"""Error estimation, marking, and hp smoothness indicators."""

from hpdg_tpu.estimators.error import l2_error, h1_seminorm_error  # noqa: F401
