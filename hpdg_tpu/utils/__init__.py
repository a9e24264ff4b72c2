"""Utilities: typed config tree + CLI parsing, timers/profiling."""

from hpdg_tpu.utils.config import ParameterTree, parse_cli  # noqa: F401
from hpdg_tpu.utils.timer import Timer, profile_region  # noqa: F401
