"""Batched hp-SIPG assembly (GaussLobattoIPDGAssembler and friends, TPU-native)."""

from hpdg_tpu.assemble.plan import AssemblyPlan, build_plan  # noqa: F401
from hpdg_tpu.assemble.sipg import assemble_laplace, pullback_diffusion  # noqa: F401
from hpdg_tpu.assemble.mass import assemble_mass  # noqa: F401
from hpdg_tpu.assemble.rhs import l2_functional, dirichlet_rhs  # noqa: F401
