"""Solvers: Krylov (CG), hp-multigrid, smoothers, nonsmooth (TNNMG)."""

from hpdg_tpu.solvers.cg import pcg  # noqa: F401
from hpdg_tpu.solvers.refine import tunnel_refinement_solve  # noqa: F401
from hpdg_tpu.solvers import smoothers  # noqa: F401
