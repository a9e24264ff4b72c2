"""Solvers: Krylov (CG), hp-multigrid, smoothers, nonsmooth (TNNMG)."""

from hpdg_tpu.solvers.cg import pcg  # noqa: F401
from hpdg_tpu.solvers.refine import (  # noqa: F401
    tunnel_refinement_solve, onchip_refinement_solve)
from hpdg_tpu.solvers import smoothers  # noqa: F401
