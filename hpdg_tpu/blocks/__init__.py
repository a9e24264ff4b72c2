"""User-facing building blocks (buildingblocks/ analog): the high-level
assemble-solve-estimate-adapt API."""

from hpdg_tpu.blocks.api import (  # noqa: F401
    laplace, mass, l2_functional, dirichlet_data, solve_linear,
    solve_obstacle, local_norm, global_error)
from hpdg_tpu.blocks.persist import (  # noqa: F401
    SavedState, save_state, interpolate_to)
