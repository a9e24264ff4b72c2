"""Transfer operators: p-coarsening, h-coarsening, Galerkin products."""

from hpdg_tpu.transfer.element import (  # noqa: F401
    ElementTransfer, p_transfer, h_transfer, p_coarse_degrees)
