"""Degree-bucketed block linear algebra (DynamicBCRS/DynamicBlockVector analog)."""

from hpdg_tpu.linalg import blockvector as bv  # noqa: F401
from hpdg_tpu.linalg.blockmatrix import BlockSparseMatrix  # noqa: F401
