"""Matrix-free operators (sum-factorized, batched over degree buckets).

TPU-native rebuild of dune-hpdg's biggest subsystem
(matrix-free/, ~8k LoC): operator applications that never form the
global matrix, with the tensor-product (sum-factorization) structure
turned into batched einsums on the MXU.  Unlike the reference
(2D-only static_asserts, sfipdg.hh:48) everything here works in any
dimension.
"""

from hpdg_tpu.matrixfree.sumfact import (  # noqa: F401
    sipg_operator, laplace_bulk_operator, mass_operator, naive_sipg_operator)
from hpdg_tpu.matrixfree.diagonal import sipg_diagonal_blocks  # noqa: F401
from hpdg_tpu.matrixfree.exact import (  # noqa: F401
    uniform_sipg_exact_apply, uniform_sipg_exact_residual,
    blocksparse_exact_apply, blocksparse_exact_residual,
    blocksparse_exact_apply_from_plan, blocksparse_exact_residual_from_plan)
from hpdg_tpu.matrixfree.dedup import (  # noqa: F401
    dedup_spmv_operator, dedup_spmv_from_plan)
from hpdg_tpu.matrixfree.norms import ipdg_local_norm  # noqa: F401
