"""hpdg_tpu — a TPU-native hp-adaptive discontinuous Galerkin framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the DUNE
module dune-hpdg (hp-adaptive Symmetric Interior Penalty DG with
hp-multigrid solvers, obstacle problems and domain-decomposition
parallelism; see /root/reference).

Design pillars (TPU-first, not a port):

* Elements are grouped into *degree buckets* so every kernel is a fixed
  static-shape batch: ``[n_elements_in_bucket, (p+1)^d]`` coefficient
  arrays and ``[nnz_bucket, (p_r+1)^d, (p_c+1)^d]`` matrix-block arrays.
  Batched einsums put the sum-factorized tensor contractions on the MXU.
* The grid is *precomputed connectivity arrays* (element geometry
  factors, face pair lists bucketed by (p_in, p_out, axis)), built once
  on the host — no per-element control flow ever reaches XLA.
* Multigrid is a functional composition of jitted level operations
  (mirroring dune-hpdg's ``LevelOperations`` of std::functions,
  iterationsteps/mg/multigrid.hh:26-79), with p-transfer as batched
  per-bucket interpolation tensors and Galerkin RtAR as batched einsums.
* Multi-chip: elements are sharded over a ``jax.sharding.Mesh`` axis and
  cross-shard face terms use halo exchange via ``shard_map``/``ppermute``
  — the ICI-native analog of dune-hpdg's MPI VariableSizeCommunicator
  layer (parallel/communicationhpdg.hh).
"""

import os as _os

import jax as _jax

# On TPU, f32 matmuls default to bf16-input passes.  For finite-element
# operators that is not a performance knob but a correctness bug: the
# multigrid contraction rate collapses (it can even diverge) and the
# 1e-11-class differential tests against the oracle become meaningless.
# Make honest f32 the framework default; opt out with
# HPDG_ALLOW_BF16_MATMUL=1 if you know what you are doing.
if _os.environ.get("HPDG_ALLOW_BF16_MATMUL", "0") != "1":
    _jax.config.update("jax_default_matmul_precision", "highest")

from hpdg_tpu import quadrature  # noqa: E402
from hpdg_tpu.basis import lagrange, legendre  # noqa: E402

__version__ = "0.1.0"
