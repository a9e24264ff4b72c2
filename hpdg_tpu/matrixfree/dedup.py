"""Deduplicated block-sparse SpMV: the general-mesh fast apply.

A bucketed block-sparse SIPG matrix on a (locally refined) lattice mesh
contains only a few dozen DISTINCT blocks: the batched assembler
computes every element of a bucket with the same vectorized arithmetic,
so equal geometry means bitwise-equal f64 blocks (interior stencil,
per-level variants, boundary and hanging-node variants).  A plain SpMV
reads the full ``[nnz, bs, bs]`` value array from HBM per apply —
2.4 GB at 605k DOFs p=4, i.e. ~3 ms of pure matrix traffic.  This
operator instead stores the UNIQUE blocks (a few MB) plus int32
indices, and applies

    y[rows_u] += x[cols_u] @ W_u^T        for each unique block u

as one gather + one [m_u, bs] x [bs, bs] MXU GEMM per unique block and
a single segment-sum per bucket pair.  HBM traffic drops to the
gathered/scattered VECTORS (~2 (K+1) * |x| bytes), turning the
assembled general-mesh apply from bandwidth-bound on the matrix into
gather-bound on the vector — measured 6-10x faster at the 605k-DOF
hanging-node benchmark config.

Two entry points:

* :func:`dedup_spmv_operator` discovers the dictionary from an already
  assembled ``BlockSparseMatrix`` (bitwise row dedup, hash-accelerated).
* :func:`dedup_spmv_from_plan` never assembles at all: the fast
  (dictionary-GEMM) assembler factorizes every block as
  ``coef_row @ D`` (assemble.sipg._CoefBuilder), so blocks are equal
  whenever their tiny per-block coefficient rows are equal — the dedup
  runs on ``[nnz, K]`` with K ~ tens and only the unique blocks are
  ever materialized.  This is the path to multi-M-DOF adaptive meshes:
  nothing of size ``[nnz, bs, bs]`` exists at any point.

This is the TPU-native generalization of the reference's uniform /
sum-factorized operators (uniformipdgoperator.hh:22-315 exploits ONE
repeated geometry; sfipdg.hh re-evaluates per element): here the
repeated-block dictionary is discovered automatically, so a 2:1-refined
hp lattice with boundary and hanging-node variants works as well as a
uniform grid — and a truly unstructured mesh simply degrades to the
per-entry SpMV (use ``stats["compression"]`` to decide).

The same dictionary layout feeds the exact-split anchors
(matrixfree.exact.blocksparse_exact_apply(dedup=True)); this module is
the plain-f32 single-pass sibling for smoothers/Krylov/V-cycle applies.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def unique_rows(flat: np.ndarray):
    """Bitwise-unique rows of a 2D array, hash-accelerated.

    ``np.unique(flat, axis=0)`` lexicographically sorts with full-row
    comparators — minutes at 61k rows of (p+1)^6 f64 entries.  Here each
    row is first reduced to a pair of 64-bit mixed sums (one sort of
    scalar keys), then every member is verified bitwise against its
    group representative — a single vectorized comparison pass — so the
    result is EXACT bitwise grouping, not probabilistic.  Returns
    ``(uid [n] int64 group ids, reps [nu] int64 representative row
    indices)`` with group ids ordered by first occurrence.
    """
    n = flat.shape[0]
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    b = np.ascontiguousarray(flat).view(np.uint8).reshape(n, -1)
    # pad the byte rows to a multiple of 8 for a u64 view
    pad = (-b.shape[1]) % 8
    if pad:
        b = np.concatenate([b, np.zeros((n, pad), np.uint8)], axis=1)
    u = b.view(np.uint64)
    m = u.shape[1]
    rng = np.random.default_rng(0xD5D0)
    w1 = rng.integers(1, 2**63, size=m, dtype=np.uint64) * 2 + 1
    w2 = rng.integers(1, 2**63, size=m, dtype=np.uint64) * 2 + 1
    with np.errstate(over="ignore"):
        h1 = (u * w1[None, :]).sum(axis=1, dtype=np.uint64)
        h2 = (u * w2[None, :]).sum(axis=1, dtype=np.uint64)
    key = (h1.astype(np.int64) << np.int64(1)) ^ h2.astype(np.int64)
    order = np.argsort(key, kind="stable")
    ks = key[order]
    starts = np.flatnonzero(np.concatenate([[True], ks[1:] != ks[:-1]]))
    gid_sorted = np.cumsum(np.concatenate(
        [[0], (ks[1:] != ks[:-1]).astype(np.int64)]))
    gid = np.empty(n, np.int64)
    gid[order] = gid_sorted
    reps = order[starts]  # representative row per hash group
    # exact verification: every row must equal its group representative
    if not (u == u[reps[gid]]).all():
        # hash collision (astronomically unlikely): exact fallback
        _, uid = np.unique(b, axis=0, return_inverse=True)
        uid = np.asarray(uid).reshape(-1)
        first = np.zeros(uid.max() + 1, np.int64)
        seen = np.zeros(uid.max() + 1, bool)
        for i, g in enumerate(uid):
            if not seen[g]:
                seen[g] = True
                first[g] = i
        return uid, first
    # reorder group ids by first occurrence (stable / deterministic)
    firstpos = np.full(len(reps), n, np.int64)
    np.minimum.at(firstpos, gid, np.arange(n))
    rank = np.argsort(np.argsort(firstpos, kind="stable"), kind="stable")
    uid = rank[gid]
    reps_out = np.empty(len(reps), np.int64)
    reps_out[rank] = reps
    return uid, reps_out


def dedup_blocks(pattern, values) -> dict:
    """Host-side dictionary build.  Returns per (pr, pc):
    (rows_perm, cols_perm, group_bounds, W_unique) with entries sorted
    by unique-block id (stable), so each unique block's entries are one
    contiguous [m_u] slice."""
    out = {}
    for (pr, pc), (rows, cols) in pattern.entries.items():
        W = np.asarray(values[(pr, pc)])
        nnz = W.shape[0]
        flat = np.ascontiguousarray(W).reshape(nnz, -1)
        uid, reps = unique_rows(flat)
        U = W[reps]
        perm = np.argsort(uid, kind="stable")
        bounds = np.searchsorted(uid[perm], np.arange(len(U) + 1))
        out[(pr, pc)] = (rows[perm], cols[perm],
                         [int(b) for b in bounds], U)
    return out


def _dedup_entry(rows, cols, uid, U, dtype):
    """Device-ready prep tuple from a grouped entry list."""
    nu = U.shape[0]
    perm = np.argsort(uid, kind="stable")
    bounds = np.searchsorted(uid[perm], np.arange(nu + 1))
    Wt = jnp.asarray(np.ascontiguousarray(U.transpose(0, 2, 1)), dtype)
    cols_u = [jnp.asarray(cols[perm][bounds[u]:bounds[u + 1]])
              for u in range(nu)]
    return ("dedup", jnp.asarray(rows[perm]), cols_u, Wt)


def _make_apply(pattern, prep):
    def apply(x: dict) -> dict:
        y = {}
        for (pr, pc), item in prep.items():
            if item[0] == "dedup":
                _, rows_p, cols_u, Wt = item
                parts = [jnp.matmul(x[pc][cols_u[u]], Wt[u],
                                    preferred_element_type=x[pc].dtype)
                         for u in range(len(cols_u))]
                s = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
                contrib = jax.ops.segment_sum(
                    s, rows_p, num_segments=pattern.row_sizes[pr])
            else:
                _, rows, cols, W = item
                g = jnp.einsum("nij,nj->ni", W, x[pc][cols],
                               preferred_element_type=x[pc].dtype)
                contrib = jax.ops.segment_sum(
                    g, rows, num_segments=pattern.row_sizes[pr])
            y[pr] = contrib if pr not in y else y[pr] + contrib
        return y

    return apply


def dedup_spmv_operator(A, dtype=jnp.float32, max_unique_frac: float = 0.25):
    """Build ``apply(x) -> y`` for a BlockSparseMatrix ``A`` using the
    unique-block dictionary, plus a ``stats`` dict.

    Falls back to the plain per-entry SpMV for bucket pairs whose
    unique-block count exceeds ``max_unique_frac`` of their nnz (no
    repetition to exploit — e.g. genuinely unstructured geometry).
    """
    pattern = A.pattern
    groups = dedup_blocks(pattern, {k: np.asarray(v, np.float64)
                                    for k, v in A.values.items()})
    prep = {}
    stats = {"n_unique": {}, "nnz": {}, "dedup": {}}
    for (pr, pc), (rows_p, cols_p, bounds, U) in groups.items():
        nnz = len(rows_p)
        nu = len(U)
        stats["n_unique"][(pr, pc)] = nu
        stats["nnz"][(pr, pc)] = nnz
        use = nu <= max(1, int(max_unique_frac * nnz))
        stats["dedup"][(pr, pc)] = use
        if use:
            Wt = jnp.asarray(U.transpose(0, 2, 1), dtype)  # x @ W^T
            cols_u = [jnp.asarray(cols_p[bounds[u]:bounds[u + 1]])
                      for u in range(nu)]
            prep[(pr, pc)] = ("dedup", jnp.asarray(rows_p), cols_u, Wt)
        else:
            rows, cols = pattern.entries[(pr, pc)]
            prep[(pr, pc)] = ("plain", jnp.asarray(rows),
                              jnp.asarray(cols),
                              jnp.asarray(A.values[(pr, pc)], dtype))
    stats["compression"] = (
        sum(stats["n_unique"].values()) / max(1, sum(stats["nnz"].values())))
    return _make_apply(pattern, prep), stats


def dedup_spmv_from_plan(basis, penalty: float = 2.0,
                         dirichlet: bool = False, dtype=jnp.float32,
                         plan=None, penalty_scaling: str = "measure",
                         dg_form="sipg", sigma1: float = 0.0,
                         max_unique_frac: float = 0.25):
    """Dedup SpMV operator WITHOUT ever assembling the matrix.

    The fast (dictionary-GEMM) assembler factorizes every block of the
    constant-coefficient SIPG matrix as ``coef_row [K] @ D [K, br*bc]``
    (assemble_laplace(coef_parts=True)), so two blocks are bitwise
    equal whenever their coefficient rows are — the dedup runs on the
    tiny ``[nnz, K]`` coefficient table (K ~ tens) and only the UNIQUE
    blocks are multiplied out.  Peak host memory is O(nnz * K); the
    device stores the unique blocks (a few MB) + int32 indices.  The
    apply itself is identical to :func:`dedup_spmv_operator`'s.

    Returns ``(apply, stats)``.  Equivalent reference machinery: the
    uniform operator's single repeated local matrix
    (uniformipdgoperator.hh:22-315), generalized to every repeated
    variant a refined-lattice hp mesh produces.
    """
    from hpdg_tpu.assemble.sipg import assemble_laplace
    from hpdg_tpu.assemble.plan import build_plan
    plan = plan or build_plan(basis)
    parts = assemble_laplace(
        basis, penalty=penalty, dirichlet=dirichlet, plan=plan,
        penalty_scaling=penalty_scaling, dg_form=dg_form, sigma1=sigma1,
        coef_parts=True)
    pattern = plan.pattern
    prep = {}
    stats = {"n_unique": {}, "nnz": {}, "dedup": {}}
    for (pr, pc), (coef, D) in parts.items():
        rows, cols = pattern.entries[(pr, pc)]
        nnz = len(rows)
        br = (pr + 1) ** basis.mesh.dim
        bc = (pc + 1) ** basis.mesh.dim
        if D.shape[0] == 0:  # bucket pair never touched: all-zero blocks
            uid = np.zeros(nnz, np.int64)
            U = np.zeros((1 if nnz else 0, br, bc))
        else:
            uid, reps = unique_rows(np.ascontiguousarray(coef))
            U = (coef[reps] @ D).reshape(-1, br, bc)
        nu = U.shape[0]
        stats["n_unique"][(pr, pc)] = nu
        stats["nnz"][(pr, pc)] = nnz
        use = nu <= max(1, int(max_unique_frac * nnz))
        stats["dedup"][(pr, pc)] = use
        if use:
            prep[(pr, pc)] = _dedup_entry(rows, cols, uid, U, dtype)
        else:
            W = (coef @ D).reshape(nnz, br, bc)
            prep[(pr, pc)] = ("plain", jnp.asarray(rows),
                              jnp.asarray(cols), jnp.asarray(W, dtype))
    stats["compression"] = (
        sum(stats["n_unique"].values()) / max(1, sum(stats["nnz"].values())))
    return _make_apply(pattern, prep), stats
