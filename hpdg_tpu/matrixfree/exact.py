"""On-chip near-f64 SIPG apply via exact-split (Ozaki-style) GEMMs.

The headline iterative-refinement solve (bench.py,
solvers.tunnel_refinement_solve) historically anchored every step with
a HOST f64 residual — at 4.1M DOFs that is ~75% of the solve's wall
time (tunnel fetch of each 16 MB correction at ~30 MB/s plus a host
f64 operator apply per step).  This module computes the residual
``r = b - A x`` ON-CHIP to ~2^-48 relative accuracy using only f32
MXU GEMMs, so the refinement loop never leaves the device and only
the final answer is downloaded for one verifying f64 host residual.

Scheme (the standard error-free split-GEMM construction):

* The solution is carried as a double-f32 pair ``x = x_hi + x_lo``
  (~48-bit precision; utils.df32).
* Per residual, the pair is decomposed at a per-row power-of-two scale
  into ``nchunks`` integer-valued f32 chunks of ``t`` bits each
  (df32.split_chunks) — and each stencil matrix is decomposed likewise
  per-column on the host (df32.split_matrix_chunks).
* ``t`` is chosen so chunk products summed over the contraction AND
  over the chunk pairs of one magnitude level stay below 2^24:
  every MXU GEMM over the chunks is then BIT-EXACT — chunk values
  <= 2^t <= 256 are exactly representable in bf16, so even the
  single-pass (DEFAULT-precision) f32 matmul is exact.
* Chunk-pair products are summed per magnitude level l = i + j
  (exact integer f32 adds), scaled by the exact power-of-two factors,
  and accumulated smallest-level-first into a double-f32 pair.

The operator is the uniform-lattice dense stencil (the headline bench
configuration): ``y[e] = T x[e] + sum_ax M12 x[nbr+] + M21 x[nbr-]``
with the dense blocks built as Kronecker products of the exact 1D
factor blocks (matrixfree.uniform.sipg_factor_blocks); boundary
elements get per-(axis, side) correction GEMMs on the lattice-face
subsets.  Missing neighbors read a zero ghost row, so no masking is
needed inside the exact path.

Accuracy: truncation is ~2^{-t*nchunks} of the row/column scales plus
dropped chunk pairs beyond ``levels``; with the defaults (48 bits) the
apply matches the f64 host operator to ~1e-14 relative (differential-
tested in tests/test_exact.py), i.e. the anchored residual is exact to
far below the 1e-8 solve tolerance.

Reference point this replaces: the single-memory-space solve driver of
dune-hpdg (buildingblocks/solve.hh:142-169) runs entirely in host f64;
this is its TPU-deployment equivalent — f32 speed with f64-grade
anchoring, no host in the loop.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.matrixfree.uniform import _lattice_shape, sipg_factor_blocks
from hpdg_tpu.utils import df32


def _pick_t(bs: int, bits: int) -> tuple[int, int]:
    """Largest chunk width t (and chunk count) such that one magnitude
    level's sum of GEMM results stays an exact f32 integer:
    nchunks * bs * 2^(2t) <= 2^24."""
    for t in range(8, 2, -1):
        nchunks = -(-bits // t)
        if nchunks * bs * 4 ** t <= 2 ** 24:
            return t, nchunks
    raise ValueError(f"no exact chunk width for block size {bs}")


def _kron_at(B, Mm, dim: int, ax: int) -> np.ndarray:
    """kron(M0, ..., M_{dim-1}) with B in slot ``ax`` and the 1D mass
    matrix elsewhere (C-order local dof layout, axis 0 slowest — the
    layout of basis/tensor.py and the factorized apply)."""
    M = np.ones((1, 1))
    for a in range(dim):
        M = np.kron(M, B if a == ax else Mm)
    return M


def uniform_sipg_exact_apply(basis: DGBasis, penalty: float = 2.0,
                             dirichlet: bool = False,
                             penalty_scaling: str = "measure",
                             bits: int = 48):
    """Build ``apply_pair(x_hi, x_lo) -> (y_hi, y_lo)``: the uniform-
    lattice SIPG apply on a double-f32 input, accurate to ~2^-bits of
    ``|A| |x|``, computed with bit-exact f32 MXU GEMMs only (no f64 on
    device).  Requirements match matrixfree.uniform: single degree,
    full axis-aligned uniform lattice, conforming."""
    mesh = basis.mesh
    dim = mesh.dim
    if len(basis.bucket_degrees) != 1:
        raise ValueError("exact apply needs a single degree")
    p = basis.bucket_degrees[0]
    if not np.allclose(mesh.extent, mesh.extent[0]):
        raise ValueError("exact apply needs uniform extents")
    if getattr(mesh, "jac", None) is not None \
            or getattr(mesh, "corners", None) is not None:
        raise ValueError("exact apply: axis-aligned lattices only")
    if len(mesh.faces.inside) and np.any(mesh.faces.nc_code != 0):
        raise ValueError("exact apply: conforming meshes only")
    cells, nb, Mm, D_int, D_lo, D_hi, F12, F21 = sipg_factor_blocks(
        basis, penalty, dirichlet, penalty_scaling)
    assert cells == _lattice_shape(mesh)
    n = mesh.n_elements
    bs = nb ** dim
    t, nchunks = _pick_t(bs, bits)
    levels = nchunks  # keep chunk pairs with i + j <= levels

    # ---- dense stencil blocks from the exact 1D factorization ----
    T_int = sum(_kron_at(D_int[ax], Mm, dim, ax) for ax in range(dim))
    Wp = {ax: _kron_at(F12[ax], Mm, dim, ax) for ax in range(dim)
          if cells[ax] > 1}
    Wm = {ax: _kron_at(F21[ax], Mm, dim, ax) for ax in range(dim)
          if cells[ax] > 1}
    corr = {}
    for ax in range(dim):
        corr[(ax, 0)] = _kron_at(D_lo[ax] - D_int[ax], Mm, dim, ax)
        if cells[ax] > 1:  # cells==1: both sides live in D_lo already
            corr[(ax, 1)] = _kron_at(D_hi[ax] - D_int[ax], Mm, dim, ax)

    # ---- lattice neighbor / boundary-face index arrays ----
    ids = np.arange(n, dtype=np.int32).reshape(cells)
    gp, gm, sel = {}, {}, {}
    for ax in range(dim):
        if cells[ax] > 1:
            up = (slice(None),) * ax + (slice(1, None),)
            dn = (slice(None),) * ax + (slice(0, -1),)
            nbp = np.full(cells, n, dtype=np.int32)  # ghost row = n
            nbp[dn] = ids[up]
            nbm = np.full(cells, n, dtype=np.int32)
            nbm[up] = ids[dn]
            gp[ax] = jnp.asarray(nbp.reshape(-1))
            gm[ax] = jnp.asarray(nbm.reshape(-1))
        lo_face = (slice(None),) * ax + (0,)
        sel[(ax, 0)] = jnp.asarray(ids[lo_face].reshape(-1))
        if cells[ax] > 1:
            hi_face = (slice(None),) * ax + (cells[ax] - 1,)
            sel[(ax, 1)] = jnp.asarray(ids[hi_face].reshape(-1))

    # ---- host-side matrix chunking (transposed: GEMM is x @ W^T) ----
    def prep(W):
        tau, ch = df32.split_matrix_chunks(W.T, t, nchunks)
        return jnp.asarray(tau), [jnp.asarray(c) for c in ch]

    T_tau, T_ch = prep(T_int)
    Wp_s = {ax: prep(Wp[ax]) for ax in Wp}
    Wm_s = {ax: prep(Wm[ax]) for ax in Wm}
    corr_s = {k: prep(corr[k]) for k in corr}

    two = np.float32(2.0)

    def split_terms(xc, sigma, tau, ch):
        """Magnitude-level terms of the exact GEMM: a list of
        (level, f32 array) with value = sum of terms and each level's
        integer GEMM sums exact, scaled by exact powers of two:
        term[l] ~ 2^{-t l} sigma tau."""
        out = []
        for lv in range(levels + 1):
            s = None
            for j in range(min(lv + 1, len(xc))):
                i = lv - j
                if i >= len(ch):
                    continue
                g = jnp.matmul(xc[j], ch[i], precision="default")
                s = g if s is None else s + g
            if s is None:
                continue
            out.append((lv, (s * (tau * two ** (-t * (lv + 2)))) * sigma))
        return out

    def _accumulate(terms, like):
        """Sum (level, array) terms smallest-magnitude-level first into
        a double-f32 pair (compensated; error ~2^-48 |sum| per add)."""
        h = jnp.zeros_like(like)
        lo = jnp.zeros_like(like)
        for _, tm in sorted(terms, key=lambda it: -it[0]):
            h, lo = df32.df_add(h, lo, tm)
        return h, lo

    def apply_pair(xh, xl):
        sigma = df32.pow2_rowscale(xh)
        xc = df32.split_chunks(xh, xl, sigma, t, nchunks)
        # ghost zero row for neighbor gathers
        z = jnp.zeros((1, bs), xh.dtype)
        xcg = [jnp.concatenate([c, z]) for c in xc]
        sig_g = jnp.concatenate([sigma, jnp.ones((1, 1), xh.dtype)])

        terms = split_terms(xc, sigma, T_tau, T_ch)
        for ax in Wp_s:
            for g, (tau, ch) in ((gp[ax], Wp_s[ax]), (gm[ax], Wm_s[ax])):
                terms += split_terms([c[g] for c in xcg], sig_g[g],
                                     tau, ch)
        acc_h, acc_l = _accumulate(terms, xh)

        # boundary corrections on the lattice-face subsets
        for k, (tau, ch) in corr_s.items():
            sl = sel[k]
            sub = split_terms([c[sl] for c in xc], sigma[sl], tau, ch)
            sh, slo = _accumulate(sub, xh[sl])
            nh, nl = df32.df_add_df(acc_h[sl], acc_l[sl], sh, slo)
            acc_h = acc_h.at[sl].set(nh)
            acc_l = acc_l.at[sl].set(nl)
        return acc_h, acc_l

    return apply_pair


def uniform_sipg_exact_residual(basis: DGBasis, b64, penalty: float = 2.0,
                                dirichlet: bool = False,
                                penalty_scaling: str = "measure",
                                bits: int = 48):
    """``residual_pair(x_hi, x_lo) -> (r_hi, r_lo)`` with
    ``r = b - A x`` accurate to ~2^-48 of ``|A||x|`` — the on-chip
    anchor of the refinement solve.  ``b64`` is the host f64 rhs bucket
    dict; it is split exactly into a device-resident double-f32 pair."""
    (p,) = basis.bucket_degrees
    app = uniform_sipg_exact_apply(basis, penalty, dirichlet,
                                   penalty_scaling, bits=bits)
    bh, bl = df32.df_from_f64(np.asarray(b64[p], np.float64))
    bh = jnp.asarray(bh)
    bl = jnp.asarray(bl)

    def residual_pair(xh, xl):
        yh, yl = app(xh, xl)
        # the barrier keeps the b pair out of XLA:CPU's constant-aware
        # simplifier, which otherwise rewrites two_sum's error
        # extraction to zero when jitted with b embedded as a literal
        # (measured: lo half lost, 6e-8 abs).  Production drivers hoist
        # b to a parameter anyway (solvers.cg.hoist_constants); this
        # protects direct jit users.  TPU unaffected either way.
        bhb, blb = jax.lax.optimization_barrier((bh, bl))
        return df32.df_sub_df(bhb, blb, yh, yl)

    return residual_pair


# ---------------------------------------------------------------------
# exact-split BLOCK-SPARSE apply: on-chip anchors for ANY assembled
# system (elasticity, adaptive hp meshes, obstacle linearizations) —
# the general-matrix companion of the uniform-lattice stencil above.
# ---------------------------------------------------------------------

def _pick_t_spmv(L: int, bits: int) -> tuple[int, int]:
    """Largest chunk width t such that one magnitude level's FULL ROW
    contraction (length L = sum of block widths over a row's blocks)
    sums exactly in f32: nchunks * L * 2^(2t) <= 2^24."""
    for t in range(8, 1, -1):
        nchunks = -(-bits // t)
        if nchunks * L * 4 ** t <= 2 ** 24:
            return t, nchunks
    raise ValueError(f"no exact chunk width for row length {L}")


def blocksparse_exact_apply(pattern, values64: dict, bits: int = 48,
                            dedup: bool = False):
    """Build ``apply_pair(xh, xl) -> (yh, yl)`` for a bucketed
    block-sparse matrix (linalg.blockmatrix layout): bucket dicts of
    double-f32 pairs in, pairs out, accurate to ~2^-bits of the global
    row scales, f32 MXU GEMMs only.

    Exactness scheme (differs from the dense-stencil variant in its
    scales): ONE power-of-two ``sigma`` per input bucket (global, so
    every block of an output row shares its level scale and the
    level-wise segment-sums stay exact integers) and a per-output-DOF
    power-of-two ``tau`` (max over the row's blocks).  Truncation is
    ~2^-bits of ``tau * sigma`` — relative to the GLOBAL input
    magnitude, which is exactly the contract an iterative-refinement
    anchor needs (r accurate to far below tol * ||b||).

    ``dedup=True`` stores the chunked matrix per UNIQUE block (bitwise
    f64 equality): on uniform lattices the batched assembler produces
    bitwise-identical interior blocks, so a 1M-DOF elasticity matrix
    chunks to a few dozen stencil blocks instead of ~20 GB of per-entry
    chunks.  The per-dof ``tau`` becomes one per block-row POSITION
    (max over all blocks of the bucket), so truncation is relative to
    the bucket-global magnitudes — the same backward-error contract.
    Falls back to the per-entry store for buckets without repetition.

    ``values64``: host numpy f64 block arrays, keyed like
    ``BlockSparseMatrix.values``.
    """
    if dedup:
        return _blocksparse_exact_apply_dedup(pattern, values64, bits)
    entries = pattern.entries
    # per-row total contraction length per row bucket
    row_len = {pr: np.zeros(pattern.row_sizes[pr], np.int64)
               for pr in pattern.row_sizes}
    for (pr, pc), (rows, cols) in entries.items():
        W = values64[(pr, pc)]
        np.add.at(row_len[pr], rows, W.shape[2])
    L = max(int(v.max()) for v in row_len.values() if v.size) or 1
    t, nchunks = _pick_t_spmv(L, bits)
    levels = nchunks

    # per-output-dof tau (pow2 >= max |W| over the dof's blocks)
    taus = {}
    for pr in pattern.row_sizes:
        taus[pr] = np.zeros((pattern.row_sizes[pr], 0))
    br_of = {}
    for (pr, pc), (rows, cols) in entries.items():
        W = np.asarray(values64[(pr, pc)], np.float64)
        br = W.shape[1]
        br_of[pr] = br
        m = np.zeros((pattern.row_sizes[pr], br))
        np.maximum.at(m, rows, np.abs(W).max(axis=2))
        cur = taus[pr]
        taus[pr] = np.maximum(cur, m) if cur.size else m
    for pr in taus:
        m = taus[pr]
        ex = np.frexp(m)[1]
        taus[pr] = np.ldexp(1.0, ex)  # pow2 >= max; 1.0 for zero rows

    # host chunking of each entry's blocks at the row-dof tau
    prep = {}
    for (pr, pc), (rows, cols) in entries.items():
        W = np.asarray(values64[(pr, pc)], np.float64)
        r = W / taus[pr][rows][:, :, None]
        ch = []
        for _ in range(nchunks):
            r = r * (2.0 ** t)
            c = np.rint(r)
            ch.append(jnp.asarray(c, jnp.float32))
            r = r - c
        prep[(pr, pc)] = (jnp.asarray(rows), jnp.asarray(cols), ch)
    tau_dev = {pr: jnp.asarray(taus[pr], jnp.float32) for pr in taus}
    two = np.float32(2.0)

    def apply_pair(xh: dict, xl: dict):
        # global per-bucket power-of-two input scale
        sig = {}
        xc = {}
        for pc in xh:
            m = jnp.max(jnp.abs(xh[pc]))
            _, ex = jnp.frexp(m)
            sig[pc] = jnp.ldexp(jnp.float32(1.0), ex)
            xc[pc] = df32.split_chunks(xh[pc], xl[pc],
                                       sig[pc].reshape((1,) * xh[pc].ndim),
                                       t, nchunks)
        out = {}
        for (pr, pc), (rows, cols, ch) in prep.items():
            terms = []
            for lv in range(levels + 1):
                s = None
                for j in range(min(lv + 1, nchunks)):
                    i = lv - j
                    if i >= nchunks:
                        continue
                    g = jnp.einsum("nij,nj->ni", ch[i], xc[pc][j][cols],
                                   precision="default")
                    s = g if s is None else s + g
                if s is None:
                    continue
                S = jax.ops.segment_sum(s, rows,
                                        num_segments=pattern.row_sizes[pr])
                terms.append((lv, S * (tau_dev[pr]
                                       * (two ** (-t * (lv + 2))))
                              * sig[pc]))
            out.setdefault(pr, []).extend(terms)
        res = {}
        for pr, terms in out.items():
            h = jnp.zeros((pattern.row_sizes[pr], br_of[pr]), jnp.float32)
            lo = jnp.zeros_like(h)
            for _, tm in sorted(terms, key=lambda it: -it[0]):
                h, lo = df32.df_add(h, lo, tm)
            res[pr] = (h, lo)
        return ({pr: res[pr][0] for pr in res},
                {pr: res[pr][1] for pr in res})

    return apply_pair


def _blocksparse_exact_apply_dedup(pattern, values64: dict, bits: int):
    """Deduplicated store from ASSEMBLED values: bitwise unique blocks
    per bucket (hash-accelerated — matrixfree.dedup.unique_rows), then
    the shared grouped kernel."""
    from hpdg_tpu.matrixfree.dedup import unique_rows
    groups = {}
    for key in pattern.entries:
        W = np.asarray(values64[key], np.float64)
        nnz = W.shape[0]
        uid, reps = unique_rows(np.ascontiguousarray(W).reshape(nnz, -1))
        groups[key] = (uid, W[reps] if nnz else W[:0])
    return _dedup_exact_from_groups(pattern, groups, bits)


def _dedup_exact_from_groups(pattern, groups: dict, bits: int):
    """Grouped dedup exact apply: chunk each bucket's UNIQUE blocks
    once, run one GEMM per (unique block, chunk pair) over the gathered
    input rows of that block's entries, reassemble in entry order, and
    segment-sum per magnitude level (exact integer f32 adds — the same
    bound as the per-entry path, since tau/sigma are bucket-global).

    ``groups[key] = (uid [nnz] int, U [nu, br, bc] f64)``: the unique
    blocks and each entry's unique id, in pattern entry order."""
    entries = pattern.entries
    row_len = {pr: np.zeros(pattern.row_sizes[pr], np.int64)
               for pr in pattern.row_sizes}
    for (pr, pc), (rows, cols) in entries.items():
        bc = groups[(pr, pc)][1].shape[2]
        np.add.at(row_len[pr], rows, bc)
    L = max(int(v.max()) for v in row_len.values() if v.size) or 1
    t, nchunks = _pick_t_spmv(L, bits)
    levels = nchunks

    # bucket-global tau per block-row position: pow2 >= max |W| over
    # every block that writes into bucket pr (the unique blocks carry
    # the same maxima as the full value set)
    taus = {}
    br_of = {}
    for (pr, pc), (_, U) in groups.items():
        br_of[pr] = U.shape[1]
        m = np.abs(U).max(axis=(0, 2)) if len(U) else np.zeros(U.shape[1])
        cur = taus.get(pr)
        taus[pr] = m if cur is None else np.maximum(cur, m)
    for pr in taus:
        ex = np.frexp(taus[pr])[1]
        taus[pr] = np.ldexp(1.0, ex)  # pow2 >= max; 1.0 for zero rows

    # per bucket: unique blocks, entry order sorted by unique id, and
    # static numpy group slices
    prep = {}
    for (pr, pc), (rows, cols) in entries.items():
        uid, U = groups[(pr, pc)]
        perm = np.argsort(uid, kind="stable")
        bounds = np.searchsorted(uid[perm], np.arange(len(U) + 1))
        # chunk unique blocks at the bucket tau, transposed for x @ W^T
        r = U / taus[pr][None, :, None]
        ch = []
        for _ in range(nchunks):
            r = r * (2.0 ** t)
            c = np.rint(r)
            ch.append(jnp.asarray(c.transpose(0, 2, 1), jnp.float32))
            r = r - c
        prep[(pr, pc)] = (jnp.asarray(rows[perm]),
                          [jnp.asarray(cols[perm[bounds[u]:bounds[u + 1]]])
                           for u in range(len(U))],
                          [int(b) for b in bounds], ch)
    tau_dev = {pr: jnp.asarray(taus[pr], jnp.float32) for pr in taus}
    two = np.float32(2.0)

    def apply_pair(xh: dict, xl: dict):
        sig = {}
        xc = {}
        for pc in xh:
            m = jnp.max(jnp.abs(xh[pc]))
            _, ex = jnp.frexp(m)
            sig[pc] = jnp.ldexp(jnp.float32(1.0), ex)
            xc[pc] = df32.split_chunks(xh[pc], xl[pc],
                                       sig[pc].reshape((1,) * xh[pc].ndim),
                                       t, nchunks)
        out = {}
        for (pr, pc), (rows_p, cols_u, bounds, ch) in prep.items():
            nnz = int(rows_p.shape[0])
            br = ch[0].shape[2]
            for lv in range(levels + 1):
                s = None
                for j in range(min(lv + 1, nchunks)):
                    i = lv - j
                    if i >= nchunks:
                        continue
                    parts = [jnp.matmul(xc[pc][j][cols_u[u]], ch[i][u],
                                        precision="default")
                             for u in range(len(cols_u))]
                    g = jnp.concatenate(parts) if len(parts) > 1 \
                        else parts[0]
                    s = g if s is None else s + g
                if s is None:
                    continue
                S = jax.ops.segment_sum(s, rows_p,
                                        num_segments=pattern.row_sizes[pr])
                out.setdefault(pr, []).append(
                    (lv, S * (tau_dev[pr] * (two ** (-t * (lv + 2))))
                     * sig[pc]))
        res = {}
        for pr, terms in out.items():
            h = jnp.zeros((pattern.row_sizes[pr], br_of[pr]), jnp.float32)
            lo = jnp.zeros_like(h)
            for _, tm in sorted(terms, key=lambda it: -it[0]):
                h, lo = df32.df_add(h, lo, tm)
            res[pr] = (h, lo)
        return ({pr: res[pr][0] for pr in res},
                {pr: res[pr][1] for pr in res})

    return apply_pair


def blocksparse_exact_apply_from_plan(basis, penalty: float = 2.0,
                                      dirichlet: bool = False, plan=None,
                                      penalty_scaling: str = "measure",
                                      dg_form="sipg", sigma1: float = 0.0,
                                      bits: int = 48):
    """Dedup exact-split apply WITHOUT ever assembling the matrix: the
    unique blocks come from the assembler's coefficient table
    (assemble_laplace(coef_parts=True) — blocks are bitwise equal iff
    their [K]-coefficient rows are), so the on-chip anchor for a
    multi-M-DOF adaptive mesh needs neither the ~GBs of host f64
    assembly nor minutes of full-row dedup.  Returns ``(apply_pair,
    pattern)``.  Same exactness contract as
    :func:`blocksparse_exact_apply(dedup=True)`."""
    from hpdg_tpu.assemble.sipg import assemble_laplace
    from hpdg_tpu.assemble.plan import build_plan
    from hpdg_tpu.matrixfree.dedup import unique_rows
    plan = plan or build_plan(basis)
    parts = assemble_laplace(
        basis, penalty=penalty, dirichlet=dirichlet, plan=plan,
        penalty_scaling=penalty_scaling, dg_form=dg_form, sigma1=sigma1,
        coef_parts=True)
    dim = basis.mesh.dim
    groups = {}
    for (pr, pc), (coef, D) in parts.items():
        rows, _ = plan.pattern.entries[(pr, pc)]
        nnz = len(rows)
        br, bc = (pr + 1) ** dim, (pc + 1) ** dim
        if D.shape[0] == 0:
            groups[(pr, pc)] = (np.zeros(nnz, np.int64),
                                np.zeros((1 if nnz else 0, br, bc)))
            continue
        uid, reps = unique_rows(np.ascontiguousarray(coef))
        groups[(pr, pc)] = (uid, (coef[reps] @ D).reshape(-1, br, bc))
    return _dedup_exact_from_groups(plan.pattern, groups, bits), plan.pattern


def blocksparse_exact_residual_from_plan(basis, b64: dict,
                                         penalty: float = 2.0,
                                         dirichlet: bool = False, plan=None,
                                         penalty_scaling: str = "measure",
                                         dg_form="sipg", sigma1: float = 0.0,
                                         bits: int = 48):
    """``residual_pair(xh, xl) -> (rh, rl)``, ``r = b - A x``, built
    straight from the assembly plan (no assembled matrix anywhere):
    the general-mesh on-chip anchor at multi-M-DOF adaptive sizes.
    Drop-in for :func:`blocksparse_exact_residual` in the refinement
    driver (``tree_mode`` bucket-dict pairs)."""
    app, _ = blocksparse_exact_apply_from_plan(
        basis, penalty=penalty, dirichlet=dirichlet, plan=plan,
        penalty_scaling=penalty_scaling, dg_form=dg_form, sigma1=sigma1,
        bits=bits)
    bh, bl = {}, {}
    for pk, v in b64.items():
        h, low = df32.df_from_f64(np.asarray(v, np.float64))
        bh[pk] = jnp.asarray(h)
        bl[pk] = jnp.asarray(low)

    def residual_pair(xh, xl):
        yh, yl = app(xh, xl)
        # barrier: see uniform_sipg_exact_residual — keeps the b-pair
        # literals away from XLA:CPU's two_sum-breaking simplification
        bhb, blb = jax.lax.optimization_barrier((bh, bl))
        rh, rl = {}, {}
        for pk in yh:
            rh[pk], rl[pk] = df32.df_sub_df(bhb[pk], blb[pk],
                                            yh[pk], yl[pk])
        return rh, rl

    residual_pair.tree_mode = True  # bucket-dict pairs (refine driver)
    return residual_pair


def blocksparse_exact_residual(A64, b64: dict, bits: int = 48,
                               dedup: bool = False):
    """``residual_pair(xh, xl) -> (rh, rl)`` with ``r = b - A x`` for a
    host f64 BlockSparseMatrix ``A64`` — the general-matrix on-chip
    anchor (elasticity, adaptive hp, truncated obstacle systems)."""
    vals = {k: np.asarray(v, np.float64) for k, v in A64.values.items()}
    app = blocksparse_exact_apply(A64.pattern, vals, bits=bits, dedup=dedup)
    bh, bl = {}, {}
    for pk, v in b64.items():
        h, low = df32.df_from_f64(np.asarray(v, np.float64))
        bh[pk] = jnp.asarray(h)
        bl[pk] = jnp.asarray(low)

    def residual_pair(xh, xl):
        yh, yl = app(xh, xl)
        # barrier: see uniform_sipg_exact_residual
        bhb, blb = jax.lax.optimization_barrier((bh, bl))
        rh, rl = {}, {}
        for pk in yh:
            rh[pk], rl[pk] = df32.df_sub_df(bhb[pk], blb[pk],
                                            yh[pk], yl[pk])
        return rh, rl

    residual_pair.tree_mode = True  # bucket-dict pairs (refine driver)
    return residual_pair


def truncated_exact_residual(A64, bits: int = 48, dedup: bool = True):
    """Exact-split residual of the TRUNCATED system ``A_tr = F A F +
    (I - F)`` as a PARAMETRIC function of the free mask and rhs pair:

        residual_pair(free, bh, bl, xh, xl) -> (rh, rl)
        with  r = F (b - A (F x)) - (I - F) x

    The identity lets the anchor reuse the UNtruncated matrix's chunk
    store (built once here; with ``dedup`` a uniform lattice's matrix
    chunks to a handful of stencil blocks) — truncation enters only as
    exact 0/1 mask multiplies in pair arithmetic.  This is what makes a
    VERIFIED deep-tolerance obstacle solve cheap: dune-tnnmg's truncated
    linearization (partnnmgstep.hh:147-158) changes every active-set
    update, but its exact anchor never needs re-chunking or re-tracing.

    ``free``: bucket dict of 0/1 f32 masks (1 = free dof).  ``bh, bl``:
    rhs pair of the truncated system (must be zero at active dofs)."""
    vals = {k: np.asarray(v, np.float64) for k, v in A64.values.items()}
    app = blocksparse_exact_apply(A64.pattern, vals, bits=bits,
                                  dedup=dedup)

    def residual_pair(free: dict, bh: dict, bl: dict, xh: dict, xl: dict):
        xfh = {k: xh[k] * free[k] for k in xh}
        xfl = {k: xl[k] * free[k] for k in xl}
        yh, yl = app(xfh, xfl)
        rh, rl = {}, {}
        for k in yh:
            h, lo = df32.df_sub_df(bh[k], bl[k], yh[k], yl[k])
            act = 1.0 - free[k]
            rh[k], rl[k] = df32.df_add_df(h * free[k], lo * free[k],
                                          -(xh[k] * act), -(xl[k] * act))
        return rh, rl

    return residual_pair
