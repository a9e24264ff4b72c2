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
        return df32.df_sub_df(bh, bl, yh, yl)

    return residual_pair
