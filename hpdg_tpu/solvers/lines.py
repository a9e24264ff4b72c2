"""Line-block smoothers: exact block-tridiagonal solves along element
lines.

On meshes with stretched elements the strong coupling runs along the
short axis; element-block smoothers (Jacobi / GS / Chebyshev) leave the
along-line modes essentially undamped, which plateaus the two-grid rate
at ~0.55 on 1:4-stretched p=4 elements (ROADMAP item 13) no matter how
good the coarse space is.  The classical fix is a LINE smoother: group
the elements into lines along the strong axis and solve each line's
block-tridiagonal system exactly.  The reference reaches the same
robustness through its sequential Gauss-Seidel sweeps ordered along the
grid (dynamicblockgs.hh:94-126 runs the DUNE iterator order, which on a
structured grid IS lexicographic-by-line); a TPU-native smoother cannot
be sequential over elements, but a batched block-Thomas factorization
over all lines at once is one `lax.scan` over line position with dense
[n_lines, B, B] matmuls per step — MXU-shaped and parallel over lines.

Mixed degrees (hp) are handled by padding every block to the max bucket
size B = ncomp * (p_max+1)^dim with identity diagonals / zero couplings
(ncomp = the matrix block components: 1 for scalar problems, dim for
elasticity systems), so one static-shape scan serves the whole mesh.

Memory: the factorization stores three [n_elements, B, B] arrays
(S^{-1}, L S^{-1}, U) — 3x the element-diagonal-block storage.  Line
smoothers target anisotropy-limited configs, which are moderate size;
the uniform-mesh hot path keeps the cheaper Chebyshev/Jacobi smoothers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.linalg import blockmatrix as bm
from hpdg_tpu.linalg import blockvector as bv


def build_lines(mesh, axis: int) -> np.ndarray:
    """Group elements into lines along ``axis``: [n_lines, K] element
    ids, sorted by coordinate along the axis; ragged lines are padded
    with -1.  Elements are in the same line iff their centers agree in
    every other axis (quantized at 1e-9 of the domain size) — exact for
    box meshes; hanging-node meshes get shorter (per-patch) lines."""
    c = mesh.centers()
    scale = float(np.abs(c).max()) + 1.0
    q = np.round(c / scale * 1e9).astype(np.int64)
    other = [a for a in range(mesh.dim) if a != axis]
    keys = q[:, other]
    uniq, line_of = np.unique(keys, axis=0, return_inverse=True)
    n_lines = len(uniq)
    order = np.lexsort((c[:, axis], line_of))
    counts = np.bincount(line_of, minlength=n_lines)
    K = int(counts.max())
    lines = np.full((n_lines, K), -1, dtype=np.int64)
    pos = np.concatenate([np.arange(k) for k in counts])
    lines[line_of[order], pos] = order
    return lines


def _gather_block(A: bm.BlockSparseMatrix, basis: DGBasis, e_row: int,
                  e_col: int, B: int) -> np.ndarray | None:
    """Padded (B, B) host copy of block (e_row, e_col), or None if the
    pattern has no such block (non-adjacent elements: zero coupling)."""
    pr = int(basis.degrees[e_row])
    pc = int(basis.degrees[e_col])
    key = (pr, pc)
    if key not in A.pattern.entries:
        return None
    try:
        s = A.pattern.slot(pr, pc, int(basis.elem_bucket_pos[e_row]),
                           int(basis.elem_bucket_pos[e_col]))
    except KeyError:
        return None
    blk = np.asarray(A.values[key][s], dtype=np.float64)
    out = np.zeros((B, B))
    out[: blk.shape[0], : blk.shape[1]] = blk
    return out


def line_tridiag_factor(A: bm.BlockSparseMatrix, basis: DGBasis,
                        axis: int = 0, lines: np.ndarray | None = None):
    """Factor the line-block-tridiagonal part of ``A`` (host, f64).

    Block Thomas: S_0 = D_0, S_k = D_k - L_k S_{k-1}^{-1} U_{k-1}.
    Returns dict of numpy arrays shaped [n_lines, K, B, B]:
      Sinv  — inverted pivot blocks,
      W     — L_k S_{k-1}^{-1} (forward elimination multiplier, 0 at k=0),
      U     — upper coupling blocks (0 at k=K-1),
    plus the line table and per-bucket scatter maps.
    """
    if A.block_shape[0] != A.block_shape[1]:
        raise ValueError(f"non-square block shape {A.block_shape}")
    ncomp = A.block_shape[0]  # 1 for scalar, dim for elasticity systems
    mesh = basis.mesh
    if lines is None:
        lines = build_lines(mesh, axis)
    n_lines, K = lines.shape
    pmax = basis.max_degree()
    B = ncomp * (pmax + 1) ** mesh.dim

    D = np.zeros((n_lines, K, B, B))
    U = np.zeros((n_lines, K, B, B))
    Lo = np.zeros((n_lines, K, B, B))
    eyeB = np.eye(B)
    for li in range(n_lines):
        for k in range(K):
            e = lines[li, k]
            if e < 0:
                D[li, k] = eyeB
                continue
            blk = _gather_block(A, basis, int(e), int(e), B)
            bs = ncomp * basis.block_sizes[e]
            blk[bs:, bs:] = np.eye(B - bs)  # identity on the hp padding
            D[li, k] = blk
            if k + 1 < K and lines[li, k + 1] >= 0:
                en = int(lines[li, k + 1])
                up = _gather_block(A, basis, int(e), en, B)
                lo = _gather_block(A, basis, en, int(e), B)
                if up is not None:
                    U[li, k] = up
                if lo is not None:
                    Lo[li, k + 1] = lo

    Sinv = np.zeros_like(D)
    W = np.zeros_like(D)
    Sinv[:, 0] = np.linalg.inv(D[:, 0])
    for k in range(1, K):
        W[:, k] = Lo[:, k] @ Sinv[:, k - 1]
        Sinv[:, k] = np.linalg.inv(D[:, k] - W[:, k] @ U[:, k - 1])

    # per-bucket (line, pos) of every element, for bucketed <-> line layout
    line_of = np.full(mesh.n_elements, -1, dtype=np.int64)
    pos_of = np.full(mesh.n_elements, -1, dtype=np.int64)
    valid = lines >= 0
    li_idx, po_idx = np.nonzero(valid)
    line_of[lines[li_idx, po_idx]] = li_idx
    pos_of[lines[li_idx, po_idx]] = po_idx
    maps = {}
    for p in basis.bucket_degrees:
        el = basis.bucket_elems[p]
        maps[p] = (line_of[el], pos_of[el])
    return dict(Sinv=Sinv, W=W, U=U, lines=lines, maps=maps, B=B,
                dims=(n_lines, K))


def line_solve(fac: dict, dtype=jnp.float64):
    """jit-able exact solve of the factored line system: r -> M^{-1} r.

    Batched block Thomas: one forward and one backward `lax.scan` over
    line position with [n_lines, B, B] x [n_lines, B] matmuls per step.
    """
    Sinv = jnp.asarray(fac["Sinv"], dtype=dtype)
    W = jnp.asarray(fac["W"], dtype=dtype)
    U = jnp.asarray(fac["U"], dtype=dtype)
    maps = fac["maps"]
    n_lines, K = fac["dims"]
    B = fac["B"]
    # scan over position: move K to the leading axis
    SinvT = jnp.swapaxes(Sinv, 0, 1)  # [K, n_lines, B, B]
    WT = jnp.swapaxes(W, 0, 1)
    UT = jnp.swapaxes(U, 0, 1)

    def solve(r: dict) -> dict:
        R = jnp.zeros((K, n_lines, B), dtype=dtype)
        for p, rp in r.items():
            lo, po = maps[p]
            bs = rp.shape[-1]
            R = R.at[po, lo, :bs].set(rp.astype(dtype))

        # forward: y_k = r_k - W_k y_{k-1}
        def fwd(y_prev, inputs):
            Wk, rk = inputs
            y = rk - jnp.einsum("lij,lj->li", Wk, y_prev)
            return y, y

        y0 = jnp.zeros((n_lines, B), dtype=dtype)
        _, Y = jax.lax.scan(fwd, y0, (WT, R))

        # backward: x_k = Sinv_k (y_k - U_k x_{k+1})
        def bwd(x_next, inputs):
            Sk, Uk, yk = inputs
            x = jnp.einsum("lij,lj->li", Sk,
                           yk - jnp.einsum("lij,lj->li", Uk, x_next))
            return x, x

        _, X = jax.lax.scan(bwd, y0, (SinvT, UT, Y), reverse=True)
        out = {}
        for p, rp in r.items():
            lo, po = maps[p]
            bs = rp.shape[-1]
            out[p] = X[po, lo, :bs].astype(rp.dtype)
        return out

    return solve


def line_jacobi_step(A: bm.BlockSparseMatrix, basis: DGBasis,
                     axis: int = 0, omega: float = 1.0,
                     fac: dict | None = None, dtype=jnp.float64):
    """Damped line-Jacobi: x <- x + omega * M^{-1}(b - A x) with M the
    line-block-tridiagonal part of A along ``axis``."""
    if fac is None:
        fac = line_tridiag_factor(A, basis, axis)
    M = line_solve(fac, dtype=dtype)

    def step(x: dict, b: dict) -> dict:
        r = bv.sub(b, bm.matvec(A, x))
        return bv.add(x, bv.scale(omega, M(r)))

    return step
