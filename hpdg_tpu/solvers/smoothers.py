"""Block smoothers for hp-multigrid, TPU-native.

The reference's workhorse smoother is lexicographic block Gauss-Seidel
(``DynamicBlockGS``, iterationsteps/dynamicblockgs.hh:87-126) — a
sequential sweep that is hostile to SIMD/MXU hardware.  The TPU-native
replacements (per SURVEY.md §7):

* **damped block Jacobi** — batched dense solves of all diagonal blocks
  at once (the reference itself ships this as the matrix-free
  ``IPDGBlockJacobi``, matrix-free/localoperators/ipdgblockjacobi.hh);
* **multi-color block Gauss-Seidel** — the element face-adjacency graph
  is colored host-side (bipartite ⇒ 2 colors on structured meshes) and
  each color sweep is one batched solve; sequential-GS convergence
  quality with only `n_colors` dependent steps;
* **L1-regularized Jacobi/GS** for sharded runs (l1smoother.hh analog,
  in hpdg_tpu.parallel).

All of them precompute the inverse diagonal blocks once (batched
``jnp.linalg.inv`` per bucket) — the analog of the reference's cached
``LocalSolver`` on the diagonal MatrixWindow.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from hpdg_tpu.linalg import blockvector as bv
from hpdg_tpu.linalg.blockmatrix import BlockSparseMatrix, extract_diagonal, matvec


def inverse_diagonal_blocks(A: BlockSparseMatrix) -> dict:
    """p -> [n_p, bs, bs] inverses of the diagonal blocks.

    Computed on the host (setup-time precomputation; f64 LU doesn't
    compile on all TPU generations) and shipped as device constants.
    """
    return {p: jnp.asarray(np.linalg.inv(np.asarray(d)), d.dtype)
            for p, d in extract_diagonal(A).items()}


def apply_blockdiag(Dinv: dict, x: dict) -> dict:
    return {p: jnp.einsum("nij,nj->ni", Dinv[p], x[p],
                          preferred_element_type=x[p].dtype) for p in x}


def block_jacobi_preconditioner(A: BlockSparseMatrix):
    """r -> Dinv r (for PCG)."""
    Dinv = inverse_diagonal_blocks(A)
    return lambda r: apply_blockdiag(Dinv, r)


def block_jacobi_step(A: BlockSparseMatrix, omega: float = 1.0):
    """Damped block-Jacobi iteration step: x += omega * Dinv (b - A x)."""
    Dinv = inverse_diagonal_blocks(A)

    def step(x, b):
        r = bv.sub(b, matvec(A, x))
        return bv.axpy(omega, apply_blockdiag(Dinv, r), x)

    return step


# ---------------------------------------------------------------------------
def greedy_coloring(mesh) -> np.ndarray:
    """Color the element face-adjacency graph (host-side, greedy).

    Structured conforming meshes are bipartite (2 colors); hanging-node
    meshes may need a few more.  Returns (n_elements,) int colors.
    """
    n = mesh.n_elements
    adj = [[] for _ in range(n)]
    for i, o in zip(mesh.faces.inside, mesh.faces.outside):
        adj[i].append(o)
        adj[o].append(i)
    colors = np.full(n, -1, dtype=np.int32)
    for e in range(n):
        used = {colors[nb] for nb in adj[e] if colors[nb] >= 0}
        c = 0
        while c in used:
            c += 1
        colors[e] = c
    return colors


def colored_block_gs_step(A: BlockSparseMatrix, basis, colors=None,
                          reverse: bool = False):
    """Multi-color block Gauss-Seidel sweep (one step = all colors once).

    Within a color all block solves are independent → one batched solve;
    across colors the update is sequential, giving true Gauss-Seidel
    convergence on the colored ordering.
    """
    colors = greedy_coloring(basis.mesh) if colors is None else colors
    ncol = int(colors.max()) + 1
    Dinv = inverse_diagonal_blocks(A)
    # per color and bucket: positions of that color's elements in the bucket
    masks = {}
    for p in basis.bucket_degrees:
        elems = basis.bucket_elems[p]
        cc = colors[elems]
        masks[p] = [np.where(cc == c)[0].astype(np.int32) for c in range(ncol)]

    order = range(ncol - 1, -1, -1) if reverse else range(ncol)

    def step(x, b):
        for c in order:
            r = bv.sub(b, matvec(A, x))
            newx = {}
            for p in x:
                pos = masks[p][c]
                if len(pos) == 0:
                    newx[p] = x[p]
                    continue
                upd = jnp.einsum("nij,nj->ni", Dinv[p][pos], r[p][pos],
                                 preferred_element_type=x[p].dtype)
                newx[p] = x[p].at[pos].add(upd)
            x = newx
        return x

    return step


def richardson(step_fn, sweeps: int):
    """Compose `sweeps` applications of an iteration step."""

    def multi(x, b):
        for _ in range(sweeps):
            x = step_fn(x, b)
        return x

    return multi


# ---------------------------------------------------------------------------
# L1-regularized smoothing (the parallel-safe smoother, l1smoother.hh:20-145)
# ---------------------------------------------------------------------------

def l1_shifts(A: BlockSparseMatrix, ghost_slots: dict) -> dict:
    """Per-scalar-row diagonal shifts d_i = sum over ghost-coupling blocks
    of the row l1-norms (l1smoother.hh:31-57).

    ghost_slots[(pr, pc)] = int array of slots in that value bucket whose
    COLUMN partner lives on another shard (or is otherwise 'ghost').
    Returns p -> [n_p, br] shift vectors.
    """
    out = {p: jnp.zeros((A.pattern.row_sizes[p],
                         A.values[(p, p)].shape[1]),
                        dtype=A.values[(p, p)].dtype)
           for p in A.pattern.row_sizes}
    for (pr, pc), slots in ghost_slots.items():
        rows, _ = A.pattern.entries[(pr, pc)]
        blocks = A.values[(pr, pc)][jnp.asarray(slots)]
        contrib = jnp.sum(jnp.abs(blocks), axis=2)  # row l1-norms
        out[pr] = out[pr].at[jnp.asarray(rows[slots])].add(contrib)
    return out


def l1_jacobi_step(A: BlockSparseMatrix, shifts: dict, omega: float = 1.0):
    """Damped block Jacobi on (D + diag(shift)) — convergent under any
    partitioning, the TPU analog of the reference's L1Smoother used on
    every parallel multigrid level (parmgsetup.hh:184-195)."""
    D = extract_diagonal(A)
    Dinv = {}
    for p, d in D.items():
        br = d.shape[1]
        shifted = np.asarray(d) + np.asarray(shifts[p])[:, :, None] * np.eye(br)
        Dinv[p] = jnp.asarray(np.linalg.inv(shifted), d.dtype)

    def step(x, b):
        r = bv.sub(b, matvec(A, x))
        upd = {p: jnp.einsum("nij,nj->ni", Dinv[p], r[p],
                             preferred_element_type=r[p].dtype) for p in r}
        return bv.axpy(omega, upd, x)

    return step


# ---------------------------------------------------------------------------
# Exact lexicographic block Gauss-Seidel (parity smoother)
# ---------------------------------------------------------------------------

def lexicographic_block_gs_step(A: BlockSparseMatrix, basis,
                                reverse: bool = False):
    """Sequential block GS in element order, exactly matching the
    reference's DynamicBlockGS sweep (dynamicblockgs.hh:94-126);
    ``reverse`` sweeps the rows backward (the post-smoothing direction
    of a symmetric V-cycle).

    Sequential-by-construction (a lax.scan over block rows with padded
    per-row gather), so it is SLOW on TPU — provided for residual-history
    parity against the reference; production smoothers are the colored
    variants above.  Mixed degrees take the padded-to-max-block-size
    branch below (the sweep visits ELEMENTS in mesh order, exactly like
    the reference's row loop over variable-size blocks).
    """
    if len(basis.bucket_degrees) != 1:
        return _lexicographic_block_gs_mixed(A, basis, reverse)
    p = basis.bucket_degrees[0]
    rows, cols = A.pattern.entries[(p, p)]
    n = A.pattern.row_sizes[p]
    # padded per-row structure
    order = np.argsort(rows, kind="stable")
    maxnnz = int(np.bincount(rows, minlength=n).max())
    slot_pad = np.zeros((n, maxnnz), dtype=np.int32)
    col_pad = np.zeros((n, maxnnz), dtype=np.int32)
    mask_pad = np.zeros((n, maxnnz))
    fill = np.zeros(n, dtype=np.int32)
    for s in order:
        r = rows[s]
        slot_pad[r, fill[r]] = s
        col_pad[r, fill[r]] = cols[s]
        mask_pad[r, fill[r]] = 1.0
        fill[r] += 1
    diag = np.array([A.pattern.slot(p, p, r, r) for r in range(n)],
                    dtype=np.int32)
    vals = A.values[(p, p)]
    Dinv = jnp.asarray(np.linalg.inv(np.asarray(vals[jnp.asarray(diag)])),
                       vals.dtype)
    slot_pad = jnp.asarray(slot_pad)
    col_pad = jnp.asarray(col_pad)
    mask_pad = jnp.asarray(mask_pad)

    def step(x, b):
        xb = x[p]

        def body(xb, r):
            blocks = vals[slot_pad[r]]            # (k, bs, bs)
            xg = xb[col_pad[r]]                   # (k, bs)
            ax = jnp.einsum("kij,kj->i", blocks * mask_pad[r][:, None, None],
                            xg)
            # add back the diagonal contribution so the local solve is
            # a full re-solve of row r (dynamicblockgs.hh:94-126)
            dblk = vals[jnp.asarray(diag)[r]]
            res = b[p][r] - ax + dblk @ xb[r]
            xnew = Dinv[r] @ res
            return xb.at[r].set(xnew), None

        rows_order = jnp.arange(n - 1, -1, -1) if reverse else jnp.arange(n)
        xb, _ = jax.lax.scan(body, xb, rows_order)
        return {p: xb}

    return step


def _lexicographic_block_gs_mixed(A: BlockSparseMatrix, basis,
                                  reverse: bool = False):
    """Mixed-degree lexicographic block GS: elements in mesh order,
    variable block sizes padded to the max (the padding carries zero
    blocks / identity diagonals, so the sweep is bit-exact with the
    reference's variable-size row loop, dynamicblockgs.hh:94-126)."""
    n = basis.mesh.n_elements
    bsmax = max((p + 1) ** basis.dim for p in basis.bucket_degrees)
    bs_of = {p: (p + 1) ** basis.dim for p in basis.bucket_degrees}

    # per-element padded neighbor-block table (host, parity-scale only)
    nbrs = [[] for _ in range(n)]  # (col_elem, block ndarray)
    for (pr, pc), (rows, cols) in A.pattern.entries.items():
        vals = np.asarray(A.values[(pr, pc)])
        re = basis.bucket_elems[pr][rows]
        ce = basis.bucket_elems[pc][cols]
        for s in range(len(rows)):
            if re[s] == ce[s]:
                continue  # diagonal handled separately
            nbrs[int(re[s])].append((int(ce[s]), vals[s]))
    maxnnz = max(1, max(len(v) for v in nbrs))
    blk = np.zeros((n, maxnnz, bsmax, bsmax))
    colid = np.zeros((n, maxnnz), dtype=np.int32)
    for e in range(n):
        for k, (ce, B) in enumerate(nbrs[e]):
            blk[e, k, :B.shape[0], :B.shape[1]] = B
            colid[e, k] = ce
    # padded diagonal inverses (identity on padding rows/cols)
    Dinv = np.zeros((n, bsmax, bsmax))
    from hpdg_tpu.linalg.blockmatrix import extract_diagonal
    Dfull = extract_diagonal(A)
    for p in basis.bucket_degrees:
        bs = bs_of[p]
        Dp = np.asarray(Dfull[p])
        for k, e in enumerate(basis.bucket_elems[p]):
            pad = np.eye(bsmax)
            pad[:bs, :bs] = Dp[k]
            Dinv[e] = np.linalg.inv(pad)
    dtype = next(iter(A.values.values())).dtype
    blk = jnp.asarray(blk, dtype)
    colid = jnp.asarray(colid)
    Dinvj = jnp.asarray(Dinv, dtype)
    pos = {p: jnp.asarray(basis.bucket_elems[p]) for p in basis.bucket_degrees}

    def step(x, b):
        # flatten buckets into the padded element-order layout
        xf = jnp.zeros((n, bsmax), dtype)
        bf = jnp.zeros((n, bsmax), dtype)
        for p in x:
            xf = xf.at[pos[p], :bs_of[p]].set(x[p])
            bf = bf.at[pos[p], :bs_of[p]].set(b[p])

        def body(xf, e):
            ax = jnp.einsum("kij,kj->i", blk[e], xf[colid[e]])
            xnew = Dinvj[e] @ (bf[e] - ax)
            return xf.at[e].set(xnew), None

        order = jnp.arange(n - 1, -1, -1) if reverse else jnp.arange(n)
        xf, _ = jax.lax.scan(body, xf, order)
        return {p: xf[pos[p], :bs_of[p]] for p in x}

    return step


# ---------------------------------------------------------------------------
# Chebyshev polynomial smoothing (matvec-only; beyond the reference)
# ---------------------------------------------------------------------------

def estimate_rho(apply_fn, precond_fn, x_like: dict, iters: int = 30) -> float:
    """Power-iteration estimate of rho(M^-1 A) (host loop at setup time)."""
    import numpy as _np
    rng = _np.random.default_rng(1887)
    v = {p: jnp.asarray(rng.standard_normal(_np.asarray(x_like[p]).shape),
                        _np.asarray(x_like[p]).dtype) for p in x_like}
    nrm = 1.0
    for _ in range(iters):
        w = precond_fn(apply_fn(v))
        nrm = float(bv.norm(w))
        v = bv.scale(1.0 / max(nrm, 1e-30), w)
    return nrm


def chebyshev_smoother(apply_fn, precond_fn, lmax: float,
                       degree: int = 3, lmin_frac: float = 0.15):
    """Chebyshev(degree) smoother for the preconditioned operator M^-1 A,
    targeting the upper eigenvalue band [lmin_frac*lmax, lmax] (the
    standard smoothing window).  Only needs operator applies — the ideal
    TPU smoother for matrix-free multigrid (no sequential sweeps, no
    assembled matrix).  Returns an (x, b) -> x iteration step.

    ``lmin_frac``: the window's lower end must reach DOWN to what the
    coarse space can represent.  2:1 h-coarsening and p-halving both
    cover modes only up to ~(1/2)^2 = 0.25 of the fine spectrum, so the
    historical 0.3 default left the band [coarse-representable, 0.3]
    essentially untreated — measured on a sharded hp hierarchy
    (degrees {2,4}, (8,4) cells): V-cycle rate 0.84 at 0.3 vs 0.34 at
    0.15 (cheb 3) and 0.26 -> 0.12 (cheb 5).  The weakness was masked
    until round 3 by an UNDERestimated lmax (the ones-vector power
    iteration) that happened to shift the window down; with the honest
    spectral estimate the window itself must be honest too.
    """
    theta = 0.5 * (lmax * lmin_frac + lmax)
    delta = 0.5 * (lmax - lmax * lmin_frac)

    def step(x, b):
        # standard Chebyshev recurrence on the residual polynomial
        r = precond_fn(bv.sub(b, apply_fn(x)))
        d = bv.scale(1.0 / theta, r)
        sigma = theta / delta
        rho_old = 1.0 / sigma
        x = bv.add(x, d)
        for _ in range(degree - 1):
            r = precond_fn(bv.sub(b, apply_fn(x)))
            rho_new = 1.0 / (2.0 * sigma - rho_old)
            d = bv.axpy(rho_new * rho_old, d,
                        bv.scale(2.0 * rho_new / delta, r))
            rho_old = rho_new
            x = bv.add(x, d)
        return x

    return step


def l1_projected_jacobi_step(A: BlockSparseMatrix, shifts: dict, lo: dict,
                             up: dict, omega: float = 1.0):
    """Projected L1 smoother (l1projected.hh:20-156 analog): the damped
    L1-regularized block-Jacobi update clamped into the box [lo, up] —
    the parallel-safe smoother for sharded obstacle problems (combines
    l1smoother.hh's ghost-coupling diagonal shift with projected GS's
    constraint clamping)."""
    import jax.numpy as _jnp
    D = extract_diagonal(A)
    Dinv = {}
    for p, d in D.items():
        br = d.shape[1]
        shifted = np.asarray(d) + np.asarray(shifts[p])[:, :, None] * np.eye(br)
        Dinv[p] = jnp.asarray(np.linalg.inv(shifted), d.dtype)

    def step(x, b):
        r = bv.sub(b, matvec(A, x))
        out = {}
        for p in r:
            upd = jnp.einsum("nij,nj->ni", Dinv[p], r[p],
                             preferred_element_type=r[p].dtype)
            out[p] = _jnp.clip(x[p] + omega * upd, lo[p], up[p])
        return out

    return step
