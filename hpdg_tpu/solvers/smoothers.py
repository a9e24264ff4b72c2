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
    """p -> [n_p, bs, bs] inverses of the diagonal blocks."""
    return {p: jnp.linalg.inv(d) for p, d in extract_diagonal(A).items()}


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
