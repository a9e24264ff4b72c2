"""Assembly and matrix-free operators on the continuous Q_k space.

The reference discretizes CG problems through the same assembler stack
as DG (dune/hpdg/functionspacebases/qkglnodalbasis.hh supplies the
space; the assemblers at dune/hpdg/assemblers/localassemblers/* are
space-generic).  Here the same sharing happens through the gather /
scatter pair of :class:`~hpdg_tpu.basis.cgbasis.CGQkBasis`: every
element-local kernel (batched einsum stiffness blocks, sum-factorized
matrix-free applies) is the DG one on the degree-k companion basis, and
CG-ness is exactly ``A_cg = R^T A_local R`` with R the (weighted)
gather — assembled as a scalar sparse matrix or applied matrix-free.

Dirichlet conditions are imposed the CG way (boundary-dof elimination:
unit rows/columns), not by Nitsche penalties: the space is conforming,
so the reference's strong-constraint path applies
(buildingblocks/solve.hh handles the same through
``ignoreNodes``-style masks).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from hpdg_tpu.basis import tensor
from hpdg_tpu.basis.cgbasis import CGQkBasis
from hpdg_tpu.mesh import geometry as geo


# ---------------------------------------------------------------- local
def cg_local_stiffness(cg: CGQkBasis, diffusion=None,
                       dtype=jnp.float64) -> jnp.ndarray:
    """Element-local bulk stiffness blocks ``(n, nl, nl)`` (the same
    batched einsum as the DG bulk term, assemble/sipg.py bulk loop)."""
    basis, mesh, dim, p = cg.dg, cg.mesh, cg.dim, cg.degree
    vt = tensor.volume_tables(p, dim, p + 2, family=basis.family)
    G, w = vt["G"], vt["weights"]
    ext = mesh.extent
    detJ = np.prod(ext, axis=1)
    invh2 = detJ[:, None] / ext ** 2
    if diffusion is None and not geo.has_affine(mesh):
        S = np.einsum("q,aiq,ajq->aij", w, G, G)
        return jnp.einsum("ea,aij->eij", jnp.asarray(invh2, dtype),
                          jnp.asarray(S, dtype))
    elems = np.arange(mesh.n_elements, dtype=np.int32)
    xp = (mesh.lower[:, None, :] + vt["points"][None, :, :]
          * ext[:, None, :])
    x = geo.apply_map(mesh, elems, xp)
    k = (jnp.asarray(diffusion(jnp.asarray(x, dtype)), dtype)
         if diffusion is not None else None)
    if geo.has_affine(mesh):
        k = jnp.asarray(geo.effective_tensor(mesh, elems, k, xp), dtype)
    if k is not None and k.ndim == 4:  # (n, q, dim, dim) tensor medium
        cof = detJ[:, None, None] / (ext[:, :, None] * ext[:, None, :])
        return jnp.einsum("eqab,q,eab,aiq,bjq->eij", k,
                          jnp.asarray(w, dtype), jnp.asarray(cof, dtype),
                          jnp.asarray(G, dtype), jnp.asarray(G, dtype))
    kw = k * jnp.asarray(w, dtype)[None, :]
    return jnp.einsum("eq,ea,aiq,ajq->eij", kw, jnp.asarray(invh2, dtype),
                      jnp.asarray(G, dtype), jnp.asarray(G, dtype))


def cg_local_mass(cg: CGQkBasis, weight=None,
                  dtype=jnp.float64) -> jnp.ndarray:
    """Element-local mass blocks ``(n, nl, nl)`` at full 2p quadrature."""
    from hpdg_tpu.assemble.mass import assemble_mass
    M = assemble_mass(cg.dg, weight=weight, dtype=dtype)
    return M.values[(cg.degree, cg.degree)][:cg.mesh.n_elements]


# ------------------------------------------------------------- assembled
@dataclass(frozen=True)
class CGSparseMatrix:
    """Scalar sparse matrix in deduplicated COO, SpMV by segment-sum
    (the CG analog of linalg.blockmatrix's bucketed block COO)."""

    n: int
    rows: np.ndarray   # (nnz,) int32, sorted
    cols: np.ndarray   # (nnz,) int32
    vals: jnp.ndarray  # (nnz,)

    def matvec(self, x):
        contrib = self.vals * x[jnp.asarray(self.cols)]
        return jax.ops.segment_sum(contrib, jnp.asarray(self.rows),
                                   num_segments=self.n)

    def todense(self) -> np.ndarray:
        A = np.zeros((self.n, self.n))
        np.add.at(A, (self.rows, self.cols), np.asarray(self.vals))
        return A


def _scatter_blocks(cg: CGQkBasis, blocks, dirichlet: bool,
                    dtype) -> CGSparseMatrix:
    """Fold element-local blocks through the weighted gather on both
    sides: ``A[wdof[e,i,ki], wdof[e,j,kj]] += wval*wval*blocks[e,i,j]``,
    then deduplicate.  Dirichlet: boundary rows/cols dropped, unit
    diagonal added."""
    n, nl, K = cg.wdof.shape
    wd = cg.wdof.astype(np.int64)
    wv = cg.wval
    # (e,i,ki,j,kj) index/value outer products, flattened
    rows = np.broadcast_to(wd[:, :, :, None, None], (n, nl, K, nl, K))
    cols = np.broadcast_to(wd[:, None, None, :, :], (n, nl, K, nl, K))
    w = (wv[:, :, :, None, None] * wv[:, None, None, :, :])
    vals = np.asarray(blocks, np.float64)[:, :, None, :, None] * w
    rows, cols = rows.reshape(-1), cols.reshape(-1)
    vals = vals.reshape(-1)
    keep = vals != 0.0
    rows, cols, vals = rows[keep], cols[keep], vals[keep]
    if dirichlet:
        bnd = cg.boundary
        keep = ~(bnd[rows] | bnd[cols])
        rows, cols, vals = rows[keep], cols[keep], vals[keep]
        bidx = np.where(bnd)[0]
        rows = np.concatenate([rows, bidx])
        cols = np.concatenate([cols, bidx])
        vals = np.concatenate([vals, np.ones(len(bidx))])
    key = rows * cg.n_dofs + cols
    uniq, inv = np.unique(key, return_inverse=True)
    acc = np.zeros(len(uniq))
    np.add.at(acc, inv, vals)
    return CGSparseMatrix(n=cg.n_dofs,
                          rows=(uniq // cg.n_dofs).astype(np.int32),
                          cols=(uniq % cg.n_dofs).astype(np.int32),
                          vals=jnp.asarray(acc, dtype))


def assemble_cg_laplace(cg: CGQkBasis, diffusion=None,
                        dirichlet: bool = False,
                        dtype=jnp.float64) -> CGSparseMatrix:
    """Continuous Q_k stiffness matrix (the conforming counterpart of
    assemble_laplace — no face terms; continuity lives in the dof map)."""
    return _scatter_blocks(cg, cg_local_stiffness(cg, diffusion,
                                                  jnp.float64),
                           dirichlet, dtype)


def assemble_cg_mass(cg: CGQkBasis, weight=None, dirichlet: bool = False,
                     dtype=jnp.float64) -> CGSparseMatrix:
    return _scatter_blocks(cg, cg_local_mass(cg, weight, jnp.float64),
                           dirichlet, dtype)


# ------------------------------------------------------------ matrix-free
def cg_laplace_operator(cg: CGQkBasis, diffusion=None,
                        dirichlet: bool = False, dtype=jnp.float64):
    """Matrix-free CG stiffness apply: gather -> sum-factorized bulk
    Laplacian (matrixfree.sumfact.laplace_bulk_operator, the
    SumFactLaplaceOperator rebuild) -> scatter, with Dirichlet dofs held
    at identity.  Everything inside is batched MXU work."""
    from hpdg_tpu.matrixfree.sumfact import laplace_bulk_operator
    p = cg.degree
    bulk = laplace_bulk_operator(cg.dg, diffusion=diffusion, dtype=dtype)
    free = jnp.asarray(~cg.boundary if dirichlet else
                       np.ones(cg.n_dofs, bool))

    def apply(x):
        xi = jnp.where(free, x, 0.0) if dirichlet else x
        y = cg.scatter(bulk({p: cg.gather(xi, dtype=dtype)})[p])
        if dirichlet:
            y = jnp.where(free, y, x)
        return y

    return apply


def cg_l2_functional(cg: CGQkBasis, f, dirichlet: bool = False,
                     dtype=jnp.float64):
    """Load vector (f, v) on the CG space; Dirichlet rows zeroed."""
    from hpdg_tpu.assemble.rhs import l2_functional
    b = cg.scatter(l2_functional(cg.dg, f, dtype=dtype)[cg.degree])
    if dirichlet:
        b = jnp.where(jnp.asarray(cg.boundary), 0.0, b)
    return b
