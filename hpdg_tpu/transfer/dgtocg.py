"""DG-P1 -> CG-P1 transfer and the conforming coarse space.

Rebuild of assembleDGtoCGTransferOperator (assemblers/
dgtocgtransferassembler.hh:11-89), BlockTransferOperator
(transferoperators/blocktransfer.hh) and the DG->CG coarse path of
MultigridSetup (iterationsteps/solversetup_dgcg.hh:128-424): below the
p=1 DG level, restrict into the continuous Q1 space on the same mesh
(one dof per vertex) and solve there — a much smaller coarse problem
with the same approximation power.

For Gauss-Lobatto nodal DG-P1 the element corner nodes coincide with the
vertices, so the interpolation matrix is a plain vertex gather
(prolong) / scatter-add (restrict), and the Galerkin coarse matrix is a
scalar-sparse vertex matrix assembled by summing DG block entries over
shared vertices.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from hpdg_tpu.basis import tensor, lagrange
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.linalg.blockmatrix import BlockSparseMatrix


@dataclass(frozen=True)
class DGtoCGTransfer:
    basis: DGBasis  # uniform degree-1 DG basis
    vertices: np.ndarray  # (nv, dim)
    vmap: np.ndarray  # (n_elements, 2^dim) vertex id per local corner

    @property
    def n_vertices(self) -> int:
        return len(self.vertices)

    def prolong(self, x_cg, dtype=jnp.float64) -> dict:
        """CG vertex vector (nv,) -> DG-P1 bucketed vector."""
        vals = x_cg[jnp.asarray(self.vmap)]
        return {1: vals.astype(dtype)}

    def restrict(self, r_dg: dict):
        """Transpose: scatter-add DG corner values onto vertices."""
        r = r_dg[1]
        flat = r.reshape(-1)
        idx = jnp.asarray(self.vmap.reshape(-1))
        return jax.ops.segment_sum(flat, idx, num_segments=self.n_vertices)

    def galerkin_dense(self, A: BlockSparseMatrix) -> np.ndarray:
        """A_cg = R^T A R as a dense (nv, nv) matrix (host; the CG coarse
        problem is small by construction)."""
        nv = self.n_vertices
        Acg = np.zeros((nv, nv))
        for (pr, pc), (rows, cols) in A.pattern.entries.items():
            assert pr == 1 and pc == 1
            vals = np.asarray(A.values[(pr, pc)])
            relems = self.basis.bucket_elems[pr][rows]
            celems = self.basis.bucket_elems[pc][cols]
            vr = self.vmap[relems]  # (nnz, 2^d)
            vc = self.vmap[celems]
            bs = vals.shape[1]
            for i in range(bs):
                for j in range(bs):
                    np.add.at(Acg, (vr[:, i], vc[:, j]), vals[:, i, j])
        return Acg


def dg_to_cg_transfer(basis: DGBasis) -> DGtoCGTransfer:
    if basis.bucket_degrees != (1,):
        raise ValueError("DG->CG transfer needs a uniform degree-1 basis")
    mesh = basis.mesh
    dim = mesh.dim
    mi = tensor.multiindices(1, dim)  # corner multiindices, C order
    # corner coordinates per element
    corners = (mesh.lower[:, None, :]
               + mi[None, :, :] * mesh.extent[:, None, :])  # (n, 2^d, dim)
    tol = mesh.extent.min() * 1e-6
    keys = np.rint(corners / tol).astype(np.int64).reshape(-1, dim)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    vmap = inv.reshape(mesh.n_elements, 2**dim).astype(np.int32)
    vertices = uniq * tol
    return DGtoCGTransfer(basis=basis, vertices=vertices, vmap=vmap)


def cg_coarse_solver(basis: DGBasis, A: BlockSparseMatrix,
                     dtype=jnp.float64):
    """Coarse solve through the CG-P1 space: restrict, dense-solve on the
    vertices, prolong (P1MultigridCoarseSolver analog,
    solversetup_dgcg.hh:128-190, with a direct solve instead of a
    geometric MG on the CG matrix)."""
    T = dg_to_cg_transfer(basis)
    Acg = T.galerkin_dense(A)
    Acg = 0.5 * (Acg + Acg.T)
    try:
        fac = jnp.asarray(np.linalg.cholesky(Acg), dtype)
        solve = lambda f: jax.scipy.linalg.cho_solve((fac, True), f)  # noqa: E731
    except np.linalg.LinAlgError:
        inv = jnp.asarray(np.linalg.inv(Acg), dtype)
        solve = lambda f: inv @ f  # noqa: E731

    def coarse_solve(b: dict) -> dict:
        r_cg = T.restrict(b)
        x_cg = solve(r_cg)
        return T.prolong(x_cg, dtype=dtype)

    return coarse_solve
