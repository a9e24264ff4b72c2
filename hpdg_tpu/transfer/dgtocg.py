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


def dg_to_cg_transfer(basis: DGBasis):
    """Conforming meshes get the plain vertex gather; hanging-node meshes
    route to the constrained (nonconforming) variant automatically."""
    if basis.bucket_degrees != (1,):
        raise ValueError("DG->CG transfer needs a uniform degree-1 basis")
    mesh = basis.mesh
    if mesh.faces.nc_code is not None and mesh.faces.nc_code.max(initial=0):
        return dg_to_cg_transfer_nc(basis)
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


@dataclass(frozen=True)
class DGtoCGTransferNC:
    """DG-P1 <-> constrained CG-P1 on a hanging-node mesh
    (dgtocgnonconformingtransferassembler.hh:1-146 analog).

    CG dofs are the NON-hanging vertices; a hanging vertex's value is the
    Q1 interpolation of the coarse face that contains it (constraint
    chains resolved to true dofs).  Per element corner, a padded weight
    list over CG dofs encodes the transfer."""

    basis: DGBasis
    n_dofs: int
    wdof: np.ndarray     # (n, 2^dim, K) int32 CG dof ids
    wval: np.ndarray     # (n, 2^dim, K) weights (0 on padding)

    @property
    def n_vertices(self) -> int:  # API parity with the conforming variant
        return self.n_dofs

    def prolong(self, x_cg, dtype=jnp.float64) -> dict:
        vals = jnp.einsum("eck,eck->ec", x_cg[jnp.asarray(self.wdof)],
                          jnp.asarray(self.wval, dtype))
        return {1: vals.astype(dtype)}

    def restrict(self, r_dg: dict):
        r = r_dg[1]  # (n, 2^dim)
        contrib = (r[:, :, None] * jnp.asarray(self.wval, r.dtype)).reshape(-1)
        idx = jnp.asarray(self.wdof.reshape(-1))
        return jax.ops.segment_sum(contrib, idx, num_segments=self.n_dofs)

    def galerkin_dense(self, A: BlockSparseMatrix) -> np.ndarray:
        nd = self.n_dofs
        Acg = np.zeros((nd, nd))
        K = self.wdof.shape[2]
        for (pr, pc), (rows, cols) in A.pattern.entries.items():
            vals = np.asarray(A.values[(pr, pc)])
            relems = self.basis.bucket_elems[pr][rows]
            celems = self.basis.bucket_elems[pc][cols]
            bs = vals.shape[1]
            for i in range(bs):
                for j in range(bs):
                    for ki in range(K):
                        for kj in range(K):
                            w = (self.wval[relems, i, ki]
                                 * self.wval[celems, j, kj])
                            np.add.at(Acg,
                                      (self.wdof[relems, i, ki],
                                       self.wdof[celems, j, kj]),
                                      w * vals[:, i, j])
        return Acg


def dg_to_cg_transfer_nc(basis: DGBasis) -> DGtoCGTransferNC:
    """Build the constrained CG-P1 transfer on a 2:1 hanging-node mesh."""
    if basis.bucket_degrees != (1,):
        raise ValueError("DG->CG transfer needs a uniform degree-1 basis")
    mesh = basis.mesh
    dim = mesh.dim
    n = mesh.n_elements
    nc = 2**dim
    mi = tensor.multiindices(1, dim)
    corners = (mesh.lower[:, None, :]
               + mi[None, :, :] * mesh.extent[:, None, :])  # (n, 2^d, dim)
    tol = float(mesh.extent.min() * 1e-6)
    keys = np.rint(corners / tol).astype(np.int64).reshape(-1, dim)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    vmap = inv.reshape(n, nc)
    verts = uniq.astype(np.float64) * tol
    nv = len(verts)

    # hanging vertices: contained in some element's closed box but not
    # one of its corners -> constrained by that element's Q1 interpolation
    constraints = {}  # vertex id -> list[(vertex id, weight)]
    lo = mesh.lower
    hi = mesh.lower + mesh.extent
    corner_sets = [set(map(int, vmap[e])) for e in range(n)]
    for v in range(nv):
        inside = np.where(np.all(verts[v] >= lo - tol, axis=1)
                          & np.all(verts[v] <= hi + tol, axis=1))[0]
        for e in inside:
            if v in corner_sets[e]:
                continue
            # Q1 shape functions of e at v over its corners (C order)
            t = (verts[v] - lo[e]) / mesh.extent[e]
            w = np.ones(nc)
            for a in range(dim):
                w = w * np.where(mi[:, a] == 1, t[a], 1.0 - t[a])
            constraints[v] = [(int(vmap[e, c]), float(w[c]))
                              for c in range(nc) if abs(w[c]) > 1e-14]
            break

    # resolve constraint chains to true (non-hanging) dofs
    def resolve(v, depth=0):
        if v not in constraints:
            return [(v, 1.0)]
        if depth > 10:
            raise RuntimeError("constraint chain too deep (mesh not 2:1?)")
        out = {}
        for u, w in constraints[v]:
            for t, wt in resolve(u, depth + 1):
                out[t] = out.get(t, 0.0) + w * wt
        return list(out.items())

    true_ids = {}
    for v in range(nv):
        if v not in constraints:
            true_ids[v] = len(true_ids)
    resolved = {v: [(true_ids[t], w) for t, w in resolve(v)]
                for v in range(nv)}
    K = max(len(lst) for lst in resolved.values())
    wdof = np.zeros((n, nc, K), dtype=np.int32)
    wval = np.zeros((n, nc, K))
    for e in range(n):
        for c in range(nc):
            for k, (d, w) in enumerate(resolved[int(vmap[e, c])]):
                wdof[e, c, k] = d
                wval[e, c, k] = w
    return DGtoCGTransferNC(basis=basis, n_dofs=len(true_ids),
                            wdof=wdof, wval=wval)


def cg_qk_galerkin_dense(cgb, basis: DGBasis,
                         A: BlockSparseMatrix) -> np.ndarray:
    """``A_cg = R^T A R`` for the continuous Q_k space ``cgb``
    (basis.cgbasis.CGQkBasis) under a uniform degree-k DG matrix whose
    GL nodes coincide with the CG nodes (host dense; coarse problems
    are small by construction).  Weighted gathers cover hanging-node
    constraints (wval widths > 1)."""
    (k,) = basis.bucket_degrees
    assert k == cgb.degree
    nd = cgb.n_dofs
    Acg = np.zeros((nd, nd))
    K = cgb.wdof.shape[2]
    for (pr, pc), (rows, cols) in A.pattern.entries.items():
        vals = np.asarray(A.values[(pr, pc)])
        relems = basis.bucket_elems[pr][rows]
        celems = basis.bucket_elems[pc][cols]
        bs = vals.shape[1]
        for ki in range(K):
            wr = cgb.wval[relems, :, ki]          # (nnz, bs)
            dr = cgb.wdof[relems, :, ki]
            for kj in range(K):
                wc = cgb.wval[celems, :, kj]
                dc = cgb.wdof[celems, :, kj]
                wv = (wr[:, :, None] * wc[:, None, :]) * vals
                nz = wv != 0.0
                np.add.at(Acg, (np.broadcast_to(dr[:, :, None],
                                                (len(wv), bs, bs))[nz],
                                np.broadcast_to(dc[:, None, :],
                                                (len(wv), bs, bs))[nz]),
                          wv[nz])
    return Acg


def cg_qk_coarse_solver(basis: DGBasis, A: BlockSparseMatrix,
                        dtype=jnp.float64):
    """Coarse solve through the continuous Q_k space at the SAME degree
    as the (uniform-degree) DG level: restrict through the node-
    coincidence gather, dense-solve on the CG dofs, prolong.  The k>1
    generalization of :func:`cg_coarse_solver`
    (solversetup_dgcg.hh:394-424 uses exactly this pairing of
    DynamicDGQkGLBasis with QkGLNodalBasis — the nodes coincide, so the
    transfer is index bookkeeping, not interpolation)."""
    from hpdg_tpu.basis.cgbasis import cg_basis
    (k,) = basis.bucket_degrees
    cgb = cg_basis(basis.mesh, k, family=basis.family)
    Acg = cg_qk_galerkin_dense(cgb, basis, A)
    Acg = 0.5 * (Acg + Acg.T)
    try:
        fac = jnp.asarray(np.linalg.cholesky(Acg), dtype)
        solve = lambda f: jax.scipy.linalg.cho_solve((fac, True), f)  # noqa: E731
    except np.linalg.LinAlgError:
        inv = jnp.asarray(np.linalg.inv(Acg), dtype)
        solve = lambda f: inv @ f  # noqa: E731
    elems = basis.bucket_elems[k]
    ident = np.array_equal(elems, np.arange(basis.mesh.n_elements))

    def coarse_solve(b: dict) -> dict:
        r = b[k] if ident else b[k]  # uniform degree: bucket == element
        x_cg = solve(cgb.scatter(r))
        return {k: cgb.gather(x_cg, dtype=dtype)}

    return coarse_solve


def cg_coarse_solver(basis: DGBasis, A: BlockSparseMatrix,
                     dtype=jnp.float64):
    """Coarse solve through the CG-P1 space: restrict, dense-solve on the
    vertices, prolong (P1MultigridCoarseSolver analog,
    solversetup_dgcg.hh:128-190, with a direct solve instead of a
    geometric MG on the CG matrix).  Uniform degree-k levels with k > 1
    route to the CG-Q_k variant (:func:`cg_qk_coarse_solver`)."""
    if basis.bucket_degrees != (1,) and len(basis.bucket_degrees) == 1:
        return cg_qk_coarse_solver(basis, A, dtype=dtype)
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
