"""Matrix-free block-Jacobi drivers and diagonal-block factories.

Parity targets (SURVEY.md §2.5):
* heat diagonal blocks (mass + stiffness) — heatdiagonalblock.hh,
  weightedheatdiagonalblock.hh;
* matrix-free block (projected) Jacobi — ipdgblockjacobi.hh:62-161,
  ipdgblockprojectedjacobi.hh, and the obstacle drivers
  estimators/matrixfreehierarchical.hh:15-172;
* identity operator (identityoperator.hh), generic local-assembler
  wrapper (localassembleroperator.hh), DG restriction (dgrestrict.hh —
  covered by transfer.p_transfer restrict, re-exported here).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from hpdg_tpu.basis import tensor
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.assemble.plan import AssemblyPlan
from hpdg_tpu.matrixfree.diagonal import sipg_diagonal_blocks
from hpdg_tpu.linalg import blockvector as bv


def mass_diagonal_blocks(basis: DGBasis, dtype=jnp.float64) -> dict:
    """p -> [n_p, bs, bs] element mass blocks (block-diagonal exactly).
    Geometry-aware: affine maps scale by |det A|, trilinear (Q1) maps
    integrate the per-point |det J|."""
    from hpdg_tpu.mesh import geometry as geo
    mesh = basis.mesh
    out = {}
    for p in basis.bucket_degrees:
        vt = tensor.volume_tables(p, basis.dim, p + 2, family=basis.family)
        elems = basis.bucket_elems[p]
        ext = mesh.extent[elems]
        detJ = np.prod(ext, axis=1)
        if geo.is_trilinear(mesh):
            xpq = (mesh.lower[elems][:, None, :]
                   + vt["points"][None, :, :] * ext[:, None, :])
            detq = detJ[:, None] * geo.detj_phys(mesh, elems, xpq)
            Me = np.einsum("eq,q,iq,jq->eij", detq, vt["weights"],
                           vt["V"], vt["V"])
            out[p] = jnp.asarray(Me, dtype)
            continue
        detJ = detJ * geo.detj_phys(mesh, elems)
        M0 = np.einsum("iq,q,jq->ij", vt["V"], vt["weights"], vt["V"])
        out[p] = jnp.asarray(detJ[:, None, None] * M0[None], dtype)
    return out


def heat_diagonal_blocks(basis: DGBasis, penalty: float = 2.0,
                         mass_coef: float = 1.0, dirichlet: bool = False,
                         dtype=jnp.float64, plan: AssemblyPlan | None = None
                         ) -> dict:
    """Diagonal blocks of (mass_coef * M + A_sipg): the heat-operator
    block factory used as MatrixCreator for Jacobi smoothers
    (heatdiagonalblock.hh analog)."""
    A = sipg_diagonal_blocks(basis, penalty=penalty, dirichlet=dirichlet,
                             dtype=dtype, plan=plan)
    M = mass_diagonal_blocks(basis, dtype=dtype)
    return {p: mass_coef * M[p] + A[p] for p in A}


def identity_operator():
    """Copies input to output (identityoperator.hh)."""
    return lambda x: x


def blockdiag_operator(blocks: dict):
    """Matrix-free apply of a block-diagonal operator given its blocks
    (the LocalAssemblerOperator pattern, localassembleroperator.hh)."""
    def apply(x):
        return {p: jnp.einsum("nij,nj->ni", blocks[p], x[p],
                              preferred_element_type=x[p].dtype) for p in x}
    return apply


def local_projected_gs(Dm, r, x0, lo_b, up_b, sweeps: int = 2):
    """Batched projected scalar GS inside diagonal blocks: solve
    argmin over the box of the local quadratics (the nested obstacle
    solver of dune-tnnmg / dynamicblockgs.hh:17-40)."""
    bs = Dm.shape[1]
    y = x0
    for _ in range(sweeps):
        for i in range(bs):
            s = jnp.einsum("nj,nj->n", Dm[:, i, :], y) - Dm[:, i, i] * y[:, i]
            yi = (r[:, i] - s) / Dm[:, i, i]
            y = y.at[:, i].set(jnp.clip(yi, lo_b[:, i], up_b[:, i]))
    return y


def matrix_free_block_projected_jacobi(op, diag_blocks: dict, lo: dict,
                                       up: dict, sweeps: int = 2,
                                       omega: float = 1.0):
    """Matrix-free projected block Jacobi for obstacle problems
    (matrixfreehierarchical.hh:15-101): residual via the matrix-free
    operator, local box-constrained solves on the given diagonal blocks.
    Returns an iteration step (x, b) -> x that keeps x feasible."""

    def step(x, b):
        r = bv.sub(b, op(x))
        newx = {}
        for p in x:
            Dm = diag_blocks[p]
            r_loc = r[p] + jnp.einsum("nij,nj->ni", Dm, x[p])
            y = local_projected_gs(Dm, r_loc, x[p], lo[p], up[p],
                                   sweeps=sweeps)
            newx[p] = x[p] + omega * (y - x[p])
            newx[p] = jnp.clip(newx[p], lo[p], up[p])
        return newx

    return step


def matrix_free_block_nonlinear_jacobi(op, diag_blocks: dict, local_solver,
                                       omega: float = 1.0):
    """Generic nonlinear block Jacobi (matrixfreehierarchical.hh:110-172,
    blocknonlinearjacobi.hh): ``local_solver(D, r, x)`` solves each
    diagonal-block subproblem (batched)."""

    def step(x, b):
        r = bv.sub(b, op(x))
        newx = {}
        for p in x:
            Dm = diag_blocks[p]
            r_loc = r[p] + jnp.einsum("nij,nj->ni", Dm, x[p])
            y = local_solver(Dm, r_loc, x[p])
            newx[p] = x[p] + omega * (y - x[p])
        return newx

    return step


def weighted_mass_diagonal_blocks(basis: DGBasis, weight,
                                  dtype=jnp.float64) -> dict:
    """p -> [n_p, bs, bs] element blocks of (w(x) u, v) — the weighted
    mass part of the weighted heat block factory."""
    out = {}
    mesh = basis.mesh
    for p in basis.bucket_degrees:
        vt = tensor.volume_tables(p, basis.dim, p + 2, family=basis.family)
        elems = basis.bucket_elems[p]
        ext = mesh.extent[elems]
        detJ = np.prod(ext, axis=1)
        xp = (mesh.lower[elems][:, None, :]
              + vt["points"][None, :, :] * ext[:, None, :])
        from hpdg_tpu.mesh import geometry as geo
        if geo.is_trilinear(mesh):
            detq = detJ[:, None] * geo.detj_phys(mesh, elems, xp)
        else:
            detq = (detJ * geo.detj_phys(mesh, elems))[:, None]
        x = geo.apply_map(mesh, elems, xp)
        wv = jnp.asarray(weight(jnp.asarray(x, dtype)), dtype)
        wq = wv * jnp.asarray(vt["weights"], dtype)[None, :] \
            * jnp.asarray(detq, dtype)
        out[p] = jnp.einsum("eq,iq,jq->eij", wq,
                            jnp.asarray(vt["V"], dtype),
                            jnp.asarray(vt["V"], dtype))
    return out


def weighted_heat_diagonal_blocks(basis: DGBasis, weight=None, diffusion=None,
                                  penalty: float = 2.0, mass_coef: float = 1.0,
                                  dirichlet: bool = False, dtype=jnp.float64,
                                  penalty_scaling: str = "measure",
                                  plan: AssemblyPlan | None = None) -> dict:
    """Diagonal blocks of (mass_coef * (w u, v) + a_K(u, v)): the weighted
    heat-operator block factory (weightedheatdiagonalblock.hh analog) —
    both the mass weight w(x) and the diffusion coefficient K(x) are
    optional vectorized callables on physical points."""
    A = sipg_diagonal_blocks(basis, penalty=penalty, dirichlet=dirichlet,
                             dtype=dtype, plan=plan, diffusion=diffusion,
                             penalty_scaling=penalty_scaling)
    if weight is None:
        M = mass_diagonal_blocks(basis, dtype=dtype)
    else:
        M = weighted_mass_diagonal_blocks(basis, weight, dtype=dtype)
    return {p: mass_coef * M[p] + A[p] for p in A}
