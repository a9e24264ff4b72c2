"""High-level building blocks: assemble, solve, estimate.

Mirrors the reference's BuildingBlocks namespace exactly
(buildingblocks/matrices.hh, rhs.hh, solve.hh, estimating.hh) — the API
a user of dune-hpdg programs against.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.assemble import sipg as _sipg
from hpdg_tpu.assemble import mass as _mass
from hpdg_tpu.assemble import rhs as _rhs
from hpdg_tpu.linalg import blockmatrix as bm, blockvector as bv
from hpdg_tpu.solvers.cg import loop_solve, pcg
from hpdg_tpu.solvers.multigrid import multigrid_solver
from hpdg_tpu.solvers.tnnmg import solve_tnnmg
from hpdg_tpu.matrixfree.norms import ipdg_local_norm


def laplace(basis: DGBasis, penalty: float = 2.0, dirichlet: bool = False,
            diffusion=None, plan=None, dtype=jnp.float64):
    """SIPG stiffness matrix (BuildingBlocks::laplace,
    buildingblocks/matrices.hh:29-167)."""
    return _sipg.assemble_laplace(basis, penalty=penalty, dirichlet=dirichlet,
                                  diffusion=diffusion, plan=plan, dtype=dtype)


def mass(basis: DGBasis, weight=None, quad_order=None, plan=None,
         dtype=jnp.float64):
    """(Weighted) mass matrix (buildingblocks/matrices.hh:180-266)."""
    return _mass.assemble_mass(basis, weight=weight, quad_order=quad_order,
                               plan=plan, dtype=dtype)


def l2_functional(basis: DGBasis, f, quad_order=None, dtype=jnp.float64):
    """Load vector ∫ f v (buildingblocks/rhs.hh:26-55)."""
    return _rhs.l2_functional(basis, f, quad_order=quad_order, dtype=dtype)


def dirichlet_data(basis: DGBasis, g, penalty: float = 2.0, plan=None,
                   dtype=jnp.float64):
    """SIPG-consistent Dirichlet rhs terms (buildingblocks/rhs.hh:76-104)."""
    return _rhs.dirichlet_rhs(basis, g, penalty=penalty, plan=plan,
                              dtype=dtype)


def solve_linear(basis: DGBasis, A, b, x0=None, tol: float = 1e-8,
                 maxiter: int = 100, meshes=None, method: str = "multigrid",
                 operator_factory=None, **mg_kwargs):
    """hp-multigrid linear solve (BuildingBlocks::solveLinear,
    buildingblocks/solve.hh:142-169): builds the multigrid hierarchy and
    runs the outer loop with the energy-norm correction criterion.

    method="cg+mg" uses the V-cycle as a PCG preconditioner instead
    (more robust, usually fewer operator applies).

    method="onchip" runs f32 V-cycle chains inside the on-chip
    exact-split-anchored refinement loop (solvers.refine): the f64
    matrix ``A`` provides the block-sparse Ozaki anchor and the final
    host verification; the V-cycle smooths an f32 copy.  The fastest
    verified-to-f64-tolerance path on the TPU."""
    x0 = bv.zeros_like(b) if x0 is None else x0
    if method == "onchip":
        from hpdg_tpu.solvers.refine import onchip_refinement_solve
        from hpdg_tpu.matrixfree.exact import blocksparse_exact_residual
        A32 = bm.BlockSparseMatrix(
            A.pattern, A.dim,
            {k: jnp.asarray(v, jnp.float32) for k, v in A.values.items()},
            A.block_shape)
        step32, _ = multigrid_solver(basis, A32, meshes=meshes,
                                     operator_factory=operator_factory,
                                     dtype=jnp.float32, **mg_kwargs)
        res = blocksparse_exact_residual(A, b)
        host_res = lambda x64: bv.sub(  # noqa: E731
            b, bm.matvec(A, {k: jnp.asarray(v) for k, v in x64.items()}))
        chain_k = 8
        return onchip_refinement_solve(
            step32, res, b, chain_k=chain_k, tol=tol,
            max_steps=max(1, -(-maxiter // chain_k)),
            host_residual=host_res, fused=True)
    if method == "mf":
        # fully matrix-free hp-multigrid (Chebyshev on block-Jacobi)
        from hpdg_tpu.solvers.multigrid import matrixfree_multigrid_solver
        step, _ = matrixfree_multigrid_solver(basis, meshes=meshes,
                                              **mg_kwargs)
        return loop_solve(step, x0, b,
                          matvec_fn=lambda v: bm.matvec(A, v),
                          tol=tol, maxiter=maxiter)
    step, data = multigrid_solver(basis, A, meshes=meshes,
                                  operator_factory=operator_factory,
                                  **mg_kwargs)
    matvec = lambda v: bm.matvec(A, v)  # noqa: E731
    if method == "multigrid":
        return loop_solve(step, x0, b, matvec_fn=matvec, tol=tol,
                          maxiter=maxiter)
    elif method == "cg+mg":
        precond = lambda r: step(bv.zeros_like(r), r)  # noqa: E731
        return pcg(matvec, b, x0=x0, precond=precond, tol=tol,
                   maxiter=maxiter)
    raise ValueError(method)


def solve_obstacle(basis: DGBasis, A, b, lo, up, x0=None, tol: float = 1e-9,
                   maxiter: int = 100, meshes=None, **kwargs):
    """Obstacle problem via TNNMG (BuildingBlocks::solveObstacle,
    buildingblocks/solve.hh:40-124).  lo/up: bucketed bound vectors."""
    step, _ = multigrid_solver(basis, A, meshes=meshes,
                               dtype=next(iter(b.values())).dtype)
    return solve_tnnmg(A, b, basis, lo, up, mg_step=step, x0=x0, tol=tol,
                       maxiter=maxiter, **kwargs)


def local_norm(basis: DGBasis, x, penalty: float = 2.0,
               dirichlet: bool = False, plan=None):
    """Per-element squared DG-norm indicator eta_e^2
    (BuildingBlocks::ipdgLocalNorm, buildingblocks/estimating.hh:12-50)."""
    return ipdg_local_norm(basis, penalty=penalty, dirichlet=dirichlet,
                           plan=plan)(x)


def global_error(basis: DGBasis, x, penalty: float = 2.0,
                 dirichlet: bool = False):
    """Global DG-norm of x (buildingblocks/estimating.hh:53-58)."""
    return float(jnp.sqrt(jnp.sum(local_norm(basis, x, penalty=penalty,
                                             dirichlet=dirichlet))))


def constant_bounds(basis: DGBasis, lower=-np.inf, upper=np.inf,
                    dtype=jnp.float64):
    """Bucketed box-constraint vectors (allFalseBitVector-style helper)."""
    lo = {p: jnp.full((basis.bucket_size(p), basis.n_local(p)), lower,
                      dtype=dtype) for p in basis.bucket_degrees}
    up = {p: jnp.full((basis.bucket_size(p), basis.n_local(p)), upper,
                      dtype=dtype) for p in basis.bucket_degrees}
    return lo, up


def interpolate(basis: DGBasis, f, dtype=jnp.float64) -> dict:
    """Nodal interpolation of a function into the basis."""
    out = {}
    for p in basis.bucket_degrees:
        pos = basis.node_positions(p)
        out[p] = jnp.asarray(f(jnp.asarray(pos, dtype)), dtype)
    return out
