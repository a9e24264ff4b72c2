"""DG->CG transfer and the conforming coarse multigrid path."""

import numpy as np
import jax.numpy as jnp

from hpdg_tpu import mesh as hmesh
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.assemble import assemble_laplace, l2_functional
from hpdg_tpu.linalg import blockmatrix as bm, blockvector as bv
from hpdg_tpu.transfer.dgtocg import dg_to_cg_transfer, cg_coarse_solver
from hpdg_tpu.solvers.multigrid import multigrid_solver
from hpdg_tpu.solvers.cg import loop_solve


def test_transfer_structure():
    m = hmesh.structured((3, 2))
    basis = DGBasis(m, np.full(6, 1))
    T = dg_to_cg_transfer(basis)
    assert T.n_vertices == 4 * 3  # (3+1)x(2+1)
    # prolong of a linear vertex function is the exact DG interpolant
    f = lambda x: 2 * x[..., 0] - x[..., 1] + 1
    xv = f(T.vertices)
    xdg = T.prolong(jnp.asarray(xv))
    from hpdg_tpu.blocks import api
    xref = api.interpolate(basis, lambda p: 2 * p[..., 0] - p[..., 1] + 1)
    assert np.allclose(np.asarray(xdg[1]), np.asarray(xref[1]), atol=1e-13)
    # restrict is the transpose
    r = bv.random(basis, seed=3)
    lhs = float(jnp.vdot(T.restrict(r), jnp.asarray(xv)))
    rhs = float(bv.dot(r, xdg))
    assert np.isclose(lhs, rhs, rtol=1e-13)


def test_galerkin_dense_matches_triple_product():
    m = hmesh.structured((2, 2))
    basis = DGBasis(m, np.full(4, 1))
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True)
    T = dg_to_cg_transfer(basis)
    Acg = T.galerkin_dense(A)
    # dense check: build R (ndof_dg x nv) and compare
    R = np.zeros((basis.ndof, T.n_vertices))
    for e in range(4):
        for i in range(4):
            R[basis.offsets[e] + i, T.vmap[e, i]] = 1.0
    Ad = bm.to_dense(A, basis)
    assert np.allclose(Acg, R.T @ Ad @ R, atol=1e-11)


def test_mg_with_dgcg_coarse():
    m = hmesh.structured((4, 4))
    basis = DGBasis(m, np.full(16, 4))
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True)
    f = lambda x: 2 * jnp.pi**2 * jnp.sin(jnp.pi * x[..., 0]) \
        * jnp.sin(jnp.pi * x[..., 1])
    b = l2_functional(basis, f)
    step, _ = multigrid_solver(basis, A, coarse="dgcg")
    x, info = loop_solve(step, bv.zeros(basis), b,
                         matvec_fn=lambda v: bm.matvec(A, v),
                         tol=1e-8, maxiter=30)
    r = float(bv.norm(bv.sub(b, bm.matvec(A, x))))
    assert r < 1e-6
    assert info["iterations"] <= 15
