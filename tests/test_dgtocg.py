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


def test_nonconforming_dg_to_cg():
    """Hanging-node DG->CG (dgtocgnonconformingtransferassembler.hh
    analog): the constrained CG-Q1 space reproduces globally continuous
    bilinear functions exactly, restrict is the transpose, and the
    Galerkin CG coarse matrix is SPD."""
    from hpdg_tpu.mesh.adaptive import refine_local
    from hpdg_tpu.transfer.dgtocg import (dg_to_cg_transfer,
                                          DGtoCGTransferNC)
    from hpdg_tpu.assemble import assemble_laplace

    m0 = hmesh.structured((3, 3))
    m = refine_local(m0, np.arange(9) % 2 == 0)  # hanging nodes
    assert m.faces.nc_code.max() > 0
    basis = DGBasis(m, np.ones(m.n_elements, dtype=np.int32))
    T = dg_to_cg_transfer(basis)  # auto-routes to the NC variant
    assert isinstance(T, DGtoCGTransferNC)

    # exact reproduction of a continuous bilinear function: set the CG
    # dofs to g(vertex) and check the DG interpolant equals g at corners
    g = lambda x, y: 0.3 + 2 * x - y + 0.5 * x * y
    # recover true-dof coordinates by prolonging indicator vectors is
    # expensive; instead evaluate g on DG corners directly and check
    # restrict/prolong consistency through the constraint structure:
    # (a) transpose identity <R^T u, v> == <u, R v>
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((m.n_elements, 4)))
    v = jnp.asarray(rng.standard_normal(T.n_dofs))
    lhs = float(jnp.vdot(T.restrict({1: u}), v))
    rhs = float(jnp.vdot(u, T.prolong(v)[1]))
    assert abs(lhs - rhs) < 1e-12

    # (b) bilinear reproduction: find each true dof's coordinate via the
    # weight table (a true dof appears with weight 1 at some corner)
    coords = np.zeros((T.n_dofs, 2))
    mi = np.array([[0, 0], [0, 1], [1, 0], [1, 1]])
    corners = (m.lower[:, None, :] + mi[None] * m.extent[:, None, :])
    seen = np.zeros(T.n_dofs, dtype=bool)
    for e in range(m.n_elements):
        for c in range(4):
            if T.wval[e, c, 0] == 1.0 and T.wdof[e, c, 1] == 0 \
                    and T.wval[e, c, 1] == 0.0:
                coords[T.wdof[e, c, 0]] = corners[e, c]
                seen[T.wdof[e, c, 0]] = True
    assert seen.all()
    xcg = jnp.asarray(g(coords[:, 0], coords[:, 1]))
    xdg = T.prolong(xcg)[1]
    want = g(corners[..., 0], corners[..., 1])
    assert np.abs(np.asarray(xdg) - want).max() < 1e-12

    # (c) Galerkin CG matrix is SPD (usable as a coarse solver)
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True,
                         penalty_scaling="normal")
    Acg = T.galerkin_dense(A)
    assert np.abs(Acg - Acg.T).max() < 1e-11
    w = np.linalg.eigvalsh(0.5 * (Acg + Acg.T))
    assert w.min() > 0

    # (d) the cg coarse solver path runs end-to-end on the NC mesh
    from hpdg_tpu.transfer.dgtocg import cg_coarse_solver
    solve = cg_coarse_solver(basis, A)
    b = {1: jnp.ones((m.n_elements, 4))}
    y = solve(b)
    assert np.all(np.isfinite(np.asarray(y[1])))
