"""Hanging-node (non-conforming) meshes: face matching, 2:1 balance,
assembly and matrix-free applies vs the geometry-driven oracle.

The reference only supports this in 2D (nonConformingMatrices,
gausslobattoipdgassembler.hh:444-462); here 2D and 3D are tested.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from hpdg_tpu import mesh as hmesh
from hpdg_tpu.mesh.adaptive import refine_local, close_marks
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.assemble import assemble_laplace, build_plan
from hpdg_tpu.linalg import blockmatrix as bm, blockvector as bv
from hpdg_tpu import matrixfree as mf
from hpdg_tpu.testing import oracle
from hpdg_tpu.blocks import api


def frob_close(A, B, tol=1e-11):
    return np.linalg.norm(A - B) / max(1.0, np.linalg.norm(B)) < tol


def test_local_refine_faces_2d():
    m = hmesh.structured((2, 2))
    marks = np.array([True, False, False, False])
    f = refine_local(m, marks)
    assert f.n_elements == 7  # 4 children + 3 kept
    assert np.isclose(f.volumes.sum(), 1.0)
    # non-conforming faces: element 0'sright/top neighbors each see 2 small faces
    nc = f.faces.nc_code > 0
    assert nc.sum() == 4  # 2 per coarse neighbor relation... (2 sides x 2)
    # every nc face pairs a small and a big element
    for k in np.where(nc)[0]:
        ei, eo = f.faces.inside[k], f.faces.outside[k]
        assert not np.allclose(f.extent[ei], f.extent[eo])


def test_close_marks_enforces_2to1():
    m = hmesh.structured((4, 1))
    f1 = refine_local(m, np.array([True, False, False, False]))
    # now refine a grandchild: the coarse neighbor must get marked too
    marks = np.zeros(f1.n_elements, dtype=bool)
    kids = np.where(f1.child_pos >= 0)[0]
    marks[kids[2]] = True  # a child touching the coarse neighbor
    closed = close_marks(f1, marks)
    assert closed.sum() >= marks.sum()
    f2 = refine_local(f1, marks)
    # all faces are at most one level apart (2:1)
    ratio = f2.extent[f2.faces.inside, 0] / f2.extent[f2.faces.outside, 0]
    assert np.all((ratio <= 2.0 + 1e-12) & (ratio >= 0.5 - 1e-12))


@pytest.mark.parametrize("p", [1, 2, 3])
def test_nc_assembly_2d_vs_oracle(p):
    m = hmesh.structured((2, 2))
    f = refine_local(m, np.array([True, False, False, True]))
    basis = DGBasis(f, np.full(f.n_elements, p))
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True)
    Ad = bm.to_dense(A, basis)
    Aref = oracle.sipg_matrix(basis, penalty=2.0, dirichlet=True)
    assert frob_close(Ad, Aref)
    assert np.allclose(Ad, Ad.T, atol=1e-11)


def test_nc_assembly_mixed_degrees():
    m = hmesh.structured((2, 2))
    f = refine_local(m, np.array([True, False, False, False]))
    rng = np.random.default_rng(7)
    basis = DGBasis(f, rng.integers(1, 4, f.n_elements))
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True)
    Ad = bm.to_dense(A, basis)
    Aref = oracle.sipg_matrix(basis, penalty=2.0, dirichlet=True)
    assert frob_close(Ad, Aref)


def test_nc_assembly_3d_vs_oracle():
    m = hmesh.structured((2, 1, 1))
    f = refine_local(m, np.array([True, False]))
    assert f.n_elements == 9
    assert (f.faces.nc_code > 0).sum() == 4  # big face split into 4
    basis = DGBasis(f, np.full(9, 2))
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True)
    Ad = bm.to_dense(A, basis)
    Aref = oracle.sipg_matrix(basis, penalty=2.0, dirichlet=True)
    assert frob_close(Ad, Aref)


def test_nc_matrixfree_matches_assembled():
    m = hmesh.structured((2, 2))
    f = refine_local(m, np.array([False, True, True, False]))
    basis = DGBasis(f, np.array([2, 1, 1, 2, 3, 1, 2, 1, 2, 2])
                    [:f.n_elements])
    plan = build_plan(basis)
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True, plan=plan)
    op = mf.sipg_operator(basis, penalty=2.0, dirichlet=True, plan=plan)
    x = bv.random(basis)
    y = op(x)
    yref = bm.matvec(A, x)
    assert np.allclose(bv.to_flat(basis, y), bv.to_flat(basis, yref),
                       atol=1e-11)
    # diagonal blocks too
    D_mf = mf.sipg_diagonal_blocks(basis, penalty=2.0, dirichlet=True,
                                   plan=plan)
    D_as = bm.extract_diagonal(A)
    for p in basis.bucket_degrees:
        assert np.allclose(np.asarray(D_mf[p]), np.asarray(D_as[p]),
                           atol=1e-11)


def test_h_adaptive_solve_converges():
    """Full h-adaptive cycle on the L-shape with hanging nodes."""
    m = hmesh.lshape(2)
    u = lambda x: jnp.sin(jnp.pi * x[..., 0]) * jnp.sin(jnp.pi * x[..., 1])
    ffun = lambda x: 2 * jnp.pi**2 * u(x)
    basis = DGBasis(m, np.full(m.n_elements, 2))
    A = api.laplace(basis, penalty=2.0, dirichlet=True)
    b = api.l2_functional(basis, ffun)
    x, _ = api.solve_linear(basis, A, b, tol=1e-10, maxiter=60)
    from hpdg_tpu.estimators import l2_error
    err1 = float(l2_error(basis, x, u))
    # mark 40% worst elements by true local error, refine with hanging nodes
    eta = np.asarray(api.local_norm(
        basis, {p: x[p] - api.interpolate(basis, u)[p] for p in x}))
    from hpdg_tpu.estimators.utility import mark_fraction
    marks = mark_fraction(eta, 0.5)
    f = refine_local(m, marks)
    basis2 = DGBasis(f, np.full(f.n_elements, 2))
    A2 = api.laplace(basis2, penalty=2.0, dirichlet=True)
    b2 = api.l2_functional(basis2, ffun)
    x2, _ = api.solve_linear(basis2, A2, b2, tol=1e-10, maxiter=60)
    err2 = float(l2_error(basis2, x2, u))
    assert err2 < err1, (err1, err2)


def test_mg_with_hanging_node_h_level():
    """h-multigrid across a locally refined (hanging-node) mesh: the
    h-transfer handles kept elements (identity) and children alike."""
    from hpdg_tpu.solvers.multigrid import multigrid_solver
    from hpdg_tpu.solvers.cg import loop_solve
    mc = hmesh.structured((2, 2))
    mf_ = refine_local(mc, np.array([True, True, False, False]))
    basis = DGBasis(mf_, np.full(mf_.n_elements, 2))
    A = api.laplace(basis, penalty=2.0, dirichlet=True)
    b = api.l2_functional(basis, lambda x: 1.0 + 0 * x[..., 0])
    step, data = multigrid_solver(basis, A, meshes=[mc, mf_])
    assert data.bases[0].mesh.n_elements == 4
    x, info = loop_solve(step, bv.zeros(basis), b,
                         matvec_fn=lambda v: bm.matvec(A, v),
                         tol=1e-9, maxiter=40)
    r = float(bv.norm(bv.sub(b, bm.matvec(A, x))))
    assert r < 1e-7, info["iterations"]


def test_unrefine_roundtrip():
    from hpdg_tpu.mesh.adaptive import unrefine
    m = hmesh.structured((2, 2))
    f = hmesh.refine(m)
    # merge the children of parents 0 and 3 back
    marks = np.isin(f.parent, [0, 3])
    c = unrefine(f, marks)
    assert c.n_elements == 16 - 8 + 2
    assert np.isclose(c.volumes.sum(), 1.0)
    # partial groups are NOT merged
    marks2 = np.zeros(f.n_elements, dtype=bool)
    marks2[np.where(f.parent == 1)[0][:2]] = True  # only half the siblings
    c2 = unrefine(f, marks2)
    assert c2.n_elements == f.n_elements


def test_w_cycle_and_mf_method():
    from hpdg_tpu.solvers.multigrid import multigrid_solver
    from hpdg_tpu.solvers.cg import loop_solve
    m = hmesh.structured((4, 4))
    basis = DGBasis(m, np.full(16, 4))
    A = api.laplace(basis, penalty=2.0, dirichlet=True)
    b = api.l2_functional(basis, lambda x: 1.0 + 0 * x[..., 0])
    # W-cycle converges at least as fast as V
    stepw, _ = multigrid_solver(basis, A, mu=2)
    xw, iw = loop_solve(stepw, bv.zeros(basis), b,
                        matvec_fn=lambda v: bm.matvec(A, v), tol=1e-9,
                        maxiter=30)
    stepv, _ = multigrid_solver(basis, A, mu=1)
    xv, iv = loop_solve(stepv, bv.zeros(basis), b,
                        matvec_fn=lambda v: bm.matvec(A, v), tol=1e-9,
                        maxiter=30)
    assert iw["iterations"] <= iv["iterations"]
    # fully matrix-free path through the user API
    x, info = api.solve_linear(basis, A, b, method="mf", tol=1e-8,
                               maxiter=80)
    r = float(bv.norm(bv.sub(b, bm.matvec(A, x))))
    assert r < 1e-6
