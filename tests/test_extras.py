"""Neumann rhs, penalty-only matrix, penalty-damped (dual) MG, point
evaluation grid functions."""

import numpy as np
import jax.numpy as jnp

from hpdg_tpu import mesh as hmesh
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.assemble import assemble_laplace, build_plan, l2_functional
from hpdg_tpu.assemble.rhs import neumann_rhs
from hpdg_tpu.assemble.sipg import assemble_penalty_only
from hpdg_tpu.linalg import blockmatrix as bm, blockvector as bv
from hpdg_tpu.blocks import api
from hpdg_tpu.blocks.gridfunction import locate, evaluate
from hpdg_tpu.solvers.multigrid import multigrid_solver
from hpdg_tpu.solvers.cg import loop_solve


def test_neumann_rhs_quadrature():
    # ∫_bdry g v summed over all i = ∫_bdry g (partition of unity)
    m = hmesh.structured((3, 2), upper=(1.5, 1.0))
    basis = DGBasis(m, np.array([1, 2, 3, 2, 1, 2]))
    g = lambda x: x[..., 0] + 2 * x[..., 1]
    b = neumann_rhs(basis, g)
    total = float(sum(jnp.sum(v) for v in b.values()))
    # boundary of [0,1.5]x[0,1]: ∫ g over 4 edges
    exact = 0.0
    # bottom y=0: ∫0^1.5 x dx = 1.125 ; top y=1: ∫ x+2 = 1.125+3
    exact += 1.125 + (1.125 + 3.0)
    # left x=0: ∫0^1 2y dy = 1 ; right x=1.5: ∫ 1.5+2y = 1.5+1
    exact += 1.0 + 2.5
    assert np.isclose(total, exact, atol=1e-12)


def test_penalty_only_matrix():
    m = hmesh.structured((3, 3))
    basis = DGBasis(m, np.array([1, 2, 3, 2, 2, 1, 3, 1, 2]))
    plan = build_plan(basis)
    Apen = assemble_penalty_only(basis, penalty=2.0, dirichlet=True,
                                 plan=plan)
    # penalty part == full SIPG minus (SIPG with tiny penalty scaled back)
    A1 = assemble_laplace(basis, penalty=2.0, dirichlet=True, plan=plan)
    A0 = assemble_laplace(basis, penalty=0.0, dirichlet=True, plan=plan)
    D1 = bm.to_dense(A1, basis) - bm.to_dense(A0, basis)
    assert np.allclose(bm.to_dense(Apen, basis), D1, atol=1e-11)
    # penalty matrix is PSD
    w = np.linalg.eigvalsh(bm.to_dense(Apen, basis))
    assert w.min() > -1e-11


def test_penalty_damped_dual_mg():
    """The dual (penalty-damped) hierarchy counteracts the inherited
    over-penalization: h-level iteration growth shrinks vs plain
    Galerkin (dualdgmultigridstep.hh's idea)."""
    meshes = [hmesh.structured((2, 2))]
    for _ in range(2):
        meshes.append(hmesh.refine(meshes[-1]))
    basis = DGBasis(meshes[-1], np.full(meshes[-1].n_elements, 2))
    plan = build_plan(basis)
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True, plan=plan)
    Apen = assemble_penalty_only(basis, penalty=2.0, dirichlet=True,
                                 plan=plan)
    f = lambda x: 2 * jnp.pi**2 * jnp.sin(jnp.pi * x[..., 0]) \
        * jnp.sin(jnp.pi * x[..., 1])
    b = l2_functional(basis, f)
    counts = {}
    for name, kw in [("galerkin", {}),
                     ("damped", dict(penalty_matrix=Apen,
                                     penalty_damping=0.5))]:
        step, _ = multigrid_solver(basis, A, meshes=meshes, **kw)
        x, info = loop_solve(step, bv.zeros(basis), b,
                             matvec_fn=lambda v: bm.matvec(A, v),
                             tol=1e-9, maxiter=60)
        r = float(bv.norm(bv.sub(b, bm.matvec(A, x))))
        assert r < 1e-6, (name, r)
        counts[name] = info["iterations"]
    assert counts["damped"] <= counts["galerkin"], counts


def test_locate_and_evaluate():
    m = hmesh.structured((4, 3))
    basis = DGBasis(m, np.array([2] * 6 + [3] * 6))
    f = lambda x: x[..., 0] ** 2 + 0.5 * x[..., 1]
    x = api.interpolate(basis, f)
    pts = np.array([[0.1, 0.2], [0.9, 0.99], [0.5, 0.5], [0.26, 0.67]])
    els = locate(m, pts)
    assert (els >= 0).all()
    vals = evaluate(basis, x, pts)
    assert np.allclose(vals, pts[:, 0] ** 2 + 0.5 * pts[:, 1], atol=1e-12)
    vals2, grads = evaluate(basis, x, pts, gradient=True)
    assert np.allclose(grads[:, 0], 2 * pts[:, 0], atol=1e-10)
    assert np.allclose(grads[:, 1], 0.5, atol=1e-10)


def test_weighted_face_mass():
    """weightedfacemassassembler analog: for a CONTINUOUS weight field the
    form vanishes ([w]=0); for a discontinuous one it is symmetric and
    matches a direct per-face computation on a 2-element mesh."""
    from hpdg_tpu.assemble.sipg import assemble_weighted_face_mass
    m = hmesh.structured((2, 1))
    basis = DGBasis(m, np.array([1, 1]))
    # continuous weight -> zero matrix
    wc = api.interpolate(basis, lambda x: x[..., 0] + x[..., 1])
    Z = assemble_weighted_face_mass(basis, wc, penalty=3.0)
    assert float(max(jnp.abs(v).max() for v in Z.values.values())) < 1e-13
    # discontinuous: w = elem index (0 on left, 1 on right), grad w = 0
    w = {1: jnp.asarray(np.array([[0.0] * 4, [1.0] * 4]))}
    M = assemble_weighted_face_mass(basis, w, penalty=3.0)
    Md = bm.to_dense(M, basis)
    assert np.allclose(Md, Md.T, atol=1e-13)
    # jump = -1 (in - out), avg dn = 0, factor = 3/|f| * 1 = 3
    # entries: 0.5 * 3 * |f| * ∫ phi_i phi_j over the face combinations
    from hpdg_tpu.basis import lagrange
    from hpdg_tpu import quadrature
    nodes = lagrange.nodes_1d(1)
    qn, qw = quadrature.gauss_lobatto_for_order(2)
    # 1D face: values of the 2D P1 traces on x=1 of elem 0
    # sanity: total sum of M equals 3 * 0.5 * (sum_i phi_i)^2-ish ... just
    # check the (0,0) diag block against a hand integral:
    # trace on the face of phi (Lobatto P1, face x=1): phi_(1,j)(y)
    V = lagrange.lagrange_values(nodes, qn)
    ref = 0.5 * 3.0 * np.einsum("q,iq,jq->ij", qw, V, V)
    # dofs on the face of element 0 are local indices (1,0),(1,1) = 2,3
    assert np.allclose(Md[2:4, 2:4], ref, atol=1e-13)


def test_evaluate_on_hanging_node_mesh():
    from hpdg_tpu.mesh.adaptive import refine_local
    m = hmesh.structured((2, 2))
    f = refine_local(m, np.array([True, False, False, False]))
    basis = DGBasis(f, np.full(f.n_elements, 2))
    fn = lambda x: x[..., 0] ** 2 - x[..., 1]
    x = api.interpolate(basis, fn)
    pts = np.array([[0.1, 0.1], [0.4, 0.2], [0.7, 0.3], [0.2, 0.9]])
    vals = evaluate(basis, x, pts)
    assert np.allclose(vals, pts[:, 0] ** 2 - pts[:, 1], atol=1e-12)


def test_inhomogeneous_dirichlet_normal_scaling():
    """dirichlet_rhs must match the matrix's penalty convention: with
    penalty_scaling='normal' on an anisotropic mesh the harmonic linear
    solution is still reproduced exactly."""
    import jax.numpy as jnp2
    from hpdg_tpu.assemble.rhs import dirichlet_rhs as drhs
    from hpdg_tpu.solvers import pcg, smoothers
    from hpdg_tpu.estimators import l2_error
    m = hmesh.structured((8, 4))
    basis = DGBasis(m, np.full(32, 2))
    g = lambda x: x[..., 0] - 2 * x[..., 1]
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True,
                         penalty_scaling="normal")
    b = drhs(basis, g, penalty=2.0, penalty_scaling="normal")
    M = smoothers.block_jacobi_preconditioner(A)
    x, _ = pcg(lambda v: bm.matvec(A, v), b, precond=M, tol=1e-12,
               maxiter=3000)
    assert float(l2_error(basis, x, g)) < 1e-8
