"""Trilinear (isoparametric Q1) element geometry.

The mesh stores physical corner positions (``Mesh.corners``); every
operator consumes the resulting PER-QUAD-POINT Jacobians through the
effective-tensor path — the full analog of the reference's per-point
jacobianInverseTransposed (gausslobattoipdgassembler.hh:337-350), which
the affine representation only captured per element.  Differential-
tested against the independent per-point oracle (testing/oracle.py
``_geo_at`` — explicit scalar loops, no shared code)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hpdg_tpu import mesh as hmesh
from hpdg_tpu.mesh import geometry as geo
from hpdg_tpu.mesh import adaptive
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.assemble import (assemble_laplace, build_plan, l2_functional,
                               assemble_mass, dirichlet_rhs)
from hpdg_tpu.matrixfree import sipg_operator
from hpdg_tpu.matrixfree.diagonal import sipg_diagonal_blocks
from hpdg_tpu.linalg import blockmatrix as bm
from hpdg_tpu.testing import oracle


def _wavy2(x):
    x = np.asarray(x, np.float64)
    return np.stack([x[..., 0] + 0.08 * np.sin(np.pi * x[..., 0])
                     * np.sin(np.pi * x[..., 1]),
                     x[..., 1] - 0.06 * np.sin(np.pi * x[..., 0] * 0.7)
                     * np.cos(np.pi * x[..., 1] * 0.5)], -1)


def _wavy3(x):
    x = np.asarray(x, np.float64)
    s = np.sin(np.pi * x[..., 0]) * np.sin(np.pi * x[..., 1])
    return np.stack([x[..., 0] + 0.06 * np.sin(np.pi * x[..., 1] * 0.8),
                     x[..., 1] + 0.05 * s,
                     x[..., 2] + 0.07 * np.sin(np.pi * x[..., 2] * 0.6)
                     * np.cos(np.pi * x[..., 0])], -1)


def _rel(a, b):
    return np.abs(np.asarray(a) - np.asarray(b)).max() / np.abs(b).max()


def test_isoparametric_of_affine_equals_affine_image():
    """Q1 geometry sampled from a globally affine map reproduces the
    affine representation exactly (Jacobian constant per element)."""
    S = np.array([[1.0, 0.4], [0.2, 0.9]])
    base = hmesh.structured((3, 2))
    m_aff = geo.affine_image(base, S, b=np.array([0.3, -0.1]))
    m_tri = geo.isoparametric(base, lambda x: x @ S.T + [0.3, -0.1])
    deg = np.array([1, 2, 3, 2, 1, 2])
    for scaling in ("measure", "normal"):
        A1 = bm.to_dense(assemble_laplace(
            DGBasis(m_tri, deg), penalty=2.0, dirichlet=True,
            penalty_scaling=scaling), DGBasis(m_tri, deg))
        A2 = bm.to_dense(assemble_laplace(
            DGBasis(m_aff, deg), penalty=2.0, dirichlet=True,
            penalty_scaling=scaling), DGBasis(m_aff, deg))
        assert np.abs(np.asarray(A1) - np.asarray(A2)).max() < 1e-12


@pytest.mark.parametrize("dim", [2, 3])
def test_trilinear_assembly_matches_oracle(dim):
    """Wavy Q1 mesh, mixed degrees: batched assembly equals the
    independent per-point oracle at 1e-11, both penalty conventions,
    with scalar and tensor media on top."""
    if dim == 2:
        m = geo.isoparametric(hmesh.structured((3, 2)), _wavy2)
        deg = np.array([1, 2, 3, 2, 1, 2])
    else:
        m = geo.isoparametric(hmesh.structured((2, 2, 2)), _wavy3)
        deg = np.array([1, 2, 1, 2, 2, 1, 2, 1])
    basis = DGBasis(m, deg)
    for scaling in ("measure", "normal"):
        A = bm.to_dense(assemble_laplace(basis, penalty=2.0, dirichlet=True,
                                         penalty_scaling=scaling), basis)
        A_ref = oracle.sipg_matrix(basis, penalty=2.0, dirichlet=True,
                                   penalty_scaling=scaling)
        assert _rel(A, A_ref) < 1e-11

    def Ks(x):
        return 1.0 + 0.5 * jnp.sin(2 * x[..., 0]) * x[..., 1]

    A = bm.to_dense(assemble_laplace(basis, penalty=2.0, dirichlet=True,
                                     diffusion=Ks,
                                     penalty_scaling="measure"), basis)
    A_ref = oracle.sipg_matrix(
        basis, penalty=2.0, dirichlet=True, penalty_scaling="measure",
        diffusion=lambda x: 1.0 + 0.5 * np.sin(2 * x[0]) * x[1])
    assert _rel(A, A_ref) < 1e-11

    # tensor medium on a curved mesh (anisotropy + geometry pullback)
    T0 = np.eye(dim) + 0.3 * np.ones((dim, dim))

    def Kt(x):
        return jnp.broadcast_to(jnp.asarray(T0, x.dtype),
                                x.shape[:-1] + T0.shape)

    A = bm.to_dense(assemble_laplace(basis, penalty=2.0, dirichlet=True,
                                     diffusion=Kt,
                                     penalty_scaling="measure"), basis)
    A_ref = oracle.sipg_matrix(basis, penalty=2.0, dirichlet=True,
                               penalty_scaling="measure",
                               diffusion=lambda x: T0)
    assert _rel(A, A_ref) < 1e-11


def test_trilinear_all_paths_agree():
    """Matrix-free apply == assembled matvec; diagonal blocks ==
    assembled diagonal; lumped mass stays exactly diagonal — all on a
    genuinely trilinear 3D mesh."""
    m = geo.isoparametric(hmesh.structured((2, 2, 2)), _wavy3)
    rng = np.random.default_rng(3)
    deg = rng.choice([1, 2], size=8)
    basis = DGBasis(m, deg)
    plan = build_plan(basis)
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True,
                         penalty_scaling="normal", plan=plan)
    op = sipg_operator(basis, penalty=2.0, dirichlet=True,
                       penalty_scaling="normal", plan=plan)
    x = {p: jnp.asarray(rng.standard_normal((basis.bucket_size(p),
                                             (p + 1)**3)))
         for p in basis.bucket_degrees}
    y1, y2 = bm.matvec(A, x), op(x)
    assert max(np.abs(np.asarray(y1[p]) - y2[p]).max() for p in y1) < 1e-12

    Ad = np.asarray(bm.to_dense(A, basis))
    D = sipg_diagonal_blocks(basis, penalty=2.0, dirichlet=True,
                             penalty_scaling="normal", plan=plan)
    offs = np.concatenate([[0], np.cumsum([(int(d) + 1)**3 for d in deg])])
    for p in D:
        for k_e, e in enumerate(basis.bucket_elems[p]):
            bs = (p + 1)**3
            blk = Ad[offs[e]:offs[e] + bs, offs[e]:offs[e] + bs]
            assert np.abs(np.asarray(D[p][k_e]) - blk).max() < 1e-12


def test_trilinear_mass_rhs_volume():
    """Mass and L2 functional carry the per-point |det J|: integrating 1
    gives the exact curved-domain volume (= sum of exact Q1 element
    volumes, Gauss(2) being exact for the multilinear det)."""
    m = geo.isoparametric(hmesh.structured((2, 2, 2)), _wavy3)
    vol_exact = float(m.volumes.sum())
    basis = DGBasis(m, np.full(8, 2))
    M = assemble_mass(basis)
    ones = {p: jnp.ones((basis.bucket_size(p), (p + 1)**3))
            for p in basis.bucket_degrees}
    vol = sum(float(jnp.vdot(ones[p], v))
              for p, v in bm.matvec(M, ones).items())
    assert abs(vol - vol_exact) < 1e-11
    b = l2_functional(basis, lambda x: jnp.ones_like(x[..., 0]))
    vol2 = sum(float(jnp.sum(b[p] * ones[p])) for p in b)
    assert abs(vol2 - vol_exact) < 1e-11
    # oracle agreement for a nontrivial weight
    Mo = oracle.mass_matrix(basis,
                            weight=lambda x: 1.0 + x[0] * x[1])
    Mf = bm.to_dense(assemble_mass(basis,
                                   weight=lambda x: 1.0 + x[..., 0]
                                   * x[..., 1]), basis)
    assert _rel(Mf, Mo) < 1e-11
    # matrix-free mass operator matches the assembled one
    from hpdg_tpu.matrixfree.sumfact import mass_operator
    mop = mass_operator(basis)
    rng = np.random.default_rng(4)
    x = {p: jnp.asarray(rng.standard_normal((basis.bucket_size(p),
                                             (p + 1)**3)))
         for p in basis.bucket_degrees}
    y1, y2 = bm.matvec(assemble_mass(basis), x), mop(x)
    assert max(np.abs(np.asarray(y1[p]) - y2[p]).max() for p in y1) < 1e-12


def test_trilinear_dirichlet_rhs_matches_oracle():
    """Geometry- and coefficient-aware Dirichlet functional."""
    m = geo.isoparametric(hmesh.structured((3, 2)), _wavy2)
    basis = DGBasis(m, np.array([1, 2, 3, 2, 1, 2]))

    def gj(x):
        return jnp.sin(x[..., 0]) + x[..., 1]

    def gn(x):
        return np.sin(x[0]) + x[1]

    for scaling in ("measure", "normal"):
        b = dirichlet_rhs(basis, gj, penalty=3.0, penalty_scaling=scaling)
        b_ref = oracle.dirichlet_rhs(basis, gn, penalty=3.0,
                                     penalty_scaling=scaling)
        from hpdg_tpu.linalg.blockvector import to_flat
        assert np.abs(np.asarray(to_flat(basis, b)) - b_ref).max() \
            / np.abs(b_ref).max() < 1e-11

    def Ks(x):
        if np.ndim(x) == 1:
            return 1.0 + 0.5 * np.sin(x[0])
        return 1.0 + 0.5 * jnp.sin(x[..., 0])

    b = dirichlet_rhs(basis, gj, penalty=3.0, diffusion=Ks)
    b_ref = oracle.dirichlet_rhs(basis, gn, penalty=3.0, diffusion=Ks)
    from hpdg_tpu.linalg.blockvector import to_flat
    assert np.abs(np.asarray(to_flat(basis, b)) - b_ref).max() \
        / np.abs(b_ref).max() < 1e-11


def test_trilinear_refine_conforming_and_hanging():
    """Children restrict the parent Q1 map exactly: the refined and the
    adaptively refined (hanging-node) meshes still match the oracle —
    the geometry stays conforming across nc interfaces because child
    corners are interpolated, not re-sampled."""
    base = geo.isoparametric(hmesh.structured((2, 2)), _wavy2)
    mf = hmesh.refine(base)
    assert mf.corners is not None and mf.corners.shape == (16, 4, 2)
    basis = DGBasis(mf, np.full(16, 2))
    A = bm.to_dense(assemble_laplace(basis, penalty=2.0, dirichlet=True,
                                     penalty_scaling="normal"), basis)
    A_ref = oracle.sipg_matrix(basis, penalty=2.0, dirichlet=True,
                               penalty_scaling="normal")
    assert _rel(A, A_ref) < 1e-11

    # local refinement -> hanging nodes on a curved mesh
    marks = np.zeros(16, bool)
    marks[[0, 5]] = True
    ma = adaptive.refine_local(mf, marks)
    assert (ma.faces.nc_code > 0).any()
    rng = np.random.default_rng(5)
    dega = rng.choice([1, 2], size=ma.n_elements)
    ba = DGBasis(ma, dega)
    Aa = bm.to_dense(assemble_laplace(ba, penalty=2.0, dirichlet=True,
                                      penalty_scaling="measure"), ba)
    Aa_ref = oracle.sipg_matrix(ba, penalty=2.0, dirichlet=True,
                                penalty_scaling="measure")
    assert _rel(Aa, Aa_ref) < 1e-11


def test_trilinear_poisson_solves():
    """Full system on a wavy 2D mesh: PCG + block-Jacobi solution equals
    the dense oracle solve."""
    from hpdg_tpu.solvers.cg import pcg
    from hpdg_tpu.solvers import smoothers
    m = geo.isoparametric(hmesh.structured((4, 4)), _wavy2)
    basis = DGBasis(m, np.full(16, 2))
    A = assemble_laplace(basis, penalty=4.0, dirichlet=True,
                         penalty_scaling="normal")
    b = l2_functional(basis, lambda x: jnp.ones_like(x[..., 0]))
    M = smoothers.block_jacobi_preconditioner(A)
    x, info = pcg(lambda v: bm.matvec(A, v), b, precond=M, tol=1e-12,
                  maxiter=500)
    Ad = oracle.sipg_matrix(basis, penalty=4.0, dirichlet=True,
                            penalty_scaling="normal")
    b_ref = oracle.l2_functional(basis, lambda x: 1.0)
    x_ref = np.linalg.solve(Ad, b_ref)
    from hpdg_tpu.linalg.blockvector import to_flat
    assert np.abs(np.asarray(to_flat(basis, x)) - x_ref).max() < 1e-9


def test_trilinear_hex_import_matches_isoparametric():
    """from_hex_lattice on wavy vertices == isoparametric() of the same
    map (same corners, same operator)."""
    shape = (2, 2, 2)
    nx, ny, nz = shape
    gx = np.stack(np.meshgrid(np.arange(nx + 1), np.arange(ny + 1),
                              np.arange(nz + 1), indexing="ij"),
                  axis=-1).reshape(-1, 3).astype(np.float64)
    # wavy but smooth; scale down so cells stay valid on the unit lattice
    pts = _wavy3(gx / np.array([nx, ny, nz])) * np.array([nx, ny, nz])

    def vid(i, j, k):
        return (i * (ny + 1) + j) * (nz + 1) + k

    cells = []
    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                cells.append([vid(i, j, k), vid(i + 1, j, k),
                              vid(i + 1, j + 1, k), vid(i, j + 1, k),
                              vid(i, j, k + 1), vid(i + 1, j, k + 1),
                              vid(i + 1, j + 1, k + 1),
                              vid(i, j + 1, k + 1)])
    m_imp = geo.from_hex_lattice(pts, np.asarray(cells), shape)
    assert m_imp.corners is not None
    m_iso = geo.isoparametric(
        hmesh.structured(shape, upper=shape),
        lambda x: _wavy3(x / np.array(shape)) * np.array(shape))
    assert np.abs(m_imp.corners - m_iso.corners).max() < 1e-12
    deg = np.full(8, 2)
    A1 = bm.to_dense(assemble_laplace(DGBasis(m_imp, deg), penalty=2.0,
                                      dirichlet=True), DGBasis(m_imp, deg))
    A2 = bm.to_dense(assemble_laplace(DGBasis(m_iso, deg), penalty=2.0,
                                      dirichlet=True), DGBasis(m_iso, deg))
    assert np.abs(np.asarray(A1) - np.asarray(A2)).max() < 1e-12


def test_trilinear_manufactured_convergence():
    """2D manufactured solution on the wavy domain: DG energy error
    decreases ~4x per refinement at p=1 (h^1 in energy ~ h^2 in L2;
    a loose 3x bar guards the rate without flakiness)."""
    from hpdg_tpu.solvers.cg import pcg
    from hpdg_tpu.solvers import smoothers
    from hpdg_tpu.linalg.blockvector import to_flat

    def uex(x):
        return np.sin(np.pi * x[..., 0]) * np.sin(np.pi * x[..., 1])

    errs = []
    base = geo.isoparametric(hmesh.structured((3, 3)), _wavy2)
    m = base
    for lvl in range(2):
        if lvl:
            m = hmesh.refine(m)
        basis = DGBasis(m, np.full(m.n_elements, 2))
        A = assemble_laplace(basis, penalty=6.0, dirichlet=True)
        # -lap(u) pulled back through the map: evaluate on physical pts
        f = lambda x: 2 * np.pi**2 * jnp.sin(np.pi * x[..., 0]) \
            * jnp.sin(np.pi * x[..., 1])  # noqa: E731
        b = l2_functional(basis, f, quad_order=8)
        bd = dirichlet_rhs(basis, lambda x: jnp.asarray(uex(np.asarray(x))),
                           penalty=6.0)
        b = {p: b[p] + bd[p] for p in b}
        M = smoothers.block_jacobi_preconditioner(A)
        x, _ = pcg(lambda v: bm.matvec(A, v), b, precond=M, tol=1e-12,
                   maxiter=2000)
        # L2 error by quadrature against the interpolant is enough for a
        # rate check: compare dof values at GL nodes to exact values
        from hpdg_tpu.basis import lagrange, tensor as btensor
        p = 2
        nodes = lagrange.nodes_1d(p, basis.family)
        mi = btensor.multiindices(p, 2)
        xi = nodes[mi]  # (nl, 2) local coords of the nodal points
        elems = np.arange(m.n_elements)
        xg = (m.lower[:, None, :] + xi[None] * m.extent[:, None, :])
        xph = geo.apply_map(m, elems, xg)
        vals = np.asarray(to_flat(basis, x)).reshape(m.n_elements, -1)
        err = vals - uex(xph)
        w2 = np.sqrt((err**2).mean())
        errs.append(w2)
    assert errs[1] < errs[0] / 3.0


@pytest.mark.parametrize("make", ["affine", "trilinear"])
def test_elasticity_general_geometry_matches_oracle(make):
    """Vector-valued SIPG elasticity on curved meshes: per-point
    physical gradients, tractions with the true normal and Nanson
    measure (assemble/elasticity.py::_assemble_elasticity_geom) equal
    the independent scalar-loop oracle at 1e-11."""
    from hpdg_tpu.assemble.elasticity import assemble_elasticity
    base = hmesh.structured((2, 3))
    if make == "affine":
        S = np.array([[1.0, 0.35], [0.15, 0.9]])
        m = geo.affine_image(base, S, b=np.array([0.2, -0.1]))
    else:
        m = geo.isoparametric(base, _wavy2)
    deg = np.array([1, 2, 2, 1, 2, 3])
    basis = DGBasis(m, deg)
    for diri in (False, True):
        A = bm.to_dense(assemble_elasticity(basis, mu=1.3, lam=0.7,
                                            penalty=3.0, dirichlet=diri),
                        basis)
        A_ref = oracle.elasticity_matrix(basis, mu=1.3, lam=0.7,
                                         penalty=3.0, dirichlet=diri)
        assert _rel(A, A_ref) < 1e-11


def test_elasticity_trilinear_3d_solves():
    """3D curved-mesh elasticity: assembled operator vs oracle, and a
    PCG solve with assembled-diagonal block Jacobi converges to the
    dense solution."""
    from hpdg_tpu.assemble.elasticity import (assemble_elasticity,
                                              l2_functional_vec)
    from hpdg_tpu.matrixfree.elasticity import elasticity_diagonal_blocks
    from hpdg_tpu.solvers.cg import pcg
    from hpdg_tpu.linalg.blockvector import to_flat
    m = geo.isoparametric(hmesh.structured((2, 2, 2)), _wavy3)
    basis = DGBasis(m, np.full(8, 2))
    A = assemble_elasticity(basis, mu=1.0, lam=1.0, penalty=6.0,
                            dirichlet=True)
    Ad = bm.to_dense(A, basis)
    A_ref = oracle.elasticity_matrix(basis, mu=1.0, lam=1.0, penalty=6.0,
                                     dirichlet=True)
    assert _rel(Ad, A_ref) < 1e-11

    f = lambda x: jnp.stack(  # noqa: E731
        [jnp.ones_like(x[..., 0]), x[..., 0], -x[..., 1]], -1)
    b = l2_functional_vec(basis, f)
    D = elasticity_diagonal_blocks(basis, mu=1.0, lam=1.0, penalty=6.0,
                                   dirichlet=True)
    Dinv = {p: jnp.linalg.inv(D[p]) for p in D}
    M = lambda r: {p: jnp.einsum("nij,nj->ni", Dinv[p], r[p])  # noqa: E731
                   for p in r}
    x, info = pcg(lambda v: bm.matvec(A, v), b, precond=M, tol=1e-11,
                  maxiter=1500)
    bf = np.concatenate([np.asarray(b[p]).reshape(-1)
                         for p in sorted(b)])
    x_ref = np.linalg.solve(np.asarray(A_ref), bf)
    xf = np.asarray(to_flat(basis, x, ncomp=3))
    assert np.abs(xf - x_ref).max() < 1e-8


def test_matrixfree_elasticity_general_geometry():
    """Matrix-free elasticity apply == assembled matvec on affine and
    trilinear meshes (bulk + faces + Dirichlet, both scalings)."""
    from hpdg_tpu.assemble.elasticity import assemble_elasticity
    from hpdg_tpu.matrixfree.elasticity import elasticity_operator
    rng = np.random.default_rng(11)
    S = np.array([[1.0, 0.35], [0.15, 0.9]])
    meshes = [geo.affine_image(hmesh.structured((2, 3)), S),
              geo.isoparametric(hmesh.structured((2, 3)), _wavy2)]
    for m in meshes:
        deg = np.array([1, 2, 2, 1, 2, 3])
        basis = DGBasis(m, deg)
        x = {p: jnp.asarray(rng.standard_normal(
            (basis.bucket_size(p), 2 * (p + 1) ** 2)))
            for p in basis.bucket_degrees}
        for diri in (False, True):
            A = assemble_elasticity(basis, mu=1.3, lam=0.7, penalty=3.0,
                                    dirichlet=diri)
            op = elasticity_operator(basis, mu=1.3, lam=0.7, penalty=3.0,
                                     dirichlet=diri)
            y1, y2 = bm.matvec(A, x), op(x)
            err = max(np.abs(np.asarray(y1[p]) - np.asarray(y2[p])).max()
                      for p in y1)
            assert err < 1e-12, (diri, err)


def test_obstacle_tnnmg_on_curved_mesh():
    """TNNMG obstacle solve on a wavy trilinear mesh: the assembled
    geometry-aware operator flows through the nonsmooth solver stack —
    energy decreases monotonically, the obstacle activates, the
    solution stays feasible (buildingblocks/solve.hh:40-124 scope)."""
    from hpdg_tpu.blocks import api
    m = geo.isoparametric(hmesh.structured((4, 4)), _wavy2)
    basis = DGBasis(m, np.full(16, 2))
    A = api.laplace(basis, penalty=4.0, dirichlet=True)
    b = api.l2_functional(basis, lambda x: 8.0 * jnp.ones_like(x[..., 0]))
    lo, up = api.constant_bounds(basis, lower=-0.05, upper=0.05)
    x, info = api.solve_obstacle(basis, A, b, lo, up, tol=1e-10,
                                 maxiter=80)
    en = info["energy"]
    assert all(b2 <= a2 + 1e-10 for a2, b2 in zip(en, en[1:]))
    assert max(info["truncated"]) > 0  # contact zone active
    for p in x:
        assert np.all(np.asarray(x[p]) <= np.asarray(up[p]) + 1e-9)
        assert np.all(np.asarray(x[p]) >= np.asarray(lo[p]) - 1e-9)


def test_h_adaptive_loop_on_curved_mesh():
    """Full h-adaptive cycle on a trilinear mesh: solve -> estimate
    (geometry-aware DG norm) -> mark -> refine_local (children restrict
    the parent Q1 map, nc interfaces stay conforming) -> persist ->
    re-solve.  The true (geometry-aware) L2 error drops."""
    from hpdg_tpu.blocks import api
    from hpdg_tpu.blocks.persist import save_state, interpolate_to
    from hpdg_tpu.estimators.utility import mark_fraction
    from hpdg_tpu.estimators import l2_error

    u = lambda x: jnp.sin(jnp.pi * x[..., 0]) * jnp.sin(jnp.pi * x[..., 1])
    f = lambda x: 2 * jnp.pi**2 * u(x)
    m = geo.isoparametric(hmesh.structured((4, 4)), _wavy2)
    basis = DGBasis(m, np.full(16, 2))

    def solve(basis):
        A = api.laplace(basis, penalty=4.0, dirichlet=True)
        b = api.l2_functional(basis, f)
        bd = dirichlet_rhs(basis, u, penalty=4.0)
        b = {p: b[p] + bd[p] for p in b}
        x, _ = api.solve_linear(basis, A, b, tol=1e-10, maxiter=400)
        return x

    x = solve(basis)
    err1 = float(l2_error(basis, x, u))
    eta = np.asarray(api.local_norm(
        basis, {p: x[p] - api.interpolate(basis, u)[p] for p in x},
        penalty=4.0))
    marks = mark_fraction(eta, 0.7)
    assert marks.any() and not marks.all()
    saved = save_state(basis, x)
    m2 = adaptive.refine_local(m, adaptive.close_marks(m, marks))
    assert m2.corners is not None
    deg2 = np.full(m2.n_elements, 2)
    basis2 = DGBasis(m2, deg2)
    x0 = interpolate_to(saved, basis2)
    assert float(np.asarray(
        sum(jnp.sum(v**2) for v in x0.values()))) > 0
    x2 = solve(basis2)
    err2 = float(l2_error(basis2, x2, u))
    assert err2 < 0.7 * err1, (err1, err2)


def test_model_zoo_on_curved_mesh():
    """PoissonProblem and HeatProblem presets work unchanged on a
    trilinear mesh (geometry flows through the bundled assemblers):
    the heat step conserves nothing exotic — it damps toward steady
    state, and the Poisson solve matches the oracle dense solve."""
    from hpdg_tpu.models import PoissonProblem, HeatProblem
    from hpdg_tpu.linalg.blockvector import to_flat
    m = geo.isoparametric(hmesh.structured((3, 3)), _wavy2)
    basis = DGBasis(m, np.full(9, 2))
    prob = PoissonProblem(basis, penalty=4.0, dirichlet=True)
    b = prob.rhs(lambda x: jnp.ones_like(x[..., 0]))
    x, info = prob.solve(b, method="cg+mg", tol=1e-11, maxiter=200)
    Ad = oracle.sipg_matrix(basis, penalty=4.0, dirichlet=True)
    b_ref = oracle.l2_functional(basis, lambda x: 1.0)
    x_ref = np.linalg.solve(Ad, b_ref)
    assert np.abs(np.asarray(to_flat(basis, x)) - x_ref).max() < 1e-8

    heat = HeatProblem(basis, dt=0.05, penalty=4.0)
    u = api_interp(basis, lambda p: jnp.sin(jnp.pi * p[..., 0])
                   * jnp.sin(jnp.pi * p[..., 1]))
    e0 = sum(float(jnp.sum(v**2)) for v in u.values())
    for _ in range(3):
        u, _ = heat.advance(u)
    e1 = sum(float(jnp.sum(v**2)) for v in u.values())
    assert e1 < e0  # diffusion decays the homogeneous-Dirichlet mode


def api_interp(basis, f):
    from hpdg_tpu.blocks import api
    return api.interpolate(basis, f)


def test_h_multigrid_on_curved_mesh_converges():
    """Geometric (h) multigrid with Galerkin-restricted coarse matrices
    on a trilinear hierarchy (children restrict the parent map): the
    V-cycle rate on the wavy mesh MATCHES the box-mesh rate of the same
    configuration (geometry costs nothing — measured 0.568 vs 0.566)."""
    from hpdg_tpu.solvers.multigrid import multigrid_solver
    from hpdg_tpu.linalg import blockvector as bv

    def rate_for(base):
        meshes = [base, hmesh.refine(base),
                  hmesh.refine(hmesh.refine(base))]
        m = meshes[-1]
        basis = DGBasis(m, np.full(m.n_elements, 2))
        A = assemble_laplace(basis, penalty=4.0, dirichlet=True)
        step, _ = multigrid_solver(basis, A, meshes=meshes)
        rng = np.random.default_rng(12)
        b = {p: jnp.asarray(rng.standard_normal(
            (basis.bucket_size(p), (p + 1) ** 2)))
            for p in basis.bucket_degrees}
        x = bv.zeros_like(b)
        res = [float(bv.norm(b))]
        for _ in range(8):
            x = step(x, b)
            res.append(float(bv.norm(bv.sub(b, bm.matvec(A, x)))))
        return (res[-1] / res[2]) ** (1.0 / (len(res) - 3))

    r_box = rate_for(hmesh.structured((3, 3)))
    r_wavy = rate_for(geo.isoparametric(hmesh.structured((3, 3)), _wavy2))
    assert r_wavy < 1.0 and r_wavy < r_box + 0.05, (r_box, r_wavy)


def test_neumann_rhs_curved_surface_measure():
    """∫_bdry 1 · v summed over all test functions = physical surface
    area.  Independent check: the area of each curved boundary face is
    integrated by dense sampling of the Q1 map's tangent vectors
    (finite differences + cross products, no shared code)."""
    from hpdg_tpu.assemble.rhs import neumann_rhs
    m = geo.isoparametric(hmesh.structured((3, 3)), _wavy2)
    basis = DGBasis(m, np.full(9, 3))
    b = neumann_rhs(basis, lambda x: jnp.ones_like(x[..., 0]))
    total = sum(float(jnp.sum(v)) for v in b.values())

    # independent: sample each boundary edge densely through the map
    area = 0.0
    s = np.linspace(0.0, 1.0, 2001)
    mid = 0.5 * (s[1:] + s[:-1])
    for f in range(len(m.bfaces)):
        e = int(m.bfaces.elem[f])
        ax = int(m.bfaces.axis[f])
        side = int(m.bfaces.side[f])
        tang = 1 - ax
        xg = np.zeros((len(s), 2))
        xg[:, ax] = m.lower[e, ax] + side * m.extent[e, ax]
        xg[:, tang] = m.lower[e, tang] + s * m.extent[e, tang]
        xp = geo.apply_map(m, np.full(len(s), e), xg[None])[0]
        area += np.linalg.norm(np.diff(xp, axis=0), axis=1).sum()
    assert abs(total - area) < 1e-6 * area, (total, area)


def test_quad_lattice_import_2d():
    """from_quad_lattice: wavy 2D vertices (VTK quad ordering) import to
    the same operator as isoparametric() of the same map; parallelogram
    lattices import as affine."""
    shape = (3, 2)
    nx, ny = shape
    gx = np.stack(np.meshgrid(np.arange(nx + 1), np.arange(ny + 1),
                              indexing="ij"), axis=-1
                  ).reshape(-1, 2).astype(np.float64)
    phi = lambda x: _wavy2(x / np.array(shape)) * np.array(shape)
    pts = phi(gx)

    def vid(i, j):
        return i * (ny + 1) + j

    cells = []
    for i in range(nx):
        for j in range(ny):
            cells.append([vid(i, j), vid(i + 1, j),
                          vid(i + 1, j + 1), vid(i, j + 1)])
    m_imp = geo.from_quad_lattice(pts, np.asarray(cells), shape)
    assert m_imp.corners is not None
    m_iso = geo.isoparametric(hmesh.structured(shape, upper=shape), phi)
    assert np.abs(m_imp.corners - m_iso.corners).max() < 1e-12
    deg = np.array([1, 2, 3, 2, 1, 2])
    A1 = bm.to_dense(assemble_laplace(DGBasis(m_imp, deg), penalty=2.0,
                                      dirichlet=True), DGBasis(m_imp, deg))
    A2 = bm.to_dense(assemble_laplace(DGBasis(m_iso, deg), penalty=2.0,
                                      dirichlet=True), DGBasis(m_iso, deg))
    assert np.abs(np.asarray(A1) - np.asarray(A2)).max() < 1e-12

    # parallelogram lattice -> affine representation
    S = np.array([[1.0, 0.4], [0.1, 0.8]])
    m_aff = geo.from_quad_lattice(gx @ S.T, np.asarray(cells), shape)
    assert m_aff.jac is not None and m_aff.corners is None


def test_hp_smoothness_decision_on_curved_mesh():
    """The Legendre-decay smoothness indicator drives the hp decision on
    a curved mesh: a globally smooth field votes 'raise p' (small
    indicator) while a kinked field votes 'refine h' (large indicator)
    on the elements containing the kink — geometry does not confuse the
    parametric modal decay (smoothnessindicator.hh:12-41 role)."""
    from hpdg_tpu.estimators.smoothness import smoothness_indicator
    from hpdg_tpu.blocks import api
    m = geo.isoparametric(hmesh.structured((4, 4)), _wavy2)
    basis = DGBasis(m, np.full(16, 3))
    xs = api.interpolate(basis, lambda p: jnp.sin(p[..., 0])
                         * jnp.cos(p[..., 1]))
    xr = api.interpolate(basis, lambda p: jnp.abs(p[..., 0] - 0.53)
                         + jnp.abs(p[..., 1] - 0.47))
    ind_s = np.asarray(smoothness_indicator(basis, xs))
    ind_r = np.asarray(smoothness_indicator(basis, xr))
    # kinked: strong, LOCALIZED response (large only on kink elements);
    # smooth: uniformly weak
    assert ind_r.max() > 3 * ind_s.max(), (ind_r.max(), ind_s.max())
    assert np.median(ind_r) < ind_r.max() / 10, (np.median(ind_r),
                                                 ind_r.max())
