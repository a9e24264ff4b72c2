"""First-class general (affine) element geometry (r2-verdict item 4).

The mesh stores per-element affine maps (``Mesh.jac``/``Mesh.shift``,
the TPU-native form of the reference's per-quad-point
jacobianInverseTransposed, gausslobattoipdgassembler.hh:337-350);
assembly, matrix-free applies, diagonal blocks, mass and RHS consume
them directly.  Differential-tested against the independent per-element
quadrature oracle (which implements the physical geometry with explicit
Nanson factors and physical normals — no shared code)."""

import numpy as np
import jax.numpy as jnp

from hpdg_tpu import mesh as hmesh
from hpdg_tpu.mesh import geometry as geo
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.assemble import (assemble_laplace, build_plan, l2_functional,
                               assemble_mass)
from hpdg_tpu.matrixfree import sipg_operator
from hpdg_tpu.matrixfree.diagonal import sipg_diagonal_blocks
from hpdg_tpu.linalg import blockmatrix as bm
from hpdg_tpu.testing import oracle


def _shear3():
    th = 0.4
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    return R @ np.array([[1.0, 0.3, 0.1], [0.0, 1.0, 0.2], [0.0, 0.0, 0.8]])


def test_affine_diag_equals_box_mesh():
    """A diagonal affine map is exactly the stretched box mesh — the
    affine path must reproduce the box path bit-for-bit-ish."""
    s = np.array([2.0, 0.5])
    m_ref = hmesh.structured((3, 2))
    m_box = hmesh.from_boxes(m_ref.lower * s, m_ref.extent * s)
    m_aff = geo.affine_image(m_ref, np.diag(s))
    rng = np.random.default_rng(0)
    deg = rng.choice([1, 2, 3], size=6)
    for scaling in ("measure", "normal"):
        A_box = bm.to_dense(assemble_laplace(
            DGBasis(m_box, deg), penalty=2.0, dirichlet=True,
            penalty_scaling=scaling), DGBasis(m_box, deg))
        A_aff = bm.to_dense(assemble_laplace(
            DGBasis(m_aff, deg), penalty=2.0, dirichlet=True,
            penalty_scaling=scaling), DGBasis(m_aff, deg))
        assert np.abs(np.asarray(A_box) - np.asarray(A_aff)).max() < 1e-13


def test_sheared_assembly_matches_oracle():
    """Sheared/rotated 3D affine mesh, mixed degrees: the batched
    assembly equals the independent physical-geometry oracle at 1e-11,
    with and without a variable scalar medium on top."""
    m3 = geo.affine_image(hmesh.structured((2, 2, 2)), _shear3(),
                          b=np.array([0.1, -0.2, 0.05]))
    rng = np.random.default_rng(1)
    deg = rng.choice([1, 2], size=8)
    basis = DGBasis(m3, deg)
    for scaling in ("measure", "normal"):
        A = bm.to_dense(assemble_laplace(basis, penalty=2.0, dirichlet=True,
                                         penalty_scaling=scaling), basis)
        A_ref = oracle.sipg_matrix(basis, penalty=2.0, dirichlet=True,
                                   penalty_scaling=scaling)
        assert (np.abs(np.asarray(A) - A_ref).max()
                / np.abs(A_ref).max()) < 1e-11

    def Ks(x):
        return 1.0 + 0.5 * jnp.sin(2 * x[..., 0]) * x[..., 1]

    A = bm.to_dense(assemble_laplace(basis, penalty=2.0, dirichlet=True,
                                     diffusion=Ks, penalty_scaling="normal"),
                    basis)
    A_ref = oracle.sipg_matrix(
        basis, penalty=2.0, dirichlet=True, penalty_scaling="normal",
        diffusion=lambda x: 1.0 + 0.5 * np.sin(2 * x[0]) * x[1])
    assert (np.abs(np.asarray(A) - A_ref).max()
            / np.abs(A_ref).max()) < 1e-11


def test_twisted_mesh_all_paths_agree():
    """Per-element affinized twist map: matrix-free apply == assembled
    matvec; assembled == oracle at 1e-11; diagonal blocks == assembled
    diagonal."""
    def phi(x):
        th = 0.5 * x[..., 2]
        c, s = np.cos(th), np.sin(th)
        return np.stack([c * x[..., 0] - s * x[..., 1],
                         s * x[..., 0] + c * x[..., 1], x[..., 2]], -1)

    mt = geo.affinize(hmesh.structured((2, 2, 3)), phi)
    rng = np.random.default_rng(2)
    deg = rng.choice([1, 2], size=12)
    bt = DGBasis(mt, deg)
    plan = build_plan(bt)
    A = assemble_laplace(bt, penalty=2.0, dirichlet=True,
                         penalty_scaling="normal", plan=plan)
    op = sipg_operator(bt, penalty=2.0, dirichlet=True,
                       penalty_scaling="normal", plan=plan)
    x = {p: jnp.asarray(rng.standard_normal((bt.bucket_size(p), (p + 1)**3)))
         for p in bt.bucket_degrees}
    y1, y2 = bm.matvec(A, x), op(x)
    assert max(np.abs(np.asarray(y1[p]) - y2[p]).max() for p in y1) < 1e-12

    A_ref = oracle.sipg_matrix(bt, penalty=2.0, dirichlet=True,
                               penalty_scaling="normal")
    Ad = np.asarray(bm.to_dense(A, bt))
    assert np.abs(Ad - A_ref).max() / np.abs(A_ref).max() < 1e-11

    D = sipg_diagonal_blocks(bt, penalty=2.0, dirichlet=True,
                             penalty_scaling="normal", plan=plan)
    offs = np.concatenate([[0], np.cumsum([(int(d) + 1)**3 for d in deg])])
    for p in D:
        for k_e, e in enumerate(bt.bucket_elems[p]):
            bs = (p + 1)**3
            blk = Ad[offs[e]:offs[e] + bs, offs[e]:offs[e] + bs]
            assert np.abs(np.asarray(D[p][k_e]) - blk).max() < 1e-12


def test_sheared_poisson_solves():
    """CG + block-Jacobi on a sheared 2D mesh converges, and the
    solution equals the dense solve of the oracle matrix (full system
    consistency: stiffness + L2 rhs with physical detJ)."""
    from hpdg_tpu.solvers.cg import pcg
    from hpdg_tpu.solvers import smoothers
    S = np.array([[1.0, 0.6], [0.0, 1.0]])
    m = geo.affine_image(hmesh.structured((4, 4)), S)
    basis = DGBasis(m, np.full(16, 2))
    A = assemble_laplace(basis, penalty=4.0, dirichlet=True,
                         penalty_scaling="normal")
    f = lambda x: jnp.ones_like(x[..., 0])  # noqa: E731
    b = l2_functional(basis, f)
    M = smoothers.block_jacobi_preconditioner(A)
    x, info = pcg(lambda v: bm.matvec(A, v), b, precond=M, tol=1e-12,
                  maxiter=400)
    Ad = oracle.sipg_matrix(basis, penalty=4.0, dirichlet=True,
                            penalty_scaling="normal")
    b_ref = oracle.l2_functional(basis, lambda x: 1.0)
    x_ref = np.linalg.solve(Ad, b_ref)
    from hpdg_tpu.linalg.blockvector import to_flat
    xf = np.asarray(to_flat(basis, x))
    assert np.abs(xf - x_ref).max() < 1e-9


def test_mass_and_rhs_affine():
    """Mass matrix and L2 functional carry the |det A| volume factor:
    integral of 1 against 1 equals the physical domain volume."""
    S = _shear3()
    m3 = geo.affine_image(hmesh.structured((2, 2, 2)), S)
    basis = DGBasis(m3, np.full(8, 2))
    M = assemble_mass(basis)
    ones = {p: jnp.ones((basis.bucket_size(p), (p + 1)**3))
            for p in basis.bucket_degrees}
    vol = sum(float(jnp.vdot(ones[p], v)) for p, v in
              bm.matvec(M, ones).items())
    assert abs(vol - abs(np.linalg.det(S))) < 1e-12
    b = l2_functional(basis, lambda x: jnp.ones_like(x[..., 0]))
    vol2 = sum(float(jnp.sum(b[p] * ones[p])) for p in b)
    assert abs(vol2 - abs(np.linalg.det(S))) < 1e-12


def test_hex_lattice_import():
    """from_hex_lattice: vertices of a sheared lattice (VTK hex
    ordering) import to the same operator as affine_image; trilinear
    (non-parallelepiped) cells are rejected."""
    import pytest
    S = _shear3()
    shape = (2, 2, 2)
    # build vertex array of the sheared lattice
    nx, ny, nz = shape
    gx = np.stack(np.meshgrid(np.arange(nx + 1), np.arange(ny + 1),
                              np.arange(nz + 1), indexing="ij"),
                  axis=-1).reshape(-1, 3).astype(np.float64)
    pts = gx @ S.T

    def vid(i, j, k):
        return (i * (ny + 1) + j) * (nz + 1) + k

    cells = []
    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                cells.append([vid(i, j, k), vid(i + 1, j, k),
                              vid(i + 1, j + 1, k), vid(i, j + 1, k),
                              vid(i, j, k + 1), vid(i + 1, j, k + 1),
                              vid(i + 1, j + 1, k + 1), vid(i, j + 1, k + 1)])
    m_imp = geo.from_hex_lattice(pts, np.asarray(cells), shape)
    # equivalent affine_image mesh (parametric = unit lattice)
    m_ref = geo.affine_image(hmesh.structured(shape, upper=shape), S)
    deg = np.full(8, 2)
    A1 = bm.to_dense(assemble_laplace(DGBasis(m_imp, deg), penalty=2.0,
                                      dirichlet=True,
                                      penalty_scaling="normal"),
                     DGBasis(m_imp, deg))
    A2 = bm.to_dense(assemble_laplace(DGBasis(m_ref, deg), penalty=2.0,
                                      dirichlet=True,
                                      penalty_scaling="normal"),
                     DGBasis(m_ref, deg))
    assert np.abs(np.asarray(A1) - np.asarray(A2)).max() < 1e-11

    # trilinear cells -> Q1 isoparametric geometry (mesh.corners)
    pts_tri = pts.copy()
    pts_tri[vid(1, 1, 1)] += np.array([0.2, 0.1, -0.1])
    m_tri = geo.from_hex_lattice(pts_tri, np.asarray(cells), shape)
    assert m_tri.corners is not None and m_tri.jac is None
    # corner positions round-trip exactly
    B = geo._bits(3)
    want = m_tri.lower[:, None, :] + B[None] * m_tri.extent[:, None, :]
    got = geo.apply_map(m_tri, np.arange(8), want)
    assert np.abs(np.sort(got.reshape(-1, 3), axis=0)
                  - np.sort(pts_tri[np.asarray(cells)].reshape(-1, 3),
                            axis=0)).max() < 1e-12
    # an INVERTED hex is still rejected
    pts_bad = pts.copy()
    pts_bad[vid(1, 1, 1)] -= 4.0 * np.array([1.0, 1.0, 1.0]) @ S.T
    with pytest.raises(ValueError):
        geo.from_hex_lattice(pts_bad, np.asarray(cells), shape)


def test_refine_propagates_affine():
    """Uniform refinement keeps the per-element maps (children inherit
    the parent's affine map): the refined operator matches the oracle."""
    S = np.array([[1.0, 0.5], [0.0, 1.0]])
    m = geo.affine_image(hmesh.structured((2, 2)), S)
    mf = hmesh.refine(m)
    assert mf.jac is not None and mf.jac.shape == (16, 2, 2)
    basis = DGBasis(mf, np.full(16, 2))
    A = bm.to_dense(assemble_laplace(basis, penalty=2.0, dirichlet=True,
                                     penalty_scaling="normal"), basis)
    A_ref = oracle.sipg_matrix(basis, penalty=2.0, dirichlet=True,
                               penalty_scaling="normal")
    assert np.abs(np.asarray(A) - A_ref).max() / np.abs(A_ref).max() < 1e-11
