"""Differential tests for the DG-form family (SIPG/IIPG/NIPG) and the
sigma1 gradient-jump stabilization.

Reference: VInteriorPenaltyDGAssembler's DGType switch and sigma1 terms
(dune/hpdg/assemblers/localassemblers/variableipdg.hh:33,177,328-351).
The oracle re-derives both with explicit scalar loops; the batched
assembler and the sum-factorized matrix-free apply are tested against
it at 1e-11 including mixed degrees and hanging nodes, and NIPG's
nonsymmetry (resp. SIPG's symmetry) is asserted directly.
"""

import numpy as np
import pytest

from hpdg_tpu import mesh as hmesh
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.assemble import assemble_laplace
from hpdg_tpu.linalg import blockmatrix as bm
from hpdg_tpu.matrixfree import sipg_operator
from hpdg_tpu.testing import oracle


def frob_close(A, B, tol=1e-11):
    scale = max(1.0, np.linalg.norm(B))
    return np.linalg.norm(A - B) / scale < tol


from hpdg_tpu.linalg import blockvector as bv


@pytest.mark.parametrize("dg_form,theta", [("sipg", -1.0), ("iipg", 0.0),
                                           ("nipg", 1.0)])
@pytest.mark.parametrize("dirichlet", [False, True])
def test_dg_forms_2d_vs_oracle(dg_form, theta, dirichlet):
    m = hmesh.structured((3, 2), upper=(1.5, 1.0))
    basis = DGBasis(m, np.full(m.n_elements, 3))
    A = assemble_laplace(basis, penalty=2.0, dirichlet=dirichlet,
                         dg_form=dg_form)
    Ad = bm.to_dense(A, basis)
    Aref = oracle.sipg_matrix(basis, penalty=2.0, dirichlet=dirichlet,
                              dg_form=theta)
    assert frob_close(Ad, Aref)


@pytest.mark.parametrize("dg_form", ["iipg", "nipg"])
def test_dg_forms_3d_mixed_degrees(dg_form):
    m = hmesh.structured((2, 2, 1), upper=(1.0, 2.0, 0.5))
    degrees = np.array([1, 2, 2, 3])
    basis = DGBasis(m, degrees)
    A = assemble_laplace(basis, penalty=1.5, dirichlet=True,
                         dg_form=dg_form)
    Ad = bm.to_dense(A, basis)
    Aref = oracle.sipg_matrix(basis, penalty=1.5, dirichlet=True,
                              dg_form=dg_form)
    assert frob_close(Ad, Aref)


def test_nipg_nonsymmetric_sipg_symmetric():
    m = hmesh.structured((3, 3))
    basis = DGBasis(m, np.full(m.n_elements, 2))
    As = bm.to_dense(assemble_laplace(basis, penalty=2.0, dirichlet=True,
                                      dg_form="sipg"), basis)
    An = bm.to_dense(assemble_laplace(basis, penalty=2.0, dirichlet=True,
                                      dg_form="nipg"), basis)
    Ai = bm.to_dense(assemble_laplace(basis, penalty=2.0, dirichlet=True,
                                      dg_form="iipg"), basis)
    assert np.allclose(As, As.T, atol=1e-11)
    # NIPG/IIPG must NOT be symmetric (the consistency terms no longer
    # mirror); their symmetric parts all agree with SIPG's bulk+penalty
    assert np.linalg.norm(An - An.T) > 1e-3
    assert np.linalg.norm(Ai - Ai.T) > 1e-3
    # theta enters linearly: A(iipg) = (A(sipg) + A(nipg)) / 2
    assert frob_close(Ai, 0.5 * (As + An))


@pytest.mark.parametrize("sigma1", [0.5, 2.0])
def test_sigma1_2d_vs_oracle(sigma1):
    m = hmesh.structured((3, 2), upper=(1.5, 1.0))
    basis = DGBasis(m, np.full(m.n_elements, 3))
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True,
                         sigma1=sigma1)
    Ad = bm.to_dense(A, basis)
    Aref = oracle.sipg_matrix(basis, penalty=2.0, dirichlet=True,
                              sigma1=sigma1)
    assert frob_close(Ad, Aref)
    # sigma1 adds a PSD gradient-jump term: must stay symmetric
    assert np.allclose(Ad, Ad.T, atol=1e-11)


def test_sigma1_mixed_degrees_and_forms_vs_oracle():
    m = hmesh.structured((2, 2, 1))
    degrees = np.array([1, 2, 3, 2])
    basis = DGBasis(m, degrees)
    for dg_form in ("sipg", "nipg"):
        A = assemble_laplace(basis, penalty=2.0, dirichlet=True,
                             dg_form=dg_form, sigma1=1.25)
        Ad = bm.to_dense(A, basis)
        Aref = oracle.sipg_matrix(basis, penalty=2.0, dirichlet=True,
                                  dg_form=dg_form, sigma1=1.25)
        assert frob_close(Ad, Aref)


def test_sigma1_hanging_nodes_vs_oracle():
    from hpdg_tpu.mesh.adaptive import refine_local
    m0 = hmesh.structured((2, 2))
    marks = np.zeros(m0.n_elements, bool)
    marks[0] = True
    m = refine_local(m0, marks)
    basis = DGBasis(m, np.full(m.n_elements, 2))
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True, sigma1=0.75,
                         dg_form="iipg")
    Ad = bm.to_dense(A, basis)
    Aref = oracle.sipg_matrix(basis, penalty=2.0, dirichlet=True,
                              sigma1=0.75, dg_form="iipg")
    assert frob_close(Ad, Aref)


@pytest.mark.parametrize("dg_form,sigma1", [("sipg", 1.0), ("iipg", 0.0),
                                            ("nipg", 0.5)])
def test_matrixfree_matches_assembled_forms(dg_form, sigma1):
    m = hmesh.structured((3, 2), upper=(1.5, 1.0))
    degrees = np.array([2, 3, 2, 1, 2, 3])
    basis = DGBasis(m, degrees)
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True,
                         dg_form=dg_form, sigma1=sigma1)
    Ad = bm.to_dense(A, basis)
    op = sipg_operator(basis, penalty=2.0, dirichlet=True,
                       dg_form=dg_form, sigma1=sigma1)
    rng = np.random.default_rng(0)
    xflat = rng.standard_normal(basis.ndof)
    y = bv.to_flat(basis, op(bv.from_flat(basis, xflat)))
    yref = Ad @ xflat
    assert np.linalg.norm(y - yref) / np.linalg.norm(yref) < 1e-12


def test_matrixfree_forms_variable_coefficient():
    import jax.numpy as jnp
    m = hmesh.structured((2, 3))
    basis = DGBasis(m, np.full(m.n_elements, 2))
    kfun = lambda x: 1.0 + 0.5 * jnp.sin(x[..., 0]) * x[..., 1]  # noqa
    kfun_np = lambda x: 1.0 + 0.5 * np.sin(x[..., 0]) * x[..., 1]  # noqa
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True,
                         diffusion=kfun, dg_form="nipg", sigma1=0.5)
    Ad = bm.to_dense(A, basis)
    Aref = oracle.sipg_matrix(basis, penalty=2.0, dirichlet=True,
                              diffusion=kfun_np, dg_form="nipg",
                              sigma1=0.5)
    assert frob_close(Ad, Aref)
    op = sipg_operator(basis, penalty=2.0, dirichlet=True, diffusion=kfun,
                       dg_form="nipg", sigma1=0.5)
    rng = np.random.default_rng(1)
    xflat = rng.standard_normal(basis.ndof)
    y = bv.to_flat(basis, op(bv.from_flat(basis, xflat)))
    assert np.linalg.norm(y - Ad @ xflat) / np.linalg.norm(Ad @ xflat) \
        < 1e-12


def test_sigma1_affine_geometry_vs_oracle():
    """sigma1 on a sheared+rotated affine mesh (r4 verdict item 4:
    geometry-generic gradient jumps; variableipdg.hh:330-351 computes
    them through real per-point geometry)."""
    from hpdg_tpu.mesh import geometry as geo
    m = hmesh.structured((3, 2), upper=(1.5, 1.0))
    c, s = np.cos(0.4), np.sin(0.4)
    F = np.array([[c, -s], [s, c]]) @ np.array([[1.0, 0.3], [0.0, 1.2]])
    ms = geo.affine_image(m, F)
    basis = DGBasis(ms, np.full(ms.n_elements, 2))
    for dg_form in ("sipg", "nipg"):
        A = assemble_laplace(basis, penalty=2.0, dirichlet=True,
                             sigma1=1.5, dg_form=dg_form)
        Ad = bm.to_dense(A, basis)
        Aref = oracle.sipg_matrix(basis, penalty=2.0, dirichlet=True,
                                  sigma1=1.5, dg_form=dg_form)
        assert frob_close(Ad, Aref), dg_form
        # matrix-free apply matches the assembled operator
        op = sipg_operator(basis, penalty=2.0, dirichlet=True,
                           dg_form=dg_form, sigma1=1.5)
        rng = np.random.default_rng(2)
        xflat = rng.standard_normal(basis.ndof)
        y = bv.to_flat(basis, op(bv.from_flat(basis, xflat)))
        assert np.linalg.norm(y - Ad @ xflat) \
            / np.linalg.norm(Ad @ xflat) < 1e-12


def test_sigma1_isoparametric_and_tensor_media_vs_oracle():
    """sigma1 on a curved (trilinear/isoparametric) mesh and on a
    tensor-media box mesh — the two scopes the r4 guards rejected."""
    from hpdg_tpu.mesh import geometry as geo
    # curved: smooth non-affine warp of the unit square
    m = hmesh.structured((3, 3))
    phi = lambda x: np.stack(  # noqa: E731
        [x[..., 0] + 0.08 * np.sin(np.pi * x[..., 1]),
         x[..., 1] + 0.06 * np.sin(np.pi * x[..., 0])], axis=-1)
    ms = geo.isoparametric(m, phi)
    basis = DGBasis(ms, np.full(ms.n_elements, 2))
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True, sigma1=0.8)
    Ad = bm.to_dense(A, basis)
    Aref = oracle.sipg_matrix(basis, penalty=2.0, dirichlet=True,
                              sigma1=0.8)
    assert frob_close(Ad, Aref)
    op = sipg_operator(basis, penalty=2.0, dirichlet=True, sigma1=0.8)
    rng = np.random.default_rng(3)
    xflat = rng.standard_normal(basis.ndof)
    y = bv.to_flat(basis, op(bv.from_flat(basis, xflat)))
    assert np.linalg.norm(y - Ad @ xflat) / np.linalg.norm(Ad @ xflat) \
        < 1e-12
    # tensor media on a plain box mesh
    import jax.numpy as jnp

    def kfun(x):
        k11 = 1.0 + 0.5 * x[..., 0]
        k22 = 2.0 + 0.25 * x[..., 1]
        k12 = 0.2 + 0.0 * x[..., 0]
        row1 = jnp.stack([k11, k12], axis=-1)
        row2 = jnp.stack([k12, k22], axis=-1)
        return jnp.stack([row1, row2], axis=-2)

    m2 = hmesh.structured((2, 3), upper=(1.0, 1.5))
    basis2 = DGBasis(m2, np.full(m2.n_elements, 2))
    A2 = assemble_laplace(basis2, penalty=2.0, dirichlet=True,
                          diffusion=kfun, sigma1=1.1)
    Ad2 = bm.to_dense(A2, basis2)

    def kfun_np(x):
        return np.array([[1.0 + 0.5 * x[0], 0.2],
                         [0.2, 2.0 + 0.25 * x[1]]])

    Aref2 = oracle.sipg_matrix(basis2, penalty=2.0, dirichlet=True,
                               diffusion=kfun_np, sigma1=1.1)
    assert frob_close(Ad2, Aref2)
    op2 = sipg_operator(basis2, penalty=2.0, dirichlet=True,
                        diffusion=kfun, sigma1=1.1)
    x2 = rng.standard_normal(basis2.ndof)
    y2 = bv.to_flat(basis2, op2(bv.from_flat(basis2, x2)))
    assert np.linalg.norm(y2 - Ad2 @ x2) / np.linalg.norm(Ad2 @ x2) \
        < 1e-12
