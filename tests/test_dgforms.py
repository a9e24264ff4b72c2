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


def test_sigma1_rejected_on_curved_meshes():
    from hpdg_tpu.mesh import geometry as geo
    m = hmesh.structured((2, 2))
    F = np.array([[1.0, 0.3], [0.0, 1.0]])
    ms = geo.affine_image(m, F)
    basis = DGBasis(ms, np.full(ms.n_elements, 2))
    with pytest.raises(NotImplementedError):
        assemble_laplace(basis, penalty=2.0, dirichlet=True, sigma1=1.0)
