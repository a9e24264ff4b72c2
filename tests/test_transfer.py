"""Transfer operators: p/h prolongation exactness and Galerkin products."""

import numpy as np
import jax.numpy as jnp

from hpdg_tpu import mesh as hmesh
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.basis import lagrange, tensor
from hpdg_tpu.assemble import assemble_laplace
from hpdg_tpu.linalg import blockmatrix as bm, blockvector as bv
from hpdg_tpu.transfer import p_transfer, h_transfer


def interp(basis, f):
    """Nodal interpolation of f into the basis (bucketed)."""
    out = {}
    for p in basis.bucket_degrees:
        pos = basis.node_positions(p)
        out[p] = jnp.asarray(f(pos))
    return out


def test_p_prolong_exact_on_coarse_polynomials():
    m = hmesh.structured((2, 2))
    basis = DGBasis(m, np.array([4, 2, 3, 4]))
    T = p_transfer(basis, 2)
    assert tuple(T.coarse.degrees) == (2, 2, 2, 2)
    f = lambda x: (x[..., 0] - 0.3) ** 2 + x[..., 0] * x[..., 1]
    xc = interp(T.coarse, f)
    xf = T.prolong(xc)
    xf_ref = interp(basis, f)
    assert np.allclose(bv.to_flat(basis, xf), bv.to_flat(basis, xf_ref),
                       atol=1e-12)


def test_h_prolong_exact():
    mc = hmesh.structured((2, 2))
    mf = hmesh.refine(mc)
    fine = DGBasis(mf, np.full(16, 2))
    coarse = DGBasis(mc, np.full(4, 2))
    T = h_transfer(fine, coarse)
    f = lambda x: x[..., 0] ** 2 - 0.5 * x[..., 0] * x[..., 1] + x[..., 1]
    xc = interp(coarse, f)
    xf = T.prolong(xc)
    xf_ref = interp(fine, f)
    assert np.allclose(bv.to_flat(fine, xf), bv.to_flat(fine, xf_ref),
                       atol=1e-12)


def test_restrict_is_transpose_of_prolong():
    m = hmesh.structured((3, 3))
    basis = DGBasis(m, np.array([2, 4, 3, 2, 4, 2, 3, 2, 4]))
    T = p_transfer(basis, 2)
    xc = bv.random(T.coarse, seed=11)
    yf = bv.random(basis, seed=22)
    # <P xc, yf> == <xc, R yf>
    lhs = float(bv.dot(T.prolong(xc), yf))
    rhs = float(bv.dot(xc, T.restrict(yf)))
    assert np.isclose(lhs, rhs, rtol=1e-13)


def test_h_restrict_transpose():
    mc = hmesh.structured((2, 2))
    mf = hmesh.refine(mc)
    fine = DGBasis(mf, np.full(16, 1))
    coarse = DGBasis(mc, np.full(4, 1))
    T = h_transfer(fine, coarse)
    xc = bv.random(coarse, seed=1)
    yf = bv.random(fine, seed=2)
    assert np.isclose(float(bv.dot(T.prolong(xc), yf)),
                      float(bv.dot(xc, T.restrict(yf))), rtol=1e-13)


def _dense_transfer(T):
    """Dense prolongation matrix (fine.ndof x coarse.ndof) for oracle."""
    P = np.zeros((T.fine.ndof, T.coarse.ndof))
    for g in T.groups:
        fels = T.fine.bucket_elems[g.pf][g.fine_pos]
        cels = T.coarse.bucket_elems[g.pc][g.coarse_pos]
        for fe, ce in zip(fels, cels):
            fo, co = T.fine.offsets[fe], T.coarse.offsets[ce]
            P[fo:fo + g.T.shape[0], co:co + g.T.shape[1]] = g.T
    return P


def test_galerkin_p():
    m = hmesh.structured((3, 2))
    basis = DGBasis(m, np.array([4, 2, 3, 2, 4, 3]))
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True)
    T = p_transfer(basis, 2)
    Ac = T.galerkin(A)
    P = _dense_transfer(T)
    Ad = bm.to_dense(A, basis)
    Acd = bm.to_dense(Ac, T.coarse)
    assert np.allclose(Acd, P.T @ Ad @ P, atol=1e-11)


def test_galerkin_h():
    mc = hmesh.structured((2, 2))
    mf = hmesh.refine(mc)
    fine = DGBasis(mf, np.full(16, 1))
    coarse = DGBasis(mc, np.full(4, 1))
    A = assemble_laplace(fine, penalty=2.0, dirichlet=True)
    T = h_transfer(fine, coarse)
    Ac = T.galerkin(A)
    P = _dense_transfer(T)
    assert np.allclose(bm.to_dense(Ac, coarse),
                       P.T @ bm.to_dense(A, fine) @ P, atol=1e-11)
