import numpy as np
import pytest

from hpdg_tpu import quadrature
from hpdg_tpu.basis import lagrange, legendre, tensor


@pytest.mark.parametrize("family", ["lobatto", "legendre"])
@pytest.mark.parametrize("p", [1, 2, 3, 4, 7, 10])
def test_lagrange_cardinal(p, family):
    nodes = lagrange.nodes_1d(p, family)
    V = lagrange.lagrange_values(nodes, nodes)
    assert np.allclose(V, np.eye(p + 1), atol=1e-12)


@pytest.mark.parametrize("p", [1, 2, 3, 5, 8, 12])
def test_lagrange_partition_of_unity_and_poly_reproduction(p):
    nodes = lagrange.nodes_1d(p)
    x = np.linspace(0, 1, 37)
    V = lagrange.lagrange_values(nodes, x)
    assert np.allclose(V.sum(axis=0), 1.0, atol=1e-12)
    # reproduce x^k exactly for k <= p
    for k in range(p + 1):
        approx = (nodes**k) @ V
        assert np.allclose(approx, x**k, atol=1e-10), k


@pytest.mark.parametrize("p", [1, 2, 3, 5, 8])
def test_lagrange_derivatives(p):
    nodes = lagrange.nodes_1d(p)
    x = np.concatenate([np.linspace(0, 1, 23), nodes])  # incl. node hits
    D = lagrange.lagrange_derivatives(nodes, x)
    assert np.allclose(D.sum(axis=0), 0.0, atol=1e-10)
    for k in range(1, p + 1):
        approx = (nodes**k) @ D
        assert np.allclose(approx, k * x ** (k - 1), atol=1e-9), k


def test_tables_endpoints():
    t = lagrange.tables(3, 5)
    assert np.allclose(t.at0, lagrange.lagrange_values(lagrange.nodes_1d(3), [0.0])[:, 0])
    # lobatto nodes include endpoints -> trace is an indicator vector
    assert np.allclose(t.at0, [1, 0, 0, 0], atol=1e-13)
    assert np.allclose(t.at1, [0, 0, 0, 1], atol=1e-13)


def test_legendre_orthonormal():
    p = 6
    x, w = quadrature.gauss_legendre(p + 1)
    V = legendre.legendre_values(p, x)
    gram = (V * w[None, :]) @ V.T
    assert np.allclose(gram, np.eye(p + 1), atol=1e-12)


def test_modal_projection():
    p = 5
    M, qn = legendre.modal_projection_matrix(p)
    # project P~_3 -> e_3
    f = legendre.legendre_values(p, qn)[3]
    c = M @ f
    e = np.zeros(p + 1)
    e[3] = 1
    assert np.allclose(c, e, atol=1e-12)


def test_volume_tables_2d():
    vt = tensor.volume_tables(2, 2, 4)
    nl, nq = vt["V"].shape
    assert nl == 9 and nq == 16
    # partition of unity & gradient consistency with FD
    assert np.allclose(vt["V"].sum(axis=0), 1.0, atol=1e-12)
    # integrate grad phi_i . grad phi_j sum over i = 0
    K = np.einsum("q,aiq,ajq->ij", vt["weights"], vt["G"], vt["G"])
    assert np.allclose(K.sum(axis=0), 0.0, atol=1e-11)
    assert np.allclose(K, K.T, atol=1e-13)


def test_face_tables_vs_volume():
    # trace of basis on face x_0 = 1 in 2D equals volume eval at (1, t)
    p, nq1 = 3, 5
    ft = tensor.face_tables(p, 2, axis=0, side=1, nq1=nq1)
    nodes = lagrange.nodes_1d(p)
    mi = tensor.multiindices(p, 2)
    for q, tpt in enumerate(ft["points"]):
        for i, (i0, i1) in enumerate(mi):
            v = (lagrange.lagrange_values(nodes, [1.0])[i0, 0]
                 * lagrange.lagrange_values(nodes, [tpt[0]])[i1, 0])
            assert np.isclose(ft["V"][i, q], v, atol=1e-12)
            dv = (lagrange.lagrange_derivatives(nodes, [1.0])[i0, 0]
                  * lagrange.lagrange_values(nodes, [tpt[0]])[i1, 0])
            assert np.isclose(ft["Dn"][i, q], dv, atol=1e-12)


def test_interpolation_matrix():
    # degree-2 function interpolated into degree-4 basis is exact
    T = tensor.interpolation_matrix(2, 4, 2)
    assert T.shape == (25, 9)
    nodes2 = lagrange.nodes_1d(2)
    nodes4 = lagrange.nodes_1d(4)
    mi2 = tensor.multiindices(2, 2)
    mi4 = tensor.multiindices(4, 2)
    f = lambda x, y: (2 * x - 1) ** 2 * (y + 0.5)  # bi-quadratic
    c2 = np.array([f(nodes2[i], nodes2[j]) for i, j in mi2])
    c4 = np.array([f(nodes4[i], nodes4[j]) for i, j in mi4])
    assert np.allclose(T @ c2, c4, atol=1e-12)
