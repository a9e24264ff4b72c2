import numpy as np
import pytest

from hpdg_tpu import quadrature


def poly_int01(k):
    return 1.0 / (k + 1)


@pytest.mark.parametrize("n", range(1, 15))
def test_gauss_legendre_exactness(n):
    x, w = quadrature.gauss_legendre(n)
    assert np.isclose(w.sum(), 1.0)
    for k in range(2 * n):  # exact to degree 2n-1
        assert np.isclose(np.sum(w * x**k), poly_int01(k), atol=1e-13), k


@pytest.mark.parametrize("n", range(2, 16))
def test_gauss_lobatto_exactness(n):
    x, w = quadrature.gauss_lobatto(n)
    assert np.isclose(x[0], 0.0) and np.isclose(x[-1], 1.0)
    assert np.all(np.diff(x) > 0)
    for k in range(2 * n - 2):  # exact to degree 2n-3
        assert np.isclose(np.sum(w * x**k), poly_int01(k), atol=1e-12), k


@pytest.mark.parametrize("n", [1, 2, 3, 5, 7, 10])
def test_gauss_kronrod_exactness(n):
    x, w = quadrature.gauss_kronrod(n)
    assert len(x) == 2 * n + 1
    # GK(2n+1) is exact at least to degree 3n+1
    for k in range(3 * n + 2):
        assert np.isclose(np.sum(w * x**k), poly_int01(k), atol=1e-11), k


def test_gauss_kronrod_nests_gauss():
    # the n Gauss points are a subset of the 2n+1 Kronrod points
    for n in [2, 3, 5]:
        xg, _ = quadrature.gauss_legendre(n)
        xk, _ = quadrature.gauss_kronrod(n)
        d = np.abs(xk[:, None] - xg[None, :]).min(axis=0)
        assert d.max() < 1e-10


def test_for_order_semantics():
    # DUNE semantics: rule exact to the requested order
    for order in range(1, 12):
        x, w = quadrature.gauss_lobatto_for_order(order)
        for k in range(order + 1):
            assert np.isclose(np.sum(w * x**k), poly_int01(k), atol=1e-12)
    # degree-p SIPG uses order 2p -> p+2 lobatto points
    for p in range(1, 8):
        x, _ = quadrature.gauss_lobatto_for_order(2 * p)
        assert len(x) == p + 2


def test_tensor_rule():
    x, w = quadrature.gauss_legendre(3)
    pts, ww = quadrature.tensor_rule(x, w, 3)
    assert pts.shape == (27, 3) and np.isclose(ww.sum(), 1.0)
    # integrate x^2 y z^3 over unit cube = 1/3 * 1/2 * 1/4
    val = np.sum(ww * pts[:, 0] ** 2 * pts[:, 1] * pts[:, 2] ** 3)
    assert np.isclose(val, 1.0 / 24)
    # last axis fastest
    assert pts[0, 2] != pts[1, 2] or len(x) == 1
    assert pts[0, 0] == pts[1, 0]
