"""Legendre-decay hp smoothness indicator.

Rebuild of SmoothnessIndicator (estimators/smoothnessindicator.hh:12-71),
after Houston & Süli: expand each element's local solution in the
L2-orthonormal Legendre modal basis, fit the slope m of log|c_k| against
|k|_1 by least squares, and return e^{-m}.  Small values mean fast modal
decay = smooth solution = raise p; large values mean refine h.

Fully batched per degree bucket (the reference does one virtual FE
interpolation per element).
"""

from __future__ import annotations

import numpy as np

from hpdg_tpu import quadrature
from hpdg_tpu.basis import legendre, lagrange, tensor
from hpdg_tpu.basis.dgbasis import DGBasis


def smoothness_indicator(basis: DGBasis, x: dict) -> np.ndarray:
    """Per-element indicator e^{-m} (flat element order)."""
    mesh = basis.mesh
    dim = mesh.dim
    out = np.zeros(mesh.n_elements)
    for p in basis.bucket_degrees:
        # evaluate u_h at a Gauss-Legendre tensor rule exact to 2p
        qn, qw = quadrature.gauss_legendre(p + 1)
        nodes = lagrange.nodes_1d(p, basis.family)
        V1 = lagrange.lagrange_values(nodes, qn)  # (p+1, q)
        L1 = legendre.legendre_values(p, qn) * qw[None, :]  # modal proj 1D
        # modal coeffs: tensor product of 1D projections applied to nodal V
        # C[k, i] = ∫ P~_k phi_i  (1D);  per dim then tensorized
        C1 = L1 @ V1.T  # (p+1 modal, p+1 nodal)
        C = C1
        for _ in range(dim - 1):
            C = np.kron(C, C1)
        coeffs = np.asarray(x[p]) @ C.T  # (n, n_local) modal coefficients
        mi = tensor.multiindices(p, dim)
        deg = mi.sum(axis=1).astype(np.float64)  # |k|_1
        # reference semantics (smoothnessindicator.hh:28-41): fit
        # y = |log|c||  against |k|_1 over ALL indices; return e^{-slope};
        # NaN slope (e.g. from zero coefficients) counts as smooth -> 0.
        with np.errstate(divide="ignore"):
            y = np.abs(np.log(np.abs(coeffs)))
        dbar = deg.mean()
        denom = ((deg - dbar) ** 2).sum()
        with np.errstate(invalid="ignore"):
            slope = ((y - y.mean(axis=1, keepdims=True))
                     @ (deg - dbar)) / denom
            ind = np.exp(-slope)
        ind = np.where(np.isnan(slope), 0.0, ind)
        out[basis.bucket_elems[p]] = ind
    return out
