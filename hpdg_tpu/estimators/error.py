"""Discretization-error norms against a known exact solution.

Analog of the dune-fufem DiscretizationError utilities exercised by
test_discretizationerror.cc in the reference: batched quadrature of
``||u_h - u||`` per element, summed globally.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from hpdg_tpu.basis import tensor
from hpdg_tpu.basis.dgbasis import DGBasis


def _phys_points(basis: DGBasis, p: int, pts: np.ndarray) -> np.ndarray:
    elems = basis.bucket_elems[p]
    mesh = basis.mesh
    return (mesh.lower[elems][:, None, :]
            + pts[None, :, :] * mesh.extent[elems][:, None, :])


def l2_error(basis: DGBasis, x: dict, u_exact, quad_inc: int = 3):
    """sqrt(∫ (u_h - u)^2); u_exact vectorized on (..., dim) points."""
    total = 0.0
    for p in basis.bucket_degrees:
        vt = tensor.volume_tables(p, basis.dim, p + 1 + quad_inc,
                                  family=basis.family, quad_family="legendre")
        V, w = jnp.asarray(vt["V"]), jnp.asarray(vt["weights"])
        xq = _phys_points(basis, p, vt["points"])
        uh = jnp.einsum("ei,iq->eq", x[p], V)
        uu = u_exact(jnp.asarray(xq))
        detJ = jnp.asarray(np.prod(basis.mesh.extent[basis.bucket_elems[p]], axis=1))
        total = total + jnp.sum(detJ[:, None] * w[None, :] * (uh - uu) ** 2)
    return jnp.sqrt(total)


def h1_seminorm_error(basis: DGBasis, x: dict, grad_exact, quad_inc: int = 3):
    """sqrt(Σ_E ∫_E |∇u_h - ∇u|²) (broken H1 seminorm).

    grad_exact: vectorized callable (..., dim) -> (..., dim).
    """
    total = 0.0
    mesh = basis.mesh
    for p in basis.bucket_degrees:
        vt = tensor.volume_tables(p, basis.dim, p + 1 + quad_inc,
                                  family=basis.family, quad_family="legendre")
        G, w = jnp.asarray(vt["G"]), jnp.asarray(vt["weights"])
        elems = basis.bucket_elems[p]
        ext = mesh.extent[elems]
        xq = _phys_points(basis, p, vt["points"])
        # physical gradient: (1/h_a) * reference dphi_a
        gh = jnp.einsum("ei,aiq->eqa", x[p], G) / jnp.asarray(ext)[:, None, :]
        gu = grad_exact(jnp.asarray(xq))
        detJ = jnp.asarray(np.prod(ext, axis=1))
        total = total + jnp.sum(
            detJ[:, None] * w[None, :] * jnp.sum((gh - gu) ** 2, axis=-1))
    return jnp.sqrt(total)
