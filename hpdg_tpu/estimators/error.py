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


def _param_points(basis: DGBasis, p: int, pts: np.ndarray) -> np.ndarray:
    elems = basis.bucket_elems[p]
    mesh = basis.mesh
    return (mesh.lower[elems][:, None, :]
            + pts[None, :, :] * mesh.extent[elems][:, None, :])


def _phys_points(basis: DGBasis, p: int, pts: np.ndarray) -> np.ndarray:
    from hpdg_tpu.mesh import geometry as geo
    xp = _param_points(basis, p, pts)
    return geo.apply_map(basis.mesh, basis.bucket_elems[p], xp)


def _detq(basis: DGBasis, p: int, pts: np.ndarray) -> np.ndarray:
    """(n, q) physical volume element / parametric weight factor."""
    from hpdg_tpu.mesh import geometry as geo
    mesh = basis.mesh
    elems = basis.bucket_elems[p]
    detp = np.prod(mesh.extent[elems], axis=1)
    if not geo.has_geometry(mesh):
        return np.broadcast_to(detp[:, None], (len(elems), len(pts)))
    xp = _param_points(basis, p, pts)
    return detp[:, None] * geo.detj_phys(mesh, elems, xp)


def l2_error(basis: DGBasis, x: dict, u_exact, quad_inc: int = 3):
    """sqrt(∫ (u_h - u)^2); u_exact vectorized on (..., dim) PHYSICAL
    points — geometry-aware (affine / trilinear meshes)."""
    total = 0.0
    for p in basis.bucket_degrees:
        vt = tensor.volume_tables(p, basis.dim, p + 1 + quad_inc,
                                  family=basis.family, quad_family="legendre")
        V, w = jnp.asarray(vt["V"]), jnp.asarray(vt["weights"])
        xq = _phys_points(basis, p, vt["points"])
        uh = jnp.einsum("ei,iq->eq", x[p], V)
        uu = u_exact(jnp.asarray(xq))
        detq = jnp.asarray(_detq(basis, p, vt["points"]))
        total = total + jnp.sum(detq * w[None, :] * (uh - uu) ** 2)
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
        # physical gradient: (1/h_a) * reference dphi_a (times J^-1 for
        # curved meshes)
        gh = jnp.einsum("ei,aiq->eqa", x[p], G) / jnp.asarray(ext)[:, None, :]
        from hpdg_tpu.mesh import geometry as geo
        if geo.has_geometry(mesh):
            xp = _param_points(basis, p, vt["points"])
            Ji = np.linalg.inv(geo.jacobians(mesh, elems, xp))
            gh = jnp.einsum("eqb,eqba->eqa", gh, jnp.asarray(Ji))
        gu = grad_exact(jnp.asarray(xq))
        detq = jnp.asarray(_detq(basis, p, vt["points"]))
        total = total + jnp.sum(
            detq * w[None, :] * jnp.sum((gh - gu) ** 2, axis=-1))
    return jnp.sqrt(total)
