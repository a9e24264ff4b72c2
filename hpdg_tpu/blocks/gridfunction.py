"""Discrete grid functions: point evaluation of DG fields.

Analog of the reference's gridfunctions/ layer
(discretepersistentbasisfunction.hh, simplederivative.hh): evaluate a
coefficient vector (and its gradient) at arbitrary physical points.
Host-side numpy — this is post-processing machinery, not a hot path.
"""

from __future__ import annotations

import numpy as np

from hpdg_tpu.basis import lagrange
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.linalg import blockvector as bv


def locate(mesh, pts: np.ndarray, chunk: int = 4096) -> np.ndarray:
    """Element id containing each point (ties -> lowest id; -1 if outside)."""
    pts = np.atleast_2d(np.asarray(pts, dtype=np.float64))
    out = np.full(len(pts), -1, dtype=np.int64)
    lo = mesh.lower
    hi = mesh.lower + mesh.extent
    eps = mesh.extent.min() * 1e-12
    for s in range(0, len(pts), chunk):
        P = pts[s:s + chunk]  # (m, dim)
        inside = np.all((P[:, None, :] >= lo[None] - eps)
                        & (P[:, None, :] <= hi[None] + eps), axis=2)
        hit = inside.argmax(axis=1)
        ok = inside[np.arange(len(P)), hit]
        out[s:s + chunk] = np.where(ok, hit, -1)
    return out


def evaluate(basis: DGBasis, x: dict, pts: np.ndarray,
             gradient: bool = False):
    """Values (and optionally gradients) of the DG field at the points.

    Returns (m,) values, or (values, (m, dim) gradients).
    """
    mesh = basis.mesh
    dim = mesh.dim
    pts = np.atleast_2d(np.asarray(pts, dtype=np.float64))
    elems = locate(mesh, pts)
    if (elems < 0).any():
        raise ValueError("points outside the mesh")
    flat = bv.to_flat(basis, x)
    vals = np.zeros(len(pts))
    grads = np.zeros((len(pts), dim)) if gradient else None
    # group by degree for table reuse
    for p in basis.bucket_degrees:
        sel = np.where(basis.degrees[elems] == p)[0]
        if not len(sel):
            continue
        nodes = lagrange.nodes_1d(p, basis.family)
        for k in sel:
            e = elems[k]
            h = mesh.extent[e]
            xr = (pts[k] - mesh.lower[e]) / h
            per_v = [lagrange.lagrange_values(nodes, [xr[a]])[:, 0]
                     for a in range(dim)]
            phi = per_v[0]
            for a in range(1, dim):
                phi = np.multiply.outer(phi, per_v[a]).reshape(-1)
            o = basis.offsets[e]
            c = flat[o:o + basis.block_sizes[e]]
            vals[k] = phi @ c
            if gradient:
                per_d = [lagrange.lagrange_derivatives(nodes, [xr[a]])[:, 0]
                         for a in range(dim)]
                for a in range(dim):
                    g = per_d[0] if a == 0 else per_v[0]
                    for bax in range(1, dim):
                        g = np.multiply.outer(
                            g, per_d[bax] if bax == a else per_v[bax]
                        ).reshape(-1)
                    grads[k, a] = (g @ c) / h[a]
    return (vals, grads) if gradient else vals
