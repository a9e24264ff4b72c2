"""Batched (weighted) mass matrix assembly.

Analog of BuildingBlocks::mass (buildingblocks/matrices.hh:180-266) and
the lumped Gauss-Lobatto collocation mass (assemblers/lumpedmass.hh).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from hpdg_tpu.basis import tensor
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.assemble.plan import AssemblyPlan
from hpdg_tpu.linalg.blockmatrix import BlockSparseMatrix, BlockPattern, zeros_values


def blockdiag_pattern(basis: DGBasis) -> BlockPattern:
    sizes = {p: basis.bucket_size(p) for p in basis.bucket_degrees}
    entries = {
        (p, p): (np.arange(n, dtype=np.int32), np.arange(n, dtype=np.int32))
        for p, n in sizes.items()
    }
    return BlockPattern(sizes, sizes, entries)


def assemble_mass(basis: DGBasis, weight=None, quad_order=None,
                  dtype=jnp.float64, plan: AssemblyPlan | None = None
                  ) -> BlockSparseMatrix:
    """Block-diagonal (weighted) mass matrix.

    If ``plan`` is given, the mass blocks are placed in the plan's full
    skeleton pattern (zero off-diagonal blocks) so the result can be
    added to a stiffness matrix — the reference's
    ``mass(basis, ..., skeletonPattern=true)`` variant
    (buildingblocks/matrices.hh:219-266).
    """
    mesh = basis.mesh
    dim = mesh.dim
    pattern = plan.pattern if plan is not None else blockdiag_pattern(basis)
    vals = zeros_values(pattern, dim, dtype=dtype)
    for p in basis.bucket_degrees:
        order = quad_order if quad_order is not None else 2 * p
        nq1 = max(2, -(-(order + 3) // 2))
        vt = tensor.volume_tables(p, dim, nq1, family=basis.family)
        V, w = vt["V"], vt["weights"]
        elems = basis.bucket_elems[p]
        ext = mesh.extent[elems]
        from hpdg_tpu.mesh import geometry as geo
        detp = np.prod(ext, axis=1)
        xp = (mesh.lower[elems][:, None, :]
              + vt["points"][None, :, :] * ext[:, None, :])
        if geo.is_trilinear(mesh):
            # per-point physical volume element
            detq = jnp.asarray(detp[:, None]
                               * geo.detj_phys(mesh, elems, xp), dtype)
        else:
            detq = jnp.asarray((detp * geo.detj_phys(mesh, elems))[:, None],
                               dtype)
        if weight is None and not geo.is_trilinear(mesh):
            M0 = jnp.asarray(np.einsum("iq,q,jq->ij", V, w, V), dtype)
            blocks = detq[:, :1, None] * M0[None]
        else:
            x = geo.apply_map(mesh, elems, xp)
            k = (jnp.asarray(weight(jnp.asarray(x, dtype)), dtype)
                 if weight is not None else 1.0)
            kw = k * jnp.asarray(w, dtype)[None, :] * detq
            blocks = jnp.einsum("eq,iq,jq->eij", kw, jnp.asarray(V, dtype),
                                jnp.asarray(V, dtype))
        n = basis.bucket_size(p)
        vals[(p, p)] = vals[(p, p)].at[:n].add(blocks)
    return BlockSparseMatrix(pattern, dim, vals)


def lumped_mass(basis: DGBasis, dtype=jnp.float64) -> dict:
    """Diagonal Gauss-Lobatto collocation mass vector (lumpedmass.hh analog).

    Uses the (p+1)-point GL rule collocated with the nodal basis, so the
    mass matrix is exactly diagonal: m_i = detJ * prod_a w_{i_a}.
    Returns a bucketed block vector.
    """
    out = {}
    for p in basis.bucket_degrees:
        from hpdg_tpu import quadrature
        if basis.family != "lobatto":
            raise NotImplementedError("lumped mass needs collocation nodes")
        _, w1 = quadrature.gauss_lobatto(p + 1)
        mi = tensor.multiindices(p, basis.dim)
        wloc = np.prod(w1[mi], axis=1)  # (nl,)
        elems = basis.bucket_elems[p]
        mesh = basis.mesh
        detJ = np.prod(mesh.extent[elems], axis=1)[:, None]  # (n, 1)
        from hpdg_tpu.mesh import geometry as geo
        if geo.has_geometry(mesh):
            # collocation keeps the mass exactly diagonal for general
            # geometry too: m_i = w_i |det J(node_i)| detJ_param
            nodes, _ = quadrature.gauss_lobatto(p + 1)
            xp = (mesh.lower[elems][:, None, :]
                  + nodes[mi][None, :, :] * mesh.extent[elems][:, None, :])
            detJ = detJ * geo.detj_phys(mesh, elems, xp)  # (n, nl)
        out[p] = jnp.asarray(detJ * wloc[None, :], dtype)
    return out
