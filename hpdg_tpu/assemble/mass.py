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
        detJ = jnp.asarray(np.prod(ext, axis=1)
                           * geo.detj_phys(mesh, elems), dtype)
        if weight is None:
            M0 = jnp.asarray(np.einsum("iq,q,jq->ij", V, w, V), dtype)
            blocks = detJ[:, None, None] * M0[None]
        else:
            x = (mesh.lower[elems][:, None, :]
                 + vt["points"][None, :, :] * ext[:, None, :])
            x = geo.apply_map(mesh, elems, x)
            k = jnp.asarray(weight(jnp.asarray(x, dtype)), dtype)
            kw = k * jnp.asarray(w, dtype)[None, :] * detJ[:, None]
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
        detJ = np.prod(basis.mesh.extent[elems], axis=1)
        out[p] = jnp.asarray(detJ[:, None] * wloc[None, :], dtype)
    return out
