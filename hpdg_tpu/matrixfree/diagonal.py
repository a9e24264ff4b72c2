"""Matrix-free diagonal-block extraction for block-Jacobi smoothing.

Rebuild of SumFactDiagonalIPDGOperator / IPDGDiagonalBlock
(matrix-free/localoperators/sfdiagonalipdg.hh, ipdgdiagonalblock.hh):
computes only the (e, e) diagonal blocks of the SIPG operator — bulk
block plus the M11/M22 face contributions — without forming the global
matrix.  Used as the ``MatrixCreator`` for matrix-free block Jacobi
(ipdgblockjacobi.hh analog, see solvers.smoothers).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from hpdg_tpu.basis import tensor
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.assemble.plan import (AssemblyPlan, build_plan,
                                    face_group_tables, penalty_coef,
                                    boundary_penalty_coef)


def _sym(M):
    return M + M.T


def sipg_diagonal_blocks(basis: DGBasis, penalty: float = 2.0,
                         dirichlet: bool = False, dtype=jnp.float64,
                         penalty_scaling: str = "measure",
                         plan: AssemblyPlan | None = None) -> dict:
    """p -> [n_p, bs, bs] diagonal blocks of the SIPG operator."""
    plan = plan or build_plan(basis)
    mesh = basis.mesh
    dim = mesh.dim
    out = {}
    for p in basis.bucket_degrees:
        vt = tensor.volume_tables(p, dim, p + 2, family=basis.family)
        G, w = vt["G"], vt["weights"]
        ext = mesh.extent[basis.bucket_elems[p]]
        detJ = np.prod(ext, axis=1)
        invh2 = detJ[:, None] / ext**2
        S = np.einsum("q,aiq,ajq->aij", w, G, G)
        out[p] = jnp.einsum("ea,aij->eij", jnp.asarray(invh2, dtype),
                            jnp.asarray(S, dtype))

    for fg in plan.face_groups:
        pmax = max(fg.p_in, fg.p_out)
        fin, fout = face_group_tables(basis, fg, pmax + 2)
        w = fin["weights"]
        pen = jnp.asarray(penalty_coef(fg, penalty, pmax, penalty_scaling),
                          dtype)[:, None, None]
        AVDi = np.einsum("iq,q,jq->ij", fin["V"], w, fin["Dn"])
        BVVi = np.einsum("iq,q,jq->ij", fin["V"], w, fin["V"])
        AVDo = np.einsum("iq,q,jq->ij", fout["V"], w, fout["Dn"])
        BVVo = np.einsum("iq,q,jq->ij", fout["V"], w, fout["V"])
        c_in = jnp.asarray(-0.5 * fg.fmeas * fg.inv_h_in, dtype)
        c_out = jnp.asarray(-0.5 * fg.fmeas * fg.inv_h_out, dtype)
        M11 = c_in[:, None, None] * jnp.asarray(_sym(AVDi), dtype) \
            + pen * jnp.asarray(BVVi, dtype)[None]
        M22 = -c_out[:, None, None] * jnp.asarray(_sym(AVDo), dtype) \
            + pen * jnp.asarray(BVVo, dtype)[None]
        out[fg.p_in] = out[fg.p_in].at[jnp.asarray(fg.in_pos)].add(M11)
        out[fg.p_out] = out[fg.p_out].at[jnp.asarray(fg.out_pos)].add(M22)

    if dirichlet:
        for bg in plan.boundary_groups:
            ft = tensor.face_tables(bg.p, dim, bg.axis, bg.side, bg.p + 2,
                                    family=basis.family)
            w = ft["weights"]
            sign = 1.0 if bg.side == 1 else -1.0
            AVD = np.einsum("iq,q,jq->ij", ft["V"], w, ft["Dn"])
            BVV = np.einsum("iq,q,jq->ij", ft["V"], w, ft["V"])
            c = jnp.asarray(-sign * bg.fmeas * bg.inv_h, dtype)
            penb = jnp.asarray(
                boundary_penalty_coef(bg, penalty, penalty_scaling),
                dtype)[:, None, None]
            M = c[:, None, None] * jnp.asarray(_sym(AVD), dtype) \
                + penb * jnp.asarray(BVV, dtype)[None]
            out[bg.p] = out[bg.p].at[jnp.asarray(bg.pos)].add(M)
    return out
