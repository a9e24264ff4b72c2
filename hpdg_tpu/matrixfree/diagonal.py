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
                                    face_group_tables, face_phys_points,
                                    penalty_coef, boundary_penalty_coef)


def _sym(M):
    return M + M.T


def sipg_diagonal_blocks(basis: DGBasis, penalty: float = 2.0,
                         dirichlet: bool = False, dtype=jnp.float64,
                         penalty_scaling: str = "measure",
                         diffusion=None,
                         plan: AssemblyPlan | None = None) -> dict:
    """p -> [n_p, bs, bs] diagonal blocks of the SIPG operator.

    ``diffusion``: optional scalar coefficient K(x) (vectorized on
    physical points) — the coefficient variant of the diagonal-block
    factory (weightedheatdiagonalblock.hh / ipdgcoefficientoperator.hh
    scope)."""
    plan = plan or build_plan(basis)
    mesh = basis.mesh
    dim = mesh.dim
    out = {}
    for p in basis.bucket_degrees:
        vt = tensor.volume_tables(p, dim, p + 2, family=basis.family)
        G, w = vt["G"], vt["weights"]
        elems = basis.bucket_elems[p]
        ext = mesh.extent[elems]
        detJ = np.prod(ext, axis=1)
        invh2 = detJ[:, None] / ext**2
        if diffusion is None:
            S = np.einsum("q,aiq,ajq->aij", w, G, G)
            out[p] = jnp.einsum("ea,aij->eij", jnp.asarray(invh2, dtype),
                                jnp.asarray(S, dtype))
        else:
            x = (mesh.lower[elems][:, None, :]
                 + vt["points"][None, :, :] * ext[:, None, :])
            k = jnp.asarray(diffusion(jnp.asarray(x, dtype)), dtype)
            kw = k * jnp.asarray(w, dtype)[None, :]
            out[p] = jnp.einsum("eq,ea,aiq,ajq->eij", kw,
                                jnp.asarray(invh2, dtype),
                                jnp.asarray(G, dtype), jnp.asarray(G, dtype))

    for fg in plan.face_groups:
        pmax = max(fg.p_in, fg.p_out)
        fin, fout = face_group_tables(basis, fg, pmax + 2)
        w = fin["weights"]
        pen = jnp.asarray(penalty_coef(fg, penalty, pmax, penalty_scaling),
                          dtype)[:, None, None]
        c_in = jnp.asarray(-0.5 * fg.fmeas * fg.inv_h_in, dtype)
        c_out = jnp.asarray(-0.5 * fg.fmeas * fg.inv_h_out, dtype)
        if diffusion is None:
            AVDi = np.einsum("iq,q,jq->ij", fin["V"], w, fin["Dn"])
            BVVi = np.einsum("iq,q,jq->ij", fin["V"], w, fin["V"])
            AVDo = np.einsum("iq,q,jq->ij", fout["V"], w, fout["Dn"])
            BVVo = np.einsum("iq,q,jq->ij", fout["V"], w, fout["V"])
            M11 = c_in[:, None, None] * jnp.asarray(_sym(AVDi), dtype) \
                + pen * jnp.asarray(BVVi, dtype)[None]
            M22 = -c_out[:, None, None] * jnp.asarray(_sym(AVDo), dtype) \
                + pen * jnp.asarray(BVVo, dtype)[None]
        else:
            x = face_phys_points(basis, fg, fin["points"])
            k = jnp.asarray(diffusion(jnp.asarray(x, dtype)), dtype)
            wj = jnp.asarray(w, dtype)
            kzi = k * wj[None, :] * c_in[:, None]
            kzo = k * wj[None, :] * c_out[:, None]
            J = lambda a: jnp.asarray(a, dtype)  # noqa: E731
            M11 = (jnp.einsum("fq,iq,jq->fij", kzi, J(fin["V"]), J(fin["Dn"]))
                   + jnp.einsum("fq,iq,jq->fij", kzi, J(fin["Dn"]),
                                J(fin["V"]))
                   + pen * J(np.einsum("iq,q,jq->ij", fin["V"], w,
                                       fin["V"]))[None])
            M22 = (-jnp.einsum("fq,iq,jq->fij", kzo, J(fout["V"]),
                               J(fout["Dn"]))
                   - jnp.einsum("fq,iq,jq->fij", kzo, J(fout["Dn"]),
                                J(fout["V"]))
                   + pen * J(np.einsum("iq,q,jq->ij", fout["V"], w,
                                       fout["V"]))[None])
        out[fg.p_in] = out[fg.p_in].at[jnp.asarray(fg.in_pos)].add(M11)
        out[fg.p_out] = out[fg.p_out].at[jnp.asarray(fg.out_pos)].add(M22)

    if dirichlet:
        for bg in plan.boundary_groups:
            ft = tensor.face_tables(bg.p, dim, bg.axis, bg.side, bg.p + 2,
                                    family=basis.family)
            w = ft["weights"]
            sign = 1.0 if bg.side == 1 else -1.0
            c = jnp.asarray(-sign * bg.fmeas * bg.inv_h, dtype)
            penb = jnp.asarray(
                boundary_penalty_coef(bg, penalty, penalty_scaling),
                dtype)[:, None, None]
            if diffusion is None:
                AVD = np.einsum("iq,q,jq->ij", ft["V"], w, ft["Dn"])
                BVV = np.einsum("iq,q,jq->ij", ft["V"], w, ft["V"])
                M = c[:, None, None] * jnp.asarray(_sym(AVD), dtype) \
                    + penb * jnp.asarray(BVV, dtype)[None]
            else:
                elems = basis.mesh.bfaces.elem[bg.face_ids]
                lo = basis.mesh.lower[elems].copy()
                if bg.side == 1:
                    lo[:, bg.axis] += basis.mesh.extent[elems, bg.axis]
                tang = [a for a in range(dim) if a != bg.axis]
                x = np.repeat(lo[:, None, :], len(w), axis=1)
                for t, a in enumerate(tang):
                    x[:, :, a] += (ft["points"][None, :, t]
                                   * basis.mesh.extent[elems, a][:, None])
                k = jnp.asarray(diffusion(jnp.asarray(x, dtype)), dtype)
                kz = k * jnp.asarray(w, dtype)[None, :] * c[:, None]
                J = lambda a: jnp.asarray(a, dtype)  # noqa: E731
                M = (jnp.einsum("fq,iq,jq->fij", kz, J(ft["V"]), J(ft["Dn"]))
                     + jnp.einsum("fq,iq,jq->fij", kz, J(ft["Dn"]),
                                  J(ft["V"]))
                     + penb * J(np.einsum("iq,q,jq->ij", ft["V"], w,
                                          ft["V"]))[None])
            out[bg.p] = out[bg.p].at[jnp.asarray(bg.pos)].add(M)
    return out
