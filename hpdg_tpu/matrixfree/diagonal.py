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

    ``diffusion``: optional coefficient K(x) (vectorized on physical
    points), scalar or symmetric (dim, dim) TENSOR per point — the
    coefficient variant of the diagonal-block factory
    (weightedheatdiagonalblock.hh / ipdgcoefficientoperator.hh scope,
    tensor media as in gausslobattoipdgcoefficientassembler.hh:31)."""
    from hpdg_tpu.matrixfree.sumfact import _is_tensor_coefficient
    from hpdg_tpu.mesh import geometry as geo
    plan = plan or build_plan(basis)
    mesh = basis.mesh
    dim = mesh.dim
    affine = geo.has_affine(mesh)
    kmat = _is_tensor_coefficient(diffusion, dim, dtype) or affine
    out = {}
    for p in basis.bucket_degrees:
        vt = tensor.volume_tables(p, dim, p + 2, family=basis.family)
        G, w = vt["G"], vt["weights"]
        elems = basis.bucket_elems[p]
        ext = mesh.extent[elems]
        detJ = np.prod(ext, axis=1)
        invh2 = detJ[:, None] / ext**2
        if diffusion is None and not affine:
            S = np.einsum("q,aiq,ajq->aij", w, G, G)
            out[p] = jnp.einsum("ea,aij->eij", jnp.asarray(invh2, dtype),
                                jnp.asarray(S, dtype))
        else:
            x = (mesh.lower[elems][:, None, :]
                 + vt["points"][None, :, :] * ext[:, None, :])
            x = geo.apply_map(mesh, elems, x)
            k = (jnp.asarray(diffusion(jnp.asarray(x, dtype)), dtype)
                 if diffusion is not None else None)
            if affine:
                k = jnp.asarray(geo.effective_tensor(mesh, elems, k,
                                                     x.shape[1]), dtype)
            if kmat:
                # (K grad u, grad v): sum_ab detJ w K_ab h_a^-1 h_b^-1
                kw = (k * jnp.asarray(w, dtype)[None, :, None, None]
                      * jnp.asarray(detJ, dtype)[:, None, None, None])
                invh = jnp.asarray(1.0 / ext, dtype)
                out[p] = jnp.einsum("eqab,ea,eb,aiq,bjq->eij", kw, invh,
                                    invh, jnp.asarray(G, dtype),
                                    jnp.asarray(G, dtype))
            else:
                kw = k * jnp.asarray(w, dtype)[None, :]
                out[p] = jnp.einsum("eq,ea,aiq,ajq->eij", kw,
                                    jnp.asarray(invh2, dtype),
                                    jnp.asarray(G, dtype),
                                    jnp.asarray(G, dtype))

    for fg in plan.face_groups:
        pmax = max(fg.p_in, fg.p_out)
        fin, fout = face_group_tables(basis, fg, pmax + 2)
        w = fin["weights"]
        pen = jnp.asarray(
            geo.penalty_coef_mesh(mesh, fg, penalty, pmax, penalty_scaling)
            if affine else
            penalty_coef(fg, penalty, pmax, penalty_scaling),
            dtype)[:, None, None]
        c_in = jnp.asarray(-0.5 * fg.fmeas * fg.inv_h_in, dtype)
        c_out = jnp.asarray(-0.5 * fg.fmeas * fg.inv_h_out, dtype)
        if diffusion is None and not affine:
            AVDi = np.einsum("iq,q,jq->ij", fin["V"], w, fin["Dn"])
            BVVi = np.einsum("iq,q,jq->ij", fin["V"], w, fin["V"])
            AVDo = np.einsum("iq,q,jq->ij", fout["V"], w, fout["Dn"])
            BVVo = np.einsum("iq,q,jq->ij", fout["V"], w, fout["V"])
            M11 = c_in[:, None, None] * jnp.asarray(_sym(AVDi), dtype) \
                + pen * jnp.asarray(BVVi, dtype)[None]
            M22 = -c_out[:, None, None] * jnp.asarray(_sym(AVDo), dtype) \
                + pen * jnp.asarray(BVVo, dtype)[None]
        elif kmat:
            # co-normal consistency: n.K grad u = sum_b K_{axis,b}/h_b d_b u
            ein = mesh.faces.inside[fg.face_ids]
            eout = mesh.faces.outside[fg.face_ids]
            x = geo.apply_map(mesh, ein,
                              face_phys_points(basis, fg, fin["points"]))
            k = (jnp.asarray(diffusion(jnp.asarray(x, dtype)), dtype)
                 if diffusion is not None else None)
            if affine:
                k_in = jnp.asarray(geo.effective_tensor(mesh, ein, k,
                                                        x.shape[1]), dtype)
                k_out = jnp.asarray(geo.effective_tensor(mesh, eout, k,
                                                         x.shape[1]), dtype)
            else:
                k_in = k_out = k
            Ka = k_in[..., fg.axis, :]                   # (nf, q, dim)
            Kao = k_out[..., fg.axis, :]
            ihi = jnp.asarray(1.0 / mesh.extent[ein], dtype)
            iho = jnp.asarray(1.0 / mesh.extent[eout], dtype)
            J = lambda a: jnp.asarray(a, dtype)  # noqa: E731
            DnKi = jnp.einsum("fqb,fb,bjq->fjq", Ka, ihi, J(fin["Dall"]))
            DnKo = jnp.einsum("fqb,fb,bjq->fjq", Kao, iho, J(fout["Dall"]))
            zi = jnp.asarray(-0.5 * fg.fmeas, dtype)
            wj = J(w)
            M11 = (zi[:, None, None]
                   * (jnp.einsum("iq,q,fjq->fij", J(fin["V"]), wj, DnKi)
                      + jnp.einsum("fiq,q,jq->fij", DnKi, wj, J(fin["V"])))
                   + pen * J(np.einsum("iq,q,jq->ij", fin["V"], w,
                                       fin["V"]))[None])
            M22 = (-zi[:, None, None]
                   * (jnp.einsum("iq,q,fjq->fij", J(fout["V"]), wj, DnKo)
                      + jnp.einsum("fiq,q,jq->fij", DnKo, wj, J(fout["V"])))
                   + pen * J(np.einsum("iq,q,jq->ij", fout["V"], w,
                                       fout["V"]))[None])
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
                geo.boundary_penalty_coef_mesh(mesh, bg, penalty,
                                               penalty_scaling)
                if affine else
                boundary_penalty_coef(bg, penalty, penalty_scaling),
                dtype)[:, None, None]
            if diffusion is None and not affine:
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
                x = geo.apply_map(basis.mesh, elems, x)
                k = (jnp.asarray(diffusion(jnp.asarray(x, dtype)), dtype)
                     if diffusion is not None else None)
                if affine:
                    k = jnp.asarray(geo.effective_tensor(
                        basis.mesh, elems, k, x.shape[1]), dtype)
                J = lambda a: jnp.asarray(a, dtype)  # noqa: E731
                if kmat:
                    Ka = k[..., bg.axis, :]
                    ih = J(1.0 / basis.mesh.extent[elems])
                    DnK = jnp.einsum("fqb,fb,bjq->fjq", Ka, ih,
                                     J(ft["Dall"]))
                    z = jnp.asarray(-sign * bg.fmeas, dtype)
                    wj = J(w)
                    M = (z[:, None, None]
                         * (jnp.einsum("iq,q,fjq->fij", J(ft["V"]), wj, DnK)
                            + jnp.einsum("fiq,q,jq->fij", DnK, wj,
                                         J(ft["V"])))
                         + penb * J(np.einsum("iq,q,jq->ij", ft["V"], w,
                                              ft["V"]))[None])
                else:
                    kz = k * jnp.asarray(w, dtype)[None, :] * c[:, None]
                    M = (jnp.einsum("fq,iq,jq->fij", kz, J(ft["V"]),
                                    J(ft["Dn"]))
                         + jnp.einsum("fq,iq,jq->fij", kz, J(ft["Dn"]),
                                      J(ft["V"]))
                         + penb * J(np.einsum("iq,q,jq->ij", ft["V"], w,
                                              ft["V"]))[None])
            out[bg.p] = out[bg.p].at[jnp.asarray(bg.pos)].add(M)
    return out
