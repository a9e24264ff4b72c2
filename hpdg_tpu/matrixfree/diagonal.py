"""Matrix-free diagonal-block extraction for block-Jacobi smoothing.

Rebuild of SumFactDiagonalIPDGOperator / IPDGDiagonalBlock
(matrix-free/localoperators/sfdiagonalipdg.hh, ipdgdiagonalblock.hh):
computes only the (e, e) diagonal blocks of the SIPG operator — bulk
block plus the M11/M22 face contributions — without forming the global
matrix.  Used as the ``MatrixCreator`` for matrix-free block Jacobi
(ipdgblockjacobi.hh analog, see solvers.smoothers).

Computed in NUMPY on the host: this is setup-time work, and the
per-face-group eager jnp scatter-adds of the original implementation
triggered one XLA compile per group — ~2,600 compiles and 156 s of a
181 s sharded build at 10k elements (r3 profile).  The numpy version is
one vectorized pass, no compiler in the loop.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from hpdg_tpu.basis import tensor
from hpdg_tpu.mesh.structured import require_classic_faces
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.assemble.plan import (AssemblyPlan, build_plan,
                                    face_group_tables, face_phys_points,
                                    penalty_coef, boundary_penalty_coef)


def _sym(M):
    return M + M.T


def _scatter_add(out, pos, vals, rdtype):
    """out[pos] += vals; positions within one face group are unique for
    conforming classes (one high/low face per element per axis), where
    plain fancy indexing is ~10x faster than np.add.at; fall back to
    add.at under duplicates (possible for hanging-node classes)."""
    vals = np.broadcast_to(vals, (len(pos),) + out.shape[1:]).astype(rdtype)
    if len(np.unique(pos)) == len(pos):
        out[pos] += vals
    else:
        np.add.at(out, pos, vals)


def sipg_diagonal_blocks(basis: DGBasis, penalty: float = 2.0,
                         dirichlet: bool = False, dtype=jnp.float64,
                         penalty_scaling: str = "measure",
                         diffusion=None,
                         plan: AssemblyPlan | None = None) -> dict:
    """p -> [n_p, bs, bs] diagonal blocks of the SIPG operator (host
    numpy arrays in the precision of ``dtype``).

    ``diffusion``: optional coefficient K(x) (vectorized on physical
    points), scalar or symmetric (dim, dim) TENSOR per point — the
    coefficient variant of the diagonal-block factory
    (weightedheatdiagonalblock.hh / ipdgcoefficientoperator.hh scope,
    tensor media as in gausslobattoipdgcoefficientassembler.hh:31).
    First-class affine geometry (mesh.jac) folds in exactly as in the
    assemblers (mesh/geometry.py)."""
    require_classic_faces(basis.mesh, "sipg_diagonal_blocks")
    from hpdg_tpu.mesh import geometry as geo
    plan = plan or build_plan(basis)
    mesh = basis.mesh
    dim = mesh.dim
    affine = geo.has_affine(mesh)
    kmat = affine
    if diffusion is not None:
        probe = np.asarray(diffusion(jnp.full((1, dim), 0.5, dtype)))
        kmat = kmat or probe.ndim >= 3
    rdtype = np.dtype(jnp.zeros(0, dtype).dtype)

    def K(x):
        return np.asarray(diffusion(jnp.asarray(x, dtype)), rdtype)

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
            out[p] = np.einsum("ea,aij->eij", invh2, S).astype(rdtype)
        else:
            xp = (mesh.lower[elems][:, None, :]
                  + vt["points"][None, :, :] * ext[:, None, :])
            x = geo.apply_map(mesh, elems, xp)
            k = K(x) if diffusion is not None else None
            if affine:
                k = np.asarray(geo.effective_tensor(mesh, elems, k, xp))
            if kmat:
                # (K grad u, grad v): sum_ab detJ w K_ab h_a^-1 h_b^-1
                kw = (k * w[None, :, None, None]
                      * detJ[:, None, None, None])
                invh = 1.0 / ext
                out[p] = np.einsum("eqab,ea,eb,aiq,bjq->eij", kw, invh,
                                   invh, G, G).astype(rdtype)
            else:
                kw = k * w[None, :]
                out[p] = np.einsum("eq,ea,aiq,ajq->eij", kw, invh2,
                                   G, G).astype(rdtype)

    for fg in plan.face_groups:
        pmax = max(fg.p_in, fg.p_out)
        fin, fout = face_group_tables(basis, fg, pmax + 2)
        w = fin["weights"]
        pen = np.asarray(
            geo.penalty_coef_mesh(mesh, fg, penalty, pmax, penalty_scaling)
            if affine else
            penalty_coef(fg, penalty, pmax, penalty_scaling))[:, None, None]
        c_in = -0.5 * fg.fmeas * fg.inv_h_in
        c_out = -0.5 * fg.fmeas * fg.inv_h_out
        if diffusion is None and not affine:
            AVDi = np.einsum("iq,q,jq->ij", fin["V"], w, fin["Dn"])
            BVVi = np.einsum("iq,q,jq->ij", fin["V"], w, fin["V"])
            AVDo = np.einsum("iq,q,jq->ij", fout["V"], w, fout["Dn"])
            BVVo = np.einsum("iq,q,jq->ij", fout["V"], w, fout["V"])
            M11 = c_in[:, None, None] * _sym(AVDi) + pen * BVVi[None]
            M22 = -c_out[:, None, None] * _sym(AVDo) + pen * BVVo[None]
        elif kmat:
            # co-normal consistency: n.K grad u = sum_b K_{axis,b}/h_b d_b u
            ein = mesh.faces.inside[fg.face_ids]
            eout = mesh.faces.outside[fg.face_ids]
            xp = face_phys_points(basis, fg, fin["points"])
            x = geo.apply_map(mesh, ein, xp)
            k = K(x) if diffusion is not None else None
            if affine:
                xpo = face_phys_points(basis, fg, fin["points"],
                                       side="out")
                k_in = np.asarray(geo.effective_tensor(mesh, ein, k, xp))
                k_out = np.asarray(geo.effective_tensor(mesh, eout, k,
                                                        xpo))
            else:
                k_in = k_out = k
            ihi = 1.0 / mesh.extent[ein]
            iho = 1.0 / mesh.extent[eout]
            DnKi = np.einsum("fqb,fb,bjq->fjq", k_in[..., fg.axis, :], ihi,
                             fin["Dall"])
            DnKo = np.einsum("fqb,fb,bjq->fjq", k_out[..., fg.axis, :], iho,
                             fout["Dall"])
            zi = -0.5 * fg.fmeas
            M11 = (zi[:, None, None]
                   * (np.einsum("iq,q,fjq->fij", fin["V"], w, DnKi)
                      + np.einsum("fiq,q,jq->fij", DnKi, w, fin["V"]))
                   + pen * np.einsum("iq,q,jq->ij", fin["V"], w,
                                     fin["V"])[None])
            M22 = (-zi[:, None, None]
                   * (np.einsum("iq,q,fjq->fij", fout["V"], w, DnKo)
                      + np.einsum("fiq,q,jq->fij", DnKo, w, fout["V"]))
                   + pen * np.einsum("iq,q,jq->ij", fout["V"], w,
                                     fout["V"])[None])
        else:
            x = face_phys_points(basis, fg, fin["points"])
            k = K(x)
            kzi = k * w[None, :] * c_in[:, None]
            kzo = k * w[None, :] * c_out[:, None]
            M11 = (np.einsum("fq,iq,jq->fij", kzi, fin["V"], fin["Dn"])
                   + np.einsum("fq,iq,jq->fij", kzi, fin["Dn"], fin["V"])
                   + pen * np.einsum("iq,q,jq->ij", fin["V"], w,
                                     fin["V"])[None])
            M22 = (-np.einsum("fq,iq,jq->fij", kzo, fout["V"], fout["Dn"])
                   - np.einsum("fq,iq,jq->fij", kzo, fout["Dn"], fout["V"])
                   + pen * np.einsum("iq,q,jq->ij", fout["V"], w,
                                     fout["V"])[None])
        _scatter_add(out[fg.p_in], fg.in_pos, M11, rdtype)
        _scatter_add(out[fg.p_out], fg.out_pos, M22, rdtype)

    if dirichlet:
        for bg in plan.boundary_groups:
            ft = tensor.face_tables(bg.p, dim, bg.axis, bg.side, bg.p + 2,
                                    family=basis.family)
            w = ft["weights"]
            sign = 1.0 if bg.side == 1 else -1.0
            c = -sign * bg.fmeas * bg.inv_h
            penb = np.asarray(
                geo.boundary_penalty_coef_mesh(mesh, bg, penalty,
                                               penalty_scaling)
                if affine else
                boundary_penalty_coef(bg, penalty,
                                      penalty_scaling))[:, None, None]
            if diffusion is None and not affine:
                AVD = np.einsum("iq,q,jq->ij", ft["V"], w, ft["Dn"])
                BVV = np.einsum("iq,q,jq->ij", ft["V"], w, ft["V"])
                M = c[:, None, None] * _sym(AVD) + penb * BVV[None]
            else:
                elems = basis.mesh.bfaces.elem[bg.face_ids]
                lo = basis.mesh.lower[elems].copy()
                if bg.side == 1:
                    lo[:, bg.axis] += basis.mesh.extent[elems, bg.axis]
                tang = [a for a in range(dim) if a != bg.axis]
                xp = np.repeat(lo[:, None, :], len(w), axis=1)
                for t, a in enumerate(tang):
                    xp[:, :, a] += (ft["points"][None, :, t]
                                    * basis.mesh.extent[elems, a][:, None])
                x = geo.apply_map(basis.mesh, elems, xp)
                k = K(x) if diffusion is not None else None
                if affine:
                    k = np.asarray(geo.effective_tensor(
                        basis.mesh, elems, k, xp))
                BVV = np.einsum("iq,q,jq->ij", ft["V"], w, ft["V"])
                if kmat:
                    ih = 1.0 / basis.mesh.extent[elems]
                    DnK = np.einsum("fqb,fb,bjq->fjq",
                                    k[..., bg.axis, :], ih, ft["Dall"])
                    z = -sign * bg.fmeas
                    M = (z[:, None, None]
                         * (np.einsum("iq,q,fjq->fij", ft["V"], w, DnK)
                            + np.einsum("fiq,q,jq->fij", DnK, w, ft["V"]))
                         + penb * BVV[None])
                else:
                    kz = k * w[None, :] * c[:, None]
                    M = (np.einsum("fq,iq,jq->fij", kz, ft["V"], ft["Dn"])
                         + np.einsum("fq,iq,jq->fij", kz, ft["Dn"],
                                     ft["V"])
                         + penb * BVV[None])
            _scatter_add(out[bg.p], bg.pos, M, rdtype)
    return out
