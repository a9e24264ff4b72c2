"""Sum-factorized matrix-free SIPG / Laplace / mass operators.

Rebuild of SumFactIPDGOperator (matrix-free/localoperators/sfipdg.hh:39-725),
SumFactLaplaceOperator (sflaplace.hh), SumFactMassOperator (sfmass.hh) and
the naive reference IPDGOperator (ipdgoperator.hh) — TPU-first:

* The reference's per-element ``BtUL`` / ``CplusAXtBt`` BLAS chains
  (common/mmmatrix.hh:154-279) become *batched* tensor contractions over
  whole degree buckets: ``einsum('nij,iq,jr->nqr', u, D, V)`` is exactly
  Bᵀ·U·L for every element of the bucket at once — MXU-shaped work.
* The reference's intersection loop with its visit-once guard
  (sfipdg.hh:196-197) becomes precomputed face groups (assemble.plan):
  gather both sides' coefficients, evaluate 1D traces, scatter-add both
  sides' outputs.  No per-face control flow.
* Works for dim 1/2/3 and mixed degrees (the reference is 2D-only,
  static_assert sfipdg.hh:48).

Operator cost: O(d^2 (p+1)^d (p+2)) per element vs O((p+1)^{2d}) for the
assembled SpMV — the classic sum-factorization win that grows with p.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from hpdg_tpu.basis import tensor
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.mesh import geometry as geo
from hpdg_tpu.assemble.plan import (AssemblyPlan, build_plan,
                                    face_group_tables, face_phys_points,
                                    penalty_coef, boundary_penalty_coef)

_LETTERS = "ijkl"
_QLETTERS = "qrst"


def _fwd_spec(dim: int) -> str:
    """e.g. dim=3: 'nijk,iq,jr,ks->nqrs' (coeffs -> quad values)."""
    ii = _LETTERS[:dim]
    qq = _QLETTERS[:dim]
    mats = ",".join(f"{i}{q}" for i, q in zip(ii, qq))
    return f"n{ii},{mats}->n{qq}"


def _bwd_spec(dim: int) -> str:
    """e.g. dim=3: 'nqrs,iq,jr,ks->nijk' (quad-weighted values -> dofs)."""
    ii = _LETTERS[:dim]
    qq = _QLETTERS[:dim]
    mats = ",".join(f"{i}{q}" for i, q in zip(ii, qq))
    return f"n{qq},{mats}->n{ii}"


def _chain(u, tables, spec, dtype):
    return jnp.einsum(spec, u, *[jnp.asarray(t, dtype) for t in tables],
                      preferred_element_type=dtype)


def _bucket_geometry(basis: DGBasis, p: int):
    ext = basis.mesh.extent[basis.bucket_elems[p]]
    detJ = np.prod(ext, axis=1)
    return ext, detJ


def _is_tensor_coefficient(diffusion, dim, dtype):
    """True if K(x) returns a (dim, dim) tensor per point."""
    if diffusion is None:
        return False
    probe = np.asarray(diffusion(jnp.full((1, dim), 0.5, dtype)))
    return probe.ndim >= 3


def laplace_bulk_operator(basis: DGBasis, diffusion=None, dtype=jnp.float64):
    """Matrix-free (K ∇u, ∇v) over all elements (SumFactLaplaceOperator).

    ``diffusion`` may return a scalar or a symmetric (dim, dim) TENSOR
    per point (anisotropic media / general-geometry pullback)."""
    dim = basis.dim
    fwd, bwd = _fwd_spec(dim), _bwd_spec(dim)
    affine = geo.has_affine(basis.mesh)
    kmat = _is_tensor_coefficient(diffusion, dim, dtype) or affine
    prep = {}
    for p in basis.bucket_degrees:
        vt = tensor.volume_tables(p, dim, p + 2, family=basis.family)
        t1 = vt["t1d"]
        ext, detJ = _bucket_geometry(basis, p)
        coef = detJ[:, None] / ext**2  # (n, dim)
        wq = vt["weights"].reshape((len(t1.qweights),) * dim)
        xq = xpq = keff = None
        elems = basis.bucket_elems[p]
        if diffusion is not None or affine:
            xpq = (basis.mesh.lower[elems][:, None, :]
                   + vt["points"][None, :, :] * ext[:, None, :])
            xq = geo.apply_map(basis.mesh, elems, xpq)
        if affine and diffusion is None:
            # geometry folds into a per-element constant (affine) or
            # per-point (trilinear) tensor, precomputed on the host
            keff = np.asarray(geo.effective_tensor(
                basis.mesh, elems, None, xpq))
            xq = xpq = None
        prep[p] = (t1.values, t1.derivatives, coef, wq, xq, ext, detJ,
                   elems, keff, xpq)

    def apply(x):
        y = {}
        for p, (V, D, coef, wq, xq, ext, detJ, elems, keff,
                xpq) in prep.items():
            shp = x[p].shape
            d1 = V.shape[0]
            u = x[p].reshape((shp[0],) + (d1,) * dim)
            kq = None
            if keff is not None:
                kq = jnp.asarray(keff, dtype)
            elif xq is not None:
                kq = diffusion(jnp.asarray(xq, dtype))
                if affine:
                    kq = geo.effective_tensor(basis.mesh, elems, kq, xpq)
            out = 0.0
            if kmat:
                # tensor medium: all reference-gradient fields, mixed by
                # K per point: g_a = w detJ/ (h_a h_b) sum_b K_ab du_b
                invh = jnp.asarray(1.0 / ext, dtype)       # (n, dim)
                wdet = (jnp.asarray(wq, dtype)[None]
                        * jnp.asarray(detJ, dtype).reshape(
                            (-1,) + (1,) * dim))
                kq = kq.reshape((shp[0],) + wq.shape + (dim, dim))
                dus = []
                for b in range(dim):
                    tabs = [D if c == b else V for c in range(dim)]
                    dus.append(_chain(u, tabs, fwd, dtype)
                               * invh[:, b].reshape((-1,) + (1,) * dim))
                for a in range(dim):
                    g = 0.0
                    for b in range(dim):
                        g = g + kq[..., a, b] * dus[b]
                    g = g * wdet * invh[:, a].reshape((-1,) + (1,) * dim)
                    tabs = [D if c == a else V for c in range(dim)]
                    out = out + _chain(g, tabs, bwd, dtype)
            else:
                if kq is not None:
                    kq = kq.reshape((shp[0],) + wq.shape)
                for a in range(dim):
                    tabs = [D if b == a else V for b in range(dim)]
                    du = _chain(u, tabs, fwd, dtype)
                    g = du * jnp.asarray(wq, dtype)[None]
                    if kq is not None:
                        g = g * kq
                    g = g * jnp.asarray(coef[:, a], dtype).reshape(
                        (-1,) + (1,) * dim)
                    out = out + _chain(g, tabs, bwd, dtype)
            y[p] = out.reshape(shp)
        return y

    return apply


def mass_operator(basis: DGBasis, dtype=jnp.float64):
    """Matrix-free (u, v): batched dense block GEMM (SumFactMassOperator)."""
    prep = {}
    tri = geo.is_trilinear(basis.mesh)
    for p in basis.bucket_degrees:
        vt = tensor.volume_tables(p, basis.dim, p + 2, family=basis.family)
        ext, detJ = _bucket_geometry(basis, p)
        elems = basis.bucket_elems[p]
        if tri:
            # per-point |det J|: the mass block varies per element
            xpq = (basis.mesh.lower[elems][:, None, :]
                   + vt["points"][None, :, :] * ext[:, None, :])
            detq = (detJ[:, None]
                    * geo.detj_phys(basis.mesh, elems, xpq))  # (n, q)
            Me = np.einsum("eq,q,iq,jq->eij", detq, vt["weights"],
                           vt["V"], vt["V"])
            prep[p] = (jnp.asarray(Me, dtype), None)
        else:
            M0 = np.einsum("iq,q,jq->ij", vt["V"], vt["weights"], vt["V"])
            detJ = detJ * geo.detj_phys(basis.mesh, elems)
            prep[p] = (jnp.asarray(M0, dtype), jnp.asarray(detJ, dtype))

    def apply(x):
        out = {}
        for p, (M, detJ) in prep.items():
            if detJ is None:
                out[p] = jnp.einsum("ni,nij->nj", x[p], M,
                                    preferred_element_type=dtype)
            else:
                out[p] = jnp.einsum("ni,ij->nj", x[p], M,
                                    preferred_element_type=dtype) \
                    * detJ[:, None]
        return out

    return apply


def _face_prep(basis: DGBasis, plan: AssemblyPlan, dtype):
    """Static per-face-group data for the SIPG skeleton terms."""
    groups = []
    for fg in plan.face_groups:
        pmax = max(fg.p_in, fg.p_out)
        fin, fout = face_group_tables(basis, fg, pmax + 2)
        groups.append(dict(
            fg=fg, w=fin["weights"], Vi=fin["V"], Di=fin["Dn"],
            Vo=fout["V"], Do=fout["Dn"], pmax=pmax, pts=fin["points"],
            Dalli=fin["Dall"], Dallo=fout["Dall"],
        ))
    return groups


def sipg_operator(basis: DGBasis, penalty: float = 2.0,
                  dirichlet: bool = False, diffusion=None,
                  dtype=jnp.float64, plan: AssemblyPlan | None = None,
                  penalty_scaling: str = "measure", dg_form="sipg",
                  sigma1: float = 0.0):
    """Full matrix-free IPDG apply (bulk + skeleton + Dirichlet terms).

    Semantically identical to ``assemble_laplace(...)`` matvec; tested
    against it at 1e-12 (mirroring testsumfactor.cc:36-96).
    Returns a jit-safe closure dict -> dict.

    ``dg_form``: "sipg" | "iipg" | "nipg" (or theta float) — symmetry
    factor of the consistency terms (variableipdg.hh:33,177,328-351).
    ``sigma1``: gradient-jump stabilization on interior faces
    (variableipdg.hh:330-351); geometry-generic (curved meshes and
    tensor media use per-point physical gradients and unit normals,
    mesh.geometry.face_grad_jump_geometry).
    """
    from hpdg_tpu.assemble.sipg import dg_theta
    plan = plan or build_plan(basis)
    dim = basis.dim
    mesh = basis.mesh
    affine = geo.has_affine(mesh)
    kmat = _is_tensor_coefficient(diffusion, dim, dtype) or affine
    theta = dg_theta(dg_form)
    bulk = laplace_bulk_operator(basis, diffusion=diffusion, dtype=dtype)
    groups = _face_prep(basis, plan, dtype)

    # face geometry coefficient arrays (host -> constants)
    for g in groups:
        fg = g["fg"]
        g["z"] = fg.fmeas  # |f| * w_q applied via w (parametric: the
        # affine face Jacobian is folded into the effective tensors)
        # mu*|f|*w = pen_f * w (pen_f per face)
        g["pen_w"] = ((geo.penalty_coef_mesh(mesh, fg, penalty, g["pmax"],
                                             penalty_scaling)
                       if affine else
                       penalty_coef(fg, penalty, g["pmax"],
                                    penalty_scaling))[:, None]
                      * g["w"][None, :])
        ein = mesh.faces.inside[fg.face_ids]
        eout = mesh.faces.outside[fg.face_ids]
        if diffusion is not None or affine:
            g["xpq"] = face_phys_points(basis, fg, g["pts"])  # parametric
            g["xpq_out"] = face_phys_points(basis, fg, g["pts"],
                                            side="out")
            g["xq"] = geo.apply_map(mesh, ein, g["xpq"])
        if kmat:
            g["ext_in"] = mesh.extent[ein]
            g["ext_out"] = mesh.extent[eout]
            g["ein"], g["eout"] = ein, eout
        if affine and diffusion is None:
            g["keff_in"] = np.asarray(geo.effective_tensor(
                mesh, ein, None, g["xpq"]))
            g["keff_out"] = np.asarray(geo.effective_tensor(
                mesh, eout, None, g["xpq_out"]))
        if sigma1 != 0.0 and kmat:
            # geometry-generic gradient-jump traces (per-point physical
            # gradients / unit normal; host constants)
            sn_i, sn_o, zs = geo.face_grad_jump_geometry(
                mesh, fg, g["xpq"], g["xpq_out"])
            zsw = zs * g["w"][None, :]
            g["s1_cw"] = (sigma1 / zsw.sum(axis=1))[:, None] * zsw
            g["s1_sn_in"], g["s1_sn_out"] = sn_i, sn_o

    bgroups = []
    if dirichlet:
        for bg in plan.boundary_groups:
            ft = tensor.face_tables(bg.p, dim, bg.axis, bg.side, bg.p + 2,
                                    family=basis.family)
            item = dict(bg=bg, w=ft["weights"], V=ft["V"], D=ft["Dn"],
                        sign=1.0 if bg.side == 1 else -1.0,
                        pen_w=(geo.boundary_penalty_coef_mesh(
                            mesh, bg, penalty, penalty_scaling)
                            if affine else
                            boundary_penalty_coef(
                                bg, penalty, penalty_scaling))[:, None]
                        * ft["weights"][None, :])
            elems = mesh.bfaces.elem[bg.face_ids]
            if diffusion is not None or affine:
                lo = mesh.lower[elems].copy()
                if bg.side == 1:
                    lo[:, bg.axis] += mesh.extent[elems, bg.axis]
                tang = [a for a in range(dim) if a != bg.axis]
                x = np.repeat(lo[:, None, :], len(ft["weights"]), axis=1)
                for t, a in enumerate(tang):
                    x[:, :, a] += ft["points"][None, :, t] * mesh.extent[elems, a][:, None]
                item["xpq"] = x
                item["xq"] = geo.apply_map(mesh, elems, x)
            if kmat:
                item["Dall"] = ft["Dall"]
                item["ext"] = mesh.extent[elems]
                item["elems"] = elems
            if affine and diffusion is None:
                item["keff"] = np.asarray(geo.effective_tensor(
                    mesh, elems, None, item["xpq"]))
            bgroups.append(item)

    def apply(x):
        y = bulk(x)
        # collect all skeleton contributions per bucket and land them in
        # ONE segment-sum each — at[].add per group makes XLA traverse
        # the whole bucket array once per call
        contribs = {p: [] for p in x}
        targets = {p: [] for p in x}
        for g in groups:
            fg = g["fg"]
            J = lambda a: jnp.asarray(a, dtype)  # noqa: E731
            Vi, Di, Vo, Do = J(g["Vi"]), J(g["Di"]), J(g["Vo"]), J(g["Do"])
            u_in = x[fg.p_in][jnp.asarray(fg.in_pos)]
            u_out = x[fg.p_out][jnp.asarray(fg.out_pos)]
            uinq = u_in @ Vi
            uoutq = u_out @ Vo
            jump = uinq - uoutq
            zw = J(g["z"])[:, None] * J(g["w"])[None, :]  # |f| w_q
            penw = J(g["pen_w"])
            if kmat:
                # tensor medium / affine geometry: co-normal derivatives
                # via the full trace-gradient tables (K folded in)
                if "keff_in" in g:
                    k_in, k_out = J(g["keff_in"]), J(g["keff_out"])
                else:
                    kq = diffusion(jnp.asarray(g["xq"], dtype))
                    if affine:
                        k_in = geo.effective_tensor(mesh, g["ein"], kq,
                                                    g["xpq"])
                        k_out = geo.effective_tensor(mesh, g["eout"], kq,
                                                     g["xpq_out"])
                    else:
                        k_in = k_out = kq
                # each side's conormal row along ITS chart's face axis,
                # signed so the parametric normal points inside ->
                # outside (twisted imports; defaults keep +e_axis)
                Kai = float(2 * fg.in_side - 1) * k_in[..., fg.axis, :]
                Kao = float(1 - 2 * fg.out_side) \
                    * k_out[..., fg.out_axis, :]  # (nf, q, dim)
                ihi = J(1.0 / g["ext_in"])        # (nf, dim)
                iho = J(1.0 / g["ext_out"])
                Dalli, Dallo = J(g["Dalli"]), J(g["Dallo"])
                duin = jnp.einsum("fi,biq->fbq", u_in, Dalli)
                duout = jnp.einsum("fi,biq->fbq", u_out, Dallo)
                dninq = jnp.einsum("fqb,fb,fbq->fq", Kai, ihi, duin)
                dnoutq = jnp.einsum("fqb,fb,fbq->fq", Kao, iho, duout)
                avg = 0.5 * (dninq + dnoutq)
                t1_in = zw * (-avg) + penw * jump
                t1_out = zw * avg - penw * jump
                t2b = zw * (0.5 * theta * jump)
                c_in = (t1_in @ Vi.T
                        + jnp.einsum("fq,fqb,fb,biq->fi", t2b, Kai, ihi,
                                     Dalli))
                c_out = (t1_out @ Vo.T
                         + jnp.einsum("fq,fqb,fb,biq->fi", t2b, Kao, iho,
                                      Dallo))
                if sigma1 != 0.0:
                    # gradient-jump: plain physical gradient traces (no
                    # K), per-point unit normal, weighted by
                    # sigma1/|f|_phys * ds (host-precomputed s1_cw)
                    sn_i, sn_o = J(g["s1_sn_in"]), J(g["s1_sn_out"])
                    gin = jnp.einsum("fbq,fqb->fq", duin, sn_i)
                    gout = jnp.einsum("fbq,fqb->fq", duout, sn_o)
                    gj = J(g["s1_cw"]) * (gin - gout)
                    c_in = c_in + jnp.einsum("fq,fqb,biq->fi", gj, sn_i,
                                             Dalli)
                    c_out = c_out - jnp.einsum("fq,fqb,biq->fi", gj, sn_o,
                                               Dallo)
                contribs[fg.p_in].append(c_in)
                targets[fg.p_in].append(fg.in_pos)
                contribs[fg.p_out].append(c_out)
                targets[fg.p_out].append(fg.out_pos)
                continue
            dninq = (u_in @ Di) * J(fg.inv_h_in)[:, None]
            dnoutq = (u_out @ Do) * J(fg.inv_h_out)[:, None]
            avg = 0.5 * (dninq + dnoutq)
            k = 1.0
            if diffusion is not None:
                k = diffusion(jnp.asarray(g["xq"], dtype))
            t1_in = zw * (-(k * avg)) + penw * jump
            t2_in = zw * (0.5 * theta * k * jump) * J(fg.inv_h_in)[:, None]
            t1_out = zw * (k * avg) - penw * jump
            t2_out = zw * (0.5 * theta * k * jump) * J(fg.inv_h_out)[:, None]
            if sigma1 != 0.0:
                # gradient-jump stabilization: rows are the plain (no K)
                # normal-derivative traces; |f_param| = |f_phys| on box
                # meshes so the weight is sigma1 * w_q
                gj = (dninq - dnoutq) * J(g["w"])[None, :]
                t2_in = t2_in + sigma1 * gj * J(fg.inv_h_in)[:, None]
                t2_out = t2_out - sigma1 * gj * J(fg.inv_h_out)[:, None]
            contribs[fg.p_in].append(t1_in @ Vi.T + t2_in @ Di.T)
            targets[fg.p_in].append(fg.in_pos)
            contribs[fg.p_out].append(t1_out @ Vo.T + t2_out @ Do.T)
            targets[fg.p_out].append(fg.out_pos)
        for g in bgroups:
            bg = g["bg"]
            J = lambda a: jnp.asarray(a, dtype)  # noqa: E731
            V, D = J(g["V"]), J(g["D"])
            u = x[bg.p][jnp.asarray(bg.pos)]
            uq = u @ V
            zw = J(bg.fmeas)[:, None] * J(g["w"])[None, :]
            penw = J(g["pen_w"])
            if kmat:
                if "keff" in g:
                    kq = J(g["keff"])
                else:
                    kq = diffusion(jnp.asarray(g["xq"], dtype))
                    if affine:
                        kq = geo.effective_tensor(mesh, g["elems"], kq,
                                                  g["xpq"])
                Ka = kq[..., bg.axis, :]
                ih = J(1.0 / g["ext"])
                Dall = J(g["Dall"])
                du = jnp.einsum("fi,biq->fbq", u, Dall)
                dnKq = g["sign"] * jnp.einsum("fqb,fb,fbq->fq", Ka, ih, du)
                t1 = zw * (-dnKq) + penw * uq
                t2b = zw * (theta * uq)
                contribs[bg.p].append(
                    t1 @ V.T + g["sign"] * jnp.einsum(
                        "fq,fqb,fb,biq->fi", t2b, Ka, ih, Dall))
                targets[bg.p].append(bg.pos)
                continue
            dnq = (u @ D) * (g["sign"] * J(bg.inv_h))[:, None]
            k = 1.0
            if diffusion is not None:
                k = diffusion(jnp.asarray(g["xq"], dtype))
            t1 = zw * (-(k * dnq)) + penw * uq
            t2 = zw * (theta * k * uq) * (g["sign"] * J(bg.inv_h))[:, None]
            contribs[bg.p].append(t1 @ V.T + t2 @ D.T)
            targets[bg.p].append(bg.pos)
        import jax as _jax
        for p in x:
            if not contribs[p]:
                continue
            idx = jnp.asarray(np.concatenate(targets[p]))
            c = jnp.concatenate(contribs[p], axis=0)
            y[p] = y[p] + _jax.ops.segment_sum(c, idx,
                                               num_segments=y[p].shape[0])
        return y

    return apply


def naive_sipg_operator(basis: DGBasis, penalty: float = 2.0,
                        dirichlet: bool = False, dtype=jnp.float64,
                        plan: AssemblyPlan | None = None, dg_form="sipg",
                        sigma1: float = 0.0):
    """Naive matrix-free IPDG: assemble per-bucket *local* blocks once and
    matvec them (the reference's IPDGOperator, ipdgoperator.hh:22-406 —
    kept as the differential-testing partner for the sum-factorized path).
    """
    from hpdg_tpu.assemble.sipg import assemble_laplace
    from hpdg_tpu.linalg.blockmatrix import matvec as bsm_matvec
    A = assemble_laplace(basis, penalty=penalty, dirichlet=dirichlet,
                         dtype=dtype, plan=plan, dg_form=dg_form,
                         sigma1=sigma1)
    return lambda x: bsm_matvec(A, x)
