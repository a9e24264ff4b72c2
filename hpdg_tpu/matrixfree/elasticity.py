"""Matrix-free linear-elasticity SIPG apply (vector-valued fields).

Beyond the reference (which assembles elasticity through generic fufem
machinery): the full traction-consistent SIPG elasticity operator as a
batched matrix-free apply — strains evaluated at quadrature points,
tractions at face points, everything integrated back through the
transposed tables.  Component-major layout (c * (p+1)^dim + i), matching
assemble.elasticity.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from hpdg_tpu.basis import tensor
from hpdg_tpu.mesh.structured import require_classic_faces
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.assemble.plan import (AssemblyPlan, build_plan,
                                    face_group_tables, penalty_coef,
                                    boundary_penalty_coef)


def elasticity_geom_tables(basis: DGBasis, plan: AssemblyPlan | None = None,
                           penalty: float = 2.0, dirichlet: bool = False,
                           penalty_scaling: str = "measure") -> dict:
    """Per-point geometry tables of the elasticity operator as a plain
    pytree of numpy arrays — everything in the operator that depends on
    the element maps (and nothing that depends only on the parametric
    lattice).  Keys:

    * ``bulk[p] = (H, dA)``: H[n,q,b,a] = (1/h_b) J^-1 (local-parametric
      derivative b -> physical derivative a), dA[n,q] = |det J|;
    * ``face[i] = (H_in, H_out, R_in, R_out, pen)`` per face group:
      R[n,q,a] = |det J| J^-1[ax,a] is the Nanson covector, ``pen`` the
      per-face penalty coefficient;
    * ``bnd[i] = (H, R, pen)`` per Dirichlet boundary group (outward R).

    The sharded layer stacks these per shard and feeds them through
    ``shard_map`` so ONE compiled SPMD program serves shards with
    different physical geometry (the vector-valued analog of the scalar
    path's [.., q, d, d] coefficient arrays in parallel/hp.py)."""
    from hpdg_tpu.mesh import geometry as geo
    from hpdg_tpu.assemble.plan import face_phys_points
    plan = plan or build_plan(basis)
    mesh = basis.mesh
    d = mesh.dim

    def h_and_det(elems, xpq):
        Jac = geo.jacobians(mesh, elems, xpq)
        Ji = np.linalg.inv(Jac)
        dA = np.abs(np.linalg.det(Jac))
        H = (1.0 / mesh.extent[elems])[:, None, :, None] * Ji
        return H, Ji, dA

    bulk = {}
    for p in basis.bucket_degrees:
        vt = tensor.volume_tables(p, d, p + 2, family=basis.family)
        elems = basis.bucket_elems[p]
        ext = mesh.extent[elems]
        xpq = (mesh.lower[elems][:, None, :]
               + vt["points"][None, :, :] * ext[:, None, :])
        H, _, dA = h_and_det(elems, xpq)
        bulk[p] = (H, dA)

    face = []
    for fg in plan.face_groups:
        pmax = max(fg.p_in, fg.p_out)
        fin, _ = face_group_tables(basis, fg, pmax + 2)
        xpq = face_phys_points(basis, fg, fin["points"])
        xpq_o = face_phys_points(basis, fg, fin["points"], side="out")
        ein = mesh.faces.inside[fg.face_ids]
        eout = mesh.faces.outside[fg.face_ids]
        Hi, Jii, _ = h_and_det(ein, xpq)
        Ho, Jio, _ = h_and_det(eout, xpq_o)
        dAi = np.abs(1.0 / np.linalg.det(Jii))
        dAo = np.abs(1.0 / np.linalg.det(Jio))
        pen = geo.penalty_coef_mesh(mesh, fg, penalty, pmax,
                                    penalty_scaling)
        face.append((Hi, Ho, dAi[..., None] * Jii[:, :, fg.axis, :],
                     dAo[..., None] * Jio[:, :, fg.axis, :], pen))

    bnd = []
    if dirichlet:
        for bg in plan.boundary_groups:
            ft = tensor.face_tables(bg.p, d, bg.axis, bg.side, bg.p + 2,
                                    family=basis.family)
            elems = mesh.bfaces.elem[bg.face_ids]
            sign = 1.0 if bg.side == 1 else -1.0
            lo = mesh.lower[elems].copy()
            if bg.side == 1:
                lo[:, bg.axis] += mesh.extent[elems, bg.axis]
            tang = [a for a in range(d) if a != bg.axis]
            xpq = np.repeat(lo[:, None, :], len(ft["weights"]), axis=1)
            for t, a in enumerate(tang):
                xpq[:, :, a] += ft["points"][None, :, t] \
                    * mesh.extent[elems, a][:, None]
            H, Ji, dA = h_and_det(elems, xpq)
            pen = geo.boundary_penalty_coef_mesh(mesh, bg, penalty,
                                                 penalty_scaling)
            # outward Nanson covector
            bnd.append((H, sign * dA[..., None] * Ji[:, :, bg.axis, :], pen))
    return {"bulk": bulk, "face": tuple(face), "bnd": tuple(bnd)}


def elasticity_operator(basis: DGBasis, mu: float = 1.0, lam: float = 1.0,
                        penalty: float = 2.0, dirichlet: bool = False,
                        dtype=jnp.float64, plan: AssemblyPlan | None = None,
                        penalty_scaling: str = "measure",
                        include_bulk: bool = True):
    """Returns apply: {p: [n, dim*(p+1)^dim]} -> same (jit-safe).

    ``include_bulk=False`` gives the skeleton/boundary terms only (used
    by the sharded layer's masked boundary corrections).

    On meshes with first-class geometry the returned apply also accepts
    ``apply(x, gt)`` where ``gt`` overrides the baked-in geometry tables
    (see :func:`elasticity_geom_tables`) — possibly with traced arrays,
    which is how the sharded layer feeds per-shard geometry through one
    SPMD program."""
    require_classic_faces(basis.mesh, "elasticity_operator")
    from hpdg_tpu.mesh import geometry as geo
    plan = plan or build_plan(basis)
    mesh = basis.mesh
    d = mesh.dim
    geom = geo.has_geometry(mesh)
    J = lambda a: jnp.asarray(a, dtype)  # noqa: E731

    baked_gt = (elasticity_geom_tables(basis, plan, penalty=penalty,
                                       dirichlet=dirichlet,
                                       penalty_scaling=penalty_scaling)
                if geom else None)

    # ---- bulk prep: per bucket parametric quadrature tables ----
    bulk_prep = {}
    for p in basis.bucket_degrees:
        vt = tensor.volume_tables(p, d, p + 2, family=basis.family)
        elems = basis.bucket_elems[p]
        ext = mesh.extent[elems]
        detJ = np.prod(ext, axis=1)
        bulk_prep[p] = (vt["G"], vt["weights"], ext, detJ)

    fgroups = []
    for gi, fg in enumerate(plan.face_groups):
        pmax = max(fg.p_in, fg.p_out)
        fin, fout = face_group_tables(basis, fg, pmax + 2)
        ein = mesh.faces.inside[fg.face_ids]
        eout = mesh.faces.outside[fg.face_ids]
        g = dict(
            fg=fg, fin=fin, fout=fout, pmax=pmax,
            ih_in=1.0 / mesh.extent[ein],  # (nf, d)
            ih_out=1.0 / mesh.extent[eout],
        )
        if not geom:
            g["pen"] = penalty_coef(fg, penalty, pmax, penalty_scaling)
        fgroups.append(g)

    bgroups = []
    if dirichlet:
        for bi, bg in enumerate(plan.boundary_groups):
            ft = tensor.face_tables(bg.p, d, bg.axis, bg.side, bg.p + 2,
                                    family=basis.family)
            elems = mesh.bfaces.elem[bg.face_ids]
            g = dict(
                bg=bg, ft=ft, sign=1.0 if bg.side == 1 else -1.0,
                ih=1.0 / mesh.extent[elems],
            )
            if not geom:
                g["pen"] = boundary_penalty_coef(bg, penalty,
                                                 penalty_scaling)
            bgroups.append(g)

    def traction(du, ax, mu_, lam_):
        """(sigma(u) n)_c from grad array du[..., b, c] (=∂_b u_c), n=+e_ax."""
        div = jnp.trace(du, axis1=-2, axis2=-1)[..., None]
        t = mu_ * (du[..., ax, :] + du[..., :, ax])
        return t + lam_ * div * (jnp.arange(d) == ax).astype(du.dtype)

    def apply(x, gt=None):
        gt = baked_gt if gt is None else gt
        y = {}
        if not include_bulk:
            y = {p: jnp.zeros_like(x[p]) for p in x}
        # -------- bulk: 2 mu eps(u):eps(v) + lam div div --------
        for p, (G, w, ext, detJ) in (bulk_prep.items()
                                     if include_bulk else ()):
            H, dA = gt["bulk"][p] if geom else (None, None)
            nl = (p + 1) ** d
            u = x[p].reshape(-1, d, nl)
            n = u.shape[0]
            Gj = J(G)
            # du[n, q, b, c] = ∂_b u_c at quad points (local parametric)
            du = jnp.einsum("ncj,bjq->nqbc", u, Gj,
                            preferred_element_type=dtype)
            if H is not None:  # physical gradients via per-point J^-1
                du = jnp.einsum("nqbc,nqba->nqac", du, J(H))
            else:
                du = du / J(ext)[:, None, :, None]
            eps = 0.5 * (du + jnp.swapaxes(du, -2, -1))
            div = jnp.trace(du, axis1=-2, axis2=-1)
            # sigma[n,q,b,c]
            sig = 2 * mu * eps + lam * div[..., None, None] * jnp.eye(d, dtype=dtype)
            # integrate: y[c,i] += Σ_q w detJ |det| sigma_ac (∂_a phi_i)_phys
            sw = sig * (J(w)[None, :, None, None]
                        * J(detJ)[:, None, None, None])
            if H is not None:
                sw = sw * J(dA)[..., None, None]
                out = jnp.einsum("nqac,nqba,bjq->ncj", sw, J(H), Gj,
                                 preferred_element_type=dtype)
            else:
                sw = sw / J(ext)[:, None, :, None]  # 1/h_b on test gradient
                out = jnp.einsum("nqbc,bjq->ncj", sw, Gj,
                                 preferred_element_type=dtype)
            y[p] = out.reshape(n, d * nl)

        # -------- interior faces --------
        for gi, g in enumerate(fgroups):
            fg = g["fg"]
            fin, fout = g["fin"], g["fout"]
            w = J(fin["weights"])
            pen = J(gt["face"][gi][4] if geom else g["pen"])
            nli = (fg.p_in + 1) ** d
            nlo = (fg.p_out + 1) ** d
            u_in = x[fg.p_in][jnp.asarray(fg.in_pos)].reshape(-1, d, nli)
            u_out = x[fg.p_out][jnp.asarray(fg.out_pos)].reshape(-1, d, nlo)
            Vi, Vo = J(fin["V"]), J(fout["V"])
            Di, Do = J(fin["Dall"]), J(fout["Dall"])  # (d, nl, q)
            # values and grads at face points
            uin_q = jnp.einsum("nci,iq->nqc", u_in, Vi)
            uout_q = jnp.einsum("nci,iq->nqc", u_out, Vo)
            ax = fg.axis
            jump = uin_q - uout_q
            zw = J(fg.fmeas)[:, None, None] * w[None, :, None]
            penw = pen[:, None, None] * w[None, :, None]
            if geom:
                Hi_, Ho_, Ri_, Ro_, _ = gt["face"][gi]
                Hi, Ho = J(Hi_), J(Ho_)
                Ri, Ro = J(Ri_), J(Ro_)
                duin = jnp.einsum("nci,biq,nqba->nqac", u_in, Di, Hi)
                duout = jnp.einsum("nci,biq,nqba->nqac", u_out, Do, Ho)

                def sig_of(du):
                    eps = 0.5 * (du + jnp.swapaxes(du, -2, -1))
                    div = jnp.trace(du, axis1=-2, axis2=-1)
                    return (2 * mu * eps + lam * div[..., None, None]
                            * jnp.eye(d, dtype=dtype))

                # co-normal tractions g sigma(u) n_phys per side
                t_avg = 0.5 * (
                    jnp.einsum("nqa,nqac->nqc", Ri, sig_of(duin))
                    + jnp.einsum("nqa,nqac->nqc", Ro, sig_of(duout)))
            else:
                duin = jnp.einsum("nci,biq->nqbc", u_in, Di) \
                    * J(g["ih_in"])[:, None, :, None]
                duout = jnp.einsum("nci,biq->nqbc", u_out, Do) \
                    * J(g["ih_out"])[:, None, :, None]
                t_avg = 0.5 * (traction(duin, ax, mu, lam)
                               + traction(duout, ax, mu, lam))
            # value-type contributions (multiply V of the test side)
            tv_in = zw * (-t_avg) + penw * jump
            tv_out = zw * t_avg - penw * jump
            y_in = jnp.einsum("nqc,iq->nci", tv_in, Vi)
            y_out = jnp.einsum("nqc,iq->nci", tv_out, Vo)
            if geom:
                # test-gradient term -1/2 [u].(g sigma(v) n_phys):
                # P_S[n,q,c,i] = (∂_c phi_i)_phys, Q_S = R.P
                zw2 = J(fg.fmeas)[:, None] * w[None, :]
                for (Dt, Hs, Rs, tgt, sidep, pos) in (
                        (Di, Hi, Ri, "in", fg.p_in, fg.in_pos),
                        (Do, Ho, Ro, "out", fg.p_out, fg.out_pos)):
                    P = jnp.einsum("biq,nqbc->nqci", Dt, Hs)
                    Q = jnp.einsum("nqc,nqci->nqi", Rs, P)
                    A1 = jnp.einsum("nqk,nqki->nqi", jump, P)
                    tg = (mu * jnp.einsum("nq,nqc,nqi->nci", zw2, Rs, A1)
                          + mu * jnp.einsum("nq,nqc,nqi->nci", zw2, jump, Q)
                          + lam * jnp.einsum("nq,nq,nqci->nci", zw2,
                                             jnp.einsum("nqc,nqc->nq",
                                                        jump, Rs), P))
                    if tgt == "in":
                        y_in = y_in - 0.5 * tg
                    else:
                        y_out = y_out - 0.5 * tg
            else:
                # gradient-type: -1/2 [u].(sigma(phi) n) with n = e_ax
                def test_tensor(jmp):
                    T = jnp.zeros(jmp.shape[:2] + (d, d), dtype)
                    T = T.at[..., ax, :].add(mu * jmp)
                    T = T.at[..., :, ax].add(mu * jmp)
                    T = T + lam * jmp[..., ax][..., None, None] \
                        * jnp.eye(d, dtype=dtype)
                    return T

                Tj = test_tensor(jump)
                tg_in = (-0.5) * zw[..., None] * Tj \
                    * J(g["ih_in"])[:, None, :, None]
                tg_out = (-0.5) * zw[..., None] * Tj \
                    * J(g["ih_out"])[:, None, :, None]
                y_in = y_in + jnp.einsum("nqbc,biq->nci", tg_in, Di)
                y_out = y_out + jnp.einsum("nqbc,biq->nci", tg_out, Do)
            y[fg.p_in] = y[fg.p_in].at[jnp.asarray(fg.in_pos)].add(
                y_in.reshape(-1, d * nli))
            y[fg.p_out] = y[fg.p_out].at[jnp.asarray(fg.out_pos)].add(
                y_out.reshape(-1, d * nlo))

        # -------- Dirichlet boundary --------
        for bi, g in enumerate(bgroups):
            bg = g["bg"]
            ft = g["ft"]
            w = J(ft["weights"])
            pen = J(gt["bnd"][bi][2] if geom else g["pen"])
            nl = (bg.p + 1) ** d
            u = x[bg.p][jnp.asarray(bg.pos)].reshape(-1, d, nl)
            V, Dall = J(ft["V"]), J(ft["Dall"])
            uq = jnp.einsum("nci,iq->nqc", u, V)
            ax = bg.axis
            zw = J(bg.fmeas)[:, None, None] * w[None, :, None]
            penw = pen[:, None, None] * w[None, :, None]
            if geom:
                Hb_, Rb_, _ = gt["bnd"][bi]
                Hb, Rb = J(Hb_), J(Rb_)
                du = jnp.einsum("nci,biq,nqba->nqac", u, Dall, Hb)
                eps = 0.5 * (du + jnp.swapaxes(du, -2, -1))
                div = jnp.trace(du, axis1=-2, axis2=-1)
                sig = (2 * mu * eps + lam * div[..., None, None]
                       * jnp.eye(d, dtype=dtype))
                t_full = jnp.einsum("nqa,nqac->nqc", Rb, sig)
                tv = zw * (-t_full) + penw * uq
                zw2 = J(bg.fmeas)[:, None] * w[None, :]
                P = jnp.einsum("biq,nqbc->nqci", Dall, Hb)
                Q = jnp.einsum("nqc,nqci->nqi", Rb, P)
                A1 = jnp.einsum("nqk,nqki->nqi", uq, P)
                tg = (mu * jnp.einsum("nq,nqc,nqi->nci", zw2, Rb, A1)
                      + mu * jnp.einsum("nq,nqc,nqi->nci", zw2, uq, Q)
                      + lam * jnp.einsum("nq,nq,nqci->nci", zw2,
                                         jnp.einsum("nqc,nqc->nq", uq, Rb),
                                         P))
                yb = jnp.einsum("nqc,iq->nci", tv, V) - tg
            else:
                du = jnp.einsum("nci,biq->nqbc", u, Dall) \
                    * J(g["ih"])[:, None, :, None]
                t_full = g["sign"] * traction(du, ax, mu, lam)
                tv = zw * (-t_full) + penw * uq
                T = jnp.zeros(uq.shape[:2] + (d, d), dtype)
                T = T.at[..., ax, :].add(mu * uq)
                T = T.at[..., :, ax].add(mu * uq)
                T = T + lam * uq[..., ax][..., None, None] \
                    * jnp.eye(d, dtype=dtype)
                tg = (-1.0) * zw[..., None] * T \
                    * (g["sign"] * J(g["ih"]))[:, None, :, None]
                yb = (jnp.einsum("nqc,iq->nci", tv, V)
                      + jnp.einsum("nqbc,biq->nci", tg, Dall))
            y[bg.p] = y[bg.p].at[jnp.asarray(bg.pos)].add(
                yb.reshape(-1, d * nl))
        return y

    return apply


def elasticity_diagonal_blocks(basis: DGBasis, mu: float = 1.0,
                               lam: float = 1.0, penalty: float = 6.0,
                               dirichlet: bool = False,
                               dtype=jnp.float64) -> dict:
    """p -> [n_p, dim*bs, dim*bs] diagonal (vector) blocks of the SIPG
    elasticity operator, for matrix-free block-Jacobi smoothing — the
    elasticity member of the diagonal-block factory family (the
    reference's assembled-block flavor, slowipdgdiag.hh:22-27 pattern,
    here batched over the whole mesh at once)."""
    require_classic_faces(basis.mesh, "elasticity_diagonal_blocks")
    from hpdg_tpu.assemble.elasticity import assemble_elasticity
    from hpdg_tpu.linalg.blockmatrix import extract_diagonal
    A = assemble_elasticity(basis, mu=mu, lam=lam, penalty=penalty,
                            dirichlet=dirichlet, dtype=dtype)
    return extract_diagonal(A)
