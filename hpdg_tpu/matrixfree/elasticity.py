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
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.assemble.plan import (AssemblyPlan, build_plan,
                                    face_group_tables, penalty_coef,
                                    boundary_penalty_coef)


def elasticity_operator(basis: DGBasis, mu: float = 1.0, lam: float = 1.0,
                        penalty: float = 2.0, dirichlet: bool = False,
                        dtype=jnp.float64, plan: AssemblyPlan | None = None,
                        penalty_scaling: str = "measure",
                        include_bulk: bool = True):
    """Returns apply: {p: [n, dim*(p+1)^dim]} -> same (jit-safe).

    ``include_bulk=False`` gives the skeleton/boundary terms only (used
    by the sharded layer's masked boundary corrections)."""
    from hpdg_tpu.mesh import geometry as geo
    if geo.has_geometry(basis.mesh):
        raise NotImplementedError(
            "matrix-free elasticity: general geometry not wired yet — "
            "use the assembled operator (assemble_elasticity handles "
            "affine/trilinear meshes)")
    plan = plan or build_plan(basis)
    mesh = basis.mesh
    d = mesh.dim
    J = lambda a: jnp.asarray(a, dtype)  # noqa: E731

    # ---- bulk prep: per bucket quadrature tables + geometry ----
    bulk_prep = {}
    for p in basis.bucket_degrees:
        vt = tensor.volume_tables(p, d, p + 2, family=basis.family)
        elems = basis.bucket_elems[p]
        ext = mesh.extent[elems]
        detJ = np.prod(ext, axis=1)
        bulk_prep[p] = (vt["G"], vt["weights"], ext, detJ)

    fgroups = []
    for fg in plan.face_groups:
        pmax = max(fg.p_in, fg.p_out)
        fin, fout = face_group_tables(basis, fg, pmax + 2)
        ein = mesh.faces.inside[fg.face_ids]
        eout = mesh.faces.outside[fg.face_ids]
        fgroups.append(dict(
            fg=fg, fin=fin, fout=fout, pmax=pmax,
            ih_in=1.0 / mesh.extent[ein],  # (nf, d)
            ih_out=1.0 / mesh.extent[eout],
        ))

    bgroups = []
    if dirichlet:
        for bg in plan.boundary_groups:
            ft = tensor.face_tables(bg.p, d, bg.axis, bg.side, bg.p + 2,
                                    family=basis.family)
            elems = mesh.bfaces.elem[bg.face_ids]
            bgroups.append(dict(
                bg=bg, ft=ft, sign=1.0 if bg.side == 1 else -1.0,
                ih=1.0 / mesh.extent[elems],
            ))

    def traction(du, ax, mu_, lam_):
        """(sigma(u) n)_c from grad array du[..., b, c] (=∂_b u_c), n=+e_ax."""
        div = jnp.trace(du, axis1=-2, axis2=-1)[..., None]
        t = mu_ * (du[..., ax, :] + du[..., :, ax])
        return t + lam_ * div * (jnp.arange(d) == ax).astype(du.dtype)

    def apply(x):
        y = {}
        if not include_bulk:
            y = {p: jnp.zeros_like(x[p]) for p in x}
        # -------- bulk: 2 mu eps(u):eps(v) + lam div div --------
        for p, (G, w, ext, detJ) in (bulk_prep.items() if include_bulk
                                     else ()):
            nl = (p + 1) ** d
            u = x[p].reshape(-1, d, nl)
            n = u.shape[0]
            Gj = J(G)
            # du[n, q, b, c] = ∂_b u_c at quad points (physical)
            du = jnp.einsum("ncj,bjq->nqbc", u, Gj,
                            preferred_element_type=dtype)
            du = du / J(ext)[:, None, :, None]
            eps = 0.5 * (du + jnp.swapaxes(du, -2, -1))
            div = jnp.trace(du, axis1=-2, axis2=-1)
            # sigma[n,q,b,c]
            sig = 2 * mu * eps + lam * div[..., None, None] * jnp.eye(d, dtype=dtype)
            # integrate: y[c,i] += Σ_q w detJ sigma_bc ∂_b phi_i / h_b
            sw = sig * (J(w)[None, :, None, None]
                        * J(detJ)[:, None, None, None])
            sw = sw / J(ext)[:, None, :, None]  # 1/h_b on the test gradient
            out = jnp.einsum("nqbc,bjq->ncj", sw, Gj,
                             preferred_element_type=dtype)
            y[p] = out.reshape(n, d * nl)

        # -------- interior faces --------
        for g in fgroups:
            fg = g["fg"]
            fin, fout = g["fin"], g["fout"]
            w = J(fin["weights"])
            pen = J(penalty_coef(fg, penalty, g["pmax"], penalty_scaling))
            nli = (fg.p_in + 1) ** d
            nlo = (fg.p_out + 1) ** d
            u_in = x[fg.p_in][jnp.asarray(fg.in_pos)].reshape(-1, d, nli)
            u_out = x[fg.p_out][jnp.asarray(fg.out_pos)].reshape(-1, d, nlo)
            Vi, Vo = J(fin["V"]), J(fout["V"])
            Di, Do = J(fin["Dall"]), J(fout["Dall"])  # (d, nl, q)
            # values and grads at face points
            uin_q = jnp.einsum("nci,iq->nqc", u_in, Vi)
            uout_q = jnp.einsum("nci,iq->nqc", u_out, Vo)
            duin = jnp.einsum("nci,biq->nqbc", u_in, Di) \
                * J(g["ih_in"])[:, None, :, None]
            duout = jnp.einsum("nci,biq->nqbc", u_out, Do) \
                * J(g["ih_out"])[:, None, :, None]
            ax = fg.axis
            jump = uin_q - uout_q
            t_avg = 0.5 * (traction(duin, ax, mu, lam)
                           + traction(duout, ax, mu, lam))
            zw = J(fg.fmeas)[:, None, None] * w[None, :, None]
            penw = pen[:, None, None] * w[None, :, None]
            # value-type contributions (multiply V of the test side)
            tv_in = zw * (-t_avg) + penw * jump
            tv_out = zw * t_avg - penw * jump
            # gradient-type: -1/2 [u].(sigma(phi) n): assemble the tensor
            # S[n,q,b,c] to integrate against ∂_b phi_i e_c of each side
            def test_tensor(jmp):
                # contributions to sigma(v)n contracted with jump/2:
                # mu (δ ∂ax + ...) pattern transposed: build T[n,q,b,c]
                T = jnp.zeros(jmp.shape[:2] + (d, d), dtype)
                # term mu δ_ce ∂_ax φ: T[ax, c] += mu * jmp_c
                T = T.at[..., ax, :].add(mu * jmp)
                # term mu δ_{c,ax} ∂_e φ: T[e, ax] += mu * jmp_e
                T = T.at[..., :, ax].add(mu * jmp)
                # term lam δ_{e,ax} ∂_c φ: T[c, c']... dive: lam * jmp_ax on diag
                T = T + lam * jmp[..., ax][..., None, None] \
                    * jnp.eye(d, dtype=dtype)
                return T

            Tj = test_tensor(jump)
            tg_in = (-0.5) * zw[..., None] * Tj * J(g["ih_in"])[:, None, :, None]
            tg_out = (-0.5) * zw[..., None] * Tj * J(g["ih_out"])[:, None, :, None]
            y_in = (jnp.einsum("nqc,iq->nci", tv_in, Vi)
                    + jnp.einsum("nqbc,biq->nci", tg_in, Di))
            y_out = (jnp.einsum("nqc,iq->nci", tv_out, Vo)
                     + jnp.einsum("nqbc,biq->nci", tg_out, Do))
            y[fg.p_in] = y[fg.p_in].at[jnp.asarray(fg.in_pos)].add(
                y_in.reshape(-1, d * nli))
            y[fg.p_out] = y[fg.p_out].at[jnp.asarray(fg.out_pos)].add(
                y_out.reshape(-1, d * nlo))

        # -------- Dirichlet boundary --------
        for g in bgroups:
            bg = g["bg"]
            ft = g["ft"]
            w = J(ft["weights"])
            pen = J(boundary_penalty_coef(bg, penalty, penalty_scaling))
            nl = (bg.p + 1) ** d
            u = x[bg.p][jnp.asarray(bg.pos)].reshape(-1, d, nl)
            V, Dall = J(ft["V"]), J(ft["Dall"])
            uq = jnp.einsum("nci,iq->nqc", u, V)
            du = jnp.einsum("nci,biq->nqbc", u, Dall) \
                * J(g["ih"])[:, None, :, None]
            ax = bg.axis
            t_full = g["sign"] * traction(du, ax, mu, lam)
            zw = J(bg.fmeas)[:, None, None] * w[None, :, None]
            penw = pen[:, None, None] * w[None, :, None]
            tv = zw * (-t_full) + penw * uq
            T = jnp.zeros(uq.shape[:2] + (d, d), dtype)
            T = T.at[..., ax, :].add(mu * uq)
            T = T.at[..., :, ax].add(mu * uq)
            T = T + lam * uq[..., ax][..., None, None] * jnp.eye(d, dtype=dtype)
            tg = (-1.0) * zw[..., None] * T * (g["sign"]
                                               * J(g["ih"]))[:, None, :, None]
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
    from hpdg_tpu.assemble.elasticity import assemble_elasticity
    from hpdg_tpu.linalg.blockmatrix import extract_diagonal
    A = assemble_elasticity(basis, mu=mu, lam=lam, penalty=penalty,
                            dirichlet=dirichlet, dtype=dtype)
    return extract_diagonal(A)
