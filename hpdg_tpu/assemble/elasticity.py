"""Batched SIPG assembly for linear elasticity (vector-valued blocks).

BASELINE config 4: 3D linear elasticity hp-DG.  The reference reaches
vector-valued problems through dune-fufem's generic assemblers on
power bases; here the elasticity forms are first-class batched kernels.

Bilinear form: a(u,v) = ∫ 2 mu eps(u):eps(v) + lam (div u)(div v)
plus SIPG skeleton terms with traction averages {sigma(u) n}, vector
jumps [u], and penalty sigma_0 max(p)^2/|f| ∫ [u].[v]
(conventions as the scalar assembler, assemble/sipg.py).

Local dof ordering: component-major, dof = c * (p+1)^dim + i, so a
vector coefficient block is ``[ncomp, (p+1)^dim]`` flattened — p/h
transfer blocks act on the node index only (see transfer.element).
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
from hpdg_tpu.linalg.blockmatrix import BlockSparseMatrix, zeros_values


def assemble_elasticity(basis: DGBasis, mu: float = 1.0, lam: float = 1.0,
                        penalty: float = 2.0, dirichlet: bool = False,
                        dtype=jnp.float64, plan: AssemblyPlan | None = None,
                        penalty_scaling: str = "measure"
                        ) -> BlockSparseMatrix:
    require_classic_faces(basis.mesh, "assemble_elasticity")
    from hpdg_tpu.mesh import geometry as geo
    if geo.has_geometry(basis.mesh):
        return _assemble_elasticity_geom(basis, mu, lam, penalty, dirichlet,
                                         dtype, plan, penalty_scaling)
    plan = plan or build_plan(basis)
    mesh = basis.mesh
    d = mesh.dim
    vals = zeros_values(plan.pattern, d, block_shape=(d, d), dtype=dtype)
    J = lambda a: jnp.asarray(a, dtype)  # noqa: E731

    # ---------------- bulk ----------------
    for p in basis.bucket_degrees:
        vt = tensor.volume_tables(p, d, p + 2, family=basis.family)
        G, w = vt["G"], vt["weights"]
        nl = (p + 1) ** d
        SS = np.einsum("q,aiq,bjq->abij", w, G, G)  # (d, d, nl, nl)
        elems = basis.bucket_elems[p]
        ext = mesh.extent[elems]
        detJ = np.prod(ext, axis=1)
        g = detJ[:, None, None] / (ext[:, :, None] * ext[:, None, :])
        nelem = len(elems)
        blk = jnp.zeros((nelem, d, nl, d, nl), dtype)
        # mu * delta_ce * sum_a g_aa S_aa
        lap = jnp.einsum("na,aij->nij", J(np.einsum("naa->na", g)),
                         J(np.einsum("aaij->aij", SS)))
        for c in range(d):
            blk = blk.at[:, c, :, c, :].add(mu * lap)
            for e in range(d):
                blk = blk.at[:, c, :, e, :].add(
                    mu * J(g[:, e, c])[:, None, None] * J(SS[e, c])
                    + lam * J(g[:, c, e])[:, None, None] * J(SS[c, e]))
        n = basis.bucket_size(p)
        vals[(p, p)] = vals[(p, p)].at[:n].add(
            blk.reshape(nelem, d * nl, d * nl))

    # ---------------- interior faces ----------------
    for fg in plan.face_groups:
        pi, po, ax = fg.p_in, fg.p_out, fg.axis
        pmax = max(pi, po)
        fin, fout = face_group_tables(basis, fg, pmax + 2)
        w = fin["weights"]
        pen = penalty_coef(fg, penalty, pmax, penalty_scaling)  # (nf,)
        ein = mesh.faces.inside[fg.face_ids]
        eout = mesh.faces.outside[fg.face_ids]
        IH = {1.0: 1.0 / mesh.extent[ein],   # keyed by jump sign
              -1.0: 1.0 / mesh.extent[eout]}
        tabs = {1.0: fin, -1.0: fout}
        nf = len(fg.face_ids)
        fmeas = fg.fmeas

        def face_blocks(sA, sB):
            """[nf, d, nlA, d, nlB] block batch for (test side, trial side)."""
            TA, TB = tabs[sA], tabs[sB]
            nlA, nlB = TA["V"].shape[0], TB["V"].shape[0]
            FVD = np.einsum("iq,q,bjq->bij", TA["V"], w, TB["Dall"])
            FDV = np.einsum("biq,q,jq->bij", TA["Dall"], w, TB["V"])
            FVV = np.einsum("iq,q,jq->ij", TA["V"], w, TB["V"])
            ihA, ihB = IH[sA], IH[sB]
            out = jnp.zeros((nf, d, nlA, d, nlB), dtype)
            zA = J(-0.5 * sA * fmeas)
            zB = J(-0.5 * sB * fmeas)
            for c in range(d):
                for e in range(d):
                    M = jnp.zeros((nf, nlA, nlB), dtype)
                    # -1/2 sA {sigma(u) n}_c v_A  (trial derivs, side B)
                    if c == e:
                        M += (zA * mu * J(ihB[:, ax]))[:, None, None] * J(FVD[ax])
                    if e == ax:
                        M += (zA * mu * J(ihB[:, c]))[:, None, None] * J(FVD[c])
                    if c == ax:
                        M += (zA * lam * J(ihB[:, e]))[:, None, None] * J(FVD[e])
                    # -1/2 sB {sigma(v) n}_e u_B  (test derivs, side A)
                    if c == e:
                        M += (zB * mu * J(ihA[:, ax]))[:, None, None] * J(FDV[ax])
                    if c == ax:
                        M += (zB * mu * J(ihA[:, e]))[:, None, None] * J(FDV[e])
                    if e == ax:
                        M += (zB * lam * J(ihA[:, c]))[:, None, None] * J(FDV[c])
                    if c == e:
                        M += (sA * sB) * J(pen)[:, None, None] * J(FVV)[None]
                    out = out.at[:, c, :, e, :].add(M)
            return out

        nli, nlo = (pi + 1) ** d, (po + 1) ** d
        M11 = face_blocks(1.0, 1.0).reshape(nf, d * nli, d * nli)
        M12 = face_blocks(1.0, -1.0).reshape(nf, d * nli, d * nlo)
        M21 = face_blocks(-1.0, 1.0).reshape(nf, d * nlo, d * nli)
        M22 = face_blocks(-1.0, -1.0).reshape(nf, d * nlo, d * nlo)
        vals[(pi, pi)] = vals[(pi, pi)].at[jnp.asarray(fg.in_pos)].add(M11)
        vals[(po, po)] = vals[(po, po)].at[jnp.asarray(fg.out_pos)].add(M22)
        vals[(pi, po)] = vals[(pi, po)].at[jnp.asarray(fg.slot12)].add(M12)
        vals[(po, pi)] = vals[(po, pi)].at[jnp.asarray(fg.slot21)].add(M21)

    # ---------------- Dirichlet boundary ----------------
    if dirichlet:
        for bg in plan.boundary_groups:
            p, ax, side = bg.p, bg.axis, bg.side
            sgn = 1.0 if side == 1 else -1.0
            ft = tensor.face_tables(p, d, ax, side, p + 2, family=basis.family)
            w = ft["weights"]
            nl = (p + 1) ** d
            pen = boundary_penalty_coef(bg, penalty, penalty_scaling)
            elems = mesh.bfaces.elem[bg.face_ids]
            ih = sgn / mesh.extent[elems]  # signed normal derivative scale
            nf = len(bg.face_ids)
            FVD = np.einsum("iq,q,bjq->bij", ft["V"], w, ft["Dall"])
            FDV = np.einsum("biq,q,jq->bij", ft["Dall"], w, ft["V"])
            FVV = np.einsum("iq,q,jq->ij", ft["V"], w, ft["V"])
            z = J(-bg.fmeas)
            out = jnp.zeros((nf, d, nl, d, nl), dtype)
            for c in range(d):
                for e in range(d):
                    M = jnp.zeros((nf, nl, nl), dtype)
                    if c == e:
                        M += (z * mu * J(ih[:, ax]))[:, None, None] * J(FVD[ax])
                        M += (z * mu * J(ih[:, ax]))[:, None, None] * J(FDV[ax])
                        M += J(pen)[:, None, None] * J(FVV)[None]
                    if e == ax:
                        M += (z * mu * J(ih[:, c]))[:, None, None] * J(FVD[c])
                        M += (z * lam * J(ih[:, c]))[:, None, None] * J(FDV[c])
                    if c == ax:
                        M += (z * lam * J(ih[:, e]))[:, None, None] * J(FVD[e])
                        M += (z * mu * J(ih[:, e]))[:, None, None] * J(FDV[e])
                    out = out.at[:, c, :, e, :].add(M)
            vals[(p, p)] = vals[(p, p)].at[jnp.asarray(bg.pos)].add(
                out.reshape(nf, d * nl, d * nl))

    return BlockSparseMatrix(plan.pattern, d, vals, block_shape=(d, d))


def _assemble_elasticity_geom(basis: DGBasis, mu, lam, penalty, dirichlet,
                              dtype, plan, penalty_scaling
                              ) -> BlockSparseMatrix:
    """Elasticity assembly on meshes with first-class geometry (affine /
    trilinear Q1): per-quad-point Jacobians through the pullback.

    The physical gradient operator per point is the table
    ``P[n,q,a,i] = sum_m Ghat_m[i,q] Jinv[n,q,m,a]`` (Ghat the global-
    parametric derivative tables); the co-normal traction uses the
    Nanson covector ``R[n,q,b] = |det J| Jinv[n,q,ax,b]`` — pointwise,
    ``g (sigma(u) n_phys)_c = mu R_b D_c u_b + mu (R.Dhat) u_c
    + lam R_c div u`` keeps the PARAMETRIC face measure in the
    quadrature weight, exactly as the scalar path (mesh/geometry.py).
    Reference role: dune-fufem's generic elasticity assemblers reading
    jacobianInverseTransposed per point on arbitrary DUNE grids."""
    from hpdg_tpu.mesh import geometry as geo
    plan = plan or build_plan(basis)
    mesh = basis.mesh
    d = mesh.dim
    vals = zeros_values(plan.pattern, d, block_shape=(d, d), dtype=dtype)
    J = lambda a: jnp.asarray(a, dtype)  # noqa: E731

    def geom_at(elems, xpq):
        Jac = geo.jacobians(mesh, elems, xpq)      # (n, q, d, d)
        Ji = np.linalg.inv(Jac)
        dA = np.abs(np.linalg.det(Jac))            # (n, q)
        return Ji, dA

    def p_table(Dall, elems, Ji):
        """P[n,q,a,i]: physical derivative a of local basis i per point;
        Dall: (d, nl, q) local-parametric derivative tables."""
        ih = 1.0 / mesh.extent[elems]              # (n, d)
        return np.einsum("miq,nm,nqma->nqai", Dall, ih, Ji)

    # ---------------- bulk ----------------
    for p in basis.bucket_degrees:
        vt = tensor.volume_tables(p, d, p + 2, family=basis.family)
        G, w = vt["G"], vt["weights"]
        nl = (p + 1) ** d
        elems = basis.bucket_elems[p]
        ext = mesh.extent[elems]
        detp = np.prod(ext, axis=1)
        xpq = (mesh.lower[elems][:, None, :]
               + vt["points"][None, :, :] * ext[:, None, :])
        Ji, dA = geom_at(elems, xpq)
        P = p_table(G, elems, Ji)                  # (n, q, d, nl)
        wdet = w[None, :] * detp[:, None] * dA     # (n, q)
        A1 = np.einsum("nq,nqai,nqaj->nij", wdet, P, P)
        B2 = np.einsum("nq,nqei,nqcj->nceij", wdet, P, P)
        B3 = np.einsum("nq,nqci,nqej->nceij", wdet, P, P)
        nelem = len(elems)
        blk = mu * B2 + lam * B3
        for c in range(d):
            blk[:, c, c] += mu * A1
        # blk[n, c, e, i, j] -> [n, c, i, e, j]
        blk = np.transpose(blk, (0, 1, 3, 2, 4))
        n = basis.bucket_size(p)
        vals[(p, p)] = vals[(p, p)].at[:n].add(
            J(blk.reshape(nelem, d * nl, d * nl)))

    # ---------------- interior faces ----------------
    from hpdg_tpu.assemble.plan import face_phys_points

    def traction(Pb, R, Q):
        """T[n,q,c,b,j] = mu R_b P[c,j] + mu delta_cb Q[j] + lam R_c P[b,j]
        — the co-normal traction operator g sigma(.) n_phys per point."""
        T = (mu * np.einsum("nqb,nqcj->nqcbj", R, Pb)
             + lam * np.einsum("nqc,nqbj->nqcbj", R, Pb))
        for c in range(d):
            T[:, :, c, c, :] += mu * Q
        return T

    for fg in plan.face_groups:
        pi, po, ax = fg.p_in, fg.p_out, fg.axis
        pmax = max(pi, po)
        fin, fout = face_group_tables(basis, fg, pmax + 2)
        w = fin["weights"]
        pen = geo.penalty_coef_mesh(mesh, fg, penalty, pmax, penalty_scaling)
        ein = mesh.faces.inside[fg.face_ids]
        eout = mesh.faces.outside[fg.face_ids]
        xpq = face_phys_points(basis, fg, fin["points"])
        xpq_o = face_phys_points(basis, fg, fin["points"], side="out")
        sides = {}
        for sgn, elems, tab, xq in ((1.0, ein, fin, xpq),
                                    (-1.0, eout, fout, xpq_o)):
            Ji, dA = geom_at(elems, xq)
            P = p_table(tab["Dall"], elems, Ji)
            R = dA[..., None] * Ji[:, :, ax, :]    # (n, q, d)
            Q = np.einsum("nqb,nqbj->nqj", R, P)
            sides[sgn] = dict(V=tab["V"], T=traction(P, R, Q))
        nf = len(fg.face_ids)
        zw = np.asarray(fg.fmeas)[:, None] * w[None, :]  # (nf, q)

        def face_blocks(sA, sB):
            A_, B_ = sides[sA], sides[sB]
            nlA, nlB = A_["V"].shape[0], B_["V"].shape[0]
            M = (-0.5 * sA * np.einsum("nq,iq,nqcej->nciej",
                                       zw, A_["V"], B_["T"])
                 - 0.5 * sB * np.einsum("nq,jq,nqeci->nciej",
                                        zw, B_["V"], A_["T"]))
            FVV = np.einsum("iq,q,jq->ij", A_["V"], w, B_["V"])
            penf = (sA * sB) * pen
            for c in range(d):
                M[:, c, :, c, :] += penf[:, None, None] * FVV[None]
            return J(M.reshape(nf, d * nlA, d * nlB))

        vals[(pi, pi)] = vals[(pi, pi)].at[jnp.asarray(fg.in_pos)].add(
            face_blocks(1.0, 1.0))
        vals[(po, po)] = vals[(po, po)].at[jnp.asarray(fg.out_pos)].add(
            face_blocks(-1.0, -1.0))
        vals[(pi, po)] = vals[(pi, po)].at[jnp.asarray(fg.slot12)].add(
            face_blocks(1.0, -1.0))
        vals[(po, pi)] = vals[(po, pi)].at[jnp.asarray(fg.slot21)].add(
            face_blocks(-1.0, 1.0))

    # ---------------- Dirichlet boundary ----------------
    if dirichlet:
        for bg in plan.boundary_groups:
            p, ax, side = bg.p, bg.axis, bg.side
            sgn = 1.0 if side == 1 else -1.0
            ft = tensor.face_tables(p, d, ax, side, p + 2,
                                    family=basis.family)
            w = ft["weights"]
            nl = (p + 1) ** d
            pen = geo.boundary_penalty_coef_mesh(mesh, bg, penalty,
                                                 penalty_scaling)
            elems = mesh.bfaces.elem[bg.face_ids]
            nf = len(bg.face_ids)
            lo = mesh.lower[elems].copy()
            if side == 1:
                lo[:, ax] += mesh.extent[elems, ax]
            tang = [a for a in range(d) if a != ax]
            xpq = np.repeat(lo[:, None, :], len(w), axis=1)
            for t, a in enumerate(tang):
                xpq[:, :, a] += ft["points"][None, :, t] \
                    * mesh.extent[elems, a][:, None]
            Ji, dA = geom_at(elems, xpq)
            P = p_table(ft["Dall"], elems, Ji)
            R = sgn * dA[..., None] * Ji[:, :, ax, :]  # outward
            Q = np.einsum("nqb,nqbj->nqj", R, P)
            T = traction(P, R, Q)
            zw = w[None, :] * np.asarray(bg.fmeas)[:, None]
            M = (-np.einsum("nq,iq,nqcej->nciej", zw, ft["V"], T)
                 - np.einsum("nq,jq,nqeci->nciej", zw, ft["V"], T))
            FVV = np.einsum("iq,q,jq->ij", ft["V"], w, ft["V"])
            for c in range(d):
                M[:, c, :, c, :] += pen[:, None, None] * FVV[None]
            vals[(p, p)] = vals[(p, p)].at[jnp.asarray(bg.pos)].add(
                J(M.reshape(nf, d * nl, d * nl)))

    return BlockSparseMatrix(plan.pattern, d, vals, block_shape=(d, d))


def l2_functional_vec(basis: DGBasis, f, quad_order=None, dtype=jnp.float64
                      ) -> dict:
    """Vector load: b_{(c,i)} = ∫ f_c phi_i; f maps (..., dim) points to
    (..., dim) values.  Component-major layout."""
    from hpdg_tpu import quadrature as quad
    mesh = basis.mesh
    d = mesh.dim
    out = {}
    for p in basis.bucket_degrees:
        order = quad_order if quad_order is not None else 2 * p + 2
        nq1 = max(1, (order + 2) // 2)
        vt = tensor.volume_tables(p, d, nq1, family=basis.family,
                                  quad_family="legendre")
        V, w = vt["V"], vt["weights"]
        elems = basis.bucket_elems[p]
        ext = mesh.extent[elems]
        from hpdg_tpu.mesh import geometry as geo
        detp = np.prod(ext, axis=1)
        xp = (mesh.lower[elems][:, None, :]
              + vt["points"][None, :, :] * ext[:, None, :])
        if geo.is_trilinear(mesh):
            detJ = jnp.asarray(detp[:, None]
                               * geo.detj_phys(mesh, elems, xp), dtype)
        else:
            detJ = jnp.asarray((detp * geo.detj_phys(mesh, elems))[:, None],
                               dtype)
        x = geo.apply_map(mesh, elems, xp)
        fv = jnp.asarray(f(jnp.asarray(x, dtype)), dtype)  # (n, nq, d)
        fw = fv * jnp.asarray(w, dtype)[None, :, None] * detJ[:, :, None]
        b = jnp.einsum("eqc,iq->eci", fw, jnp.asarray(V, dtype))
        out[p] = b.reshape(len(elems), d * (p + 1) ** d)
    return out
