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
        detJ = jnp.asarray(np.prod(ext, axis=1), dtype)
        x = (mesh.lower[elems][:, None, :]
             + vt["points"][None, :, :] * ext[:, None, :])
        fv = jnp.asarray(f(jnp.asarray(x, dtype)), dtype)  # (n, nq, d)
        fw = fv * jnp.asarray(w, dtype)[None, :, None] * detJ[:, None, None]
        b = jnp.einsum("eqc,iq->eci", fw, jnp.asarray(V, dtype))
        out[p] = b.reshape(len(elems), d * (p + 1) ** d)
    return out
