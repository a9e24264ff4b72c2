"""Right-hand-side functionals: L2 load vector and SIPG Dirichlet data.

Analogs of BuildingBlocks::l2Functional and ::dirichletData
(buildingblocks/rhs.hh:26-104, assemblers/localassemblers/
ipdgboundaryassembler.hh:131-137 with DGType = -1 i.e. SIPG).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from hpdg_tpu.basis import tensor
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.assemble.plan import (AssemblyPlan, build_plan,
                                    boundary_penalty_coef)
from hpdg_tpu.linalg import blockvector as bv


def l2_functional(basis: DGBasis, f, quad_order=None, dtype=jnp.float64) -> dict:
    """b_i = ∫ f phi_i, as a bucketed block vector.

    ``f`` is a vectorized callable on arrays of physical points (..., dim).
    Default quadrature: Gauss-Legendre exact to order 2p+2.
    """
    mesh = basis.mesh
    dim = mesh.dim
    out = {}
    for p in basis.bucket_degrees:
        order = quad_order if quad_order is not None else 2 * p + 2
        nq1 = max(1, (order + 2) // 2)
        vt = tensor.volume_tables(p, dim, nq1, family=basis.family,
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
        fv = jnp.asarray(f(jnp.asarray(x, dtype)), dtype)
        fw = fv * jnp.asarray(w, dtype)[None, :] * detJ
        out[p] = jnp.einsum("eq,iq->ei", fw, jnp.asarray(V, dtype))
    return out


def dirichlet_rhs(basis: DGBasis, g, penalty: float = 2.0,
                  dtype=jnp.float64, plan: AssemblyPlan | None = None,
                  penalty_scaling: str = "measure", diffusion=None) -> dict:
    """SIPG-consistent Dirichlet boundary functional:
    b_i += ∫_bdry g * (mu * v_i - (K grad v_i).n), mu = penalty p^2/|f|.

    Geometry-aware (affine / trilinear meshes) and coefficient-aware, so
    it is the exact adjoint-consistent companion of
    ``assemble_laplace(..., dirichlet=True, diffusion=...)`` — the role
    of IPDGBoundaryAssembler (ipdgboundaryassembler.hh:31-120)."""
    from hpdg_tpu.mesh import geometry as geo
    plan = plan or build_plan(basis)
    mesh = basis.mesh
    dim = mesh.dim
    geom = geo.has_geometry(mesh)
    kmat = geom
    if diffusion is not None and not kmat:
        probe = np.asarray(diffusion(jnp.full((1, dim), 0.5, dtype)))
        kmat = probe.ndim >= 3
    out = bv.zeros(basis, dtype=dtype)
    for bg in plan.boundary_groups:
        p, ax, side = bg.p, bg.axis, bg.side
        sign = 1.0 if side == 1 else -1.0
        ft = tensor.face_tables(p, dim, ax, side, p + 2, family=basis.family)
        w, V, D = ft["weights"], ft["V"], ft["Dn"]
        pen = (geo.boundary_penalty_coef_mesh(mesh, bg, penalty,
                                              penalty_scaling)
               if geom else
               boundary_penalty_coef(bg, penalty, penalty_scaling))  # (nf,)
        elems = mesh.bfaces.elem[bg.face_ids]
        lo = mesh.lower[elems].copy()
        if side == 1:
            lo[:, ax] += mesh.extent[elems, ax]
        tang = [a for a in range(dim) if a != ax]
        xp = np.repeat(lo[:, None, :], len(w), axis=1)
        for t, a in enumerate(tang):
            xp[:, :, a] += ft["points"][None, :, t] * mesh.extent[elems, a][:, None]
        x = geo.apply_map(mesh, elems, xp)
        gv = jnp.asarray(g(jnp.asarray(x, dtype)), dtype)  # (nf, q)
        wj = jnp.asarray(w, dtype)
        k = (jnp.asarray(diffusion(jnp.asarray(x, dtype)), dtype)
             if diffusion is not None else None)
        # mu * |f| * w = pen_f * w (per-face penalty convention)
        penpart = (jnp.asarray(pen, dtype)[:, None]
                   * jnp.einsum("fq,iq->fi", gv * wj[None],
                                jnp.asarray(V, dtype)))
        if kmat:
            keff = geo.effective_tensor(mesh, elems, k, xp) if geom else k
            Ka = jnp.asarray(keff, dtype)[..., ax, :]       # (nf, q, dim)
            ih = jnp.asarray(1.0 / mesh.extent[elems], dtype)
            Dall = jnp.asarray(ft["Dall"], dtype)
            zg = gv * wj[None] * jnp.asarray(bg.fmeas, dtype)[:, None]
            cons = sign * jnp.einsum("fq,fqb,fb,biq->fi", zg, Ka, ih, Dall)
        else:
            kz = gv if k is None else gv * k
            cons = jnp.einsum("fq,iq->fi",
                              kz * wj[None] * jnp.asarray(
                                  sign * bg.fmeas * bg.inv_h,
                                  dtype)[:, None],
                              jnp.asarray(D, dtype))
        contrib = penpart - cons
        out[p] = out[p].at[jnp.asarray(bg.pos)].add(contrib)
    return out


def neumann_rhs(basis: DGBasis, g, dtype=jnp.float64,
                plan: AssemblyPlan | None = None) -> dict:
    """Neumann boundary functional b_i = ∫_bdry g v_i (the non-Dirichlet
    branch of the reference's boundary assembler,
    ipdgboundaryassembler.hh:62-75)."""
    plan = plan or build_plan(basis)
    mesh = basis.mesh
    dim = mesh.dim
    out = bv.zeros(basis, dtype=dtype)
    for bg in plan.boundary_groups:
        p, ax, side = bg.p, bg.axis, bg.side
        ft = tensor.face_tables(p, dim, ax, side, p + 2, family=basis.family)
        w, V = ft["weights"], ft["V"]
        elems = mesh.bfaces.elem[bg.face_ids]
        lo = mesh.lower[elems].copy()
        if side == 1:
            lo[:, ax] += mesh.extent[elems, ax]
        tang = [a for a in range(dim) if a != ax]
        xp = np.repeat(lo[:, None, :], len(w), axis=1)
        for t, a in enumerate(tang):
            xp[:, :, a] += ft["points"][None, :, t] * mesh.extent[elems, a][:, None]
        from hpdg_tpu.mesh import geometry as geo
        x = geo.apply_map(mesh, elems, xp)
        gv = jnp.asarray(g(jnp.asarray(x, dtype)), dtype)
        zw = jnp.asarray(bg.fmeas, dtype)[:, None] * jnp.asarray(w, dtype)[None]
        if geo.has_geometry(mesh):
            # physical surface measure: per-point Nanson factor
            zw = zw * jnp.asarray(
                geo.face_jacobian_factor(mesh, elems, ax, xp), dtype)
        contrib = jnp.einsum("fq,iq->fi", gv * zw, jnp.asarray(V, dtype))
        out[p] = out[p].at[jnp.asarray(bg.pos)].add(contrib)
    return out
