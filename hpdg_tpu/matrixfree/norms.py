"""DG energy-norm functionals: the per-element error indicator.

Rebuild of IPDGLocalNorm (matrix-free/localoperators/ipdglocalnorm.hh):
eta_e^2 = (∇x, ∇x)_E + Σ_{faces f ∋ E} sigma max(p)^2 / (2|f|) ∫_f [x]^2
(each interior face splits its jump energy evenly between its two
elements; boundary faces contribute fully to their element when
``dirichlet``).  This drives the hp-adaptive loop
(buildingblocks/estimating.hh:12-58).
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
from hpdg_tpu.matrixfree.sumfact import _fwd_spec, _chain


def ipdg_local_norm(basis: DGBasis, penalty: float = 2.0,
                    dirichlet: bool = False, dtype=jnp.float64,
                    plan: AssemblyPlan | None = None,
                    penalty_scaling: str = "measure"):
    """Returns apply(x) -> (n_elements,) array of eta_e^2 (flat element order)."""
    require_classic_faces(basis.mesh, "ipdg_local_norm")
    plan = plan or build_plan(basis)
    dim = basis.dim
    mesh = basis.mesh
    fwd = _fwd_spec(dim)

    from hpdg_tpu.mesh import geometry as geo
    geom = geo.has_geometry(mesh)

    def apply(x):
        eta = jnp.zeros(mesh.n_elements, dtype=dtype)
        # bulk: |∇x|^2 per element (PHYSICAL gradient for affine /
        # trilinear geometry, via the effective tensor |det J| J^-1 J^-T)
        for p in basis.bucket_degrees:
            vt = tensor.volume_tables(p, dim, p + 2, family=basis.family)
            t1 = vt["t1d"]
            elems = basis.bucket_elems[p]
            ext = mesh.extent[elems]
            detJ = np.prod(ext, axis=1)
            d1 = p + 1
            u = x[p].reshape((-1,) + (d1,) * dim)
            qshape = (len(t1.qweights),) * dim
            wq = jnp.asarray(vt["weights"].reshape(qshape), dtype)
            if geom:
                xpq = (mesh.lower[elems][:, None, :]
                       + vt["points"][None, :, :] * ext[:, None, :])
                G = np.asarray(geo.effective_tensor(mesh, elems, None, xpq))
                G = G.reshape((-1,) + qshape + (dim, dim))
                dus = []
                for a in range(dim):
                    tabs = [t1.derivatives if b == a else t1.values
                            for b in range(dim)]
                    dus.append(_chain(u, tabs, fwd, dtype)
                               * jnp.asarray(1.0 / ext[:, a], dtype).reshape(
                                   (-1,) + (1,) * dim))
                acc = 0.0
                dp = jnp.asarray(detJ, dtype)
                for a in range(dim):
                    for b in range(dim):
                        acc = acc + dp * jnp.sum(
                            wq[None] * jnp.asarray(G[..., a, b], dtype)
                            * dus[a] * dus[b],
                            axis=tuple(range(1, dim + 1)))
            else:
                acc = 0.0
                for a in range(dim):
                    tabs = [t1.derivatives if b == a else t1.values
                            for b in range(dim)]
                    du = _chain(u, tabs, fwd, dtype)
                    coef = jnp.asarray(detJ / ext[:, a] ** 2, dtype)
                    acc = acc + coef * jnp.sum(
                        wq[None] * du**2, axis=tuple(range(1, dim + 1)))
            eta = eta.at[jnp.asarray(basis.bucket_elems[p])].add(acc)
        # interior faces: sigma max(p)^2/(2|f|) ∫ [x]^2 to both elements
        for fg in plan.face_groups:
            pmax = max(fg.p_in, fg.p_out)
            fin, fout = face_group_tables(basis, fg, pmax + 2)
            u_in = x[fg.p_in][jnp.asarray(fg.in_pos)]
            u_out = x[fg.p_out][jnp.asarray(fg.out_pos)]
            jump = u_in @ jnp.asarray(fin["V"], dtype) - \
                u_out @ jnp.asarray(fout["V"], dtype)
            w = jnp.asarray(fin["weights"], dtype)
            # mu/2 * |f| * w_q = pen_f w_q / 2
            penf = jnp.asarray(penalty_coef(fg, penalty, pmax,
                                            penalty_scaling), dtype)
            contrib = 0.5 * penf * jnp.sum(w[None] * jump**2, axis=1)
            ein = jnp.asarray(mesh.faces.inside[fg.face_ids])
            eout = jnp.asarray(mesh.faces.outside[fg.face_ids])
            eta = eta.at[ein].add(contrib).at[eout].add(contrib)
        if dirichlet:
            for bg in plan.boundary_groups:  # noqa: E301
                ft = tensor.face_tables(bg.p, dim, bg.axis, bg.side,
                                        bg.p + 2, family=basis.family)
                u = x[bg.p][jnp.asarray(bg.pos)]
                tr = u @ jnp.asarray(ft["V"], dtype)
                w = jnp.asarray(ft["weights"], dtype)
                penb = jnp.asarray(boundary_penalty_coef(
                    bg, penalty, penalty_scaling), dtype)
                contrib = penb * jnp.sum(w[None] * tr**2, axis=1)
                elems = jnp.asarray(mesh.bfaces.elem[bg.face_ids])
                eta = eta.at[elems].add(contrib)
        return eta

    return apply


def jump_indicator(basis: DGBasis, penalty: float = 2.0,
                   dtype=jnp.float64, plan: AssemblyPlan | None = None,
                   penalty_scaling: str = "measure"):
    """Per-element *jump-only* indicator: eta_e^2 = sum over the element's
    faces of sigma max(p)^2/(2|f|) ∫_f [x]^2.

    The inter-element jumps of a DG approximation vanish for the exact
    solution, so the scaled jump energy is a practical a-posteriori
    error surrogate (the skeleton part of IPDGLocalNorm,
    ipdglocalnorm.hh:6-16) — usable even at p=1 where hierarchic
    p-surrogates are empty.  Returns apply(x) -> (n_elements,).
    """
    require_classic_faces(basis.mesh, "jump_indicator")
    plan = plan or build_plan(basis)
    mesh = basis.mesh

    def apply(x):
        eta = jnp.zeros(mesh.n_elements, dtype=dtype)
        for fg in plan.face_groups:
            pmax = max(fg.p_in, fg.p_out)
            fin, fout = face_group_tables(basis, fg, pmax + 2)
            u_in = x[fg.p_in][jnp.asarray(fg.in_pos)]
            u_out = x[fg.p_out][jnp.asarray(fg.out_pos)]
            jump = u_in @ jnp.asarray(fin["V"], dtype) - \
                u_out @ jnp.asarray(fout["V"], dtype)
            w = jnp.asarray(fin["weights"], dtype)
            penf = jnp.asarray(penalty_coef(fg, penalty, pmax,
                                            penalty_scaling), dtype)
            contrib = 0.5 * penf * jnp.sum(w[None] * jump**2, axis=1)
            eta = eta.at[jnp.asarray(mesh.faces.inside[fg.face_ids])].add(contrib)
            eta = eta.at[jnp.asarray(mesh.faces.outside[fg.face_ids])].add(contrib)
        return eta

    return apply
