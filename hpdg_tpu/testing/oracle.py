"""Slow, obviously-correct numpy reference assemblers (the test oracle).

This plays the role the generic dune-fufem ``InteriorPenaltyDGAssembler``
plays in the reference's test suite (test/testobjects.hh:20-158): an
independent, maximally-simple implementation that the fast batched /
sum-factorized paths are differential-tested against at ~1e-11
tolerances (SURVEY.md §4).

Deliberately written with explicit per-element, per-quad-point loops and
direct basis evaluation — it shares *no* kernel code with the production
assemblers (which use precomputed tensor tables and batched einsums).
"""

from __future__ import annotations

import numpy as np

from hpdg_tpu import quadrature
from hpdg_tpu.basis import lagrange
from hpdg_tpu.basis.dgbasis import DGBasis


def _phi(nodes, xref):
    """All tensor basis values at one reference point: (p+1)^d vector."""
    d = len(xref)
    per_axis = [lagrange.lagrange_values(nodes, [xref[a]])[:, 0] for a in range(d)]
    out = per_axis[0]
    for a in range(1, d):
        out = np.multiply.outer(out, per_axis[a]).reshape(-1)
    return out


def _grad_phi(nodes, xref, h):
    """Physical gradients at one reference point: ((p+1)^d, d)."""
    d = len(xref)
    vals = [lagrange.lagrange_values(nodes, [xref[a]])[:, 0] for a in range(d)]
    ders = [lagrange.lagrange_derivatives(nodes, [xref[a]])[:, 0] for a in range(d)]
    n = len(nodes) ** d
    out = np.zeros((n, d))
    for a in range(d):
        g = vals[0] if a != 0 else ders[0]
        for b in range(1, d):
            g = np.multiply.outer(g, ders[b] if b == a else vals[b]).reshape(-1)
        out[:, a] = g / h[a]
    return out


def _face_point(tpt, axis, side, dim):
    """Embed a tangential (dim-1) point into element-local coords."""
    x = np.zeros(dim)
    t = 0
    for a in range(dim):
        if a == axis:
            x[a] = float(side)
        else:
            x[a] = tpt[t]
            t += 1
    return x


def _aff(mesh, e):
    """(A, Ainv, |det A|, shift) of element e (identity for box meshes)."""
    if getattr(mesh, "jac", None) is None:
        d = mesh.dim
        return np.eye(d), np.eye(d), 1.0, np.zeros(d)
    A = mesh.jac[e]
    return A, np.linalg.inv(A), abs(np.linalg.det(A)), mesh.shift[e]


def _geo_at(mesh, e, xg):
    """Per-point geometry at GLOBAL parametric point ``xg`` of element e:
    (J, J^-1, |det J|, x_phys) with J = d(phys)/d(global param).
    Deliberately re-derived with explicit scalar loops (shares no code
    with mesh/geometry.py) — the oracle for trilinear (Q1) and affine
    element maps."""
    d = mesh.dim
    if getattr(mesh, "corners", None) is not None:
        xi = (xg - mesh.lower[e]) / mesh.extent[e]
        phi = np.zeros(d)
        Jl = np.zeros((d, d))
        for c in range(2**d):
            bits = [(c >> (d - 1 - a)) & 1 for a in range(d)]
            wgt = 1.0
            for a in range(d):
                wgt *= xi[a] if bits[a] else 1.0 - xi[a]
            phi += wgt * mesh.corners[e, c]
            for a in range(d):
                gfac = 1.0
                for b in range(d):
                    if b == a:
                        gfac *= 1.0 if bits[b] else -1.0
                    else:
                        gfac *= xi[b] if bits[b] else 1.0 - xi[b]
                Jl[:, a] += gfac * mesh.corners[e, c]
        J = Jl / mesh.extent[e][None, :]
        return J, np.linalg.inv(J), abs(np.linalg.det(J)), phi
    if getattr(mesh, "jac", None) is None:
        return np.eye(d), np.eye(d), 1.0, xg
    A = mesh.jac[e]
    return A, np.linalg.inv(A), abs(np.linalg.det(A)), mesh.shift[e] + A @ xg


def _face_center_factors(mesh, e, ax):
    """(nanson g, |det|) at the ELEMENT center — the per-face-constant
    convention used for 'normal' penalty scaling (matches
    mesh/geometry.py's face_jacobian_factor/_det_center)."""
    ctr = mesh.lower[e] + 0.5 * mesh.extent[e]
    _, Ji, det, _ = _geo_at(mesh, e, ctr)
    g = det * np.linalg.norm(Ji[ax])
    return g, det


def dg_theta(dg_form) -> float:
    """Map a DG-form name to its symmetry factor theta:
    SIPG -1 (symmetric), IIPG 0 (incomplete), NIPG +1 (nonsymmetric) —
    the reference's DGType enum (variableipdg.hh:33).  Floats pass
    through unchanged (the reference stores dgType_ as a double too)."""
    if isinstance(dg_form, str):
        return {"sipg": -1.0, "iipg": 0.0, "nipg": 1.0}[dg_form.lower()]
    return float(dg_form)


def sipg_matrix(basis: DGBasis, penalty: float = 2.0, dirichlet: bool = False,
                diffusion=None, penalty_scaling: str = "measure",
                dg_form="sipg", sigma1: float = 0.0) -> np.ndarray:
    """Dense IPDG stiffness matrix in the flat element-ordered layout.

    Matches the reference's conventions exactly
    (gausslobattoipdgassembler.hh): bulk/face Gauss-Lobatto rules of DUNE
    order 2p (resp. 2 max(p_in, p_out)); penalty sigma*max(p)^2/|f|;
    [u] = u_in - u_out with the normal pointing inside -> outside.
    ``diffusion``: optional coefficient K(x) (callable on (dim,)),
    returning a scalar or a symmetric (dim, dim) TENSOR — the tensor
    case covers anisotropic media and the pullback of general
    (affine/curvilinear) element geometries, where the reference reads
    jacobianInverseTransposed per quad point
    (gausslobattoipdgassembler.hh:320-364).
    ``dg_form``: "sipg" | "iipg" | "nipg" (or the theta float itself) —
    the symmetry factor of the consistency terms, the reference's
    dgType_ (variableipdg.hh:33,177,328-351).
    ``sigma1``: gradient-jump stabilization
    sigma1/|f|_phys * (grad phi_i . n)(grad phi_j . n) on interior faces
    (variableipdg.hh:330-351; it does not affect boundary faces).
    Geometry-generic: per-point physical gradients and unit normals,
    |f|_phys the quadrature surface measure (symmetric mean of the two
    sides' Nanson factors) — the convention the fast assembler and the
    sum-factorized apply implement.
    """
    mesh = basis.mesh
    dim = mesh.dim
    K = diffusion or (lambda x: 1.0)
    theta = dg_theta(dg_form)
    A = np.zeros((basis.ndof, basis.ndof))

    # ---- bulk ----
    for e in range(mesh.n_elements):
        p = int(basis.degrees[e])
        nodes = lagrange.nodes_1d(p, basis.family)
        qn, qw = quadrature.gauss_lobatto_for_order(2 * p)
        pts, w = quadrature.tensor_rule(qn, qw, dim)
        h = mesh.extent[e]
        detJ = np.prod(h)
        o = basis.offsets[e]
        n = basis.block_sizes[e]
        for q in range(len(w)):
            xg = mesh.lower[e] + pts[q] * h
            _, Ji, dA, x = _geo_at(mesh, e, xg)
            # physical gradients: parametric grads times J^-1 (row form)
            G = _grad_phi(nodes, pts[q], h) @ Ji
            kq = K(x)
            if np.ndim(kq) == 2:
                A[o:o + n, o:o + n] += w[q] * detJ * dA * (G @ kq @ G.T)
            else:
                A[o:o + n, o:o + n] += w[q] * detJ * dA * kq * (G @ G.T)

    # ---- interior faces (geometry-driven: handles hanging nodes too) ----
    for f in range(len(mesh.faces)):
        ei, eo = int(mesh.faces.inside[f]), int(mesh.faces.outside[f])
        ax = int(mesh.faces.axis[f])
        # generalized face charts (twisted unstructured imports;
        # defaults reproduce the classic in-high/out-low contract)
        in_side = int(mesh.faces.in_side[f])
        out_ax = int(mesh.faces.out_axis[f])
        out_side = int(mesh.faces.out_side[f])
        twist = int(mesh.faces.twist[f])
        pi, po = int(basis.degrees[ei]), int(basis.degrees[eo])
        pmax = max(pi, po)
        qn, qw = quadrature.gauss_lobatto_for_order(2 * pmax)
        if dim > 1:
            tpts, tw = quadrature.tensor_rule(qn, qw, dim - 1)
        else:
            tpts, tw = np.zeros((1, 0)), np.ones(1)
        nodes_i = lagrange.nodes_1d(pi, basis.family)
        nodes_o = lagrange.nodes_1d(po, basis.family)
        hi, ho = mesh.extent[ei], mesh.extent[eo]
        # intersection (the fine face for 2:1 non-conforming pairs)
        ilo = np.maximum(mesh.lower[ei], mesh.lower[eo])
        iext = np.minimum(hi, ho)
        fmeas = np.prod(np.delete(iext, ax))
        # per-face-constant penalty coefficient pen_f = mu * |f_phys|
        # (the reference's sigma max(p)^2/|e| convention with ONE measure
        # per edge, variableipdg.hh:253; element-center factors for
        # curved maps — matching mesh/geometry.py)
        if penalty_scaling == "measure":
            pen_f = penalty * pmax**2
        else:  # "normal": |f_phys| * mean inverse normal PHYSICAL extent
            gic, dic = _face_center_factors(mesh, ei, ax)
            goc, doc = _face_center_factors(mesh, eo, out_ax)
            pen_f = (penalty * pmax**2 * 0.5 * (gic + goc) * fmeas
                     * 0.5 * (gic / (dic * hi[ax])
                              + goc / (doc * ho[out_ax])))
        oi, no = basis.offsets[ei], basis.block_sizes[ei]
        oo, mo = basis.offsets[eo], basis.block_sizes[eo]
        if sigma1 != 0.0:
            # gradient-jump blocks accumulate separately: the 1/|f|_phys
            # factor needs the full quadrature surface measure first
            S11 = np.zeros((no, no))
            S12 = np.zeros((no, mo))
            S21 = np.zeros((mo, no))
            S22 = np.zeros((mo, mo))
            emeas_acc = 0.0
        tang = [a for a in range(dim) if a != ax]
        # parametric adjacency: lattice-style meshes share one global
        # parametric chart (intersection logic covers 2:1 hanging
        # faces); imports with per-element charts (geometry.
        # from_cell_vertices) pair faces at IDENTITY tangential
        # correspondence in each element's own unit coordinates.
        adjacent = abs((mesh.lower[ei][ax] + hi[ax])
                       - mesh.lower[eo][ax]) <= 1e-9 * max(1.0, hi[ax])
        if not adjacent:
            fmeas = np.prod(np.delete(np.minimum(hi, ho), ax))
        for q in range(len(tw)):
            if adjacent:
                xg = np.zeros(dim)
                xg[ax] = mesh.lower[eo][ax]  # face plane (global param.)
                for t, a in enumerate(tang):
                    xg[a] = ilo[a] + tpts[q][t] * iext[a]
                xi = (xg - mesh.lower[ei]) / hi
                xi[ax] = 1.0
                xo = (xg - mesh.lower[eo]) / ho
                xo[ax] = 0.0
                xg_i = xg_o = xg
            else:
                xi = np.zeros(dim)
                xo = np.zeros(dim)
                xi[ax], xo[out_ax] = float(in_side), float(out_side)
                for t, a in enumerate(tang):
                    xi[a] = tpts[q][t]
                # outside chart: tangential coords through the twist
                # isometry (independent scalar re-derivation of
                # assemble.plan.apply_twist)
                uu = list(tpts[q])
                if dim == 3 and (twist >> 2) & 1:
                    uu = uu[::-1]
                if dim >= 2 and (twist & 1):
                    uu[0] = 1.0 - uu[0]
                if dim == 3 and (twist >> 1) & 1:
                    uu[1] = 1.0 - uu[1]
                for t, a in enumerate(aa for aa in range(dim)
                                      if aa != out_ax):
                    xo[a] = uu[t]
                xg_i = mesh.lower[ei] + xi * hi
                xg_o = mesh.lower[eo] + xo * ho
            vi = _phi(nodes_i, xi)
            vo = _phi(nodes_o, xo)
            # per-point geometry on each side (equal physical surface for
            # conforming maps; per-side Jacobians differ off the face)
            _, Jii, dAi, xpi = _geo_at(mesh, ei, xg_i)
            _, Jio, dAo, _ = _geo_at(mesh, eo, xg_o)
            gi = dAi * np.linalg.norm(Jii[ax])
            go = dAo * np.linalg.norm(Jio[out_ax])
            sgn_in = 2 * in_side - 1
            nrm_i = sgn_in * Jii[ax] / np.linalg.norm(Jii[ax])
            # physical co-normal derivative (K grad phi).n per point
            kq = K(xpi)
            Km = kq if np.ndim(kq) == 2 else kq * np.eye(dim)
            Gi = _grad_phi(nodes_i, xi, hi) @ Jii
            Go = _grad_phi(nodes_o, xo, ho) @ Jio
            dni = Gi @ (Km @ nrm_i)
            dno = Go @ (Km @ nrm_i)
            z = tw[q] * fmeas * 0.5 * (gi + go)  # physical surface elem
            zp = tw[q] * pen_f                   # penalty (parametric w)
            # consistency -0.5 z v_i (grad v_j . n); symmetry term carries
            # theta: +0.5 theta z v_j (grad v_i . n) (variableipdg.hh:330+)
            M11 = z * (-0.5 * np.outer(vi, dni)
                       + 0.5 * theta * np.outer(dni, vi)) \
                + zp * np.outer(vi, vi)
            M12 = z * (-0.5 * np.outer(vi, dno)
                       - 0.5 * theta * np.outer(dni, vo)) \
                - zp * np.outer(vi, vo)
            M21 = z * (+0.5 * np.outer(vo, dni)
                       + 0.5 * theta * np.outer(dno, vi)) \
                - zp * np.outer(vo, vi)
            M22 = z * (+0.5 * np.outer(vo, dno)
                       - 0.5 * theta * np.outer(dno, vo)) \
                + zp * np.outer(vo, vo)
            if sigma1 != 0.0:
                # sigma1 z / |f|_phys (grad v_i . n)(grad v_j . n),
                # jump-jump sign pattern [+,-;-,+]
                # (variableipdg.hh:330-351); plain PHYSICAL gradients
                # with the per-point unit normal, no K folded in
                pgi = Gi @ nrm_i
                pgo = Go @ nrm_i
                emeas_acc += z
                S11 += z * np.outer(pgi, pgi)
                S12 -= z * np.outer(pgi, pgo)
                S21 -= z * np.outer(pgo, pgi)
                S22 += z * np.outer(pgo, pgo)
            A[oi:oi + no, oi:oi + no] += M11
            A[oi:oi + no, oo:oo + mo] += M12
            A[oo:oo + mo, oi:oi + no] += M21
            A[oo:oo + mo, oo:oo + mo] += M22
        if sigma1 != 0.0:
            cs1 = sigma1 / emeas_acc
            A[oi:oi + no, oi:oi + no] += cs1 * S11
            A[oi:oi + no, oo:oo + mo] += cs1 * S12
            A[oo:oo + mo, oi:oi + no] += cs1 * S21
            A[oo:oo + mo, oo:oo + mo] += cs1 * S22

    # ---- Dirichlet boundary faces ----
    if dirichlet:
        for f in range(len(mesh.bfaces)):
            e = int(mesh.bfaces.elem[f])
            ax = int(mesh.bfaces.axis[f])
            side = int(mesh.bfaces.side[f])
            sign = 1.0 if side == 1 else -1.0
            p = int(basis.degrees[e])
            qn, qw = quadrature.gauss_lobatto_for_order(2 * p)
            if dim > 1:
                tpts, tw = quadrature.tensor_rule(qn, qw, dim - 1)
            else:
                tpts, tw = np.zeros((1, 0)), np.ones(1)
            nodes = lagrange.nodes_1d(p, basis.family)
            h = mesh.extent[e]
            fmeas = np.prod(np.delete(h, ax))
            if penalty_scaling == "measure":
                pen_f = penalty * p**2
            else:
                gc, dc = _face_center_factors(mesh, e, ax)
                pen_f = penalty * p**2 * gc * fmeas * gc / (dc * h[ax])
            o, n = basis.offsets[e], basis.block_sizes[e]
            for q in range(len(tw)):
                x = _face_point(tpts[q], ax, side, dim)
                v = _phi(nodes, x)
                xg = mesh.lower[e] + x * h
                _, Ji, dA, xphys = _geo_at(mesh, e, xg)
                g = dA * np.linalg.norm(Ji[ax])
                nrm = Ji[ax] / np.linalg.norm(Ji[ax])
                kq = K(xphys)
                Km = kq if np.ndim(kq) == 2 else kq * np.eye(dim)
                dn = sign * ((_grad_phi(nodes, x, h) @ Ji) @ (Km @ nrm))
                z = tw[q] * fmeas * g
                # boundary: full (unhalved) weights; theta on the
                # symmetry term (variableipdg.hh:174-180); no sigma1
                A[o:o + n, o:o + n] += (
                    z * (-np.outer(v, dn) + theta * np.outer(dn, v))
                    + tw[q] * pen_f * np.outer(v, v)
                )
    return A


def mass_matrix(basis: DGBasis, weight=None, quad_order=None) -> np.ndarray:
    mesh = basis.mesh
    dim = mesh.dim
    wfun = weight or (lambda x: 1.0)
    M = np.zeros((basis.ndof, basis.ndof))
    for e in range(mesh.n_elements):
        p = int(basis.degrees[e])
        nodes = lagrange.nodes_1d(p, basis.family)
        order = quad_order if quad_order is not None else 2 * p
        qn, qw = quadrature.gauss_lobatto_for_order(order)
        pts, w = quadrature.tensor_rule(qn, qw, dim)
        h = mesh.extent[e]
        detJ = np.prod(h)
        o, n = basis.offsets[e], basis.block_sizes[e]
        for q in range(len(w)):
            v = _phi(nodes, pts[q])
            xg = mesh.lower[e] + pts[q] * h
            _, _, dA, x = _geo_at(mesh, e, xg)
            M[o:o + n, o:o + n] += w[q] * detJ * dA * wfun(x) \
                * np.outer(v, v)
    return M


def l2_functional(basis: DGBasis, g, quad_order=None) -> np.ndarray:
    mesh = basis.mesh
    dim = mesh.dim
    b = np.zeros(basis.ndof)
    for e in range(mesh.n_elements):
        p = int(basis.degrees[e])
        nodes = lagrange.nodes_1d(p, basis.family)
        order = quad_order if quad_order is not None else 2 * p + 2
        qn, qw = quadrature.gauss_legendre_for_order(order)
        pts, w = quadrature.tensor_rule(qn, qw, dim)
        h = mesh.extent[e]
        detJ = np.prod(h)
        o, n = basis.offsets[e], basis.block_sizes[e]
        for q in range(len(w)):
            v = _phi(nodes, pts[q])
            xg = mesh.lower[e] + pts[q] * h
            _, _, dA, x = _geo_at(mesh, e, xg)
            b[o:o + n] += w[q] * detJ * dA * g(x) * v
    return b


def dirichlet_rhs(basis: DGBasis, g, penalty: float = 2.0,
                  diffusion=None,
                  penalty_scaling: str = "measure") -> np.ndarray:
    """SIPG-consistent Dirichlet data:
    b_i = ∫_bdry g (mu v_i - (K grad v_i).n), geometry- and
    coefficient-aware (reference: ipdgboundaryassembler.hh:131-137 with
    DGType = -1)."""
    mesh = basis.mesh
    dim = mesh.dim
    K = diffusion or (lambda x: 1.0)
    b = np.zeros(basis.ndof)
    for f in range(len(mesh.bfaces)):
        e = int(mesh.bfaces.elem[f])
        ax = int(mesh.bfaces.axis[f])
        side = int(mesh.bfaces.side[f])
        sign = 1.0 if side == 1 else -1.0
        p = int(basis.degrees[e])
        qn, qw = quadrature.gauss_lobatto_for_order(2 * p)
        if dim > 1:
            tpts, tw = quadrature.tensor_rule(qn, qw, dim - 1)
        else:
            tpts, tw = np.zeros((1, 0)), np.ones(1)
        nodes = lagrange.nodes_1d(p, basis.family)
        h = mesh.extent[e]
        fmeas = np.prod(np.delete(h, ax))
        if penalty_scaling == "measure":
            pen_f = penalty * p**2
        else:
            gc, dc = _face_center_factors(mesh, e, ax)
            pen_f = penalty * p**2 * gc * fmeas * gc / (dc * h[ax])
        o, n = basis.offsets[e], basis.block_sizes[e]
        for q in range(len(tw)):
            x = _face_point(tpts[q], ax, side, dim)
            v = _phi(nodes, x)
            xg = mesh.lower[e] + x * h
            _, Ji, dA, xphys = _geo_at(mesh, e, xg)
            gfac = dA * np.linalg.norm(Ji[ax])
            nrm = Ji[ax] / np.linalg.norm(Ji[ax])
            kq = K(xphys)
            Km = kq if np.ndim(kq) == 2 else kq * np.eye(dim)
            dn = sign * ((_grad_phi(nodes, x, h) @ Ji) @ (Km @ nrm))
            b[o:o + n] += tw[q] * (pen_f * g(xphys) * v
                                   - fmeas * gfac * g(xphys) * dn)
    return b


# ---------------------------------------------------------------------------
# Linear elasticity (vector-valued) oracle.  Local dof ordering:
# component-major, dof = c * (p+1)^dim + i  (component slowest).
# ---------------------------------------------------------------------------

def elasticity_matrix(basis: DGBasis, mu: float = 1.0, lam: float = 1.0,
                      penalty: float = 2.0, dirichlet: bool = False
                      ) -> np.ndarray:
    """Dense SIPG matrix for linear elasticity:
    a(u,v) = ∫ 2 mu eps(u):eps(v) + lam div u div v  + SIPG face terms with
    traction averages {sigma(u) n} and vector jumps, penalty
    sigma_0 max(p)^2/|f| [u].[v].  Geometry-aware (affine / trilinear
    meshes): physical gradients via per-point J^-1, tractions with the
    true physical normal and Nanson surface measure ("measure" penalty
    convention: the penalty weight stays parametric)."""
    mesh = basis.mesh
    dim = mesh.dim
    nd = basis.ndof * dim
    A = np.zeros((nd, nd))

    def offs(e):
        return basis.offsets[e] * dim, basis.block_sizes[e]

    def sigma_n(G, e_comp, nrm):
        """(sigma(phi_j e_comp) n)_b for all j, b; G = physical grads
        (nl, dim), nrm the physical unit normal."""
        Gn = G @ nrm  # (nl,)
        out = np.zeros((dim, G.shape[0]))
        for b in range(dim):
            out[b] = (mu * ((b == e_comp) * Gn + nrm[e_comp] * G[:, b])
                      + lam * nrm[b] * G[:, e_comp])
        return out

    # bulk
    for e in range(mesh.n_elements):
        p = int(basis.degrees[e])
        nodes = lagrange.nodes_1d(p, basis.family)
        qn, qw = quadrature.gauss_lobatto_for_order(2 * p)
        pts, w = quadrature.tensor_rule(qn, qw, dim)
        h = mesh.extent[e]
        detJ = np.prod(h)
        o, nl = offs(e)
        for q in range(len(w)):
            xg = mesh.lower[e] + pts[q] * h
            _, Ji, dA, _ = _geo_at(mesh, e, xg)
            G = _grad_phi(nodes, pts[q], h) @ Ji  # (nl, dim) physical
            z = w[q] * detJ * dA
            for c in range(dim):
                for ec in range(dim):
                    blk = (mu * (c == ec) * (G @ G.T)
                           + mu * np.outer(G[:, ec], G[:, c])
                           + lam * np.outer(G[:, c], G[:, ec]))
                    A[o + c * nl:o + (c + 1) * nl,
                      o + ec * nl:o + (ec + 1) * nl] += z * blk

    # interior faces
    for f in range(len(mesh.faces)):
        ei, eo = int(mesh.faces.inside[f]), int(mesh.faces.outside[f])
        ax = int(mesh.faces.axis[f])
        pi, po = int(basis.degrees[ei]), int(basis.degrees[eo])
        pmax = max(pi, po)
        qn, qw = quadrature.gauss_lobatto_for_order(2 * pmax)
        tpts, tw = quadrature.tensor_rule(qn, qw, dim - 1)
        nodes_i = lagrange.nodes_1d(pi, basis.family)
        nodes_o = lagrange.nodes_1d(po, basis.family)
        hi, ho = mesh.extent[ei], mesh.extent[eo]
        ilo = np.maximum(mesh.lower[ei], mesh.lower[eo])
        iext = np.minimum(hi, ho)
        fmeas = np.prod(np.delete(iext, ax))
        pen_f = penalty * pmax**2  # parametric "measure" convention
        o1, n1 = offs(ei)
        o2, n2 = offs(eo)
        tang = [a for a in range(dim) if a != ax]
        for q in range(len(tw)):
            xg = np.zeros(dim)
            xg[ax] = mesh.lower[eo][ax]
            for t, a in enumerate(tang):
                xg[a] = ilo[a] + tpts[q][t] * iext[a]
            xi = (xg - mesh.lower[ei]) / hi
            xi[ax] = 1.0
            xo = (xg - mesh.lower[eo]) / ho
            xo[ax] = 0.0
            vi = _phi(nodes_i, xi)
            vo = _phi(nodes_o, xo)
            _, Jii, dAi, _ = _geo_at(mesh, ei, xg)
            _, Jio, dAo, _ = _geo_at(mesh, eo, xg)
            gi = dAi * np.linalg.norm(Jii[ax])
            go = dAo * np.linalg.norm(Jio[ax])
            nrm = Jii[ax] / np.linalg.norm(Jii[ax])
            Gi = _grad_phi(nodes_i, xi, hi) @ Jii
            Go = _grad_phi(nodes_o, xo, ho) @ Jio
            z = tw[q] * fmeas * 0.5 * (gi + go)
            zp = tw[q] * pen_f
            sides = [(vi, Gi, +1.0, o1, n1), (vo, Go, -1.0, o2, n2)]
            for (vA, GA, sA, oA, nA) in sides:          # test side
                for (vB, GB, sB, oB, nB) in sides:      # trial side
                    for c in range(dim):                # test component
                        for ec in range(dim):           # trial component
                            snB = sigma_n(GB, ec, nrm)[c]  # (nlB,)
                            snA = sigma_n(GA, c, nrm)[ec]  # (nlA,)
                            blk = (z * (-0.5 * sA * np.outer(vA, snB)
                                        - 0.5 * sB * np.outer(snA, vB))
                                   + zp * (c == ec) * sA * sB
                                   * np.outer(vA, vB))
                            A[oA + c * nA:oA + (c + 1) * nA,
                              oB + ec * nB:oB + (ec + 1) * nB] += blk

    # Dirichlet boundary
    if dirichlet:
        for f in range(len(mesh.bfaces)):
            e = int(mesh.bfaces.elem[f])
            ax = int(mesh.bfaces.axis[f])
            side = int(mesh.bfaces.side[f])
            sgn = 1.0 if side == 1 else -1.0
            p = int(basis.degrees[e])
            qn, qw = quadrature.gauss_lobatto_for_order(2 * p)
            tpts, tw = quadrature.tensor_rule(qn, qw, dim - 1)
            nodes = lagrange.nodes_1d(p, basis.family)
            h = mesh.extent[e]
            fmeas = np.prod(np.delete(h, ax))
            pen_f = penalty * p**2
            o, nl = offs(e)
            for q in range(len(tw)):
                x = _face_point(tpts[q], ax, side, dim)
                v = _phi(nodes, x)
                xg = mesh.lower[e] + x * h
                _, Ji, dA, _ = _geo_at(mesh, e, xg)
                gfac = dA * np.linalg.norm(Ji[ax])
                nrm = sgn * Ji[ax] / np.linalg.norm(Ji[ax])  # outward
                G = _grad_phi(nodes, x, h) @ Ji
                z = tw[q] * fmeas * gfac
                zp = tw[q] * pen_f
                for c in range(dim):
                    for ec in range(dim):
                        snB = sigma_n(G, ec, nrm)[c]
                        snA = sigma_n(G, c, nrm)[ec]
                        blk = (z * (-np.outer(v, snB) - np.outer(snA, v))
                               + zp * (c == ec) * np.outer(v, v))
                        A[o + c * nl:o + (c + 1) * nl,
                          o + ec * nl:o + (ec + 1) * nl] += blk
    return A
