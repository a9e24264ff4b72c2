"""Uniform-mesh SIPG apply: a stencil of dense GEMMs (MXU speed-of-light).

Rebuild of UniformIPDGOperator (matrix-free/localoperators/
uniformipdgoperator.hh:1-315), re-designed for the MXU: on a mesh with
uniform degree and uniform element extents, every face group's four
block matrices (M11/M12/M21/M22) are *identical across faces*, and the
bulk block is one fixed matrix.  The whole operator application is then

    y[e] = T_diag u[e] + sum_axis ( M12_a u[nbr+_a(e)] + M21_a u[nbr-_a(e)] )

— a stencil of batched [n, bs] x [bs, bs] GEMMs with zero block-value
memory traffic (the assembled SpMV reads O(nnz bs^2) matrix entries per
apply; this reads only the solution vector ~ (2 dim + 1) times).
Boundary elements get per-side diagonal corrections via masked rank-
updates (missing-neighbor and Dirichlet terms).

Sum factorization (sumfact.py) minimizes FLOPs — the right choice on
CPUs (and for p >~ 8); this kernel minimizes memory traffic and feeds
the MXU dense GEMMs — the right choice on TPU for moderate p.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from hpdg_tpu.basis import tensor
from hpdg_tpu.basis.dgbasis import DGBasis


def _sym(M):
    return M + M.T


def uniform_sipg_operator(basis: DGBasis, penalty: float = 2.0,
                          dirichlet: bool = False, dtype=jnp.float64,
                          penalty_scaling: str = "measure"):
    """Requires uniform degree and uniform element extents."""
    mesh = basis.mesh
    dim = mesh.dim
    if len(basis.bucket_degrees) != 1:
        raise ValueError("uniform operator needs a single degree")
    p = basis.bucket_degrees[0]
    if not np.allclose(mesh.extent, mesh.extent[0]):
        raise ValueError("uniform operator needs uniform extents")
    h = mesh.extent[0]
    detJ = float(np.prod(h))
    n = mesh.n_elements
    bs = (p + 1) ** dim

    # ---- fixed matrices ----
    vt = tensor.volume_tables(p, dim, p + 2, family=basis.family)
    G, w = vt["G"], vt["weights"]
    T_bulk = np.einsum("q,a,aiq,ajq->ij", w, detJ / h**2, G, G)

    M11 = {}; M12 = {}; M21 = {}; M22 = {}; MB = {}
    for ax in range(dim):
        if penalty_scaling == "measure":
            pen = penalty * p**2
        else:  # "normal"
            fmeas_ax = detJ / h[ax]
            pen = penalty * p**2 * fmeas_ax / h[ax]
        fin = tensor.face_tables(p, dim, ax, 1, p + 2, family=basis.family)
        fout = tensor.face_tables(p, dim, ax, 0, p + 2, family=basis.family)
        wf = fin["weights"]
        fmeas = detJ / h[ax]
        c = -0.5 * fmeas / h[ax]
        AVDi = np.einsum("iq,q,jq->ij", fin["V"], wf, fin["Dn"])
        AVDo = np.einsum("iq,q,jq->ij", fout["V"], wf, fout["Dn"])
        BVVi = np.einsum("iq,q,jq->ij", fin["V"], wf, fin["V"])
        BVVo = np.einsum("iq,q,jq->ij", fout["V"], wf, fout["V"])
        X1 = np.einsum("iq,q,jq->ij", fin["V"], wf, fout["Dn"])
        X2 = np.einsum("iq,q,jq->ij", fin["Dn"], wf, fout["V"])
        X3 = np.einsum("iq,q,jq->ij", fin["V"], wf, fout["V"])
        M11[ax] = c * _sym(AVDi) + pen * BVVi
        M22[ax] = -c * _sym(AVDo) + pen * BVVo
        M12[ax] = c * X1 - c * X2 - pen * X3
        M21[ax] = M12[ax].T
        # Dirichlet boundary matrices per side
        for side in (0, 1):
            ft = fout if side == 0 else fin
            sign = 1.0 if side == 1 else -1.0
            AVD = np.einsum("iq,q,jq->ij", ft["V"], wf, ft["Dn"])
            BVV = np.einsum("iq,q,jq->ij", ft["V"], wf, ft["V"])
            MB[(ax, side)] = (-sign * fmeas / h[ax]) * _sym(AVD) + pen * BVV

    # ---- neighbor index arrays (host; -1 where no neighbor) ----
    nbr_plus = np.full((dim, n), -1, dtype=np.int32)
    nbr_minus = np.full((dim, n), -1, dtype=np.int32)
    for i, o, ax, ncc in zip(mesh.faces.inside, mesh.faces.outside,
                             mesh.faces.axis, mesh.faces.nc_code):
        if ncc != 0:
            raise ValueError("uniform operator: conforming meshes only")
        nbr_plus[ax, i] = o
        nbr_minus[ax, o] = i

    # diagonal matrix per element = T_bulk + face-diagonal terms where a
    # neighbor exists + Dirichlet terms where not.  Only a handful of
    # distinct combinations exist -> build a per-element variant id.
    has_p = nbr_plus >= 0
    has_m = nbr_minus >= 0
    code = np.zeros(n, dtype=np.int64)
    for ax in range(dim):
        code = code * 4 + has_p[ax] * 2 + has_m[ax]
    variants, vid = np.unique(code, return_inverse=True)
    Tdiag = np.zeros((len(variants), bs, bs))
    for k, cde in enumerate(variants):
        M = T_bulk.copy()
        cc = cde
        for ax in range(dim - 1, -1, -1):
            hm = cc % 2
            hp = (cc // 2) % 2
            cc //= 4
            M += M11[ax] if hp else (MB[(ax, 1)] if dirichlet else 0.0)
            M += M22[ax] if hm else (MB[(ax, 0)] if dirichlet else 0.0)
        Tdiag[k] = M

    # per-variant element lists: the diagonal apply is one big GEMM per
    # variant (interior elements dominate -> essentially one [n,bs]x[bs,bs])
    var_sel = [jnp.asarray(np.where(vid == k)[0].astype(np.int32))
               for k in range(len(variants))]
    Tdiag_j = [jnp.asarray(Tdiag[k].T, dtype) for k in range(len(variants))]
    M12_j = {ax: jnp.asarray(M12[ax].T, dtype) for ax in range(dim)}
    M21_j = {ax: jnp.asarray(M21[ax].T, dtype) for ax in range(dim)}
    # gather-safe neighbor ids (self where none; masked after)
    gp = {ax: jnp.asarray(np.where(has_p[ax], nbr_plus[ax], 0)) for ax in range(dim)}
    gm = {ax: jnp.asarray(np.where(has_m[ax], nbr_minus[ax], 0)) for ax in range(dim)}
    mp = {ax: jnp.asarray(has_p[ax].astype(np.float64), dtype) for ax in range(dim)}
    mm = {ax: jnp.asarray(has_m[ax].astype(np.float64), dtype) for ax in range(dim)}

    def apply(x):
        u = x[p]
        y = jnp.zeros_like(u)
        for k in range(len(var_sel)):
            sel = var_sel[k]
            y = y.at[sel].add(u[sel] @ Tdiag_j[k])
        for ax in range(dim):
            up = u[gp[ax]]
            um = u[gm[ax]]
            y = y + mp[ax][:, None] * (up @ M12_j[ax])
            y = y + mm[ax][:, None] * (um @ M21_j[ax])
        return {p: y}

    return apply


def _lattice_shape(mesh):
    """Recover the (c0, ..., cd-1) lattice shape of a FULL structured
    box mesh in C element order; raises ValueError otherwise."""
    h = mesh.extent[0]
    lo = mesh.lower.min(axis=0)
    ic = np.rint((mesh.lower - lo) / h).astype(np.int64)
    if not np.allclose(mesh.lower, lo + ic * h, atol=1e-12 * h.max()):
        raise ValueError("factorized operator: not a regular lattice")
    cells = tuple(int(c) + 1 for c in ic.max(axis=0))
    if int(np.prod(cells)) != mesh.n_elements:
        raise ValueError("factorized operator: lattice has holes")
    if not np.array_equal(np.ravel_multi_index(ic.T, cells),
                          np.arange(mesh.n_elements)):
        raise ValueError("factorized operator: element order is not "
                         "C-lattice order")
    return cells


def sipg_factor_blocks(basis: DGBasis, penalty: float = 2.0,
                       dirichlet: bool = False,
                       penalty_scaling: str = "measure"):
    """1D factor blocks of the exactly-separable uniform-lattice SIPG
    operator A = sum_ax L_ax (x) Mm (x) ... (x) Mm (numpy f64).

    Returns ``(cells, nb, Mm, D_int, D_lo, D_hi, F12, F21)`` with the
    line matrices as dicts keyed by axis.  Shared by the XLA apply
    (:func:`uniform_sipg_factorized`) and the native host kernel
    (:func:`uniform_sipg_factorized_host` / cpp hpdg_sipg_fact_apply3).
    """
    from hpdg_tpu.basis import lagrange
    mesh = basis.mesh
    dim = mesh.dim
    p = basis.bucket_degrees[0]
    cells = _lattice_shape(mesh)
    h = mesh.extent[0]
    detJ = float(np.prod(h))
    nb = p + 1

    t1 = lagrange.tables(p, p + 2, family=basis.family)
    w1 = t1.qweights
    Mm = np.einsum("iq,q,jq->ij", t1.values, w1, t1.values)
    S = np.einsum("iq,q,jq->ij", t1.derivatives, w1, t1.derivatives)
    v0, v1 = t1.at0, t1.at1
    d0, d1 = t1.dat0, t1.dat1

    # per-axis 1D line-operator blocks (normal-direction factors of the
    # dense-stencil matrices in uniform_sipg_operator)
    D_int = {}; D_lo = {}; D_hi = {}; F12 = {}; F21 = {}
    for ax in range(dim):
        fmeas = detJ / h[ax]
        if penalty_scaling == "measure":
            pen = penalty * p**2
        else:
            pen = penalty * p**2 * fmeas / h[ax]
        c = -0.5 * fmeas / h[ax]
        N11 = c * _sym(np.outer(v1, d1)) + pen * np.outer(v1, v1)
        N22 = -c * _sym(np.outer(v0, d0)) + pen * np.outer(v0, v0)
        F12[ax] = (c * np.outer(v1, d0) - c * np.outer(d1, v0)
                   - pen * np.outer(v1, v0))
        F21[ax] = F12[ax].T
        MB0 = (fmeas / h[ax]) * _sym(np.outer(v0, d0)) + pen * np.outer(v0, v0)
        MB1 = (-fmeas / h[ax]) * _sym(np.outer(v1, d1)) + pen * np.outer(v1, v1)
        bulk = (detJ / h[ax] ** 2) * S
        D_int[ax] = bulk + N11 + N22
        D_lo[ax] = bulk + N11 + (MB0 if dirichlet else 0.0)   # line start
        D_hi[ax] = bulk + (MB1 if dirichlet else 0.0) + N22   # line end
        if cells[ax] == 1:  # degenerate single-element line
            D_lo[ax] = bulk + (MB1 + MB0 if dirichlet else 0.0)
    return cells, nb, Mm, D_int, D_lo, D_hi, F12, F21


def uniform_sipg_factorized_host(basis: DGBasis, penalty: float = 2.0,
                                 dirichlet: bool = False,
                                 penalty_scaling: str = "measure"):
    """Native (C++/OpenMP) f64 factorized apply on the HOST: numpy
    (n_elements, nb^3) -> same.  3D full uniform lattices only; raises
    if the native library or the lattice structure is unavailable —
    callers fall back to :func:`uniform_sipg_factorized` (XLA) or the
    dense-block :func:`uniform_sipg_operator`.

    This is the production host-residual kernel of the f64 iterative-
    refinement solve (bench.py): same operator to f64 roundoff as the
    XLA twin, minus XLA-CPU's transpose/copy overhead."""
    from hpdg_tpu import native
    mesh = basis.mesh
    if mesh.dim != 3:
        raise ValueError("native factorized apply is 3D-only")
    if len(basis.bucket_degrees) != 1:
        raise ValueError("factorized operator needs a single degree")
    if not np.allclose(mesh.extent, mesh.extent[0]):
        raise ValueError("factorized operator needs uniform extents")
    if getattr(mesh, "jac", None) is not None \
            or getattr(mesh, "corners", None) is not None:
        raise ValueError("factorized operator: general geometry "
                         "unsupported (axis-aligned lattices only)")
    if len(mesh.faces.inside) and np.any(mesh.faces.nc_code != 0):
        raise ValueError("factorized operator: conforming meshes only")
    cells, nb, Mm, D_int, D_lo, D_hi, F12, F21 = sipg_factor_blocks(
        basis, penalty, dirichlet, penalty_scaling)
    pack = lambda D: np.stack([D[ax] for ax in range(3)])  # noqa: E731
    return native.SipgFactApply3(cells, nb, Mm, pack(D_int), pack(D_lo),
                                 pack(D_hi), pack(F12), pack(F21))


def uniform_sipg_factorized(basis: DGBasis, penalty: float = 2.0,
                            dirichlet: bool = False, dtype=jnp.float64,
                            penalty_scaling: str = "measure"):
    """FLOP-minimal SIPG apply on a full uniform lattice.

    The uniform-mesh SIPG operator separates EXACTLY per axis:

        A  =  sum_ax  L_ax (x) Mm (x) ... (x) Mm

    where Mm is the 1D reference mass matrix and L_ax the 1D SIPG
    line operator along axis ``ax`` (block-tridiagonal over the line's
    elements with position-independent interior blocks).  The apply is
    then, per axis, two transverse 1D mass contractions plus three
    nb x nb line contractions — ~15 n nb^{d+1} MACs total vs
    (2 dim + 1) n nb^{2d} for the dense stencil
    (:func:`uniform_sipg_operator`): ~12x fewer FLOPs at p=4 in 3D.
    The dense stencil feeds the MXU better on TPU; THIS kernel is the
    right choice for the f64 HOST residual path of the iterative-
    refinement solve (bench.py), where the single CPU core is
    FLOP-bound.  Same operator to f64 roundoff (differential-tested).

    Reference analog: the sum-factorized apply role of
    matrix-free/localoperators/sfipdg.hh:38-725, restricted to the
    uniform lattice where the 1D factor structure is exact.
    """
    from hpdg_tpu.basis import lagrange
    mesh = basis.mesh
    dim = mesh.dim
    if len(basis.bucket_degrees) != 1:
        raise ValueError("factorized operator needs a single degree")
    p = basis.bucket_degrees[0]
    if not np.allclose(mesh.extent, mesh.extent[0]):
        raise ValueError("factorized operator needs uniform extents")
    if getattr(mesh, "jac", None) is not None \
            or getattr(mesh, "corners", None) is not None:
        raise ValueError("factorized operator: general geometry "
                         "unsupported (axis-aligned lattices only)")
    if len(mesh.faces.inside) and np.any(mesh.faces.nc_code != 0):
        raise ValueError("factorized operator: conforming meshes only")
    cells, nb, Mm, D_int, D_lo, D_hi, F12, F21 = sipg_factor_blocks(
        basis, penalty, dirichlet, penalty_scaling)
    cast = lambda M: jnp.asarray(M, dtype)  # noqa: E731
    Mm_j = cast(Mm)
    D_int_j = {ax: cast(D_int[ax]) for ax in range(dim)}
    D_lo_j = {ax: cast(D_lo[ax]) for ax in range(dim)}
    D_hi_j = {ax: cast(D_hi[ax]) for ax in range(dim)}
    F12_j = {ax: cast(F12[ax]) for ax in range(dim)}
    F21_j = {ax: cast(F21[ax]) for ax in range(dim)}
    shape = tuple(cells) + (nb,) * dim

    def contract(t, M, local_ax):
        # contract local axis `dim + local_ax` with M's second index
        out = jnp.tensordot(t, M, axes=[[dim + local_ax], [1]])
        return jnp.moveaxis(out, -1, dim + local_ax)

    def apply(x):
        u = x[p].reshape(shape)
        y = jnp.zeros_like(u)
        for ax in range(dim):
            t = u
            for tax in range(dim):
                if tax != ax:
                    t = contract(t, Mm_j, tax)
            nax = cells[ax]
            ya = contract(t, D_int_j[ax], ax)
            if nax > 1:
                sl_lo = (slice(None),) * ax + (slice(0, 1),)
                sl_hi = (slice(None),) * ax + (slice(nax - 1, nax),)
                ya = ya.at[sl_lo].set(contract(t[sl_lo], D_lo_j[ax], ax))
                ya = ya.at[sl_hi].set(contract(t[sl_hi], D_hi_j[ax], ax))
                sl_up = (slice(None),) * ax + (slice(1, None),)
                sl_dn = (slice(None),) * ax + (slice(0, -1),)
                ya = ya.at[sl_dn].add(contract(t[sl_up], F12_j[ax], ax))
                ya = ya.at[sl_up].add(contract(t[sl_dn], F21_j[ax], ax))
            else:
                ya = contract(t, D_lo_j[ax], ax)
            y = y + ya
        return {p: y.reshape(mesh.n_elements, nb ** dim)}

    return apply
