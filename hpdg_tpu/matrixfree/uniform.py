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
