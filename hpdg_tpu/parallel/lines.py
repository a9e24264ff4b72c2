"""Sharded line-block smoothing: per-shard block-tridiagonal solves
along element lines.

Element-block smoothers plateau MG on stretched elements (two-grid rate
~0.55 on 1:4-stretched p=4 cells even with a near-exact coarse solve,
ROADMAP item 13); the classical cure is a line smoother along the
strong-coupling (short) axis.  ``hp_line_precond`` builds, for an
existing sharded problem (parallel.hp.HPSharded), the preconditioner
r -> M^{-1} r with M the line-block-tridiagonal part of the operator:

- lines are built on the GLOBAL mesh (solvers.lines.build_lines) and cut
  at shard boundaries: each shard factors only the contiguous segments
  of its OWNED elements, so any partition works (a partition that keeps
  lines whole — slab axis orthogonal to the line axis — preserves the
  full strength; cut lines degrade gracefully toward block-Jacobi at
  the cuts);
- per-segment block-Thomas factors are computed on the host from the
  serially assembled operator (the sharded apply is differentially
  verified against it at 1e-11, so its blocks ARE the sharded
  operator's blocks) — same host-setup pattern as the per-shard
  diagonal blocks;
- the solve is one forward + one backward `lax.scan` over line position
  with [n_lines, B, B] matmuls per step inside a `shard_map` body —
  shard-local (no halo traffic), MXU-shaped, static shapes, mixed
  degrees handled by padding to B = (p_max+1)^dim.

Reference analog: dynamicblockgs.hh:94-126's sequential sweeps follow
the DUNE iterator order, which on a structured grid is
lexicographic-by-line — the source of its anisotropy robustness.  A
TPU smoother cannot sweep sequentially over elements; exact parallel
line solves recover the same coupling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.solvers.lines import build_lines, line_tridiag_factor


def _auto_axis(mesh) -> int:
    """Strong coupling runs along the SHORTEST element extent."""
    return int(np.argmin(np.mean(mesh.extent, axis=0)))


def hp_line_precond(prob, degrees, axis: int | None = None,
                    penalty: float = 2.0, dirichlet: bool = True,
                    penalty_scaling: str = "measure", dtype=jnp.float64,
                    diffusion=None):
    """Line-block-tridiagonal preconditioner for a sharded problem.

    Returns a jitted callable on the problem's sharded bucket-dict
    layout ({p: [ndev*m_own_p, bs_p]}).
    """
    from hpdg_tpu import mesh as hmesh
    from hpdg_tpu.assemble import assemble_laplace

    degrees = np.asarray(degrees, dtype=np.int32).reshape(-1)
    gmesh = prob.gmesh if prob.gmesh is not None \
        else hmesh.structured(prob.cells)
    if axis is None:
        axis = _auto_axis(gmesh)
    gbasis = DGBasis(gmesh, degrees)
    host_dtype = (jnp.float64 if jax.config.jax_enable_x64 else dtype)
    A = assemble_laplace(gbasis, penalty=penalty, dirichlet=dirichlet,
                         penalty_scaling=penalty_scaling, dtype=host_dtype,
                         diffusion=diffusion)

    glines = build_lines(gmesh, axis)
    ndev = prob.ndev
    shard_of = np.full(gmesh.n_elements, -1, dtype=np.int64)
    for (s, p), ids in prob.owned_slots.items():
        shard_of[ids] = s

    # contiguous owned runs per shard ("segments")
    seg_lists = [[] for _ in range(ndev)]
    for line in glines:
        run_shard, run = -1, []
        for e in list(line) + [-1]:
            s = shard_of[e] if e >= 0 else -1
            if s != run_shard:
                if run:
                    seg_lists[run_shard].append(run)
                run, run_shard = [], s
            if s >= 0:
                run.append(int(e))
        # (trailing run flushed by the sentinel)
    L = max(max((len(sl) for sl in seg_lists), default=1), 1)
    K = max((len(seg) for sl in seg_lists for seg in sl), default=1)
    dim = gmesh.dim
    B = (gbasis.max_degree() + 1) ** dim

    Sinv = np.zeros((ndev, L, K, B, B))
    W = np.zeros((ndev, L, K, B, B))
    U = np.zeros((ndev, L, K, B, B))
    Sinv[:] = np.eye(B)  # padding segments: identity pivots
    e2lk = {}            # (s, e) -> (l, k)
    for s, sl in enumerate(seg_lists):
        if not sl:
            continue
        tab = np.full((len(sl), K), -1, dtype=np.int64)
        for li, seg in enumerate(sl):
            tab[li, : len(seg)] = seg
            for k, e in enumerate(seg):
                e2lk[(s, e)] = (li, k)
        fac = line_tridiag_factor(A, gbasis, axis=axis, lines=tab)
        Sinv[s, : len(sl)] = fac["Sinv"]
        W[s, : len(sl)] = fac["W"]
        U[s, : len(sl)] = fac["U"]

    # per-bucket (line, pos) of every owned slot; padding slots -> dump
    lin_idx, pos_idx = {}, {}
    for p in prob.degree_set:
        li = np.full((ndev, prob.m_own[p]), L, dtype=np.int32)  # dump row
        po = np.zeros((ndev, prob.m_own[p]), dtype=np.int32)
        for s in range(ndev):
            ids = prob.owned_slots[(s, p)]
            for j, e in enumerate(ids):
                l_, k_ = e2lk[(s, int(e))]
                li[s, j], po[s, j] = l_, k_
        lin_idx[p], pos_idx[p] = li, po

    device_mesh = prob.device_mesh
    dim0 = tuple(prob.axes)
    data = dict(Sinv=Sinv.astype(np.dtype(dtype)),
                W=W.astype(np.dtype(dtype)), U=U.astype(np.dtype(dtype)),
                lin=lin_idx, pos=pos_idx)
    data_dev = jax.device_put(
        data, jax.tree.map(lambda a: NamedSharding(device_mesh, P(
            dim0, *([None] * (np.asarray(a).ndim - 1)))), data))
    x_specs = {p: P(dim0, None) for p in prob.degree_set}
    data_specs = jax.tree.map(lambda _: P(dim0), data)
    DEG = prob.degree_set

    def body(d, r):
        d = jax.tree.map(lambda a: a[0], d)
        odt = next(iter(r.values())).dtype
        R = jnp.zeros((L + 1, K, B), dtype)
        for p in DEG:
            rp = r[p].astype(dtype)
            R = R.at[d["lin"][p], d["pos"][p], : rp.shape[-1]].set(rp)
        Rl = jnp.swapaxes(R[:L], 0, 1)              # [K, L, B]
        WT = jnp.swapaxes(d["W"], 0, 1)             # [K, L, B, B]
        ST = jnp.swapaxes(d["Sinv"], 0, 1)
        UT = jnp.swapaxes(d["U"], 0, 1)

        def fwd(y_prev, inp):
            Wk, rk = inp
            y = rk - jnp.einsum("lij,lj->li", Wk, y_prev,
                                preferred_element_type=dtype)
            return y, y

        # carry derived from the varying input so its manual-axes tags
        # match inside shard_map (zeros literals are unvarying)
        y0 = Rl[0] * 0.0
        _, Y = jax.lax.scan(fwd, y0, (WT, Rl))

        def bwd(x_next, inp):
            Sk, Uk, yk = inp
            x = jnp.einsum("lij,lj->li", Sk,
                           yk - jnp.einsum("lij,lj->li", Uk, x_next,
                                           preferred_element_type=dtype),
                           preferred_element_type=dtype)
            return x, x

        _, X = jax.lax.scan(bwd, y0, (ST, UT, Y), reverse=True)
        X = jnp.swapaxes(X, 0, 1)                   # [L, K, B]
        out = {}
        for p in DEG:
            li, po = d["lin"][p], d["pos"][p]
            g = X[jnp.clip(li, 0, L - 1), po, : r[p].shape[-1]]
            out[p] = jnp.where((li < L)[:, None], g, 0.0).astype(odt)
        return out

    sharded_body = jax.shard_map(body, mesh=device_mesh,
                                 in_specs=(data_specs, x_specs),
                                 out_specs=x_specs)
    jbody = jax.jit(sharded_body)
    return lambda r: jbody(data_dev, r)
