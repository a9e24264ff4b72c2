"""Sharded colored vertex-patch Schwarz sweeps (slab partitions).

The multi-chip port of ``solvers.patches``: same multiplicative sweep
over 2^dim parity colors, executed as one SPMD program per color on the
device mesh.  Key observations that make it communication-cheap:

* **Cut patches are solved redundantly.**  A patch at a shard-boundary
  vertex spans one owned and one ghost x-slab on EACH side; both shards
  already receive the neighbor slab by ``ppermute`` halo exchange (the
  same exchange the operator apply uses), so both compute the identical
  patch solve on consistent residuals and each keeps only its OWNED
  lanes — no reverse (correction) communication at all.
* **Patch operators are translation classes.**  On a uniform box
  lattice with constant coefficients the patch operator depends only on
  which of the patch's outer faces are domain-boundary faces — at most
  3 states per axis — so one dense inverse per class serves every patch
  in it (memory K^2 per class instead of per patch).  Class inverses
  come from a serially assembled copy of the level operator (cheap: the
  patch-able levels are the low-degree ones).

Per color the cost is one sharded residual (operator apply) plus one
batched [n_patches, K] x [K, K] matmul per class — MXU-shaped with a
collision-free scatter.  Reference analog: none (the reference smooths
with sequential per-rank DynamicBlockGS + L1 regularization,
l1smoother.hh:20); this is a beyond-reference smoother that fixes the
penalty-dominated DG-Q1 h-level plateau on the device mesh (measured in
solvers/patches.py's module docstring).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from hpdg_tpu.solvers import patches as spat


def _lattice_patches(cells):
    """Full-lattice vertex patches: per color (parity tuple, sorted),
    arrays (verts [n, dim], els [n, 2^dim]) with element ids in C order
    (axis 0 slowest) — the order the sharded layer slabs over."""
    dim = len(cells)
    k = 1 << dim
    offs = np.array([[(c >> (dim - 1 - a)) & 1 for a in range(dim)]
                     for c in range(k)], dtype=np.int64)
    strides = np.array([int(np.prod(cells[a + 1:])) for a in range(dim)],
                       dtype=np.int64)
    verts = np.stack(np.meshgrid(*[np.arange(c - 1) for c in cells],
                                 indexing="ij"), axis=-1).reshape(-1, dim)
    els = (verts[:, None, :] + offs[None, :, :]) @ strides  # [n, k]
    colors = {}
    par = verts % 2
    for key in sorted({tuple(r) for r in par}):
        sel = np.all(par == np.asarray(key), axis=1)
        colors[key] = (verts[sel], els[sel].astype(np.int64))
    return list(colors.values())


def _class_key(v, cells):
    return tuple((int(v[a]) == 0, int(v[a]) == cells[a] - 2)
                 for a in range(len(cells)))


def sharded_patch_sweeps(prob, A, basis, dtype=jnp.float64):
    """Build (forward, backward) multiplicative patch sweeps
    ``sweep(x, b) -> x`` for a slab-sharded problem.

    ``prob`` needs: cells, ndev, layer, n_local, bs, apply, axis_name,
    device_mesh (the ShardedElasticity / scalar sharded layout: global
    ``[N, bs]`` arrays slab-partitioned along lattice axis 0, C element
    order).  ``A``/``basis``: the SERIAL level operator the patch
    inverses are extracted from (must match ``prob.apply``).
    """
    cells = tuple(int(c) for c in prob.cells)
    dim = len(cells)
    k = 1 << dim
    (p,) = basis.bucket_degrees
    # duck-typed layout: ShardedElasticity carries bs/device_mesh,
    # the scalar ShardedPoisson carries p/mesh
    bs = getattr(prob, "bs", (p + 1) ** dim)
    dmesh = getattr(prob, "device_mesh", None) or prob.mesh
    K = k * bs
    ndev, layer, n_local = prob.ndev, prob.layer, prob.n_local
    loc0 = cells[0] // ndev
    axis_name = prob.axis_name

    # one dense inverse per boundary class, from the assembled operator
    inv_cache = {}

    def class_inverse(key, rep_els):
        if key not in inv_cache:
            inv = spat.patch_inverses(
                A, basis, [rep_els[None, :].astype(np.int32)], dtype=dtype)[0]
            inv_cache[key] = inv[0]
        return inv_cache[key]

    right_perm = [(i, i + 1) for i in range(ndev - 1)]
    left_perm = [(i + 1, i) for i in range(ndev - 1)]

    color_fns = []
    for verts, els in _lattice_patches(cells):
        # group by boundary class, then build per-shard padded tables
        by_class = {}
        for i in range(len(verts)):
            by_class.setdefault(_class_key(verts[i], cells), []).append(i)
        groups = []
        for key, ids in sorted(by_class.items()):
            ids = np.asarray(ids)
            inv = class_inverse(key, els[ids[0]])
            v0 = verts[ids, 0]
            per_shard = []
            for s in range(ndev):
                sel = ids[(v0 >= s * loc0 - 1) & (v0 <= (s + 1) * loc0 - 1)]
                e = els[sel]                      # [ns, k] global ids
                lidx = e - s * n_local + layer    # extended-local
                own = (e >= s * n_local) & (e < (s + 1) * n_local)
                per_shard.append((lidx, own))
            npat = max(len(t[0]) for t in per_shard)
            L = np.zeros((ndev, npat, k), dtype=np.int32)
            O = np.zeros((ndev, npat, k), dtype=bool)
            for s, (lidx, own) in enumerate(per_shard):
                L[s, :len(lidx)] = lidx
                O[s, :len(own)] = own
            groups.append((jnp.asarray(L), jnp.asarray(O), inv))

        def local_correction(r, *tabs):
            # r: [n_local, bs] shard-local residual
            rl = jax.lax.ppermute(r[-layer:], axis_name, right_perm)
            rr = jax.lax.ppermute(r[:layer], axis_name, left_perm)
            re = jnp.concatenate([rl, r, rr], axis=0)
            dx = jnp.zeros_like(re)
            for gi in range(0, len(tabs), 3):
                lidx, own, inv = tabs[gi], tabs[gi + 1], tabs[gi + 2]
                npat = lidx.shape[1]
                rg = re[lidx[0]].reshape(npat, K)
                y = (rg @ inv.T).reshape(npat, k, bs) * own[0][..., None]
                dx = dx.at[lidx[0]].add(y)
            return dx[layer:-layer]

        flat_tabs = [t for (L, O, inv) in groups for t in (L, O, inv)]
        specs = [s for _ in groups
                 for s in (P(axis_name, None, None),
                           P(axis_name, None, None), P(None, None))]
        fn = jax.jit(jax.shard_map(
            local_correction, mesh=dmesh,
            in_specs=(P(axis_name, None), *specs),
            out_specs=P(axis_name, None)))
        color_fns.append((fn, flat_tabs))

    def make_sweep(order):
        def sweep(x, b):
            for fn, tabs in order:
                r = b - prob.apply(x)
                x = x + fn(r, *tabs)
            return x
        return sweep

    return make_sweep(color_fns), make_sweep(color_fns[::-1])
