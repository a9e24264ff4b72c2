"""Mixed-degree (hp) sharded SIPG: the multi-chip analog of the
reference's variable-block-size parallel layer.

The reference communicates *variable-size* per-element DOF buffers over
MPI (``VariableSizeCommunicator`` + per-level ``CommHPDG``,
parallel/communicationhpdg.hh:99-418).  XLA wants static shapes, so the
TPU-native design makes every shard's program identical by construction:

* **slab or block decomposition**: axis 0 slabs over a 1D device mesh
  (ICI ring), multi-axis block partitions over 2D/3D device meshes
  (``device_grid=(4, 2)``), or cut-plane slabs of GENERAL adaptive
  meshes with hanging nodes (``build_hp_sharded_general``);
* **per-shard-identical padded bucket layouts**: the global degree set
  fixes the buckets; each shard stores its owned elements of degree p in
  a ``[m_p, (p+1)^d]`` block padded to the max count over shards
  (padding rows stay exactly zero so global reductions are unaffected);
* **per-degree halo exchange**: each shard packs its first/last element
  layer into one fixed-size buffer per degree and ``ppermute``s it to
  its ring neighbors — the fixed-shape analog of the variable-size MPI
  buffers;
* **plan data as sharded inputs**: gather/scatter indices, geometry and
  penalty coefficients differ per shard, so they are *runtime inputs*
  stacked over the device axis (not program constants) — one compiled
  SPMD program serves every shard, including the domain-boundary shards
  (their "missing neighbor" faces carry zero coefficients and their
  Dirichlet faces carry real ones).

Correctness contract: the sharded apply equals the serial mixed-degree
``matrixfree.sipg_operator`` on the same global problem (tested at
1e-11 on an 8-device CPU mesh).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hpdg_tpu import mesh as hmesh
from hpdg_tpu.basis import tensor
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.assemble.plan import (build_plan, penalty_coef,
                                    boundary_penalty_coef,
                                    face_group_tables)
from hpdg_tpu.matrixfree.diagonal import sipg_diagonal_blocks
from hpdg_tpu.matrixfree.sumfact import _fwd_spec, _bwd_spec

_I = np.int32


@dataclass
class HPSharded:
    """A sharded mixed-degree SIPG problem."""

    cells: tuple
    degrees: np.ndarray           # global per-element degree map
    ndev: int
    axis_name: str
    device_mesh: Mesh
    degree_set: tuple             # global sorted degrees
    m_own: dict                   # p -> padded owned count per shard
    shardings: dict               # p -> NamedSharding of the x[p] arrays
    owned_slots: dict             # (s, p) -> global element ids in slot order
    apply: callable               # {p: [ndev*m_p, bs_p]} -> same (sharded)
    dinv_mul: callable            # block-Jacobi preconditioner r -> Dinv r
    diag: dict                    # p -> [ndev*m_p, bs, bs] diagonal blocks
    n_local: int
    layer: int
    axes: tuple = ("x",)          # device-mesh axis names (one per grid axis)
    device_grid: tuple = (1,)     # devices per partitioned mesh axis
    dim: int = 0                  # mesh dimension (cells may be None)
    gmesh: object = None          # the global Mesh (general-mesh path)

    @property
    def ndim(self) -> int:
        return self.dim or len(self.cells)

    @property
    def pspec(self):
        """PartitionSpec sharding dim 0 over ALL device axes."""
        return P(tuple(self.axes), None)

    def zeros(self, dtype=jnp.float64):
        dim = self.ndim
        return {p: jax.device_put(
            jnp.zeros((self.ndev * self.m_own[p], (p + 1) ** dim), dtype),
            self.shardings[p]) for p in self.degree_set}

    def scatter_global(self, xg: dict, serial_basis: DGBasis, dtype=None):
        """Serial bucketed vector -> sharded layout (host; for tests)."""
        out = {}
        dim = self.ndim
        for p in self.degree_set:
            buf = np.zeros((self.ndev, self.m_own[p], (p + 1) ** dim))
            for s in range(self.ndev):
                ids = self.owned_slots[(s, p)]
                if len(ids):
                    buf[s, :len(ids)] = np.asarray(
                        xg[p])[serial_basis.elem_bucket_pos[ids]]
            arr = jnp.asarray(buf.reshape(self.ndev * self.m_own[p], -1),
                              dtype or jnp.asarray(xg[p]).dtype)
            out[p] = jax.device_put(arr, self.shardings[p])
        return out

    def gather_global(self, xs: dict, serial_basis: DGBasis) -> dict:
        """Sharded layout -> serial bucketed vector (host; for tests)."""
        dim = self.ndim
        out = {}
        for p in serial_basis.bucket_degrees:
            out[p] = np.zeros((serial_basis.bucket_size(p), (p + 1) ** dim))
        for p in self.degree_set:
            buf = np.asarray(xs[p]).reshape(self.ndev, self.m_own[p], -1)
            for s in range(self.ndev):
                ids = self.owned_slots[(s, p)]
                if len(ids):
                    out[p][serial_basis.elem_bucket_pos[ids]] = \
                        buf[s, :len(ids)]
        return out


def _pad(a, n, fill=0):
    a = np.asarray(a)
    out = np.full((n,) + a.shape[1:], fill, dtype=a.dtype)
    out[:len(a)] = a
    return out


def _box_ids(lo, shape, cells):
    """Global element ids of the lattice box [lo, lo+shape) in local
    C-order (axis 0 slowest — matching hmesh.structured element order)."""
    dim = len(cells)
    grids = np.meshgrid(*[np.arange(lo[a], lo[a] + shape[a])
                          for a in range(dim)], indexing="ij")
    ids = np.zeros(tuple(shape), dtype=np.int64)
    for a in range(dim):
        ids = ids * cells[a] + grids[a]
    return ids.reshape(-1)


def build_hp_sharded(cells, degrees, devices=None, penalty: float = 2.0,
                     dirichlet: bool = True, dtype=jnp.float64,
                     penalty_scaling: str = "measure",
                     axis_name: str = "x",
                     device_grid=None, diffusion=None,
                     gmesh=None) -> HPSharded:
    """Build the sharded mixed-degree SIPG apply for a structured mesh.

    ``degrees``: global per-element degree array (element order of
    ``hmesh.structured(cells)``, axis 0 slowest — slabs are contiguous).

    ``device_grid``: devices per partitioned mesh axis, e.g. ``(4, 2)``
    partitions mesh axes 0 and 1 into 4x2 blocks over an 8-device 2D
    jax.sharding.Mesh.  Default ``(len(devices),)`` — the 1-axis slab.
    Multi-axis block partitions cut the halo surface per shard from one
    full mesh cross-section to the block's own surface (the reference's
    arbitrary-partition analog, parallel/communicationhpdg.hh:235-418 —
    but laid out so every exchange is a nearest-neighbor ppermute over
    one ICI mesh axis).
    """
    cells = tuple(int(c) for c in cells)
    dim = len(cells)
    degrees = np.asarray(degrees, dtype=_I).reshape(-1)
    devices = devices if devices is not None else jax.devices()
    if device_grid is None:
        device_grid = (len(devices),)
    device_grid = tuple(int(d) for d in device_grid)
    npax = len(device_grid)
    if npax > dim:
        raise ValueError(f"device_grid {device_grid} has more axes than the "
                         f"mesh ({dim})")
    ndev = int(np.prod(device_grid))
    if len(devices) < ndev:
        raise ValueError(f"need {ndev} devices, got {len(devices)}")
    devices = list(devices)[:ndev]
    for a in range(npax):
        if cells[a] % device_grid[a]:
            raise ValueError(f"cells[{a}]={cells[a]} not divisible by "
                             f"device_grid[{a}]={device_grid[a]}")
    axes = (axis_name,) if npax == 1 else tuple("xyzw"[a] for a in range(npax))
    loc = tuple(cells[a] // device_grid[a] if a < npax else cells[a]
                for a in range(dim))
    if gmesh is None:
        gmesh = hmesh.structured(cells)
    else:  # caller-supplied lattice mesh (e.g. with affine geometry)
        assert gmesh.n_elements == int(np.prod(cells)), \
            "gmesh must be the structured(cells) lattice"
    n_local = int(np.prod(loc))
    layer = n_local // loc[0]  # legacy: axis-0 cross-section size
    # halo axes: partitioned axes with >1 device (others have no neighbor)
    HAX = [a for a in range(npax) if device_grid[a] > 1]

    # halo channels: channel 1+2*ha+side carries my (axis, side) ghost; I
    # pack my OPPOSITE-side boundary layer for it (the lo-side ghost is the
    # lo-neighbor's HIGH layer, shifted +1 along the device axis)
    channels = {}
    for ha, a in enumerate(HAX):
        hi_perm = [(i, i + 1) for i in range(device_grid[a] - 1)]
        lo_perm = [(i + 1, i) for i in range(device_grid[a] - 1)]
        channels[1 + 2 * ha + 0] = (axes[a], hi_perm)
        channels[1 + 2 * ha + 1] = (axes[a], lo_perm)

    # local ids of the own-box boundary layer of (axis, side), layer C-order
    def _own_layer_ids(a, side):
        lshape = list(loc)
        lshape[a] = 1
        llo = [0] * dim
        llo[a] = 0 if side == 0 else loc[a] - 1
        return _box_ids(llo, lshape, loc)

    # ---------------- per-shard extended meshes + plans ----------------
    shards = []
    send_ids = {}
    for s in range(ndev):
        S = np.unravel_index(s, device_grid)
        olo = [S[a] * loc[a] if a < npax else 0 for a in range(dim)]
        own = _box_ids(olo, loc, cells)
        # ghost layers in channel order; shards with no neighbor on a side
        # get detached fakes (match nothing, never referenced by a
        # nonzero-coefficient face)
        ghosts = []
        for ha, a in enumerate(HAX):
            for side in (0, 1):
                gshape = list(loc)
                gshape[a] = 1
                has = (S[a] > 0) if side == 0 else (S[a] < device_grid[a] - 1)
                if has:
                    glo = list(olo)
                    glo[a] = olo[a] - 1 if side == 0 else olo[a] + loc[a]
                    ids = _box_ids(glo, gshape, cells)
                    glow = gmesh.lower[ids]
                    gext = gmesh.extent[ids]
                    gdeg = degrees[ids]
                else:
                    mlo = list(olo)
                    mlo[a] = olo[a] if side == 0 else olo[a] + loc[a] - 1
                    mids = _box_ids(mlo, gshape, cells)
                    glow = gmesh.lower[mids].copy()
                    glow[:, a] -= 1000.0 + s  # detached
                    gext = gmesh.extent[mids]
                    gdeg = degrees[mids]
                ghosts.append(dict(ch=1 + 2 * ha + side, lower=glow,
                                   extent=gext, lay_deg=gdeg,
                                   gids=ids if has else mids,
                                   detached=not has))
                send_ids[(s, 1 + 2 * ha + side)] = own[
                    _own_layer_ids(a, 1 - side)]
        lo = [gmesh.lower[own]] + [g["lower"] for g in ghosts]
        ex = [gmesh.extent[own]] + [g["extent"] for g in ghosts]
        dg = [degrees[own]] + [g["lay_deg"] for g in ghosts]
        ejac = eshift = ecorn = None
        if getattr(gmesh, "jac", None) is not None:
            eids = np.concatenate([own] + [g["gids"] for g in ghosts])
            ejac, eshift = gmesh.jac[eids], gmesh.shift[eids]
        if getattr(gmesh, "corners", None) is not None:
            from hpdg_tpu.mesh import geometry as geo
            # detached fake ghosts get identity (box) corners: their
            # parametric boxes are moved, so real corners would yield
            # garbage Jacobians (NaN risk in masked lanes)
            parts = [gmesh.corners[own]]
            B = geo._bits(gmesh.dim)
            for g in ghosts:
                if g["detached"]:
                    parts.append(g["lower"][:, None, :]
                                 + B[None, :, :] * g["extent"][:, None, :])
                else:
                    parts.append(gmesh.corners[g["gids"]])
            ecorn = np.concatenate(parts)
        emesh = hmesh.from_boxes(np.concatenate(lo), np.concatenate(ex),
                                 validate=False, jac=ejac, shift=eshift,
                                 corners=ecorn)
        ebasis = DGBasis(emesh, np.concatenate(dg))
        shards.append(dict(own=own, ghosts=ghosts, emesh=emesh, ebasis=ebasis,
                           plan=build_plan(ebasis)))

    return _finish_sharded(gmesh, degrees, shards, channels, send_ids,
                           devices, device_grid, axes, penalty, dirichlet,
                           dtype, penalty_scaling, cells=cells,
                           n_local=n_local, layer=layer,
                           diffusion=diffusion)


def slab_partition(gmesh, ndev: int, axis: int = 0) -> np.ndarray:
    """Balanced 1-axis slab partition of a general box mesh: pick
    ``ndev - 1`` cut planes along ``axis`` (from coordinates that split
    no element) balancing element counts; element -> slab of its center.
    Raises if no valid balanced cut exists (e.g. fewer uncut planes than
    shards)."""
    xlo = gmesh.lower[:, axis]
    xhi = xlo + gmesh.extent[:, axis]
    tol = float(gmesh.extent.min()) * 1e-9
    cands = np.unique(np.round(np.concatenate([xlo, xhi]), 12))
    cands = cands[(cands > xlo.min() + tol) & (cands < xhi.max() - tol)]
    valid = np.array([c for c in cands
                      if not np.any((xlo < c - tol) & (xhi > c + tol))])
    if len(valid) < ndev - 1:
        raise ValueError(f"only {len(valid)} uncut planes along axis {axis} "
                         f"for {ndev} shards")
    centers = np.sort(xlo + 0.5 * gmesh.extent[:, axis])
    n = len(centers)
    counts = np.searchsorted(centers, valid - tol)
    # monotone greedy with forced distinctness: plane k must come after
    # plane k-1 and leave enough planes for the remaining cuts
    planes = []
    prev = -1
    for k in range(1, ndev):
        target = n * k / ndev
        lo_i = prev + 1
        hi_i = len(valid) - 1 - (ndev - 1 - k)  # leave room for later cuts
        j = lo_i + int(np.argmin(np.abs(counts[lo_i:hi_i + 1] - target)))
        planes.append(float(valid[j]))
        prev = j
    shard = np.searchsorted(planes, xlo + 0.5 * gmesh.extent[:, axis]).astype(
        np.int64)
    counts = np.bincount(shard, minlength=ndev)
    if counts.min() == 0:
        raise ValueError(f"empty shard in partition (counts {counts})")
    return shard


def balanced_partition(gmesh, ndev: int) -> np.ndarray:
    """PERFECTLY balanced jagged partition: order elements
    lexicographically by center coordinates and cut into equal-count
    runs.  Cross-shard face couplings then span a small bounded set of
    shard offsets, each served by one extra ppermute channel (no ring
    restriction)."""
    centers = gmesh.lower + 0.5 * gmesh.extent
    order = np.lexsort(tuple(centers[:, a]
                             for a in range(gmesh.dim - 1, -1, -1)))
    shard = np.empty(gmesh.n_elements, np.int64)
    bounds = np.linspace(0, gmesh.n_elements, ndev + 1).astype(np.int64)
    for sidx in range(ndev):
        shard[order[bounds[sidx]:bounds[sidx + 1]]] = sidx
    return shard


def morton_partition(gmesh, ndev: int, max_level: int = 21) -> np.ndarray:
    """Space-filling-curve partition: order elements by the Morton code
    of their quantized centers and cut into equal-count runs.  Compared
    to the lexicographic ``balanced_partition`` this keeps shards
    spatially COMPACT (halo volume ~ surface of a blob instead of a thin
    slab) while staying perfectly balanced; the per-offset halo channels
    absorb the jagged boundaries."""
    centers = gmesh.lower + 0.5 * gmesh.extent
    lo = centers.min(axis=0)
    hi = centers.max(axis=0)
    span = np.where(hi - lo > 0, hi - lo, 1.0)
    q = np.minimum(((centers - lo) / span * (2**max_level - 1)).astype(
        np.int64), 2**max_level - 1)
    code = np.zeros(gmesh.n_elements, dtype=object)  # python ints: no ovfl
    for bit in range(max_level):
        for a in range(gmesh.dim):
            code = code + (((q[:, a] >> bit) & 1).astype(object)
                           << (bit * gmesh.dim + a))
    order = np.argsort(np.array([int(c) for c in code]), kind="stable")
    shard = np.empty(gmesh.n_elements, np.int64)
    bounds = np.linspace(0, gmesh.n_elements, ndev + 1).astype(np.int64)
    for sidx in range(ndev):
        shard[order[bounds[sidx]:bounds[sidx + 1]]] = sidx
    return shard


def build_hp_sharded_general(gmesh, degrees, devices=None,
                             penalty: float = 2.0, dirichlet: bool = True,
                             dtype=jnp.float64,
                             penalty_scaling: str = "measure",
                             axis_name: str = "x",
                             elem_shard=None, diffusion=None,
                             max_offset: int = 8,
                             plan_cache: dict | None = None) -> HPSharded:
    """Sharded mixed-degree SIPG on a GENERAL box mesh — including 2:1
    hanging-node meshes from adaptive refinement — under an ARBITRARY
    element partition (the sharded analog of the reference's
    arbitrary-partition hp communication,
    parallel/communicationhpdg.hh:235-418, which dune-parmg feeds with
    adaptively refined distributed grids).

    Partition: 1-axis slabs by cut planes (``slab_partition``, default),
    a perfectly balanced jagged partition (``balanced_partition``), or
    any explicit ``elem_shard`` map.  Every distinct shard OFFSET
    appearing in the face couplings gets its own halo channel (one
    ppermute of a fixed-size per-degree buffer); ring partitions use 2
    channels, jagged ones a few more (bounded by ``max_offset``).
    Ghost sets are the face-adjacent elements of each neighbor shard,
    exchanged per degree in ascending global-element order (the order
    both sides compute locally).  Nonconforming faces become extra face
    classes keyed by their ``nc_code`` with tang-mapped trace tables —
    same mechanism as the serial operator.

    ``plan_cache``: optional dict threaded across rebuilds of the SAME
    problem family (fixed penalty/scaling/diffusion — the adaptive
    loop).  Shards whose content (own + ghost geometry, maps, degrees)
    is unchanged since a previous build reuse their extended
    mesh/basis/plan AND diagonal blocks, keyed by a content hash — the
    TPU-native analog of the reference's PersistentGridView index reuse
    across adapt cycles (persistentgridview.hh:44-207).  Appends
    ``(hits, misses)`` per build under key ``"__stats__"``.
    """
    degrees = np.asarray(degrees, dtype=_I).reshape(-1)
    devices = devices if devices is not None else jax.devices()
    ndev = len(devices)
    f = gmesh.faces
    if elem_shard is None:
        elem_shard = slab_partition(gmesh, ndev)
    elem_shard = np.asarray(elem_shard).reshape(-1)
    si, so = elem_shard[f.inside], elem_shard[f.outside]
    offsets = sorted({int(o) for o in np.unique(so - si)} |
                     {int(o) for o in np.unique(si - so)})
    offsets = [o for o in offsets if o != 0]
    if offsets and max(abs(o) for o in offsets) > max_offset:
        raise ValueError(f"partition couples shards {max(map(abs, offsets))}"
                         f" apart (> max_offset={max_offset})")

    # one channel per shard offset o: shard t packs its elements adjacent
    # to shard t - o and the ppermute moves src -> src - o, so shard s
    # receives the elements of shard s + o that touch it
    channels = {}
    for k, o in enumerate(offsets):
        perm = [(i, i - o) for i in range(ndev)
                if 0 <= i - o < ndev]
        channels[k + 1] = (axis_name, perm)

    def _adj(a, b):
        """Elements of shard a face-adjacent to shard b, ascending ids."""
        mask = ((si == a) & (so == b)) | ((si == b) & (so == a))
        if not mask.any():
            return np.empty(0, np.int64)
        els = np.concatenate([f.inside[mask], f.outside[mask]])
        return np.unique(els[elem_shard[els] == a])

    shards = []
    send_ids = {}
    hits = misses = 0
    for s in range(ndev):
        own = np.where(elem_shard == s)[0]
        ghosts = []
        for k, o in enumerate(offsets):
            nb = s + o
            gids = _adj(nb, s) if 0 <= nb < ndev else np.empty(0, np.int64)
            ghosts.append(dict(ch=k + 1, lower=gmesh.lower[gids],
                               extent=gmesh.extent[gids],
                               lay_deg=degrees[gids], gids=gids))
            rcv = s - o
            send_ids[(s, k + 1)] = _adj(s, rcv) if 0 <= rcv < ndev \
                else np.empty(0, np.int64)
        lo = [gmesh.lower[own]] + [g["lower"] for g in ghosts]
        ex = [gmesh.extent[own]] + [g["extent"] for g in ghosts]
        dg = [degrees[own]] + [g["lay_deg"] for g in ghosts]
        ejac = eshift = ecorn = None
        eids = np.concatenate([own] + [g["gids"] for g in ghosts])
        if getattr(gmesh, "jac", None) is not None:
            ejac, eshift = gmesh.jac[eids], gmesh.shift[eids]
        if getattr(gmesh, "corners", None) is not None:
            ecorn = gmesh.corners[eids]
        key = None
        if plan_cache is not None:
            import hashlib
            h = hashlib.sha1()
            for a in (lo + ex + dg
                      + ([ejac, eshift] if ejac is not None else [])
                      + ([ecorn] if ecorn is not None else [])):
                h.update(np.ascontiguousarray(a).tobytes())
            h.update(np.int64([g["lower"].shape[0] for g in ghosts]
                              ).tobytes())
            key = h.hexdigest()
            ent = plan_cache.get(key)
            if ent is not None:
                hits += 1
                sh_ent = dict(own=own, ghosts=ghosts, emesh=ent["emesh"],
                              ebasis=ent["ebasis"], plan=ent["plan"],
                              diag_cache=ent["diag"], cache_key=key)
                if ent.get("dinv") is not None:
                    sh_ent["dinv_cache"] = ent["dinv"]
                if ent.get("lane") is not None:
                    sh_ent["lane_cache"] = ent["lane"]
                shards.append(sh_ent)
                continue
            misses += 1
        emesh = hmesh.from_boxes(np.concatenate(lo), np.concatenate(ex),
                                 validate=False, jac=ejac, shift=eshift,
                                 corners=ecorn)
        ebasis = DGBasis(emesh, np.concatenate(dg))
        shards.append(dict(own=own, ghosts=ghosts, emesh=emesh, ebasis=ebasis,
                           plan=build_plan(ebasis), cache_key=key))

    res = _finish_sharded(gmesh, degrees, shards, channels, send_ids,
                          devices, (ndev,), (axis_name,), penalty, dirichlet,
                          dtype, penalty_scaling, cells=None,
                          n_local=max(len(sh["own"]) for sh in shards),
                          layer=0, diffusion=diffusion)
    if plan_cache is not None:
        for sh in shards:
            k = sh.get("cache_key")
            if k is None:
                continue
            ent = plan_cache.get(k)
            if ent is None:
                plan_cache[k] = dict(emesh=sh["emesh"], ebasis=sh["ebasis"],
                                     plan=sh["plan"],
                                     diag=sh.get("diag_cache"),
                                     dinv=sh.get("dinv_cache"),
                                     lane=sh.get("lane_cache"))
            else:
                # older entries grow the newly computed pieces (lane
                # stacks, diagonal-block inverses) in place
                for src, dst in (("dinv_cache", "dinv"),
                                 ("lane_cache", "lane")):
                    if ent.get(dst) is None and sh.get(src) is not None:
                        ent[dst] = sh[src]
        plan_cache.setdefault("__stats__", []).append((hits, misses))
    return res


def _finish_sharded(gmesh, degrees, shards, channels, send_ids, devices,
                    device_grid, axes, penalty, dirichlet, dtype,
                    penalty_scaling, cells, n_local, layer,
                    diffusion=None) -> HPSharded:
    """Common tail of the sharded builders: pad class sets across shards,
    build the stacked per-shard plan data, and compile the SPMD body.

    Contract with the front-ends: ``shards[s]`` has ``own`` (global ids,
    the order defining owned slots), ``ghosts`` (blocks in a FIXED global
    channel order; block ids == the neighbor's ``send_ids`` list for that
    channel, so per-degree ranks agree on both sides), ``emesh``/
    ``ebasis``/``plan`` over own+ghost elements (own first).
    ``channels[ch] = (device_axis_name, ppermute_perm)``.
    """
    dim = gmesh.dim
    ndev = len(shards)
    from hpdg_tpu.mesh import geometry as geo
    # kmat: K(x) returns a symmetric (dim, dim) tensor per point
    # (anisotropic media / general-geometry pullback) — the sharded
    # analog of gausslobattoipdgcoefficientassembler.hh:31 combined with
    # the parallel layer (communicationhpdg.hh:235-418): the per-face /
    # per-volume coefficient arrays generalize from [.., q] scalars to
    # [.., q, d, d] tensors through the same gather/compute/scatter.
    # First-class affine geometry (mesh.jac) folds into the SAME tensor
    # arrays as |det A| A^-1 K A^-T per side (see mesh/geometry.py), so
    # general geometry shards exactly like anisotropic media.
    affine = geo.has_affine(gmesh)
    kmat = affine
    if diffusion is not None:
        kp = np.asarray(diffusion(jnp.full((1, dim), 0.5)))
        kmat = kmat or kp.ndim >= 3
    has_k = diffusion is not None or affine
    DEG = tuple(sorted(int(d) for d in np.unique(degrees)))
    CHS = sorted(channels)
    n_own = [len(sh["own"]) for sh in shards]

    # ---------------- global class sets + padded sizes ----------------
    m_own = {p: max(int(np.sum(degrees[sh["own"]] == p)) for sh in shards)
             for p in DEG}
    m_ext = {p: max((sh["ebasis"].bucket_size(p)
                     if p in sh["ebasis"].bucket_degrees else 0)
                    for sh in shards) for p in DEG}
    G = {}  # (p, ch) -> padded halo-buffer length
    for p in DEG:
        for ch in CHS:
            G[(p, ch)] = max(int(np.sum(degrees[send_ids[(s, ch)]] == p))
                             for s in range(ndev))
    # face classes keyed by (p_in, p_out, axis, nc_code) — hanging-node
    # sub-face classes get their own tang-mapped trace tables
    FCLS = []
    rep = {}
    for sh in shards:
        for fg in sh["plan"].face_groups:
            c = (fg.p_in, fg.p_out, fg.axis, fg.nc_code)
            if c not in rep:
                rep[c] = (sh["ebasis"], fg)
                FCLS.append(c)
    FCLS = sorted(FCLS)
    BCLS = sorted({(bg.p, bg.axis, bg.side)
                   for sh in shards for bg in sh["plan"].boundary_groups
                   if dirichlet}) if dirichlet else []
    Fmax = {c: 0 for c in FCLS}
    Bmax = {c: 0 for c in BCLS}
    for sh in shards:
        for fg in sh["plan"].face_groups:
            c = (fg.p_in, fg.p_out, fg.axis, fg.nc_code)
            Fmax[c] = max(Fmax[c], len(fg.face_ids))
        if dirichlet:
            for bg in sh["plan"].boundary_groups:
                c = (bg.p, bg.axis, bg.side)
                if c in Bmax:
                    Bmax[c] = max(Bmax[c], len(bg.face_ids))

    # ---------------- per-shard stacked plan data ----------------
    # send[(p, ch)]: owned slots of my degree-p elements packed for halo
    # channel ch — the fixed-shape analog of the reference's
    # variable-size per-element MPI buffers.
    data = {"ext_kind": {}, "ext_idx": {}, "send": {},
            "bulk_coef": {}, "ownmask": {}, "dinv": {}, "diag": {},
            "fg": {}, "bg": {}}
    if has_k:
        data["bulk_k"] = {}
    if kmat:
        data["bulk_invh"] = {}
        data["bulk_detj"] = {}
    owned_slots = {}
    # per-shard diagonal blocks, computed ONCE per shard (the extended
    # mesh includes interface and true domain-boundary faces; ghost
    # blocks unused).  Host-side f64 when the runtime has it, otherwise
    # honestly f32 (requesting f64 under a non-x64 runtime only
    # truncates with a warning per call).
    host_dtype = (jnp.float64 if jax.config.jax_enable_x64 else dtype)
    Dsh = []
    for sh in shards:
        if "diag_cache" in sh:
            Dsh.append(sh["diag_cache"])
        else:
            D = sipg_diagonal_blocks(sh["ebasis"], penalty=penalty,
                                     dirichlet=dirichlet, plan=sh["plan"],
                                     penalty_scaling=penalty_scaling,
                                     diffusion=diffusion, dtype=host_dtype)
            sh["diag_cache"] = D
            Dsh.append(D)
    for s, sh in enumerate(shards):
        own = sh["own"]
        od = degrees[own]
        for p in DEG:
            owned_slots[(s, p)] = own[od == p]

    def _deg_lane(sh, s, p, vtp):
        """Shard ``s``'s UNPADDED stack contributions for degree ``p``.

        A pure function of the shard's content (own + ghost geometry,
        maps, degrees) and the fixed problem family (penalty scaling /
        diffusion), so it rides the plan cache: clean shards skip these
        per-element loops on rebuilds — the profiled O(N) warm-rebuild
        floor (plan_seconds followed total mesh size, not dirty
        shards)."""
        eb = sh["ebasis"]
        own_p = owned_slots[(s, p)]
        no = len(own_p)
        out = {"no": no}
        if p in eb.bucket_degrees:
            # ext bucket: owned slots first (ext element order), then
            # ghosts; a ghost's recv index = its rank among deg-p
            # elements of its block (both sides enumerate the block in
            # the same order)
            elems = eb.bucket_elems[p]  # ext element ids, sorted
            ek_v = np.zeros(len(elems), _I)
            ei_v = np.arange(len(elems), dtype=_I)  # owned slot == pos
            ghm = elems >= n_own[s]
            if ghm.any():
                blk_off = []
                off = n_own[s]
                for g in sh["ghosts"]:
                    blk_off.append(off)
                    off += len(g["lay_deg"])
                e_g = elems[ghm]
                gi = np.searchsorted(blk_off, e_g, side="right") - 1
                ek_v[ghm] = np.array([g["ch"] for g in sh["ghosts"]],
                                     _I)[gi]
                ei_g = np.zeros(len(e_g), _I)
                for gidx, g in enumerate(sh["ghosts"]):
                    mblk = gi == gidx
                    if mblk.any():
                        cs = np.concatenate(
                            [[0], np.cumsum(g["lay_deg"] == p)])
                        ei_g[mblk] = cs[e_g[mblk] - blk_off[gidx]]
                ei_v[ghm] = ei_g
            out["ek"], out["ei"] = ek_v, ei_v
        snd = {}
        for ch in CHS:
            sel = send_ids[(s, ch)]
            sel = sel[degrees[sel] == p]
            # own_p ascending and sel subset of own_p: searchsorted is
            # the owned-slot index
            snd[ch] = np.searchsorted(own_p, sel).astype(_I)
        out["snd"] = snd
        if no:
            ext = gmesh.extent[own_p]
            out["bc"] = np.prod(ext, axis=1)[:, None] / ext**2
            if kmat:
                out["bih"] = 1.0 / ext
                out["bdj"] = np.prod(ext, axis=1)
            if has_k:
                xpq = (gmesh.lower[own_p][:, None, :]
                       + vtp["points"][None, :, :] * ext[:, None, :])
                xq = geo.apply_map(gmesh, own_p, xpq)
                kq_b = (np.asarray(diffusion(jnp.asarray(xq)))
                        if diffusion is not None else None)
                if affine:
                    kq_b = np.asarray(geo.effective_tensor(
                        gmesh, own_p, kq_b, xpq))
                out["bk"] = kq_b
        return out

    for p in DEG:
        ek = np.zeros((ndev, m_ext[p]), _I)
        ei = np.zeros((ndev, m_ext[p]), _I)
        snd = {ch: np.zeros((ndev, max(G[(p, ch)], 1)), _I) for ch in CHS}
        bc = np.zeros((ndev, m_own[p], dim))
        om = np.zeros((ndev, m_own[p]))
        bs = (p + 1) ** dim
        dv = np.zeros((ndev, m_own[p], bs, bs))
        dr = np.broadcast_to(np.eye(bs), (ndev, m_own[p], bs, bs)).copy()
        vtp = None
        if has_k:
            vtp = tensor.volume_tables(p, dim, p + 2,
                                       family=shards[0]["ebasis"].family)
            kshape = (dim, dim) if kmat else ()
            bk = np.zeros((ndev, m_own[p], len(vtp["weights"])) + kshape)
        if kmat:
            bih = np.zeros((ndev, m_own[p], dim))
            bdj = np.zeros((ndev, m_own[p]))
        for s, sh in enumerate(shards):
            lane = sh.setdefault("lane_cache", {})
            ln = lane.get(("deg", p))
            if ln is None:
                ln = _deg_lane(sh, s, p, vtp)
                lane[("deg", p)] = ln
            no = ln["no"]
            om[s, :no] = 1.0
            if "ek" in ln:
                ek[s, :len(ln["ek"])] = ln["ek"]
                ei[s, :len(ln["ei"])] = ln["ei"]
            for ch in CHS:
                sv = ln["snd"][ch]
                snd[ch][s, :len(sv)] = sv
            if no:
                bc[s, :no] = ln["bc"]
                if kmat:
                    bih[s, :no] = ln["bih"]
                    bdj[s, :no] = ln["bdj"]
                if has_k:
                    bk[s, :no] = ln["bk"]
            D = Dsh[s]
            if p in D and no:
                dr[s, :no] = np.asarray(D[p])[:no]
                # inverses ride the plan cache too: recomputing them was
                # the single biggest warm-rebuild cost (8 x np.linalg.inv
                # ~0.3 s at 171k elements, profiled)
                dinv_c = shards[s].setdefault("dinv_cache", {})
                if p not in dinv_c:
                    dinv_c[p] = np.linalg.inv(dr[s, :no])
                dv[s, :no] = dinv_c[p]
        data["ext_kind"][p] = ek
        data["ext_idx"][p] = ei
        for ch, arr in snd.items():
            data["send"][(p, ch)] = arr
        data["bulk_coef"][p] = bc
        data["ownmask"][p] = om
        data["dinv"][p] = dv
        data["diag"][p] = dr
        if has_k:
            data["bulk_k"][p] = bk
        if kmat:
            data["bulk_invh"][p] = bih
            data["bulk_detj"][p] = bdj

    for c in FCLS:
        pi, po, ax, ncc = c
        F = Fmax[c]
        arr = dict(in_pos=np.zeros((ndev, F), _I),
                   out_pos=np.zeros((ndev, F), _I),
                   tgt_in=np.full((ndev, F), m_own[pi], _I),
                   tgt_out=np.full((ndev, F), m_own[po], _I),
                   fmeas=np.zeros((ndev, F)), pen=np.zeros((ndev, F)),
                   ihi=np.zeros((ndev, F)), iho=np.zeros((ndev, F)))
        if has_k:
            ebasis_c, fg_c = rep[c]
            fin_c, _ = face_group_tables(ebasis_c, fg_c, max(pi, po) + 2)
            kshape = (dim, dim) if kmat else ()
            arr["kq"] = np.zeros((ndev, F, len(fin_c["weights"])) + kshape)
            if affine:  # per-side effective tensors differ
                arr["kq_out"] = np.zeros_like(arr["kq"])
        if kmat:
            arr["ihi_all"] = np.zeros((ndev, F, dim))
            arr["iho_all"] = np.zeros((ndev, F, dim))
        def _fg_lane(sh, s):
            """Shard ``s``'s unpadded rows for face class ``c`` (one
            entry per matching face group, applied in plan order) —
            cached alongside the plan, same content argument as
            ``_deg_lane``."""
            rows = []
            for fg in sh["plan"].face_groups:
                if (fg.p_in, fg.p_out, fg.axis, fg.nc_code) != c:
                    continue
                ein = sh["emesh"].faces.inside[fg.face_ids]
                eout = sh["emesh"].faces.outside[fg.face_ids]
                row = dict(k=len(fg.face_ids), in_pos=fg.in_pos,
                           out_pos=fg.out_pos,
                           own_in=ein < n_own[s],
                           own_out=eout < n_own[s],
                           fmeas=fg.fmeas, ihi=fg.inv_h_in,
                           iho=fg.inv_h_out,
                           pen=(geo.penalty_coef_mesh(
                               sh["emesh"], fg, penalty, max(pi, po),
                               penalty_scaling)
                               if affine else
                               penalty_coef(fg, penalty, max(pi, po),
                                            penalty_scaling)))
                if has_k:
                    from hpdg_tpu.assemble.plan import face_phys_points
                    xpq = face_phys_points(sh["ebasis"], fg,
                                           fin_c["points"])
                    xq = (geo.apply_map(sh["emesh"], ein, xpq)
                          if affine else xpq)
                    kq_f = (np.asarray(diffusion(jnp.asarray(xq)))
                            if diffusion is not None else None)
                    if affine:
                        row["kq"] = np.asarray(geo.effective_tensor(
                            sh["emesh"], ein, kq_f, xpq))
                        row["kq_out"] = np.asarray(geo.effective_tensor(
                            sh["emesh"], eout, kq_f, xpq))
                    else:
                        row["kq"] = kq_f
                if kmat:
                    row["ihi_all"] = 1.0 / sh["emesh"].extent[ein]
                    row["iho_all"] = 1.0 / sh["emesh"].extent[eout]
                rows.append(row)
            return rows

        for s, sh in enumerate(shards):
            lane = sh.setdefault("lane_cache", {})
            rows = lane.get(("fg", c))
            if rows is None:
                rows = _fg_lane(sh, s)
                lane[("fg", c)] = rows
            for row in rows:
                k = row["k"]
                arr["in_pos"][s, :k] = row["in_pos"]
                arr["out_pos"][s, :k] = row["out_pos"]
                # scatter target: owned slot (== ext bucket pos, owned
                # come first) or the dump row m_own[p]
                arr["tgt_in"][s, :k] = np.where(row["own_in"],
                                                row["in_pos"], m_own[pi])
                arr["tgt_out"][s, :k] = np.where(row["own_out"],
                                                 row["out_pos"], m_own[po])
                arr["fmeas"][s, :k] = row["fmeas"]
                arr["ihi"][s, :k] = row["ihi"]
                arr["iho"][s, :k] = row["iho"]
                arr["pen"][s, :k] = row["pen"]
                if has_k:
                    arr["kq"][s, :k] = row["kq"]
                    if affine:
                        arr["kq_out"][s, :k] = row["kq_out"]
                if kmat:
                    arr["ihi_all"][s, :k] = row["ihi_all"]
                    arr["iho_all"][s, :k] = row["iho_all"]
        data["fg"][c] = arr

    for c in BCLS:
        p, ax, side = c
        B = Bmax[c]
        arr = dict(pos=np.zeros((ndev, B), _I),
                   tgt=np.full((ndev, B), m_own[p], _I),
                   fmeas=np.zeros((ndev, B)), pen=np.zeros((ndev, B)),
                   ih=np.zeros((ndev, B)))
        if has_k:
            ftc = tensor.face_tables(p, dim, ax, side, p + 2,
                                     family=shards[0]["ebasis"].family)
            kshape = (dim, dim) if kmat else ()
            arr["kq"] = np.zeros((ndev, B, len(ftc["weights"])) + kshape)
        if kmat:
            arr["ih_all"] = np.zeros((ndev, B, dim))
        def _bg_lane(sh, s):
            """Shard ``s``'s unpadded rows for boundary class ``c``
            (owned faces only) — cached alongside the plan."""
            rows = []
            for bg in sh["plan"].boundary_groups:
                if (bg.p, bg.axis, bg.side) != c:
                    continue
                elems = sh["emesh"].bfaces.elem[bg.face_ids]
                keep = np.where(elems < n_own[s])[0]  # owned only: ghost
                # outer boundaries and detached fakes are not domain bdry
                row = dict(k=len(keep), pos=bg.pos[keep],
                           fmeas=bg.fmeas[keep], ih=bg.inv_h[keep],
                           pen=(geo.boundary_penalty_coef_mesh(
                               sh["emesh"], bg, penalty, penalty_scaling)
                               if affine else
                               boundary_penalty_coef(
                                   bg, penalty, penalty_scaling))[keep])
                if has_k:
                    em = sh["emesh"]
                    els = elems[keep]
                    lo = em.lower[els].copy()
                    if side == 1:
                        lo[:, ax] += em.extent[els, ax]
                    tangs = [a_ for a_ in range(dim) if a_ != ax]
                    xpq = np.repeat(lo[:, None, :], len(ftc["weights"]),
                                    axis=1)
                    for t_, a_ in enumerate(tangs):
                        xpq[:, :, a_] += (ftc["points"][None, :, t_]
                                          * em.extent[els, a_][:, None])
                    xq = geo.apply_map(em, els, xpq)
                    kq_bd = (np.asarray(diffusion(jnp.asarray(xq)))
                             if diffusion is not None else None)
                    if affine:
                        kq_bd = np.asarray(geo.effective_tensor(
                            em, els, kq_bd, xpq))
                    row["kq"] = kq_bd
                if kmat:
                    row["ih_all"] = 1.0 / sh["emesh"].extent[elems[keep]]
                rows.append(row)
            return rows

        for s, sh in enumerate(shards):
            lane = sh.setdefault("lane_cache", {})
            rows = lane.get(("bg", c))
            if rows is None:
                rows = _bg_lane(sh, s)
                lane[("bg", c)] = rows
            for row in rows:
                k = row["k"]
                arr["pos"][s, :k] = row["pos"]
                arr["tgt"][s, :k] = row["pos"]
                arr["fmeas"][s, :k] = row["fmeas"]
                arr["ih"][s, :k] = row["ih"]
                arr["pen"][s, :k] = row["pen"]
                if has_k:
                    arr["kq"][s, :k] = row["kq"]
                if kmat:
                    arr["ih_all"][s, :k] = row["ih_all"]
        data["bg"][c] = arr

    # ---------------- static trace tables ----------------
    fam = shards[0]["ebasis"].family
    ftabs = {}
    fall = {}  # full trace-gradient tables (tensor media only)
    for c in FCLS:
        pi, po, ax, ncc = c
        ebasis_c, fg_c = rep[c]
        fin, fout = face_group_tables(ebasis_c, fg_c, max(pi, po) + 2)
        ftabs[c] = (fin["weights"], fin["V"], fin["Dn"], fout["V"],
                    fout["Dn"])
        if kmat:
            fall[c] = (fin["Dall"], fout["Dall"])
    btabs = {}
    ball = {}
    for c in BCLS:
        p, ax, side = c
        ft = tensor.face_tables(p, dim, ax, side, p + 2, family=fam)
        btabs[c] = (ft["weights"], ft["V"], ft["Dn"],
                    1.0 if side == 1 else -1.0)
        if kmat:
            ball[c] = ft["Dall"]
    vtabs = {p: tensor.volume_tables(p, dim, p + 2, family=fam) for p in DEG}

    # ---------------- the SPMD body ----------------
    device_mesh = Mesh(np.array(devices).reshape(device_grid), axes)
    fwd, bwd = _fwd_spec(dim), _bwd_spec(dim)
    J = lambda a: jnp.asarray(a, dtype)  # noqa: E731

    def body(d, x):
        # d, x: shard-local blocks; plan arrays carry a leading length-1
        # device axis (sliced off), x[p] is [m_own_p, bs_p]
        d = jax.tree.map(lambda a: a[0], d)
        # halo exchange per degree per channel
        recv = {}
        for p in DEG:
            for ch in CHS:
                if G[(p, ch)] == 0:
                    continue
                name, perm = channels[ch]
                buf = x[p][d["send"][(p, ch)]]
                recv[(p, ch)] = jax.lax.ppermute(buf, name, perm)
        # materialize extended buckets
        xe = {}
        for p in DEG:
            k, i = d["ext_kind"][p], d["ext_idx"][p]
            out = x[p][jnp.clip(i, 0, x[p].shape[0] - 1)]
            for ch in CHS:
                if (p, ch) not in recv:
                    continue
                r = recv[(p, ch)]
                sel = r[jnp.clip(i, 0, r.shape[0] - 1)]
                out = jnp.where((k == ch)[:, None], sel, out)
            xe[p] = out
        # bulk (owned only) + dump row
        y = {}
        for p in DEG:
            vt = vtabs[p]
            t1 = vt["t1d"]
            V, D = t1.values, t1.derivatives
            nb1 = V.shape[0]
            u = x[p].reshape((x[p].shape[0],) + (nb1,) * dim)
            wq = jnp.asarray(vt["weights"], dtype).reshape(
                (len(t1.qweights),) * dim)
            coef = d["bulk_coef"][p]
            out = 0.0
            if kmat:
                # tensor medium: all reference-gradient fields, mixed by
                # K per point (mirrors matrixfree.sumfact tensor branch)
                kq = d["bulk_k"][p].astype(dtype).reshape(
                    (x[p].shape[0],) + wq.shape + (dim, dim))
                invh = d["bulk_invh"][p].astype(dtype)
                wdet = (wq[None] * d["bulk_detj"][p].astype(dtype).reshape(
                    (-1,) + (1,) * dim))
                dus = []
                for b in range(dim):
                    tabs = [J(D) if c_ == b else J(V) for c_ in range(dim)]
                    dus.append(jnp.einsum(fwd, u, *tabs,
                                          preferred_element_type=dtype)
                               * invh[:, b].reshape((-1,) + (1,) * dim))
                for a in range(dim):
                    g = 0.0
                    for b in range(dim):
                        g = g + kq[..., a, b] * dus[b]
                    g = g * wdet * invh[:, a].reshape((-1,) + (1,) * dim)
                    tabs = [J(D) if c_ == a else J(V) for c_ in range(dim)]
                    out = out + jnp.einsum(bwd, g, *tabs,
                                           preferred_element_type=dtype)
            else:
                kq = None
                if "bulk_k" in d:
                    kq = d["bulk_k"][p].astype(dtype).reshape(
                        (x[p].shape[0],) + wq.shape)
                for a in range(dim):
                    tabs = [J(D) if b == a else J(V) for b in range(dim)]
                    du = jnp.einsum(fwd, u, *tabs,
                                    preferred_element_type=dtype)
                    g = du * wq[None] * coef[:, a].astype(dtype).reshape(
                        (-1,) + (1,) * dim)
                    if kq is not None:
                        g = g * kq
                    out = out + jnp.einsum(bwd, g, *tabs,
                                           preferred_element_type=dtype)
            yb = out.reshape(x[p].shape)
            y[p] = jnp.concatenate(
                [yb, jnp.zeros((1, yb.shape[1]), dtype)], axis=0)
        # interior faces per class
        for c in FCLS:
            pi, po, ax, ncc = c
            w, Vi, Di, Vo, Do = (J(t) for t in ftabs[c])
            a = d["fg"][c]
            u_in = xe[pi][a["in_pos"]]
            u_out = xe[po][a["out_pos"]]
            uinq = u_in @ Vi
            uoutq = u_out @ Vo
            jump = uinq - uoutq
            zw = a["fmeas"].astype(dtype)[:, None] * w[None, :]
            penw = a["pen"].astype(dtype)[:, None] * w[None, :]
            if kmat:
                # tensor medium: co-normal derivatives via the full
                # trace-gradient tables (K folded in)
                Dalli, Dallo = (J(t) for t in fall[c])
                kq = a["kq"].astype(dtype)
                kqo = (a["kq_out"] if "kq_out" in a else a["kq"]).astype(
                    dtype)
                Ka = kq[..., ax, :]                     # (F, q, dim)
                Kao = kqo[..., ax, :]
                ihi = a["ihi_all"].astype(dtype)        # (F, dim)
                iho = a["iho_all"].astype(dtype)
                duin = jnp.einsum("fi,biq->fbq", u_in, Dalli,
                                  preferred_element_type=dtype)
                duout = jnp.einsum("fi,biq->fbq", u_out, Dallo,
                                   preferred_element_type=dtype)
                dninq = jnp.einsum("fqb,fb,fbq->fq", Ka, ihi, duin,
                                   preferred_element_type=dtype)
                dnoutq = jnp.einsum("fqb,fb,fbq->fq", Kao, iho, duout,
                                    preferred_element_type=dtype)
                avg = 0.5 * (dninq + dnoutq)
                t1_in = -zw * avg + penw * jump
                t1_out = zw * avg - penw * jump
                t2b = zw * (-0.5 * jump)
                y[pi] = y[pi].at[a["tgt_in"]].add(
                    t1_in @ Vi.T + jnp.einsum(
                        "fq,fqb,fb,biq->fi", t2b, Ka, ihi, Dalli,
                        preferred_element_type=dtype))
                y[po] = y[po].at[a["tgt_out"]].add(
                    t1_out @ Vo.T + jnp.einsum(
                        "fq,fqb,fb,biq->fi", t2b, Kao, iho, Dallo,
                        preferred_element_type=dtype))
                continue
            dninq = (u_in @ Di) * a["ihi"].astype(dtype)[:, None]
            dnoutq = (u_out @ Do) * a["iho"].astype(dtype)[:, None]
            avg = 0.5 * (dninq + dnoutq)
            kf = a["kq"].astype(dtype) if "kq" in a else 1.0
            t1_in = -zw * (kf * avg) + penw * jump
            t2_in = zw * (-0.5 * kf * jump) * a["ihi"].astype(dtype)[:, None]
            t1_out = zw * (kf * avg) - penw * jump
            t2_out = zw * (-0.5 * kf * jump) * a["iho"].astype(dtype)[:, None]
            y[pi] = y[pi].at[a["tgt_in"]].add(t1_in @ Vi.T + t2_in @ Di.T)
            y[po] = y[po].at[a["tgt_out"]].add(t1_out @ Vo.T + t2_out @ Do.T)
        # Dirichlet boundary per class
        for c in BCLS:
            p, ax, side = c
            w, V, D, sign = btabs[c]
            w, V, D = J(w), J(V), J(D)
            a = d["bg"][c]
            u = xe[p][a["pos"]]
            uq = u @ V
            zw = a["fmeas"].astype(dtype)[:, None] * w[None, :]
            penw = a["pen"].astype(dtype)[:, None] * w[None, :]
            if kmat:
                Dall = J(ball[c])
                kq = a["kq"].astype(dtype)
                Ka = kq[..., ax, :]
                ih = a["ih_all"].astype(dtype)
                du = jnp.einsum("fi,biq->fbq", u, Dall,
                                preferred_element_type=dtype)
                dnKq = sign * jnp.einsum("fqb,fb,fbq->fq", Ka, ih, du,
                                         preferred_element_type=dtype)
                t1 = -zw * dnKq + penw * uq
                t2b = zw * (-uq)
                y[p] = y[p].at[a["tgt"]].add(
                    t1 @ V.T + sign * jnp.einsum(
                        "fq,fqb,fb,biq->fi", t2b, Ka, ih, Dall,
                        preferred_element_type=dtype))
                continue
            dnq = (u @ D) * (sign * a["ih"].astype(dtype))[:, None]
            kf = a["kq"].astype(dtype) if "kq" in a else 1.0
            t1 = -zw * (kf * dnq) + penw * uq
            t2 = zw * (-(kf * uq)) * (sign * a["ih"].astype(dtype))[:, None]
            y[p] = y[p].at[a["tgt"]].add(t1 @ V.T + t2 @ D.T)
        # drop dump rows, zero padding rows
        return {p: y[p][:m_own[p]] * d["ownmask"][p].astype(dtype)[:, None]
                for p in DEG}

    dim0 = tuple(axes)  # dim 0 sharded over ALL device axes (C-order)
    x_specs = {p: P(dim0, None) for p in DEG}
    data_specs = jax.tree.map(lambda _: P(dim0), data)
    sharded_body = jax.shard_map(body, mesh=device_mesh,
                                 in_specs=(data_specs, x_specs),
                                 out_specs=x_specs)

    # device-resident plan data (cast floats to dtype; dinv too) — one
    # BATCHED device_put over the whole pytree (per-leaf puts cost ~15 ms
    # each on a multi-device mesh; ~1,000 leaves made placement dominate
    # the build, r3 profile)
    def _cast(a):
        a = np.asarray(a)
        return a.astype(dtype) if a.dtype == np.float64 else a

    data_np = jax.tree.map(_cast, data)
    data_dev = jax.device_put(
        data_np, jax.tree.map(lambda a: NamedSharding(device_mesh, P(
            dim0, *([None] * (np.asarray(a).ndim - 1)))), data_np))
    japply = jax.jit(sharded_body)
    apply = lambda x: japply(data_dev, x)  # noqa: E731

    shardings = {p: NamedSharding(device_mesh, P(dim0, None)) for p in DEG}

    # block-Jacobi preconditioner (shard-local, elementwise)
    dinv_dev = {p: data_dev["dinv"][p] for p in DEG}
    diag_dev = {p: data_dev["diag"][p] for p in DEG}

    @jax.jit
    def dinv_mul(r):
        out = {}
        for p in DEG:
            dv = dinv_dev[p].reshape((-1,) + dinv_dev[p].shape[2:])
            out[p] = jnp.einsum("nij,nj->ni", dv.astype(r[p].dtype), r[p],
                                preferred_element_type=r[p].dtype)
        return out

    diag_flat = {p: diag_dev[p].reshape((-1,) + diag_dev[p].shape[2:])
                 for p in DEG}
    return HPSharded(cells=cells, degrees=degrees, ndev=ndev,
                     axis_name=axes[0], device_mesh=device_mesh,
                     degree_set=DEG, m_own=m_own, shardings=shardings,
                     owned_slots=owned_slots, apply=apply, dinv_mul=dinv_mul,
                     diag=diag_flat, n_local=n_local, layer=layer,
                     axes=axes, device_grid=device_grid, dim=dim,
                     gmesh=gmesh)


# ---------------------------------------------------------------------------
# global (sharded) vector helpers for bucket dicts
# ---------------------------------------------------------------------------

def hp_dot(a: dict, b: dict):
    return sum(jnp.vdot(a[p], b[p]) for p in a)


def hp_axpy(alpha, x: dict, y: dict) -> dict:
    return {p: y[p] + alpha * x[p] for p in y}


def hp_norm(a: dict):
    return jnp.sqrt(jnp.real(hp_dot(a, a)))


def hp_pcg_solve(prob: HPSharded, b: dict, iters: int = 200, x0: dict = None):
    """Block-Jacobi-preconditioned CG on sharded bucket dicts, one
    compiled program (fori_loop; psum dot products over the device mesh).
    Returns (x, ||r||)."""

    def safe_div(a, d):
        return jnp.where(jnp.abs(d) > 0, a / jnp.where(d == 0, 1.0, d), 0.0)

    @jax.jit
    def run(b, x):
        r = hp_axpy(-1.0, prob.apply(x), b)
        z = prob.dinv_mul(r)
        rz = hp_dot(r, z)

        def body(i, st):
            x, r, z, pv, rz = st
            Ap = prob.apply(pv)
            alpha = safe_div(rz, hp_dot(pv, Ap))
            x = hp_axpy(alpha, pv, x)
            r = hp_axpy(-alpha, Ap, r)
            z = prob.dinv_mul(r)
            rz_new = hp_dot(r, z)
            pv = hp_axpy(safe_div(rz_new, rz), pv, z)
            return x, r, z, pv, rz_new

        st = jax.lax.fori_loop(0, iters, body, (x, r, z, z, rz))
        return st[0], hp_norm(st[1])

    return run(b, x0 if x0 is not None else jax.tree.map(jnp.zeros_like, b))


def _hp_rho_est(prob: HPSharded, dtype, iters: int = 30,
                precond=None) -> float:
    """Power-iteration estimate of rho(M^-1 A) for a sharded level
    (M = block diagonal by default, or any ``precond`` callable).

    Starts from a fixed-seed RANDOM vector: the ones vector is A-smooth
    and can be nearly orthogonal to the top (penalty-dominated,
    oscillatory) eigenvector — measured on a (2,2,2) p=2 level, 15
    iterations from ones returned 1.0025 where the true rho is 1.90,
    which put the Chebyshev window far below the spectrum and made the
    smoother AMPLIFY top modes by ~200x per application (the divergence
    the r3 h_first debugging traced down).  Random start + 30 iterations
    lands within ~2% of the true rho on every level tested; the 1.1x
    window margin at the call sites absorbs the rest."""
    rng = np.random.default_rng(1887)
    v0 = {p: jnp.asarray(rng.standard_normal(v.shape), dtype)
          for p, v in prob.zeros(dtype).items()}
    M = precond if precond is not None else prob.dinv_mul

    @jax.jit
    def run(v0):
        def body(i, v):
            w = M(prob.apply(v))
            return jax.tree.map(lambda a: a / hp_norm(w), w)

        v = jax.lax.fori_loop(0, iters, body, v0)
        return hp_norm(M(prob.apply(v)))

    return float(run(v0))


# ---------------------------------------------------------------------------
# sharded hp (mixed-degree) p-multigrid
# ---------------------------------------------------------------------------

@dataclass
class HPShardedPMG:
    levels: list        # coarsest..finest HPSharded problems
    degree_maps: list   # per-level global degree arrays
    step: callable      # jit-safe (x, b) -> x on sharded bucket dicts


def _hp_transfer(probf: HPSharded, probc: HPSharded, degf, degc,
                 axis_name: str, dtype):
    """Element-local sharded p-transfer between two degree maps on the
    same mesh/partition (DGOrderTransfer analog, ordertransfer.hh:45-124
    — block-diagonal, so it shards with the elements and needs no
    communication)."""
    dim = probf.ndim
    ndev = probf.ndev
    pairs = sorted({(int(a), int(b)) for a, b in zip(degf, degc)})
    M = {}
    fidx = {}
    cidx = {}
    for pr in pairs:
        pf, pc = pr
        counts = []
        per_shard = []
        for s in range(ndev):
            own_f = probf.owned_slots[(s, pf)]
            own_c = probc.owned_slots[(s, pc)]
            slot_f = {int(e): k for k, e in enumerate(own_f)}
            slot_c = {int(e): k for k, e in enumerate(own_c)}
            elems = [e for e in own_f
                     if int(degc[e]) == pc]  # fine deg pf AND coarse deg pc
            per_shard.append(([slot_f[int(e)] for e in elems],
                              [slot_c[int(e)] for e in elems]))
            counts.append(len(elems))
        M[pr] = max(max(counts), 1)
        fi = np.zeros((ndev, M[pr]), _I)
        ci = np.full((ndev, M[pr]), probc.m_own[pc], _I)  # pad -> dump
        fo = np.full((ndev, M[pr]), probf.m_own[pf], _I)
        for s, (fs, cs) in enumerate(per_shard):
            fi[s, :len(fs)] = fs
            ci[s, :len(cs)] = cs
            fo[s, :len(fs)] = fs
        fidx[pr] = (fi, fo)
        cidx[pr] = ci
    Ts = {pr: jnp.asarray(tensor.interpolation_matrix(pr[1], pr[0], dim),
                          dtype) for pr in pairs}

    tdata = {"fi": {pr: fidx[pr][0] for pr in pairs},
             "fo": {pr: fidx[pr][1] for pr in pairs},
             "ci": {pr: cidx[pr] for pr in pairs}}

    DEGF, DEGC = probf.degree_set, probc.degree_set

    def restrict_body(d, rf):
        d = jax.tree.map(lambda a: a[0], d)
        rc = {pc: jnp.zeros((probc.m_own[pc] + 1, (pc + 1) ** dim), dtype)
              for pc in DEGC}
        for pr in pairs:
            pf, pc = pr
            vals = rf[pf][d["fi"][pr]] @ Ts[pr]  # T^T r elementwise
            rc[pc] = rc[pc].at[d["ci"][pr]].add(vals)
        return {pc: rc[pc][:probc.m_own[pc]] for pc in DEGC}

    def prolong_body(d, xc):
        d = jax.tree.map(lambda a: a[0], d)
        xf = {pf: jnp.zeros((probf.m_own[pf] + 1, (pf + 1) ** dim), dtype)
              for pf in DEGF}
        for pr in pairs:
            pf, pc = pr
            vals = xc[pc][jnp.clip(d["ci"][pr], 0,
                                   probc.m_own[pc] - 1)] @ Ts[pr].T
            xf[pf] = xf[pf].at[d["fo"][pr]].set(vals)
        return {pf: xf[pf][:probf.m_own[pf]] for pf in DEGF}

    mesh = probf.device_mesh
    dim0 = tuple(probf.axes)
    fspec = {p: P(dim0, None) for p in DEGF}
    cspec = {p: P(dim0, None) for p in DEGC}
    dspec = jax.tree.map(lambda _: P(dim0), tdata)
    tdev = jax.tree.map(lambda a: jax.device_put(
        jnp.asarray(a), NamedSharding(mesh, P(dim0, None))), tdata)
    rshard = jax.shard_map(restrict_body, mesh=mesh,
                           in_specs=(dspec, fspec), out_specs=cspec)
    pshard = jax.shard_map(prolong_body, mesh=mesh,
                           in_specs=(dspec, cspec), out_specs=fspec)
    return (lambda rf: rshard(tdev, rf)), (lambda xc: pshard(tdev, xc))


def build_hp_sharded_pmg(cells, degrees, devices=None, penalty: float = 2.0,
                         dirichlet: bool = True, dtype=jnp.float64,
                         penalty_scaling: str = "measure",
                         cheb_degree: int = 3, device_grid=None,
                         gmesh=None, diffusion=None,
                         coarse_cg_iters: int = 60) -> HPShardedPMG:
    """Sharded mixed-degree p-multigrid: level degree maps follow the
    reference's min(k_e, order) with order halving to 1
    (solversetup.hh:71-108), every level a sharded hp operator with
    Chebyshev(cheb_degree) smoothing on the block-Jacobi-preconditioned
    operator, and a sharded block-Jacobi-PCG coarse solve.

    ``gmesh``: a GENERAL box mesh (incl. hanging nodes) to use instead
    of ``hmesh.structured(cells)`` — every level then goes through
    ``build_hp_sharded_general`` with ONE shared cut-plane partition so
    the element-local p-transfers need no communication.

    Chebyshev (matvecs only, no extra communication) rather than damped
    Jacobi: the level operators are RE-ASSEMBLED (matrix-free), not
    Galerkin products, and with that hierarchy a V-cycle needs a strong
    smoother — plain damped Jacobi demonstrably diverges here, while the
    same cycle with Galerkin coarse matrices would tolerate it."""
    degrees = np.asarray(degrees, dtype=_I).reshape(-1)
    dmaps = [degrees]
    while dmaps[-1].max() > 1:
        order = max(1, int(dmaps[-1].max()) // 2)
        dmaps.append(np.minimum(degrees, order).astype(_I))
    dmaps = dmaps[::-1]  # coarsest..finest

    if gmesh is not None:
        devices_ = devices if devices is not None else jax.devices()
        shard = slab_partition(gmesh, len(devices_))
        probs = [build_hp_sharded_general(
            gmesh, d, devices=devices_, penalty=penalty,
            dirichlet=dirichlet, dtype=dtype,
            penalty_scaling=penalty_scaling, elem_shard=shard,
            diffusion=diffusion)
            for d in dmaps]
    else:
        probs = [build_hp_sharded(cells, d, devices=devices, penalty=penalty,
                                  dirichlet=dirichlet, dtype=dtype,
                                  penalty_scaling=penalty_scaling,
                                  device_grid=device_grid,
                                  diffusion=diffusion)
                 for d in dmaps]
    axis_name = probs[0].axis_name
    transfers = [_hp_transfer(probs[l + 1], probs[l], dmaps[l + 1], dmaps[l],
                              axis_name, dtype)
                 for l in range(len(probs) - 1)]

    # per-level rho(D^-1 A) by power iteration -> Chebyshev window
    from hpdg_tpu.solvers import smoothers as sm
    smooths = []
    for prob in probs:
        rho = _hp_rho_est(prob, dtype)
        smooths.append(sm.chebyshev_smoother(prob.apply, prob.dinv_mul,
                                             lmax=1.1 * rho,
                                             degree=cheb_degree))

    def safe_div(a, b):
        return jnp.where(jnp.abs(b) > 0, a / jnp.where(b == 0, 1.0, b), 0.0)

    def coarse_solve(b):
        prob = probs[0]
        x = jax.tree.map(jnp.zeros_like, b)
        r = b
        z = prob.dinv_mul(r)
        rz = hp_dot(r, z)

        def body(i, st):
            x, r, z, pv, rz = st
            Ap = prob.apply(pv)
            alpha = safe_div(rz, hp_dot(pv, Ap))
            x = hp_axpy(alpha, pv, x)
            r = hp_axpy(-alpha, Ap, r)
            z = prob.dinv_mul(r)
            rz_new = hp_dot(r, z)
            beta = safe_div(rz_new, rz)
            pv = hp_axpy(beta, pv, z)
            return x, r, z, pv, rz_new

        st = jax.lax.fori_loop(0, coarse_cg_iters, body, (x, r, z, z, rz))
        return st[0]

    nlev = len(probs)

    def run(l, x, b):
        if l == 0:
            return coarse_solve(b)
        prob = probs[l]
        x = smooths[l](x, b)
        r = {p: b[p] - v for p, v in prob.apply(x).items()}
        restrict, prolong = transfers[l - 1]
        rc = restrict(r)
        xc = run(l - 1, jax.tree.map(jnp.zeros_like, rc), rc)
        x = hp_axpy(1.0, prolong(xc), x)
        return smooths[l](x, b)

    def step(x, b):
        return run(nlev - 1, x, b)

    return HPShardedPMG(levels=probs, degree_maps=dmaps, step=step)


def hp_pmg_pcg_solve(pmg: HPShardedPMG, b: dict, iters: int = 30):
    """V-cycle-preconditioned CG on sharded bucket dicts, run as one
    compiled program (psum reductions over the device mesh).  CG wraps
    the cycle because the re-assembled hierarchy's contraction is
    smoother-limited — the Krylov acceleration roughly squares the
    effective rate and is unconditionally convergent for the SPD pair.

    Returns (x, rel_residual)."""
    fine = pmg.levels[-1]

    def safe_div(a, d):
        return jnp.where(jnp.abs(d) > 0, a / jnp.where(d == 0, 1.0, d), 0.0)

    @jax.jit
    def run(b):
        nb = hp_norm(b)
        x = jax.tree.map(jnp.zeros_like, b)
        r = b
        z = pmg.step(jax.tree.map(jnp.zeros_like, b), r)
        rz = hp_dot(r, z)

        def body(i, st):
            x, r, z, pv, rz = st
            Ap = fine.apply(pv)
            alpha = safe_div(rz, hp_dot(pv, Ap))
            x = hp_axpy(alpha, pv, x)
            r = hp_axpy(-alpha, Ap, r)
            z = pmg.step(jax.tree.map(jnp.zeros_like, r), r)
            rz_new = hp_dot(r, z)
            pv = hp_axpy(safe_div(rz_new, rz), pv, z)
            return x, r, z, pv, rz_new

        st = jax.lax.fori_loop(0, iters, body, (x, r, z, z, rz))
        x, r = st[0], st[1]
        return x, hp_norm(r) / nb

    return run(b)


# ---------------------------------------------------------------------------
# sharded h-levels (uniform-degree geometric coarsening below p = 1)
# ---------------------------------------------------------------------------

def _child_T_matrices(pc: int, pf: int, dim: int, halve, dtype):
    """Per-child-position prolongation blocks T_var[(bs_f, bs_c)]:
    degree-``pc`` parent basis evaluated at the child's degree-``pf``
    nodes mapped to parent coords
    (dgtodggridtransferassembler.hh:308-323 analog, generalized to
    MIXED degrees — the reference's h-transfers are DG-Q1-only,
    dgtodggridtransferassembler.hh:227-341; here coarse degree = max
    over children, so pf <= pc).  ``halve[a]`` says whether axis ``a``
    coarsens 2:1 (uniform coarsening halves all axes; SEMIcoarsening
    halves only the anisotropy axis).  Child position var enumerates the
    halving axes with the first halving axis as the HIGHEST bit
    (matching mesh element C-order, last axis fastest)."""
    from hpdg_tpu.basis import lagrange
    nodes_c = lagrange.nodes_1d(pc, "lobatto")
    nodes_f = lagrange.nodes_1d(pf, "lobatto")
    mi_c = tensor.multiindices(pc, dim)
    mi_f = tensor.multiindices(pf, dim)
    haxes = [a for a in range(dim) if halve[a]]
    out = []
    for var in range(2 ** len(haxes)):
        bits = np.zeros(dim)
        scale = np.ones(dim)
        for t, a in enumerate(haxes):
            bits[a] = (var >> (len(haxes) - 1 - t)) & 1
            scale[a] = 0.5
        xp = scale[None, :] * (bits[None, :] + nodes_f[mi_f])  # (bs_f, dim)
        per_axis = [lagrange.lagrange_values(nodes_c, xp[:, a])
                    for a in range(dim)]
        T = np.ones((len(mi_f), len(mi_c)))
        for a in range(dim):
            T = T * per_axis[a][mi_c[:, a], :].T
        out.append(jnp.asarray(T, dtype))
    return out


def _coarsen_degree_map(deg_f, cf, cc, rule: str = "max"):
    """Geometrically coarsened lattice degree map: per coarse element the
    max (or min) over its children's degrees."""
    dim = len(cf)
    deg_f = np.asarray(deg_f, dtype=_I).reshape(-1)
    ids = np.arange(int(np.prod(cf)))
    rem = ids
    coords = []
    for a in range(dim - 1, -1, -1):
        coords.append(rem % cf[a])
        rem = rem // cf[a]
    coords = coords[::-1]
    pc = np.zeros_like(ids)
    for a in range(dim):
        pc = pc * cc[a] + coords[a] // (cf[a] // cc[a])
    if rule == "max":
        out = np.zeros(int(np.prod(cc)), _I)
        np.maximum.at(out, pc, deg_f)
    else:
        out = np.full(int(np.prod(cc)), 127, _I)
        np.minimum.at(out, pc, deg_f)
    return out


def _hp_h_transfer(probf: HPSharded, probc: HPSharded, degf, degc,
                   axis_name: str, dtype):
    """Sharded geometric (h) transfer between a fine mesh and a 2:1
    coarsening of SOME subset of axes (uniform coarsening or
    semicoarsening).  Handles per-element MIXED degrees on either side
    (classes keyed (pc, pf, child-position); exact + adjoint — beyond
    the reference, whose h-transfers are DG-Q1-only,
    dgtodggridtransferassembler.hh:227-341), though the production
    hierarchies keep h-pairs at uniform equal degrees for V-cycle
    stability (see build_hp_sharded_hmg).  The slab partition is
    aligned (both cells[0] divisible by ndev), so every coarse element
    and all its children live on the SAME shard: the transfer is
    element-local GEMM work per class, no communication — the design
    choice that replaces the reference's per-level communicator
    rebuilds (parmgsetup.hh:201-211)."""
    dim = len(probf.cells)
    ndev = probf.ndev
    cf = probf.cells
    cc = probc.cells
    halve = tuple(cf[a] // cc[a] == 2 for a in range(dim))
    if any(cf[a] // cc[a] not in (1, 2) or cf[a] % cc[a] for a in range(dim)):
        raise ValueError(f"unsupported coarsening {cf} -> {cc}")
    haxes = [a for a in range(dim) if halve[a]]
    nc = 2 ** len(haxes)
    degf = np.asarray(degf, dtype=_I).reshape(-1)
    degc = np.asarray(degc, dtype=_I).reshape(-1)

    # classes keyed (pc, pf, var): per shard, (coarse slot, fine slot)
    classes = {}
    for s in range(ndev):
        slot_f = {pp: {int(e): k for k, e in
                       enumerate(probf.owned_slots[(s, pp)])}
                  for pp in probf.degree_set}
        for pc in probc.degree_set:
            for k, ec in enumerate(probc.owned_slots[(s, pc)]):
                rem = int(ec)
                coords = []
                for a in range(dim - 1, -1, -1):
                    coords.append(rem % cc[a])
                    rem //= cc[a]
                coords = coords[::-1]
                for var in range(nc):
                    fco = list(coords)
                    for t, a in enumerate(haxes):
                        fco[a] = (2 * coords[a]
                                  + ((var >> (len(haxes) - 1 - t)) & 1))
                    ef = 0
                    for a in range(dim):
                        ef = ef * cf[a] + fco[a]
                    pf = int(degf[ef])
                    if ef not in slot_f[pf]:
                        raise ValueError("partition misaligned: child and "
                                         "parent on different shards")
                    per = classes.setdefault(
                        (pc, pf, var), [([], []) for _ in range(ndev)])
                    per[s][0].append(k)
                    per[s][1].append(slot_f[pf][ef])

    KEYS = sorted(classes)
    Ts = {}
    tcache = {}
    fidx, cidx = {}, {}
    for key in KEYS:
        pc, pf, var = key
        if (pc, pf) not in tcache:
            tcache[(pc, pf)] = _child_T_matrices(pc, pf, dim, halve, dtype)
        Ts[key] = tcache[(pc, pf)][var]
        per = classes[key]
        C = max(max(len(cs) for cs, fs in per), 1)
        ci = np.full((ndev, C), probc.m_own[pc], _I)   # pad -> dump row
        fi = np.full((ndev, C), probf.m_own[pf], _I)
        for s, (cs, fs) in enumerate(per):
            ci[s, :len(cs)] = cs
            fi[s, :len(fs)] = fs
        cidx[key], fidx[key] = ci, fi

    mesh = probf.device_mesh
    dim0 = tuple(probf.axes)
    DEGF, DEGC = probf.degree_set, probc.degree_set
    fspec = {p: P(dim0, None) for p in DEGF}
    cspec = {p: P(dim0, None) for p in DEGC}
    tdata = {"fi": fidx, "ci": cidx}
    dspec = jax.tree.map(lambda _: P(dim0), tdata)
    tdev = jax.tree.map(lambda a: jax.device_put(
        jnp.asarray(a), NamedSharding(mesh, P(dim0, None))), tdata)

    def restrict_body(d, rf):
        d = jax.tree.map(lambda a: a[0], d)
        rc = {pc: jnp.zeros((probc.m_own[pc] + 1, (pc + 1) ** dim), dtype)
              for pc in DEGC}
        for key in KEYS:
            pc, pf, var = key
            Mf = probf.m_own[pf]
            vals = rf[pf][jnp.clip(d["fi"][key], 0, Mf - 1)] @ Ts[key]
            mask = (d["fi"][key] < Mf).astype(dtype)[:, None]
            rc[pc] = rc[pc].at[d["ci"][key]].add(vals * mask)
        return {pc: rc[pc][:probc.m_own[pc]] for pc in DEGC}

    def prolong_body(d, xc):
        d = jax.tree.map(lambda a: a[0], d)
        xf = {pf: jnp.zeros((probf.m_own[pf] + 1, (pf + 1) ** dim), dtype)
              for pf in DEGF}
        for key in KEYS:
            pc, pf, var = key
            Mc = probc.m_own[pc]
            vals = xc[pc][jnp.clip(d["ci"][key], 0, Mc - 1)] @ Ts[key].T
            xf[pf] = xf[pf].at[d["fi"][key]].set(vals)
        return {pf: xf[pf][:probf.m_own[pf]] for pf in DEGF}

    rshard = jax.shard_map(restrict_body, mesh=mesh,
                           in_specs=(dspec, fspec), out_specs=cspec)
    pshard = jax.shard_map(prolong_body, mesh=mesh,
                           in_specs=(dspec, cspec), out_specs=fspec)
    return (lambda rf: rshard(tdev, rf)), (lambda xc: pshard(tdev, xc))


def build_hp_sharded_hmg(cells, degrees, h_levels: int = 1, devices=None,
                         penalty: float = 2.0, dirichlet: bool = True,
                         dtype=jnp.float64, penalty_scaling: str = "measure",
                         cheb_degree: int = 5, cells_chain=None,
                         h_first: bool = False, device_grid=None,
                         h_first_rule: str = "uniform",
                         coarse_cg_iters: int = 60,
                         smoother: str = "cheb",
                         line_axis: int | None = None) -> HPShardedPMG:
    """Full sharded hp-multigrid: p-levels (min(k_e, order), halving) on
    the fine mesh, then ``h_levels`` geometric 2x coarsenings at p = 1 —
    the sharded analog of the reference's full hierarchy
    (parmgsetup.hh:97-150), with comm attached to every level via the
    operators' own halo exchanges.

    ``cells_chain``: optional explicit coarse-to-fine list of cells
    tuples (last entry == cells) overriding the uniform halving — e.g. a
    SEMIcoarsening chain [(2,2,2), (4,2,2), (8,2,2)] for anisotropic
    meshes.  ``h_first=True`` puts the h-levels at the TOP of the
    hierarchy and the p-levels below on the coarsest mesh — the
    anisotropy-robust ordering (p-coarsening on stretched elements is a
    ~0.6-rate level pair even with an exact coarse solve; semicoarsening
    at full p contracts at ~0.13).  Mixed degree maps are supported:
    p-levels on the fine mesh reduce to the first uniform order, the
    h-chain runs at that uniform degree, and p-levels continue to 1 on
    the coarsest mesh (see the in-line rationale for why geometric
    degree coarsening is not used)."""
    degrees = np.asarray(degrees, dtype=_I).reshape(-1)
    devices = devices if devices is not None else jax.devices()
    dim = len(cells)
    if smoother == "line" and device_grid is None and len(devices) > 1:
        # Keep the lines WHOLE: partition along an axis orthogonal to
        # the (short-extent) line axis so every per-shard block-Thomas
        # solve sees full lines.  Cut lines degrade gracefully toward
        # block-Jacobi at the cuts but cost real rate: measured 0.121
        # (whole) vs 0.360 (default slab cutting the lines) on the
        # mixed-degree 4:1-anisotropic config.
        lax_ = line_axis if line_axis is not None else int(np.argmax(cells))
        if cells_chain is not None:
            chain_cells = [tuple(c) for c in cells_chain]
        else:
            chain_cells = [tuple(c // 2 ** l for c in cells)
                           for l in range(h_levels + 1)]
        nd = len(devices)
        cand = [a for a in range(dim) if a != lax_
                and all(c[a] % nd == 0 for c in chain_cells)]
        if cand:
            a = max(cand, key=lambda a: cells[a])
            device_grid = tuple(nd if i == a else 1 for i in range(a + 1))
    dgrid = tuple(device_grid) if device_grid is not None \
        else (len(devices),)

    # p-level degree maps
    dmaps = [degrees]
    while dmaps[-1].max() > 1:
        order = max(1, int(dmaps[-1].max()) // 2)
        dmaps.append(np.minimum(degrees, order).astype(_I))
    # h-level cells chain (fine first here)
    if cells_chain is not None:
        hcells = [tuple(c) for c in reversed(list(cells_chain))]
        assert hcells[0] == tuple(cells), "cells_chain must end with cells"
    else:
        hcells = [tuple(cells)]
        for _ in range(h_levels):
            nxt = tuple(c // 2 for c in hcells[-1])
            bad = any(c % 2 for c in hcells[-1]) or any(
                nxt[a] % dgrid[a] for a in range(len(dgrid)))
            if bad:
                raise ValueError(f"cannot h-coarsen {hcells[-1]} over "
                                 f"device grid {dgrid} (need even cells + "
                                 "divisible partitions)")
            hcells.append(nxt)
    kw = dict(devices=devices, penalty=penalty, dirichlet=dirichlet,
              dtype=dtype, penalty_scaling=penalty_scaling,
              device_grid=device_grid)
    probs = []
    transfers = []
    if h_first and h_first_rule == "geometric-max" \
            and len(np.unique(degrees)) > 1:
        # Geometric degree coarsening (r2-verdict item 6's suggestion):
        # every h-level carries the coarsened map with coarse degree =
        # max over children; the h-transfers interpolate between the
        # per-element degrees (exact + adjoint).  Needs the robust
        # Chebyshev window (_hp_rho_est) — with an underestimated lmax
        # this ordering diverges violently.
        deg_chain = [degrees]
        for i in range(len(hcells) - 1):
            deg_chain.append(_coarsen_degree_map(
                deg_chain[-1], hcells[i], hcells[i + 1]))
        dc = deg_chain[-1]
        dmaps_c = [dc]
        while dmaps_c[-1].max() > 1:
            order = max(1, int(dmaps_c[-1].max()) // 2)
            dmaps_c.append(np.minimum(dc, order).astype(_I))
        ccoarse = hcells[-1]
        for dm in reversed(dmaps_c[1:]):
            probs.append(build_hp_sharded(ccoarse, dm, **kw))
        for i in range(len(hcells) - 1, -1, -1):
            probs.append(build_hp_sharded(hcells[i], deg_chain[i], **kw))
        level_deg = ([dm for dm in reversed(dmaps_c[1:])]
                     + [deg_chain[i]
                        for i in range(len(hcells) - 1, -1, -1)])
    elif h_first:
        # Mixed-degree-stable ordering (coarsest..finest): p-levels to 1
        # on the COARSEST mesh, semicoarsening h-levels at the chain's
        # first UNIFORM order o* (the largest halving order <= min k_e),
        # then standard p-levels min(k_e, order) back up to the full
        # degree map on the FINE mesh (solversetup.hh:71-108 semantics).
        #
        # Why not geometric degree coarsening (coarse degree = max or
        # min over children, the r2-verdict suggestion)?  Measured: both
        # rules DIVERGE (3e4x/cycle at degrees {2,4}, 8x2x2 semicoarsen)
        # even though the transfers are exact and adjoint to 1e-14 —
        # with a REdiscretized coarse operator, degree-lossy
        # prolongation aliases high coarse modes into low fine modes
        # (max rule), and penalty coefficients sigma*max(p)^2/h mismatch
        # across the pair (both rules), pushing the coarse-correction
        # spectrum past 2.  Keeping every h-pair at a uniform equal
        # degree and every p-pair nested (min(k_e, order)) keeps each
        # level pair a standard stable pairing.
        orders = [int(degrees.max())]
        while orders[-1] > 1:
            orders.append(max(1, orders[-1] // 2))
        dmin = int(degrees.min())
        ostar = next(o for o in orders if o <= dmin)
        ccoarse = hcells[-1]
        ncc = int(np.prod(ccoarse))
        coarse_orders = [o for o in orders if o < ostar]   # descending
        for o in reversed(coarse_orders):                  # 1 .. ostar//2
            probs.append(build_hp_sharded(ccoarse, np.full(ncc, o, _I),
                                          **kw))
        for cl in reversed(hcells):                        # coarse..fine
            probs.append(build_hp_sharded(
                cl, np.full(int(np.prod(cl)), ostar, _I), **kw))
        fine_maps = [np.minimum(degrees, o).astype(_I)
                     for o in orders if o > ostar]         # descending
        for dm in reversed(fine_maps):                     # ascending
            probs.append(build_hp_sharded(cells, dm, **kw))
        level_deg = ([np.full(ncc, o, _I) for o in reversed(coarse_orders)]
                     + [np.full(int(np.prod(cl)), ostar, _I)
                        for cl in reversed(hcells)]
                     + [dm for dm in reversed(fine_maps)])
    else:
        # coarsest..finest: h-levels (at p=1) below the p-levels
        for cl in reversed(hcells[1:]):
            probs.append(build_hp_sharded(
                cl, np.ones(int(np.prod(cl)), _I), **kw))
        for dm in reversed(dmaps):
            probs.append(build_hp_sharded(cells, dm, **kw))
        level_deg = ([np.ones(int(np.prod(cl)), _I)
                      for cl in reversed(hcells[1:])]
                     + [dm for dm in reversed(dmaps)])
    for i in range(len(probs) - 1):
        if probs[i].cells != probs[i + 1].cells:
            transfers.append(_hp_h_transfer(probs[i + 1], probs[i],
                                            level_deg[i + 1], level_deg[i],
                                            probs[0].axis_name, dtype))
        else:
            transfers.append(_hp_transfer(probs[i + 1], probs[i],
                                          level_deg[i + 1], level_deg[i],
                                          probs[0].axis_name, dtype))

    from hpdg_tpu.solvers import smoothers as sm
    smooths = []
    for prob, dm in zip(probs, level_deg):
        if smoother == "line":
            # Chebyshev over the LINE-block-tridiagonal preconditioner:
            # exact per-shard block-Thomas solves along the strong
            # (short-extent) axis — the anisotropy-robust smoother class
            # element-block Chebyshev cannot reach (two-grid plateau at
            # ~0.55 on 1:4-stretched p=4 cells, ROADMAP item 13).
            from hpdg_tpu.parallel.lines import hp_line_precond
            M = hp_line_precond(prob, dm, axis=line_axis, penalty=penalty,
                                dirichlet=dirichlet,
                                penalty_scaling=penalty_scaling,
                                dtype=dtype)
            rho = _hp_rho_est(prob, dtype, precond=M)
            smooths.append(sm.chebyshev_smoother(prob.apply, M,
                                                 lmax=1.1 * rho,
                                                 degree=cheb_degree))
        else:
            rho = _hp_rho_est(prob, dtype)
            smooths.append(sm.chebyshev_smoother(prob.apply, prob.dinv_mul,
                                                 lmax=1.1 * rho,
                                                 degree=cheb_degree))

    def safe_div(a, d):
        return jnp.where(jnp.abs(d) > 0, a / jnp.where(d == 0, 1.0, d), 0.0)

    def coarse_solve(b):
        prob = probs[0]
        x = jax.tree.map(jnp.zeros_like, b)
        r = b
        z = prob.dinv_mul(r)
        rz = hp_dot(r, z)

        def body(i, st):
            x, r, z, pv, rz = st
            Ap = prob.apply(pv)
            alpha = safe_div(rz, hp_dot(pv, Ap))
            x = hp_axpy(alpha, pv, x)
            r = hp_axpy(-alpha, Ap, r)
            z = prob.dinv_mul(r)
            rz_new = hp_dot(r, z)
            beta = safe_div(rz_new, rz)
            pv = hp_axpy(beta, pv, z)
            return x, r, z, pv, rz_new

        st = jax.lax.fori_loop(0, coarse_cg_iters, body, (x, r, z, z, rz))
        return st[0]

    nlev = len(probs)

    def run(l, x, b):
        if l == 0:
            return coarse_solve(b)
        x = smooths[l](x, b)
        r = {p: b[p] - v for p, v in probs[l].apply(x).items()}
        restrict, prolong = transfers[l - 1]
        rc = restrict(r)
        xc = run(l - 1, jax.tree.map(jnp.zeros_like, rc), rc)
        x = hp_axpy(1.0, prolong(xc), x)
        return smooths[l](x, b)

    def step(x, b):
        return run(nlev - 1, x, b)

    return HPShardedPMG(levels=probs, degree_maps=level_deg, step=step)


# ---------------------------------------------------------------------------
# sharded h-levels on GENERAL adaptive meshes (refinement-history chain)
# ---------------------------------------------------------------------------

def _geo_T(p: int, dim: int, scale, shift, family, dtype):
    """Parent-basis-at-child-nodes transfer block for the affine embed
    x_parent = shift + scale * x_child: (bs_child, bs_parent)."""
    from hpdg_tpu.basis import lagrange
    nodes = lagrange.nodes_1d(p, family)
    mi = tensor.multiindices(p, dim)
    xp = np.asarray(shift)[None, :] + nodes[mi] * np.asarray(scale)[None, :]
    T = np.ones((len(mi), len(mi)))
    for a in range(dim):
        va = lagrange.lagrange_values(nodes, xp[:, a])  # (p+1, bs)
        T = T * va[mi[:, a], :].T
    return jnp.asarray(T, dtype)


def _hp_h_transfer_general(probf: HPSharded, probc: HPSharded,
                           fine_mesh, coarse_mesh, p: int, dtype):
    """Sharded geometric transfer between an adaptively refined mesh and
    its PARENT mesh (refinement-history h-level), uniform degree p.

    The partition is induced from the coarse mesh (children live on
    their parent's shard), so the transfer is element-local: per fine
    element one dense (bs, bs) block selected by its affine embedding
    class (identity for kept elements, one of 2^dim child maps
    otherwise) — assembleDGGridTransferHierarchy semantics
    (dgtodggridtransferassembler.hh:308-340) on the device mesh."""
    dim = probf.ndim
    ndev = probf.ndev
    anc = fine_mesh.parent
    scale = fine_mesh.extent / coarse_mesh.extent[anc]
    shift = (fine_mesh.lower - coarse_mesh.lower[anc]) \
        / coarse_mesh.extent[anc]
    q = np.rint(np.concatenate([scale, shift], axis=1) * 2**20).astype(
        np.int64)
    uniq, cls = np.unique(q, axis=0, return_inverse=True)
    Ts = [_geo_T(p, dim, uniq[c, :dim] / 2**20, uniq[c, dim:] / 2**20,
                 "lobatto", dtype)
          for c in range(len(uniq))]

    Mf, Mc = probf.m_own[p], probc.m_own[p]
    fidx = {c: np.full((ndev, 1), Mf, _I) for c in range(len(uniq))}
    cidx = {c: np.full((ndev, 1), Mc, _I) for c in range(len(uniq))}
    counts = {c: [0] * ndev for c in range(len(uniq))}
    per = {(s, c): ([], []) for s in range(ndev) for c in range(len(uniq))}
    for s in range(ndev):
        own_f = probf.owned_slots[(s, p)]   # global fine ids, slot order
        slot_c = {int(e): k for k, e in
                  enumerate(probc.owned_slots[(s, p)])}
        for k, ef in enumerate(own_f):
            c = int(cls[ef])
            ec = int(anc[ef])
            if ec not in slot_c:
                raise ValueError("induced partition misaligned: child and "
                                 "parent on different shards")
            per[(s, c)][0].append(k)
            per[(s, c)][1].append(slot_c[ec])
            counts[c][s] += 1
    for c in range(len(uniq)):
        C = max(max(counts[c]), 1)
        fidx[c] = np.full((ndev, C), Mf, _I)
        cidx[c] = np.full((ndev, C), Mc, _I)
        for s in range(ndev):
            fs, cs = per[(s, c)]
            fidx[c][s, :len(fs)] = fs
            cidx[c][s, :len(cs)] = cs

    mesh = probf.device_mesh
    dim0 = tuple(probf.axes)
    tdata = {"fi": fidx, "ci": cidx}
    dspec = jax.tree.map(lambda _: P(dim0), tdata)
    tdev = jax.tree.map(lambda a: jax.device_put(
        jnp.asarray(a), NamedSharding(mesh, P(dim0, None))), tdata)
    fspec = {p: P(dim0, None)}
    cspec = {p: P(dim0, None)}

    def restrict_body(d, rf):
        d = jax.tree.map(lambda a: a[0], d)
        rc = jnp.zeros((Mc + 1, (p + 1) ** dim), dtype)
        for c in range(len(uniq)):
            vals = rf[p][jnp.clip(d["fi"][c], 0, Mf - 1)] @ Ts[c]
            mask = (d["fi"][c] < Mf).astype(dtype)[:, None]
            rc = rc.at[d["ci"][c]].add(vals * mask)
        return {p: rc[:Mc]}

    def prolong_body(d, xc):
        d = jax.tree.map(lambda a: a[0], d)
        xf = jnp.zeros((Mf + 1, (p + 1) ** dim), dtype)
        for c in range(len(uniq)):
            vals = xc[p][jnp.clip(d["ci"][c], 0, Mc - 1)] @ Ts[c].T
            xf = xf.at[d["fi"][c]].set(vals)
        return {p: xf[:Mf]}

    rshard = jax.shard_map(restrict_body, mesh=mesh,
                           in_specs=(dspec, fspec), out_specs=cspec)
    pshard = jax.shard_map(prolong_body, mesh=mesh,
                           in_specs=(dspec, cspec), out_specs=fspec)
    return (lambda rf: rshard(tdev, rf)), (lambda xc: pshard(tdev, xc))


def build_hp_sharded_hmg_general(gmesh, degrees, devices=None,
                                 h_levels: int | None = None,
                                 penalty: float = 2.0,
                                 dirichlet: bool = True, dtype=jnp.float64,
                                 penalty_scaling: str = "measure",
                                 cheb_degree: int = 5, diffusion=None,
                                 coarse_cg_iters: int = 60) -> HPShardedPMG:
    """Full sharded hp-multigrid on an ADAPTIVELY refined mesh: p-levels
    (min(k_e, order), halving) on the fine mesh, then geometric h-levels
    following the refinement-history chain (parent meshes) at p = 1.
    The partition is computed on the COARSEST mesh and induced on every
    finer one (children stay on their parent's shard — no communication
    in the h-transfers), the sharded analog of attaching comms to every
    level of an adaptively refined distributed grid
    (parmgsetup.hh:97-150 + 201-211)."""
    degrees = np.asarray(degrees, dtype=_I).reshape(-1)
    devices = devices if devices is not None else jax.devices()
    ndev = len(devices)

    # mesh chain fine -> coarse along parent links
    chain = [gmesh]
    while chain[-1].parent_mesh is not None and (
            h_levels is None or len(chain) <= h_levels):
        chain.append(chain[-1].parent_mesh)
    # coarse partition, induced upward
    shard_chain = [None] * len(chain)
    shard_chain[-1] = slab_partition(chain[-1], ndev)
    for li in range(len(chain) - 2, -1, -1):
        shard_chain[li] = shard_chain[li + 1][chain[li].parent]

    # p-level degree maps on the fine mesh
    dmaps = [degrees]
    while dmaps[-1].max() > 1:
        order = max(1, int(dmaps[-1].max()) // 2)
        dmaps.append(np.minimum(degrees, order).astype(_I))

    kw = dict(devices=devices, penalty=penalty, dirichlet=dirichlet,
              dtype=dtype, penalty_scaling=penalty_scaling,
              diffusion=diffusion)
    probs = []
    # coarsest..finest: h-levels (p=1) on parent meshes, then p-levels
    for li in range(len(chain) - 1, 0, -1):
        probs.append(build_hp_sharded_general(
            chain[li], np.ones(chain[li].n_elements, _I),
            elem_shard=shard_chain[li], **kw))
    for dm in reversed(dmaps):
        probs.append(build_hp_sharded_general(
            gmesh, dm, elem_shard=shard_chain[0], **kw))
    level_deg = ([np.ones(chain[li].n_elements, _I)
                  for li in range(len(chain) - 1, 0, -1)]
                 + [dm for dm in reversed(dmaps)])

    transfers = []
    nh = len(chain) - 1
    for i in range(len(probs) - 1):
        if i < nh:  # h-pair: probs[i] on chain[nh-i], probs[i+1] finer
            lf = nh - i - 1
            transfers.append(_hp_h_transfer_general(
                probs[i + 1], probs[i], chain[lf], chain[lf + 1], 1, dtype))
        else:
            transfers.append(_hp_transfer(probs[i + 1], probs[i],
                                          level_deg[i + 1], level_deg[i],
                                          probs[0].axes[0], dtype))

    from hpdg_tpu.solvers import smoothers as sm
    smooths = []
    for prob in probs:
        rho = _hp_rho_est(prob, dtype)
        smooths.append(sm.chebyshev_smoother(prob.apply, prob.dinv_mul,
                                             lmax=1.1 * rho,
                                             degree=cheb_degree))

    def safe_div(a, d):
        return jnp.where(jnp.abs(d) > 0, a / jnp.where(d == 0, 1.0, d), 0.0)

    def coarse_solve(b):
        prob = probs[0]
        x = jax.tree.map(jnp.zeros_like, b)
        r = b
        z = prob.dinv_mul(r)
        rz = hp_dot(r, z)

        def body(i, st):
            x, r, z, pv, rz = st
            Ap = prob.apply(pv)
            alpha = safe_div(rz, hp_dot(pv, Ap))
            x = hp_axpy(alpha, pv, x)
            r = hp_axpy(-alpha, Ap, r)
            z = prob.dinv_mul(r)
            rz_new = hp_dot(r, z)
            pv = hp_axpy(safe_div(rz_new, rz), pv, z)
            return x, r, z, pv, rz_new

        st = jax.lax.fori_loop(0, coarse_cg_iters, body, (x, r, z, z, rz))
        return st[0]

    nlev = len(probs)

    def run(l, x, b):
        if l == 0:
            return coarse_solve(b)
        x = smooths[l](x, b)
        r = {p: b[p] - v for p, v in probs[l].apply(x).items()}
        restrict, prolong = transfers[l - 1]
        rc = restrict(r)
        xc = run(l - 1, jax.tree.map(jnp.zeros_like, rc), rc)
        x = hp_axpy(1.0, prolong(xc), x)
        return smooths[l](x, b)

    def step(x, b):
        return run(nlev - 1, x, b)

    return HPShardedPMG(levels=probs, degree_maps=level_deg, step=step)
