"""Sharded matrix-free linear elasticity (vector-valued SIPG).

Multi-chip elasticity rounds out the parallel layer (BASELINE config 4
on the device mesh): slab decomposition along axis 0, uniform degree.

Design — reuse the SERIAL operator wholesale instead of re-deriving the
traction face terms:

* every shard applies the serial ``elasticity_operator`` on an EXTENDED
  template mesh ``[ghostL | own | ghostR]`` (geometry is translation
  invariant, so ONE template serves all shards) and keeps the owned
  rows; ghost coefficients arrive by ``ppermute`` halo exchange;
* shards without a neighbor receive ZEROS in the ghost slot.  An
  interface face against a zero ghost already produces the penalty term
  and HALF the consistency terms of the Dirichlet boundary face (the
  average {sigma(u)n} halves them); the masked correction adds the
  missing half via a consistency-only boundary operator
  (``elasticity_operator(include_bulk=False, penalty=0)`` on a
  one-layer mesh) — so one compiled SPMD program serves interior and
  edge shards alike.

Correctness contract: equals the serial global elasticity operator at
1e-11 (test_parallel_hp.py::test_sharded_elasticity_matches_serial).

General geometry (``gmesh=`` with first-class affine or trilinear maps):
the template trick no longer applies — instead the per-shard geometry
tables of the serial operator (H/R/penalty arrays, see
``matrixfree.elasticity.elasticity_geom_tables``) are stacked over the
device axis and fed through ``shard_map``, so ONE compiled SPMD program
serves shards with different physical geometry; edge shards' missing
ghost layers get Q1-extrapolated ("mirror") corners whose Jacobian at
the shared face equals the owned element's, and the masked boundary
corrections carry an exact per-face penalty-difference term, making the
apply equal to the serial curved operator at 1e-11 for both penalty
conventions.  Reference analog: elasticity assembled through generic
fufem machinery on arbitrary DUNE grids + communicationhpdg.hh's
parallel layer.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hpdg_tpu import mesh as hmesh
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.assemble.plan import build_plan
from hpdg_tpu.matrixfree.elasticity import (elasticity_operator,
                                            elasticity_geom_tables)


@dataclass
class ShardedElasticity:
    cells: tuple
    p: int
    ndev: int
    axis_name: str
    device_mesh: Mesh
    layer: int
    n_local: int
    bs: int                      # dim * (p+1)^dim
    apply: callable              # [N, bs] -> [N, bs] (sharded)
    sharding: NamedSharding
    # general-geometry extras (None for the translation-invariant path):
    # per-shard extended bases, for per-shard preconditioner blocks
    shard_ebases: list | None = None

    @property
    def n_global(self) -> int:
        return self.n_local * self.ndev


def build_sharded_elasticity(cells, p: int, mu: float = 1.0,
                             lam: float = 1.0, devices=None,
                             penalty: float = 8.0, dirichlet: bool = True,
                             axis_name: str = "x", dtype=jnp.float64,
                             penalty_scaling: str = "measure",
                             gmesh=None) -> ShardedElasticity:
    """``gmesh``: optional global mesh over the ``cells`` lattice
    (C element order, axis 0 slowest) carrying first-class geometry —
    curved-domain elasticity then shards via per-device geometry tables
    instead of the translation-invariant template."""
    from hpdg_tpu.mesh import geometry as geo
    if gmesh is not None and geo.has_geometry(gmesh):
        return _build_sharded_elasticity_geom(
            gmesh, cells, p, mu=mu, lam=lam, devices=devices,
            penalty=penalty, dirichlet=dirichlet, axis_name=axis_name,
            dtype=dtype, penalty_scaling=penalty_scaling)
    cells = tuple(int(c) for c in cells)
    dim = len(cells)
    devices = devices if devices is not None else jax.devices()
    ndev = len(devices)
    if cells[0] % ndev != 0:
        raise ValueError(f"cells[0]={cells[0]} not divisible by {ndev}")
    loc0 = cells[0] // ndev
    h = 1.0 / np.asarray(cells)
    layer = int(np.prod(cells[1:]))
    n_local = loc0 * layer
    bs = dim * (p + 1) ** dim

    # extended template mesh: [ghost layer | own | ghost layer]; y/z span
    # the full domain so the y/z Dirichlet faces are real on every shard
    ecells = (loc0 + 2,) + cells[1:]
    upper = (float((loc0 + 2) * h[0]),) + tuple(1.0 for _ in cells[1:])
    emesh = hmesh.structured(ecells, upper=upper)
    ebasis = DGBasis(emesh, np.full(emesh.n_elements, p))
    eplan = build_plan(ebasis)
    # drop the template's x-boundary groups: those faces belong to the
    # ghost far ends, whose output rows are discarded anyway
    eplan = replace(eplan, boundary_groups=tuple(
        bg for bg in eplan.boundary_groups if bg.axis != 0))
    op_ext = elasticity_operator(ebasis, mu=mu, lam=lam, penalty=penalty,
                                 dirichlet=dirichlet, plan=eplan,
                                 dtype=dtype,
                                 penalty_scaling=penalty_scaling)

    # edge-shard corrections on one-layer meshes.  A phantom interface
    # against a ZERO ghost contributes (full penalty + HALF consistency)
    # boundary-like terms.  Dirichlet boundaries need full consistency:
    # add 0.5 * consistency.  Natural (dirichlet=False) boundaries need
    # NOTHING: subtract the whole phantom contribution
    # (= full-boundary-op - 0.5 * consistency-only).
    def corr_op(side, pen):
        lmesh = hmesh.structured((1,) + cells[1:],
                                 upper=(float(h[0]),)
                                 + tuple(1.0 for _ in cells[1:]))
        lb = DGBasis(lmesh, np.full(layer, p))
        lp = build_plan(lb)
        lp = replace(lp, face_groups=(), boundary_groups=tuple(
            bg for bg in lp.boundary_groups
            if bg.axis == 0 and bg.side == side))
        return elasticity_operator(lb, mu=mu, lam=lam, penalty=pen,
                                   dirichlet=True, plan=lp, dtype=dtype,
                                   penalty_scaling=penalty_scaling,
                                   include_bulk=False)

    cons_lo, cons_hi = corr_op(0, 0.0), corr_op(1, 0.0)
    if not dirichlet:
        full_lo, full_hi = corr_op(0, penalty), corr_op(1, penalty)

    right_perm = [(i, i + 1) for i in range(ndev - 1)]
    left_perm = [(i + 1, i) for i in range(ndev - 1)]

    def local_apply(x):
        """x: [n_local, bs] shard-local block; SPMD body."""
        idx = jax.lax.axis_index(axis_name)
        nsh = jax.lax.axis_size(axis_name)
        has_left = (idx > 0).astype(x.dtype)
        has_right = (idx < nsh - 1).astype(x.dtype)
        # halo: edge shards receive ppermute zeros (no source) — exactly
        # the zero-ghost convention the correction relies on
        xl = jax.lax.ppermute(x[-layer:], axis_name, right_perm)
        xr = jax.lax.ppermute(x[:layer], axis_name, left_perm)
        xe = jnp.concatenate([xl, x, xr], axis=0)
        y = op_ext({p: xe})[p][layer:-layer]
        clo = cons_lo({p: x[:layer]})[p]
        chi = cons_hi({p: x[-layer:]})[p]
        if dirichlet:
            add_lo, add_hi = 0.5 * clo, 0.5 * chi
        else:
            add_lo = 0.5 * clo - full_lo({p: x[:layer]})[p]
            add_hi = 0.5 * chi - full_hi({p: x[-layer:]})[p]
        y = y.at[:layer].add((1 - has_left) * add_lo)
        y = y.at[-layer:].add((1 - has_right) * add_hi)
        return y

    device_mesh = Mesh(np.array(devices), (axis_name,))
    sharding = NamedSharding(device_mesh, P(axis_name, None))
    apply_sharded = jax.jit(jax.shard_map(
        local_apply, mesh=device_mesh, in_specs=P(axis_name, None),
        out_specs=P(axis_name, None)))

    return ShardedElasticity(cells=cells, p=p, ndev=ndev,
                             axis_name=axis_name, device_mesh=device_mesh,
                             layer=layer, n_local=n_local, bs=bs,
                             apply=apply_sharded, sharding=sharding)


def _global_corners(gmesh) -> np.ndarray:
    """(n, 2^d, d) physical corners of every element — native for
    trilinear meshes; for affine meshes the Q1 interpolation of the
    affine corner images reproduces the affine map exactly."""
    from hpdg_tpu.mesh import geometry as geo
    if geo.is_trilinear(gmesh):
        return np.asarray(gmesh.corners, np.float64)
    B = geo._bits(gmesh.dim)
    X = gmesh.lower[:, None, :] + B[None] * gmesh.extent[:, None, :]
    return gmesh.shift[:, None, :] + np.einsum("eab,ekb->eka", gmesh.jac, X)


def _build_sharded_elasticity_geom(gmesh, cells, p: int, mu, lam, devices,
                                   penalty, dirichlet, axis_name, dtype,
                                   penalty_scaling) -> ShardedElasticity:
    """Curved-mesh sharded elasticity: one SPMD program, per-shard
    geometry tables stacked over the device axis (module docstring)."""
    from hpdg_tpu.mesh import geometry as geo
    cells = tuple(int(c) for c in cells)
    dim = len(cells)
    nc2 = 2 ** dim
    half = nc2 // 2  # corner index < half <=> low side along axis 0
    devices = devices if devices is not None else jax.devices()
    ndev = len(devices)
    if cells[0] % ndev != 0:
        raise ValueError(f"cells[0]={cells[0]} not divisible by {ndev}")
    if int(np.prod(cells)) != gmesh.n_elements:
        raise ValueError("gmesh does not match the cells lattice")
    loc0 = cells[0] // ndev
    h = 1.0 / np.asarray(cells)
    layer = int(np.prod(cells[1:]))
    n_local = loc0 * layer
    bs = dim * (p + 1) ** dim

    # global corners in x-major layer layout (C element order, axis 0
    # slowest): (cells[0], layer, 2^d, d)
    C = _global_corners(gmesh).reshape(cells[0], layer, nc2, dim)

    def mirror_low(F):
        """Ghost layer left of first-layer corners F: shared face
        coincides (ghost high half = F low half) and the low half is the
        Q1 extrapolation, so the ghost Jacobian on the shared face
        equals F's there (positive orientation — a sheared translation,
        not a reflection)."""
        G = np.empty_like(F)
        G[:, half:] = F[:, :half]
        G[:, :half] = 2.0 * F[:, :half] - F[:, half:]
        return G

    def mirror_high(L):
        G = np.empty_like(L)
        G[:, :half] = L[:, half:]
        G[:, half:] = 2.0 * L[:, half:] - L[:, :half]
        return G

    # parametric extended template (identical for every shard)
    ecells = (loc0 + 2,) + cells[1:]
    upper = (float((loc0 + 2) * h[0]),) + tuple(1.0 for _ in cells[1:])
    etmpl = hmesh.structured(ecells, upper=upper)
    degs_ext = np.full(etmpl.n_elements, p)
    eplan_full = build_plan(DGBasis(etmpl, degs_ext))
    # template x-boundary groups belong to the ghost far ends (rows
    # discarded); drop them from the operator plan
    eplan = replace(eplan_full, boundary_groups=tuple(
        bg for bg in eplan_full.boundary_groups if bg.axis != 0))

    # one-layer correction templates (low/high side of the shard)
    lcells = (1,) + cells[1:]
    ltmpl = hmesh.structured(lcells, upper=(float(h[0]),)
                             + tuple(1.0 for _ in cells[1:]))
    degs_lay = np.full(layer, p)
    lplan_full = build_plan(DGBasis(ltmpl, degs_lay))
    lplans = {}
    for side in (0, 1):
        lplans[side] = replace(
            lplan_full, face_groups=(), boundary_groups=tuple(
                bg for bg in lplan_full.boundary_groups
                if bg.axis == 0 and bg.side == side))

    # phantom interface faces in the extended plan: (axis-0 group face
    # index, layer position of the owned element) per shard edge
    phantom = {}
    for fg in eplan.face_groups:
        if fg.axis != 0:
            continue
        ein = etmpl.faces.inside[fg.face_ids]
        eout = etmpl.faces.outside[fg.face_ids]
        lo_mask = (ein < layer) | (eout < layer)
        hi0 = (loc0 + 1) * layer
        hi_mask = (ein >= hi0) | (eout >= hi0)
        own_lo = np.where(ein < layer, eout, ein) - layer
        own_hi = np.where(ein >= hi0, eout, ein) - loc0 * layer
        phantom[0] = (fg, np.nonzero(lo_mask)[0], own_lo[lo_mask])
        phantom[1] = (fg, np.nonzero(hi_mask)[0], own_hi[hi_mask])

    # ---- per-shard geometry tables ----
    np_dtype = np.float64 if jnp.asarray(0.0, dtype).dtype == jnp.float64 \
        else np.float32
    gts_ext, gts_lo, gts_hi, gts_full_lo, gts_full_hi = [], [], [], [], []
    shard_ebases = []
    for s in range(ndev):
        own = C[s * loc0:(s + 1) * loc0]
        gl = C[s * loc0 - 1] if s > 0 else mirror_low(C[0])
        gr = C[(s + 1) * loc0] if s < ndev - 1 else mirror_high(C[-1])
        ecorn = np.concatenate([gl[None], own, gr[None]]
                               ).reshape(-1, nc2, dim)
        emesh_s = replace(etmpl, corners=ecorn)
        ebasis_s = DGBasis(emesh_s, degs_ext)
        shard_ebases.append(ebasis_s)
        gts_ext.append(elasticity_geom_tables(
            ebasis_s, eplan, penalty=penalty, dirichlet=dirichlet,
            penalty_scaling=penalty_scaling))
        # corrections: one-layer meshes with the shard's true edge-layer
        # geometry; the penalty table carries the exact difference
        # between the true boundary coefficient and the phantom face's
        for side, lay in ((0, own[0]), (1, own[-1])):
            lmesh_s = replace(ltmpl, corners=lay)
            lb_s = DGBasis(lmesh_s, degs_lay)
            gt = elasticity_geom_tables(lb_s, lplans[side],
                                        penalty=penalty, dirichlet=True,
                                        penalty_scaling=penalty_scaling)
            fg, fidx, ownpos = phantom[side]
            pen_ph_all = geo.penalty_coef_mesh(emesh_s, fg, penalty, p,
                                               penalty_scaling)
            pen_ph = np.zeros(layer)
            pen_ph[ownpos] = pen_ph_all[fidx]
            (bgH, bgR, pen_bnd) = gt["bnd"][0]
            bg = lplans[side].boundary_groups[0]
            q = lmesh_s.bfaces.elem[bg.face_ids]
            delta = pen_bnd - pen_ph[q]
            # clo/chi are applied with weight 1/2: pen table 2*delta
            # yields the exact penalty correction (see module docstring)
            gt_cons = dict(gt, bnd=((bgH, bgR, 2.0 * delta),))
            (gts_lo if side == 0 else gts_hi).append(gt_cons)
            if not dirichlet:
                (gts_full_lo if side == 0 else gts_full_hi).append(gt)

    def stack(gts):
        return jax.tree.map(
            lambda *a: jnp.asarray(np.stack(a).astype(np_dtype)), *gts)

    GT = [stack(gts_ext), stack(gts_lo), stack(gts_hi)]
    if not dirichlet:
        GT += [stack(gts_full_lo), stack(gts_full_hi)]

    # ---- operators (traced once; geometry arrives as arguments) ----
    op_ext = elasticity_operator(shard_ebases[0], mu=mu, lam=lam,
                                 penalty=penalty, dirichlet=dirichlet,
                                 plan=eplan, dtype=dtype,
                                 penalty_scaling=penalty_scaling)
    corr_ops = {}
    for side in (0, 1):
        lmesh0 = replace(ltmpl, corners=C[0] if side == 0 else C[-1])
        lb0 = DGBasis(lmesh0, degs_lay)
        corr_ops[side] = elasticity_operator(
            lb0, mu=mu, lam=lam, penalty=penalty, dirichlet=True,
            plan=lplans[side], dtype=dtype, include_bulk=False,
            penalty_scaling=penalty_scaling)

    right_perm = [(i, i + 1) for i in range(ndev - 1)]
    left_perm = [(i + 1, i) for i in range(ndev - 1)]

    def local_apply(x, *gt):
        gt = [jax.tree.map(lambda a: a[0], g) for g in gt]
        idx = jax.lax.axis_index(axis_name)
        nsh = jax.lax.axis_size(axis_name)
        has_left = (idx > 0).astype(x.dtype)
        has_right = (idx < nsh - 1).astype(x.dtype)
        xl = jax.lax.ppermute(x[-layer:], axis_name, right_perm)
        xr = jax.lax.ppermute(x[:layer], axis_name, left_perm)
        xe = jnp.concatenate([xl, x, xr], axis=0)
        y = op_ext({p: xe}, gt[0])[p][layer:-layer]
        clo = corr_ops[0]({p: x[:layer]}, gt[1])[p]
        chi = corr_ops[1]({p: x[-layer:]}, gt[2])[p]
        if dirichlet:
            add_lo, add_hi = 0.5 * clo, 0.5 * chi
        else:
            add_lo = 0.5 * clo - corr_ops[0]({p: x[:layer]}, gt[3])[p]
            add_hi = 0.5 * chi - corr_ops[1]({p: x[-layer:]}, gt[4])[p]
        y = y.at[:layer].add((1 - has_left) * add_lo)
        y = y.at[-layer:].add((1 - has_right) * add_hi)
        return y

    device_mesh = Mesh(np.array(devices), (axis_name,))
    sharding = NamedSharding(device_mesh, P(axis_name, None))
    raw = jax.jit(jax.shard_map(
        local_apply, mesh=device_mesh,
        in_specs=(P(axis_name, None),) + (P(axis_name),) * len(GT),
        out_specs=P(axis_name, None)))
    GT = jax.device_put(GT, NamedSharding(device_mesh, P(axis_name)))
    apply_sharded = lambda x: raw(x, *GT)  # noqa: E731

    return ShardedElasticity(cells=cells, p=p, ndev=ndev,
                             axis_name=axis_name, device_mesh=device_mesh,
                             layer=layer, n_local=n_local, bs=bs,
                             apply=apply_sharded, sharding=sharding,
                             shard_ebases=shard_ebases)


def elasticity_pcg_solve(prob: ShardedElasticity, b, iters: int = 200,
                         mu: float = 1.0, lam: float = 1.0,
                         penalty: float = 8.0, dirichlet: bool = True,
                         penalty_scaling: str = "measure",
                         dtype=jnp.float64):
    """Block-Jacobi-preconditioned CG on the sharded elasticity system,
    one compiled program (psum dot products).

    The preconditioner blocks come from the extended template mesh's
    interior rows — exact on interior shards; edge shards' boundary-layer
    blocks use the interface flavor instead of the Dirichlet one (an
    O(1)-quality approximation that only perturbs the preconditioner,
    never the operator).  Returns (x, ||r||)."""
    dinv_mul = elasticity_dinv_mul(prob, mu=mu, lam=lam, penalty=penalty,
                                   dirichlet=dirichlet, dtype=dtype)
    run = jax.jit(_elasticity_pcg_runner(prob, dinv_mul, iters))
    return run(b)


def elasticity_dinv_mul(prob: ShardedElasticity, mu: float = 1.0,
                        lam: float = 1.0, penalty: float = 8.0,
                        dirichlet: bool = True, dtype=jnp.float64):
    """Block-Jacobi preconditioner r -> D^{-1} r on the sharded layout
    (see ``elasticity_pcg_solve`` for the block flavor)."""
    from hpdg_tpu.matrixfree.elasticity import elasticity_diagonal_blocks
    p = prob.p
    loc0 = prob.n_local // prob.layer
    if prob.shard_ebases is not None:
        # general geometry: per-shard blocks from each shard's extended
        # basis (interface flavor at the shard edges, as in the box path)
        Dsh = []
        for eb in prob.shard_ebases:
            D = elasticity_diagonal_blocks(eb, mu=mu, lam=lam,
                                           penalty=penalty,
                                           dirichlet=dirichlet, dtype=dtype)
            Dsh.append(np.asarray(D[p])[prob.layer:-prob.layer])
        Dinv = jnp.asarray(np.linalg.inv(np.stack(Dsh)), dtype)

        def dinv_mul(r):
            loc = r.reshape(prob.ndev, prob.n_local, prob.bs)
            out = jnp.einsum("dnij,dnj->dni", Dinv.astype(r.dtype), loc,
                             preferred_element_type=r.dtype)
            return out.reshape(r.shape)
    else:
        ecells = (loc0 + 2,) + prob.cells[1:]
        h = 1.0 / np.asarray(prob.cells)
        emesh = hmesh.structured(ecells, upper=(float((loc0 + 2) * h[0]),)
                                 + tuple(1.0 for _ in prob.cells[1:]))
        ebasis = DGBasis(emesh, np.full(emesh.n_elements, p))
        D = elasticity_diagonal_blocks(ebasis, mu=mu, lam=lam,
                                       penalty=penalty,
                                       dirichlet=dirichlet, dtype=dtype)
        Dmid = np.asarray(D[p])[prob.layer:-prob.layer]
        Dinv = jnp.asarray(np.linalg.inv(Dmid), dtype)

        def dinv_mul(r):
            loc = r.reshape(prob.ndev, prob.n_local, prob.bs)
            out = jnp.einsum("nij,dnj->dni", Dinv.astype(r.dtype), loc,
                             preferred_element_type=r.dtype)
            return out.reshape(r.shape)
    return dinv_mul


def _elasticity_pcg_runner(prob: ShardedElasticity, dinv_mul,
                           iters: int):
    """Traceable block-Jacobi PCG: b -> (x, ||r||), one fori_loop."""
    def safe_div(a, d):
        return jnp.where(jnp.abs(d) > 0, a / jnp.where(d == 0, 1.0, d), 0.0)

    def run(b):
        x = jnp.zeros_like(b)
        r = b
        z = dinv_mul(r)
        rz = jnp.vdot(r, z)

        def body(i, st):
            x, r, z, pv, rz = st
            Ap = prob.apply(pv)
            alpha = safe_div(rz, jnp.vdot(pv, Ap))
            x = x + alpha * pv
            r = r - alpha * Ap
            z = dinv_mul(r)
            rz_new = jnp.vdot(r, z)
            pv = z + safe_div(rz_new, rz) * pv
            return x, r, z, pv, rz_new

        st = jax.lax.fori_loop(0, iters, body, (x, r, z, z, rz))
        return st[0], jnp.linalg.norm(st[1])

    return run


@dataclass
class ShardedElasticityPMG:
    levels: list          # coarsest..finest ShardedElasticity problems
    transfers: list       # per gap: [nl_f, nl_c] scalar interpolation
    step: callable        # jit-safe V-cycle (x, b) -> x (sharded arrays)


def build_sharded_elasticity_pmg(cells, p: int, mu: float = 1.0,
                                 lam: float = 1.0, devices=None,
                                 penalty: float = 8.0,
                                 dirichlet: bool = True,
                                 dtype=jnp.float64,
                                 penalty_scaling: str = "measure",
                                 gmesh=None, pre_steps: int = 3,
                                 post_steps: int = 3,
                                 coarse_cg_iters: int = 60,
                                 h_levels: int = 0,
                                 smoother: str = "cheb",
                                 smoother_sweeps: int = 1
                                 ) -> ShardedElasticityPMG:
    """Sharded p-multigrid V-cycle for VECTOR-VALUED elasticity
    (BASELINE config 4's h+p V-cycle on the device mesh; the scalar
    analog is parallel.multigrid.build_sharded_pmg).  p-transfers act
    per displacement component — element-local GEMMs, no communication;
    smoothing is Chebyshev(pre/post_steps) on block-Jacobi with
    per-shard (d (p+1)^dim)^2 blocks; the p=1 coarse level runs sharded
    block-Jacobi PCG (psum reductions).  Works on box AND curved (``gmesh``) meshes — every
    level reuses ``build_sharded_elasticity`` at its degree.

    Coarse levels are re-discretized with a PENALTY-MATCHED coefficient
    ``penalty * (p/q)^2`` so every level carries the FINE level's face
    coefficient sigma*p^2.  Measured (dense two-grid spectral radii,
    8x3 p=2 mu=1 lam=1.5 "normal"): naive re-discretization DIVERGES for
    elasticity (rho 1.23 with 3+3 block-GS; the under-penalized coarse
    overshoots the penalty modes), while penalty matching reproduces the
    GALERKIN coarse rate exactly (0.6608 both) — the matrix-free analog
    of the serial hierarchy's Galerkin products (solversetup.hh:151-157;
    scalar SIPG tolerates naive re-discretization, elasticity does not).
    """
    from hpdg_tpu.basis import tensor, lagrange
    from hpdg_tpu.mesh import geometry as geo
    dim = len(cells)
    cells = tuple(int(c) for c in cells)
    orders = [p]
    while orders[-1] > 1:
        orders.append(max(1, orders[-1] // 2))
    orders = orders[::-1]  # coarsest..finest

    # level plan, coarsest..finest: ``h_levels`` geometric levels at the
    # coarsest degree BELOW the p-chain (solversetup.hh:71-108 order:
    # p-levels on the fine grid, gridTransfer below)
    def coarsen_cells(c, k):
        cc = tuple(x // (2 ** k) for x in c)
        if any(x * 2 ** k != y for x, y in zip(cc, cells)) or 0 in cc:
            raise ValueError(f"cells {c} not {k}x 2-coarsenable")
        return cc

    def coarse_gmesh(gm_f, cells_f, children):
        """Q1 coarse geometry: coarse corner k = fine child-k's corner k
        (exact when the fine mesh refines a Q1 mesh; otherwise the Q1
        fit — a preconditioner-level approximation)."""
        if gm_f is None:
            return None
        Cf = _global_corners(gm_f)
        cc = Cf[children, np.arange(2 ** dim)[None, :], :]
        base = hmesh.structured(tuple(x // 2 for x in cells_f))
        return replace(base, corners=cc)

    def children_map(cells_c):
        """[N_c, 2^d] fine element ids of each coarse element's children
        (bit convention of geometry._bits: axis 0 = highest bit)."""
        cells_f = tuple(2 * x for x in cells_c)
        B = geo._bits(dim).astype(np.int64)
        idx = np.indices(cells_c).reshape(dim, -1).T  # C order (ax0 slow)
        strides = np.array([int(np.prod(cells_f[a + 1:]))
                            for a in range(dim)], np.int64)
        ch = np.empty((len(idx), 2 ** dim), np.int64)
        for cp in range(2 ** dim):
            ch[:, cp] = (2 * idx + B[cp]) @ strides
        return ch

    levels = []   # (cells_l, q_l, gmesh_l)
    gaps = []     # per gap (coarse side of level l): ("p", T) | ("h", ...)
    q0 = orders[0]
    hl = []
    gm_l, cells_l = gmesh, cells
    for k in range(h_levels):
        ch = children_map(coarsen_cells(cells, k + 1))
        gm_c = coarse_gmesh(gm_l, cells_l, ch)
        cells_l = coarsen_cells(cells, k + 1)
        hl.append((cells_l, q0, gm_c, ch))
        gm_l = gm_c
    for cells_c, qc, gmc, ch in reversed(hl):
        levels.append((cells_c, qc, gmc))
        # DG-Q1-style embedding per child position: per-axis basis values
        # at (side + nodes)/2, tensorized in C order (axis 0 first)
        nodes = lagrange.nodes_1d(q0)
        Ms = [lagrange.lagrange_values(nodes, (s + nodes) / 2.0).T
              for s in (0, 1)]
        B = geo._bits(dim).astype(int)
        Tcps = []
        for cp in range(2 ** dim):
            out = Ms[B[cp, 0]]
            for a in range(1, dim):
                out = np.kron(out, Ms[B[cp, a]])
            Tcps.append(out)
        gaps.append(("h", jnp.asarray(ch),
                     jnp.asarray(np.stack(Tcps), dtype)))
    for li, q in enumerate(orders):
        levels.append((cells, q, gmesh))
        if li > 0:
            gaps.append(("p", jnp.asarray(tensor.interpolation_matrix(
                orders[li - 1], q, dim), dtype)))

    kw = dict(mu=mu, lam=lam, devices=devices,
              dirichlet=dirichlet, dtype=dtype,
              penalty_scaling=penalty_scaling)
    pens = [penalty * (p / q) ** 2 for (_, q, _) in levels]
    probs = [build_sharded_elasticity(cl, q, penalty=pq, gmesh=gl, **kw)
             for (cl, q, gl), pq in zip(levels, pens)]
    dinvs = [elasticity_dinv_mul(pr, mu=mu, lam=lam, penalty=pq,
                                 dirichlet=dirichlet, dtype=dtype)
             for pr, pq in zip(probs, pens)]

    # per-level rho(D^-1 A) by power iteration (fixed-seed RANDOM start
    # — the ones vector is A-smooth and nearly orthogonal to the top
    # eigenvector, ROADMAP r3 item 13)
    rng = np.random.default_rng(1887)
    lmaxs = []
    for prob, dinv in zip(probs, dinvs):
        v0 = jax.device_put(
            jnp.asarray(rng.standard_normal((prob.n_global, prob.bs)),
                        dtype), prob.sharding)

        @jax.jit
        def rho_est(v0, prob=prob, dinv=dinv):
            def body(i, v):
                w = dinv(prob.apply(v))
                return w / jnp.linalg.norm(w)
            v = jax.lax.fori_loop(0, 30, body, v0 / jnp.linalg.norm(v0))
            return jnp.linalg.norm(dinv(prob.apply(v)))
        lmaxs.append(1.05 * float(rho_est(v0)))

    def cheb(prob, dinv, lmax, x, b, degree, lmin_frac=0.15):
        # Chebyshev on the block-Jacobi-preconditioned operator — the
        # TPU-native smoother (no sequential sweeps; see
        # solvers.smoothers.chebyshev_smoother for the window rationale)
        theta = 0.5 * (lmax * lmin_frac + lmax)
        delta = 0.5 * (lmax - lmax * lmin_frac)
        r = dinv(b - prob.apply(x))
        d = r / theta
        sigma = theta / delta
        rho_old = 1.0 / sigma
        x = x + d
        for _ in range(degree - 1):
            r = dinv(b - prob.apply(x))
            rho_new = 1.0 / (2.0 * sigma - rho_old)
            d = (rho_new * rho_old) * d + (2.0 * rho_new / delta) * r
            rho_old = rho_new
            x = x + d
        return x

    # optional vertex-patch smoothing (parallel.patches): the fix for
    # the penalty-dominated DG-Q1 h-level plateau (~0.75/cycle with
    # element-block smoothing).  Applies on BOX levels whose patch
    # blocks stay under 1024 dofs (q <= 2 in 3D elasticity); bigger /
    # curved levels keep Chebyshev.
    patch_sweeps = [None] * len(levels)
    if smoother == "patch":
        from hpdg_tpu.assemble.elasticity import assemble_elasticity
        from hpdg_tpu.parallel.patches import sharded_patch_sweeps
        for li, ((cl, q, gl), pq, prob) in enumerate(
                zip(levels, pens, probs)):
            if gl is not None or 2 ** dim * dim * (q + 1) ** dim > 1024:
                continue
            basg = DGBasis(hmesh.structured(cl),
                           np.full(int(np.prod(cl)), q, dtype=np.int32))
            Ag = assemble_elasticity(basg, mu=mu, lam=lam, penalty=pq,
                                     dirichlet=dirichlet, dtype=dtype,
                                     penalty_scaling=penalty_scaling)
            patch_sweeps[li] = sharded_patch_sweeps(prob, Ag, basg,
                                                    dtype=dtype)

    coarse = _elasticity_pcg_runner(probs[0], dinvs[0], coarse_cg_iters)

    def restrict(l, r):
        gap = gaps[l - 1]
        nl_f = (levels[l][1] + 1) ** dim
        if gap[0] == "p":
            nl_c = (levels[l - 1][1] + 1) ** dim
            r3 = r.reshape(-1, dim, nl_f)
            return jnp.einsum("ndi,ic->ndc", r3, gap[1],
                              preferred_element_type=r.dtype
                              ).reshape(-1, dim * nl_c)
        _, ch, Tcps = gap
        rch = r.reshape(-1, dim, nl_f)[ch]  # [N_c, 2^d, d, nl]
        return jnp.einsum("ncdi,cij->ndj", rch, Tcps,
                          preferred_element_type=r.dtype
                          ).reshape(-1, dim * nl_f)

    def prolong(l, c):
        gap = gaps[l - 1]
        nl_f = (levels[l][1] + 1) ** dim
        if gap[0] == "p":
            nl_c = (levels[l - 1][1] + 1) ** dim
            c3 = c.reshape(-1, dim, nl_c)
            return jnp.einsum("ndc,ic->ndi", c3, gap[1],
                              preferred_element_type=c.dtype
                              ).reshape(-1, dim * nl_f)
        _, ch, Tcps = gap
        c3 = c.reshape(-1, dim, nl_f)
        xf_ch = jnp.einsum("ndj,cij->ncdi", c3, Tcps,
                           preferred_element_type=c.dtype)
        out = jnp.zeros((probs[l].n_global, dim, nl_f), c.dtype)
        return out.at[ch].set(xf_ch).reshape(-1, dim * nl_f)

    def run(l, x, b):
        if l == 0:
            return coarse(b)[0]
        prob = probs[l]
        if patch_sweeps[l] is not None:
            fwd, bwd = patch_sweeps[l]
            for _ in range(smoother_sweeps):
                x = fwd(x, b)
        else:
            x = cheb(prob, dinvs[l], lmaxs[l], x, b, pre_steps)
        r = b - prob.apply(x)
        rc = restrict(l, r)
        xc = run(l - 1, jnp.zeros_like(rc), rc)
        x = x + prolong(l, xc)
        if patch_sweeps[l] is not None:
            for _ in range(smoother_sweeps):
                x = bwd(x, b)
        else:
            x = cheb(prob, dinvs[l], lmaxs[l], x, b, post_steps)
        return x

    nlev = len(levels)

    def step(x, b):
        return run(nlev - 1, x, b)

    return ShardedElasticityPMG(levels=probs, transfers=gaps, step=step)


def solve_sharded_elasticity_pmg(pmg: ShardedElasticityPMG, b,
                                 cycles: int = 20):
    """Run ``cycles`` V-cycles as one compiled program -> (x, ||r||)."""
    fine = pmg.levels[-1]

    @jax.jit
    def runit(b):
        x = jnp.zeros_like(b)
        x = jax.lax.fori_loop(0, cycles, lambda i, xx: pmg.step(xx, b), x)
        return x, jnp.linalg.norm(b - fine.apply(x))

    return runit(b)


def elasticity_pmg_pcg_solve(pmg: ShardedElasticityPMG, b,
                             iters: int = 30):
    """V-cycle-preconditioned CG (the production solve, like the scalar
    path's hp_pmg_pcg_solve): one compiled program -> (x, ||r||/||b||).
    The symmetric pre/post-Chebyshev V-cycle from zero is an SPD
    preconditioner, so plain CG applies."""
    fine = pmg.levels[-1]

    def safe_div(a, d):
        return jnp.where(jnp.abs(d) > 0, a / jnp.where(d == 0, 1.0, d), 0.0)

    @jax.jit
    def runit(b):
        x = jnp.zeros_like(b)
        r = b
        z = pmg.step(jnp.zeros_like(r), r)
        rz = jnp.vdot(r, z)

        def body(i, st):
            x, r, z, pv, rz = st
            Ap = fine.apply(pv)
            alpha = safe_div(rz, jnp.vdot(pv, Ap))
            x = x + alpha * pv
            r = r - alpha * Ap
            z = pmg.step(jnp.zeros_like(r), r)
            rz_new = jnp.vdot(r, z)
            pv = z + safe_div(rz_new, rz) * pv
            return x, r, z, pv, rz_new

        st = jax.lax.fori_loop(0, iters, body, (x, r, z, z, rz))
        return st[0], jnp.linalg.norm(st[1]) / jnp.linalg.norm(b)

    return runit(b)
