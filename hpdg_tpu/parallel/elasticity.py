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
from hpdg_tpu.matrixfree.elasticity import elasticity_operator


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

    @property
    def n_global(self) -> int:
        return self.n_local * self.ndev


def build_sharded_elasticity(cells, p: int, mu: float = 1.0,
                             lam: float = 1.0, devices=None,
                             penalty: float = 8.0, dirichlet: bool = True,
                             axis_name: str = "x", dtype=jnp.float64,
                             penalty_scaling: str = "measure"
                             ) -> ShardedElasticity:
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
    from hpdg_tpu.matrixfree.elasticity import elasticity_diagonal_blocks
    p = prob.p
    dim = len(prob.cells)
    loc0 = prob.n_local // prob.layer
    ecells = (loc0 + 2,) + prob.cells[1:]
    h = 1.0 / np.asarray(prob.cells)
    emesh = hmesh.structured(ecells, upper=(float((loc0 + 2) * h[0]),)
                             + tuple(1.0 for _ in prob.cells[1:]))
    ebasis = DGBasis(emesh, np.full(emesh.n_elements, p))
    D = elasticity_diagonal_blocks(ebasis, mu=mu, lam=lam, penalty=penalty,
                                   dirichlet=dirichlet, dtype=dtype)
    Dmid = np.asarray(D[p])[prob.layer:-prob.layer]
    Dinv = jnp.asarray(np.linalg.inv(Dmid), dtype)

    def dinv_mul(r):
        loc = r.reshape(prob.ndev, prob.n_local, prob.bs)
        out = jnp.einsum("nij,dnj->dni", Dinv.astype(r.dtype), loc,
                         preferred_element_type=r.dtype)
        return out.reshape(r.shape)

    def safe_div(a, d):
        return jnp.where(jnp.abs(d) > 0, a / jnp.where(d == 0, 1.0, d), 0.0)

    @jax.jit
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

    return run(b)
