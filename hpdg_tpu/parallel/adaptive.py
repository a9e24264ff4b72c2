"""Sharded adaptive refinement loop (solve → estimate → mark → refine →
repartition → migrate) over a multi-device mesh.

The reference's parallel adaptivity stack is dune-grid's distributed
``adapt()`` plus the degree-map halo sync (parallel/updatedegrees.hh:11-45)
and coefficient persistence (functionspacebases/gridadaptor.hh:166-224).
The TPU-native shape of the same loop:

* the SOLVE runs sharded (``build_hp_sharded_general`` + block-Jacobi
  PCG with psum reductions) on the current mesh/partition;
* estimation, Dörfler marking and 2:1-closed refinement are host-side
  numpy passes (like all plan building — mesh surgery is metadata work,
  not FLOPs);
* after each refinement the slab partition is RE-BALANCED
  (``slab_partition`` picks new cut planes for the grown element set)
  and the solution migrates into the new layout by persist-interpolation
  (ancestor evaluation, blocks/persist.py) followed by a scatter into
  the new shard layout — the analog of dune-grid's loadBalance() + data
  handle migration, with the whole re-layout expressed as one host
  gather/scatter of bucketed arrays.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.assemble import l2_functional
from hpdg_tpu.matrixfree.norms import jump_indicator
from hpdg_tpu.estimators.utility import mark_fraction
from hpdg_tpu.mesh.adaptive import refine_local, close_marks
from hpdg_tpu.blocks.persist import (save_state, interpolate_to,
                                     degrees_after_refine)
from hpdg_tpu.parallel.hp import (build_hp_sharded_general, hp_pcg_solve,
                                  build_hp_sharded_pmg,
                                  build_hp_sharded_hmg_general,
                                  balanced_partition, morton_partition,
                                  hp_pmg_pcg_solve, hp_norm)


def sharded_adaptive_solve(mesh0, degrees0, f, devices=None,
                           cycles: int = 3, frac: float = 0.3,
                           penalty: float = 2.0,
                           penalty_scaling: str = "normal",
                           cg_iters: int = 300, dtype=jnp.float64,
                           hp_mode: bool = False,
                           smooth_cut: float = 0.5, max_p: int = 6,
                           solver: str = "jacobi-pcg",
                           partition: str = "planes",
                           repartition_threshold: float = 1.5):
    """Run ``cycles`` sharded adaptive cycles of the SIPG Poisson problem
    -Δu = f with homogeneous Dirichlet data.

    ``hp_mode``: apply the Legendre-decay smoothness indicator to every
    marked element (Houston & Süli rule, smoothnessindicator.hh:12-41):
    indicator < ``smooth_cut`` ⇒ raise the element's degree (up to
    ``max_p``); otherwise h-refine — the sharded analog of the serial
    hp workflow in examples/adaptive_lshape.py.

    ``partition="inherit"`` enables INCREMENTAL replanning (the
    TPU-native analog of the reference's persistent index sets across
    adapt cycles, persistentgridview.hh:44-207): children inherit their
    parent's shard, the partition is only rebalanced when the owned-
    element imbalance exceeds ``repartition_threshold``, and a content-
    hash plan cache reuses the extended mesh/basis/plan and diagonal
    blocks of every shard untouched by refinement — per-cycle planning
    cost scales with the DIRTY shards, not the mesh size.

    Returns ``(mesh, degrees, x, info)`` where ``x`` is the final serial
    bucketed solution and ``info`` records per cycle: element count,
    total jump-indicator value, sharded residual norm, the partition
    balance (max/min owned-element count over shards), the planning
    wall seconds (``plan_seconds``) and the plan-cache (hits, misses)
    per build (``plan_reuse``; non-"inherit" partitions log all-miss).
    """
    import time as _time
    devices = devices if devices is not None else jax.devices()
    mesh = mesh0
    degrees = np.asarray(degrees0).reshape(-1)
    x_serial = None
    info = {"n_elements": [], "eta": [], "residual": [], "balance": [],
            "plan_seconds": [], "plan_reuse": []}
    plan_cache = {}
    shard_prev = None
    for c in range(cycles):
        gbasis = DGBasis(mesh, degrees)
        if solver == "mg-pcg":
            # full sharded hp-multigrid per cycle: p-levels + the
            # refinement-history h-levels accumulated so far
            if mesh.parent_mesh is not None:
                pmg = build_hp_sharded_hmg_general(
                    mesh, degrees, devices=devices, penalty=penalty,
                    dirichlet=True, penalty_scaling=penalty_scaling,
                    dtype=dtype)
            else:
                pmg = build_hp_sharded_pmg(
                    None, degrees, gmesh=mesh, devices=devices,
                    penalty=penalty, dirichlet=True,
                    penalty_scaling=penalty_scaling, dtype=dtype)
            prob = pmg.levels[-1]
        else:
            if partition == "inherit":
                if shard_prev is None:
                    shard = balanced_partition(mesh, len(devices))
                else:
                    shard = shard_prev[mesh.parent] \
                        if mesh.parent is not None else shard_prev
                    counts_i = np.bincount(shard, minlength=len(devices))
                    if (counts_i.max()
                            > repartition_threshold * max(counts_i.min(), 1)):
                        shard = balanced_partition(mesh, len(devices))
            else:
                shard = {"balanced": balanced_partition,
                         "morton": morton_partition}.get(partition,
                                                         lambda *_: None)(
                    mesh, len(devices))
            t_plan = _time.perf_counter()
            prob = build_hp_sharded_general(
                mesh, degrees, devices=devices, penalty=penalty,
                dirichlet=True, penalty_scaling=penalty_scaling, dtype=dtype,
                elem_shard=shard, plan_cache=plan_cache)
            info["plan_seconds"].append(_time.perf_counter() - t_plan)
            info["plan_reuse"].append(plan_cache["__stats__"][-1])
            shard_prev = shard
        counts = [sum(len(prob.owned_slots[(s, p)])
                      for p in prob.degree_set) for s in range(prob.ndev)]
        info["balance"].append(max(counts) / max(min(counts), 1))
        b = prob.scatter_global(l2_functional(gbasis, f, dtype=dtype),
                                gbasis, dtype=dtype)
        x0 = (prob.scatter_global(x_serial, gbasis, dtype=dtype)
              if x_serial is not None else None)
        if solver == "mg-pcg":
            x_sh, rnorm = hp_pmg_pcg_solve(pmg, b, iters=cg_iters)
            rnorm = rnorm * hp_norm(b)  # hp_pmg returns a RELATIVE norm
        else:
            x_sh, rnorm = hp_pcg_solve(prob, b, iters=cg_iters, x0=x0)
        info["residual"].append(float(rnorm) / max(float(hp_norm(b)), 1e-300))
        xg = {p: jnp.asarray(v)
              for p, v in prob.gather_global(x_sh, gbasis).items()}
        eta = np.asarray(jump_indicator(gbasis, penalty=penalty,
                                        penalty_scaling=penalty_scaling,
                                        dtype=dtype)(xg))
        info["n_elements"].append(mesh.n_elements)
        info["eta"].append(float(np.sqrt(eta.sum())))
        x_serial = xg
        if c == cycles - 1:
            break
        # mark + hp decision + refine + migrate (re-layout on next build)
        marks = mark_fraction(eta, frac)
        new_deg = np.asarray(degrees).copy()
        if hp_mode:
            from hpdg_tpu.estimators.smoothness import smoothness_indicator
            smooth = smoothness_indicator(gbasis, xg)
            raise_p = marks & (smooth < smooth_cut) & (new_deg < max_p)
            new_deg[raise_p] += 1
            marks = marks & ~raise_p
        marks = close_marks(mesh, marks)
        saved = save_state(gbasis, xg)
        mesh = refine_local(mesh, marks)
        degrees = degrees_after_refine(new_deg, mesh)
        x_serial = interpolate_to(saved, DGBasis(mesh, degrees), dtype=dtype)
    return mesh, degrees, x_serial, info
