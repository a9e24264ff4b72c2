"""Sharded p-multigrid: the multi-chip hp solver path.

The ICI-native analog of the reference's parallel multigrid
(iterationsteps/parmgsetup.hh:483-517): every level is a sharded
matrix-free SIPG operator (halo ppermute inside shard_map,
parallel.sharded); p-transfers are *element-local* dense GEMMs — they
shard trivially with the elements and need NO communication (unlike the
reference's per-level VariableSizeCommunicator rebuilds,
communicationhpdg.hh:248-289); smoothing is damped block Jacobi with
shard-local diagonal blocks (the parallel-safe smoother family of
l1smoother.hh); the coarse level (p=1) is solved by sharded
block-Jacobi-preconditioned CG (psum reductions) — replacing the
reference's rank-0 MPI_Gatherv coarse solve (coarsegrid.hh:67-357),
which would be an anti-pattern on TPU.

Uniform degree + structured slab decomposition (see parallel.sharded).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from hpdg_tpu.basis import tensor
from hpdg_tpu.parallel.sharded import ShardedPoisson, build_sharded_poisson


@dataclass
class ShardedPMG:
    levels: list  # coarsest..finest ShardedPoisson problems
    transfers: list  # (bs_f, bs_c) interpolation matrices per gap
    step: callable  # jit-safe (x, b) -> x on global sharded arrays


def build_sharded_pmg(cells, p: int, devices=None, penalty: float = 2.0,
                      dirichlet: bool = True, dtype=jnp.float32,
                      pre_steps: int = 3, post_steps: int = 3,
                      jacobi_omega: float = 0.5,
                      coarse_cg_iters: int = 60) -> ShardedPMG:
    """Build a fully sharded p-multigrid V-cycle for uniform-degree SIPG
    Poisson on a structured mesh."""
    dim = len(cells)
    orders = [p]
    while orders[-1] > 1:
        orders.append(max(1, orders[-1] // 2))
    orders = orders[::-1]  # coarsest..finest

    probs = [build_sharded_poisson(cells, q, devices=devices,
                                   penalty=penalty, dirichlet=dirichlet,
                                   dtype=dtype) for q in orders]
    Ts = [jnp.asarray(tensor.interpolation_matrix(orders[l], orders[l + 1],
                                                  dim), dtype)
          for l in range(len(orders) - 1)]

    from hpdg_tpu.parallel.sharded import pcg_step, init_state

    # per-level damping: omega = 1/rho(D^-1 A) estimated by power
    # iteration — a fixed omega diverges on anisotropic elements where
    # rho can exceed 2/omega (D^-1 A is SPD in the D-inner product, so
    # any omega < 2/rho converges and 1/rho smooths well)
    omegas = []
    for prob in probs:
        @jax.jit
        def rho_est(prob=prob):
            def body(i, v):
                w = prob.precond(prob.apply(v))
                return w / jnp.linalg.norm(w)
            v0 = jax.device_put(
                jnp.ones((prob.n_global, (prob.p + 1) ** dim), dtype),
                prob.sharding)
            v0 = v0 / jnp.linalg.norm(v0)
            v = jax.lax.fori_loop(0, 20, body, v0)
            return jnp.linalg.norm(prob.precond(prob.apply(v)))
        omegas.append(min(jacobi_omega, 1.0 / float(rho_est())))

    def jacobi(prob, om, x, b, steps):
        def body(i, xx):
            r = b - prob.apply(xx)
            return xx + om * prob.precond(r)
        return jax.lax.fori_loop(0, steps, body, x)

    def coarse_solve(b):
        prob = probs[0]
        step = pcg_step(prob)
        state = init_state(prob, b)
        state = jax.lax.fori_loop(0, coarse_cg_iters,
                                  lambda i, s: step(s), state)
        return state[0]

    def run(l, x, b):
        if l == 0:
            return coarse_solve(b)
        prob = probs[l]
        x = jacobi(prob, omegas[l], x, b, pre_steps)
        r = b - prob.apply(x)
        rc = r @ Ts[l - 1]  # restriction = T^T per element (element-local)
        xc = run(l - 1, jnp.zeros_like(rc), rc)
        x = x + xc @ Ts[l - 1].T  # prolongation (element-local)
        x = jacobi(prob, omegas[l], x, b, post_steps)
        return x

    nlev = len(orders)

    def step(x, b):
        return run(nlev - 1, x, b)

    return ShardedPMG(levels=probs, transfers=Ts, step=step)


def solve_sharded_pmg(pmg: ShardedPMG, b, cycles: int = 20):
    """Run `cycles` V-cycles as one compiled program; returns (x, |r|)."""
    fine = pmg.levels[-1]

    @jax.jit
    def runit(b):
        x = jnp.zeros_like(b)
        x = jax.lax.fori_loop(0, cycles, lambda i, xx: pmg.step(xx, b), x)
        return x, jnp.linalg.norm(b - fine.apply(x))

    return runit(b)
