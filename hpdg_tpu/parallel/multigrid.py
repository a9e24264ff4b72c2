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


def line_smoother_x(cells, p: int, penalty: float, dirichlet: bool,
                    dtype=jnp.float32, penalty_scaling: str = "measure",
                    omega: float = 0.8):
    """Line smoother along axis 0: every x-line of elements is solved as
    one block-tridiagonal system (batched dense inverse per line), with
    cross-line couplings Jacobi-lagged — the classic robust smoother for
    anisotropic elements (the role DynamicBlockGS's strong sequential
    sweeps play in the reference hierarchy, dynamicblockgs.hh:87-126).

    Lines span the slab-partition axis, so the residual is globally
    re-laid-out per application; under jit on sharded arrays XLA inserts
    the required all-gather — the honest cost of strong coupling along
    the partition direction.  Line systems are assembled and factorized
    host-side at setup (f64) and applied as batched GEMMs.
    """
    import numpy as _np
    from hpdg_tpu import mesh as _hmesh
    from hpdg_tpu.basis.dgbasis import DGBasis as _DGBasis
    from hpdg_tpu.assemble import assemble_laplace as _asm
    from hpdg_tpu.linalg import blockmatrix as _bm

    dim = len(cells)
    L = int(cells[0])
    nlines = int(np.prod(cells[1:]))
    bs = (p + 1) ** dim
    gmesh = _hmesh.structured(cells)
    gb = _DGBasis(gmesh, _np.full(gmesh.n_elements, p))
    A = _asm(gb, penalty=penalty, dirichlet=dirichlet,
             penalty_scaling=penalty_scaling, dtype=jnp.float64)
    # per-line block-tridiagonal matrices (element e = i0*nlines + line)
    mats = _np.zeros((nlines, L * bs, L * bs))
    for (pr, pc), (rows, cols) in A.pattern.entries.items():
        vals = _np.asarray(A.values[(pr, pc)])
        re = gb.bucket_elems[pr][rows]
        ce = gb.bucket_elems[pc][cols]
        lr, pr0 = re % nlines, re // nlines
        lc, pc0 = ce % nlines, ce // nlines
        same = lr == lc  # x-line-internal couplings only
        for k in _np.where(same)[0]:
            i0, j0 = int(pr0[k]) * bs, int(pc0[k]) * bs
            mats[lr[k], i0:i0 + bs, j0:j0 + bs] += vals[k]
    inv = jnp.asarray(_np.linalg.inv(mats), dtype)

    def smooth(apply_fn, x, b):
        r = b - apply_fn(x)  # [n, bs], n = L * nlines, x slowest
        rl = r.reshape(L, nlines, bs).transpose(1, 0, 2).reshape(
            nlines, L * bs)
        d = jnp.einsum("lab,lb->la", inv, rl,
                       preferred_element_type=dtype)
        d = d.reshape(nlines, L, bs).transpose(1, 0, 2).reshape(r.shape)
        return x + omega * d

    return smooth


def build_sharded_pmg(cells, p: int, devices=None, penalty: float = 2.0,
                      dirichlet: bool = True, dtype=jnp.float32,
                      pre_steps: int = 3, post_steps: int = 3,
                      jacobi_omega: float = 0.5, smoother: str = "jacobi",
                      coarse_cg_iters: int = 60,
                      smoother_sweeps: int = 1) -> ShardedPMG:
    """Build a fully sharded p-multigrid V-cycle for uniform-degree SIPG
    Poisson on a structured mesh.

    ``smoother``: "jacobi" (damped block Jacobi, comm-free), "line"
    (x-line block-tridiagonal solves — robust on anisotropic elements
    where Jacobi-smoothed MG degrades to ~0.86/cycle), or "patch"
    (colored vertex-patch Schwarz, parallel.patches — the strongest on
    isotropic lattices; ~0.02/cycle at p=4 where Jacobi sits at ~0.93)."""
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

    if smoother == "line":
        line_smooths = [line_smoother_x(cells, q, penalty, dirichlet,
                                        dtype=dtype)
                        for q in orders]

    # vertex-patch Schwarz sweeps (parallel.patches): the strongest
    # smoother on isotropic lattices — one 1+1 sweep pair contracts the
    # p=4 chain at ~0.02/cycle where block-Jacobi sits at ~0.93.  Falls
    # back to Jacobi on levels whose patch blocks exceed 1024 dofs.
    patch_sweeps = [None] * len(orders)
    if smoother == "patch":
        from hpdg_tpu import mesh as _hmesh
        from hpdg_tpu.basis.dgbasis import DGBasis as _DGBasis
        from hpdg_tpu.assemble import assemble_laplace as _asm
        from hpdg_tpu.parallel.patches import sharded_patch_sweeps
        for li, (q, prob) in enumerate(zip(orders, probs)):
            if 2 ** dim * (q + 1) ** dim > 1024:
                continue
            gmesh = _hmesh.structured(cells)
            gb = _DGBasis(gmesh, np.full(gmesh.n_elements, q,
                                         dtype=np.int32))
            Ag = _asm(gb, penalty=penalty, dirichlet=dirichlet,
                      dtype=jnp.float64)
            patch_sweeps[li] = sharded_patch_sweeps(prob, Ag, gb,
                                                    dtype=dtype)

    def jacobi(prob, om, x, b, steps, lvl=None):
        if smoother == "line":
            ls = line_smooths[lvl]

            def body(i, xx):
                return ls(prob.apply, xx, b)
        else:
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
        if patch_sweeps[l] is not None:
            for _ in range(smoother_sweeps):
                x = patch_sweeps[l][0](x, b)
        else:
            x = jacobi(prob, omegas[l], x, b, pre_steps, lvl=l)
        r = b - prob.apply(x)
        rc = r @ Ts[l - 1]  # restriction = T^T per element (element-local)
        xc = run(l - 1, jnp.zeros_like(rc), rc)
        x = x + xc @ Ts[l - 1].T  # prolongation (element-local)
        if patch_sweeps[l] is not None:
            for _ in range(smoother_sweeps):
                x = patch_sweeps[l][1](x, b)
        else:
            x = jacobi(prob, omegas[l], x, b, post_steps, lvl=l)
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
