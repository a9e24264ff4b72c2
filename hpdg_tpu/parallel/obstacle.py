"""Sharded TNNMG: obstacle problems on a multi-chip device mesh.

The multi-chip analog of the reference's parallel TNNMG
(iterationsteps/partnnmgstep.hh:29-232): per iteration

1. projected damped block-Jacobi pre-smoothing — the parallel-safe
   smoother family (the reference swaps its sequential nonlinear GS for
   L1-regularized/projected smoothers in parallel, l1projected.hh);
   Jacobi is the shard_map-native member: no sequential sweeps, one halo
   exchange per application;
2. truncation masks where the iterate sits on an obstacle
   (partnnmgstep.hh:147-158);
3. one sharded hp-multigrid V-cycle on the masked defect problem;
4. projection of the correction into the defect constraints;
5. exact quadratic line search via global psum reductions, NaN-guarded
   (partnnmgstep.hh:183-188).

All five stages are one jitted SPMD step; the host loop only checks the
correction norm.  Padding rows are pinned to the trivial constraint
lo = up = 0, so they stay exactly zero through the projected smoothing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hpdg_tpu.parallel.hp import (HPShardedPMG, hp_dot, hp_axpy, hp_norm)


def solve_tnnmg_sharded(pmg: HPShardedPMG, b: dict, lo: dict, up: dict,
                        tol: float = 1e-9, maxiter: int = 100,
                        pre_sweeps: int = 3, omega: float | None = None,
                        inner_cg_iters: int = 8, active_eps: float = 1e-13):
    """Sharded TNNMG loop.  ``b``, ``lo``, ``up`` are sharded bucket
    dicts (use HPSharded.scatter_global; its zero padding pins the
    padding rows).  Returns (x, history) with the reference's custom
    criterion columns (correction, damping, truncated count, energy —
    buildingblocks/solve.hh:101-119).

    ``omega``: projected-Jacobi damping; default 1/rho(D^-1 A) by power
    iteration (energy monotonicity of the projected sweep needs
    omega * rho <= 1).  ``inner_cg_iters``: the linear correction is
    V-cycle-preconditioned CG on the TRUNCATED system (the smoother is
    parallel-weak, so the linear solve compensates — the reference's
    single MG step leans on its sequential nonlinear GS instead)."""
    fine = pmg.levels[-1]
    dim = fine.ndim
    # padding rows sit at the trivial constraint lo = up = 0 and always
    # count as truncated — subtract them from the reported count
    n_pad_dofs = sum(
        (fine.ndev * fine.m_own[p]
         - sum(len(fine.owned_slots[(s, p)]) for s in range(fine.ndev)))
        * (p + 1) ** dim for p in fine.degree_set)

    if omega is None:
        # the documented default: omega = 1/rho(D^-1 A) by power
        # iteration — energy monotonicity of the damped projected
        # block-Jacobi sweep needs omega * rho <= 1.  A fixed 0.5 (the
        # old default) silently diverged whenever rho(D^-1 A) > 2,
        # e.g. stretched cells under "measure" penalty scaling.
        @jax.jit
        def _rho(v0):
            def body(i, st):
                v, _ = st
                w = fine.dinv_mul(fine.apply(v))
                nw = hp_norm(w)
                inv = jnp.where(nw > 0, 1.0 / nw, 0.0)
                return jax.tree.map(lambda a: a * inv, w), nw
            return jax.lax.fori_loop(0, 30, body,
                                     (v0, jnp.asarray(1.0)))[1]
        rho = float(_rho({p: jnp.ones_like(v) for p, v in b.items()}))
        omega = min(0.95 / max(rho, 1e-3), 1.0)

    def local_projected_solve(Dm, r_loc, y, lo_b, up_b, inner=2):
        """Batched projected scalar GS inside each diagonal block — the
        local solver of the serial nonlinear smoother
        (solvers/tnnmg.projected_block_gs_step), applied to ALL elements
        at once (Jacobi-lagged neighbors).  Parks a dof on an obstacle
        only when locally optimal, unlike a clipped linear update."""
        bs = Dm.shape[1]
        for _ in range(inner):
            for i in range(bs):
                s = jnp.einsum("nj,nj->n", Dm[:, i, :], y) \
                    - Dm[:, i, i] * y[:, i]
                yi = (r_loc[:, i] - s) / Dm[:, i, i]
                y = y.at[:, i].set(jnp.clip(yi, lo_b[:, i], up_b[:, i]))
        return y

    def psmooth(x, b):
        def body(i, xx):
            r = {p: b[p] - v for p, v in fine.apply(xx).items()}
            out = {}
            for p in xx:
                Dm = fine.diag[p].astype(xx[p].dtype)
                r_loc = r[p] + jnp.einsum("nij,nj->ni", Dm, xx[p])
                y = local_projected_solve(Dm, r_loc, xx[p], lo[p], up[p])
                out[p] = jnp.clip(xx[p] + omega * (y - xx[p]),
                                  lo[p], up[p])
            return out
        return jax.lax.fori_loop(0, pre_sweeps, body, x)

    def safe_div(a, d):
        return jnp.where(jnp.abs(d) > 0, a / jnp.where(d == 0, 1.0, d), 0.0)

    def truncated_solve(free, r_masked):
        """MG-PCG on A_tr c = r_masked, A_tr = M A M + (I - M)."""
        def A_tr(v):
            vm = {p: jnp.where(free[p], v[p], 0.0) for p in v}
            Av = fine.apply(vm)
            return {p: jnp.where(free[p], Av[p], v[p]) for p in v}

        def prec(r):
            rm = {p: jnp.where(free[p], r[p], 0.0) for p in r}
            z = pmg.step(jax.tree.map(jnp.zeros_like, r), rm)
            return {p: jnp.where(free[p], z[p], r[p]) for p in r}

        x = jax.tree.map(jnp.zeros_like, r_masked)
        r = r_masked
        z = prec(r)
        rz = hp_dot(r, z)

        def body(i, st):
            x, r, z, pv, rz = st
            Ap = A_tr(pv)
            alpha = safe_div(rz, hp_dot(pv, Ap))
            x = hp_axpy(alpha, pv, x)
            r = hp_axpy(-alpha, Ap, r)
            z = prec(r)
            rz_new = hp_dot(r, z)
            pv = hp_axpy(safe_div(rz_new, rz), pv, z)
            return x, r, z, pv, rz_new

        st = jax.lax.fori_loop(0, inner_cg_iters, body, (x, r, z, z, rz))
        return st[0]

    @jax.jit
    def step(x):
        x_start = x
        x = psmooth(x, b)
        r = {p: b[p] - v for p, v in fine.apply(x).items()}
        free = {}
        ntrunc = 0
        for p in x:
            tol_p = active_eps * (1 + jnp.abs(x[p]))
            # positional truncation as in the reference
            # (partnnmgstep.hh:147-158) — sound because the nonlinear
            # smoother above parks a dof on an obstacle only when
            # locally optimal
            at_lo = jnp.isfinite(lo[p]) & (x[p] - lo[p] <= tol_p)
            at_up = jnp.isfinite(up[p]) & (up[p] - x[p] <= tol_p)
            free[p] = jnp.logical_not(at_lo | at_up)
            ntrunc = ntrunc + jnp.sum(~free[p])
        r_masked = {p: jnp.where(free[p], r[p], 0.0) for p in r}
        c = truncated_solve(free, r_masked)
        c = {p: jnp.where(free[p], c[p], 0.0) for p in c}
        # project the trial point into the constraints
        c = {p: jnp.clip(x[p] + c[p], lo[p], up[p]) - x[p] for p in c}
        # exact quadratic line search on [0, 1], NaN-guarded
        cAc = hp_dot(c, fine.apply(c))
        rc = hp_dot(r, c)
        alpha = jnp.where(cAc > 0, rc / jnp.where(cAc == 0, 1.0, cAc), 1.0)
        alpha = jnp.clip(jnp.nan_to_num(alpha, nan=0.0), 0.0, 1.0)
        x = hp_axpy(alpha, c, x)
        # correction = total change over the WHOLE iteration (smoother +
        # line-searched MG correction), as in the reference's LoopSolver
        # criterion — a rejected direction (alpha = 0) must not read as
        # convergence while the smoother still makes progress
        corr = hp_norm({p: x[p] - x_start[p] for p in x})
        energy = 0.5 * hp_dot(x, fine.apply(x)) - hp_dot(b, x)
        return x, corr, alpha, ntrunc, energy

    x = jax.tree.map(jnp.zeros_like, b)
    x = {p: jnp.clip(x[p], lo[p], up[p]) for p in x}  # feasible start
    history = {"correction": [], "damping": [], "truncated": [],
               "energy": []}
    for _ in range(maxiter):
        x, corr, alpha, ntrunc, energy = step(x)
        history["correction"].append(float(corr))
        history["damping"].append(float(alpha))
        history["truncated"].append(int(ntrunc) - n_pad_dofs)
        history["energy"].append(float(energy))
        if float(corr) < tol:
            break
    history["iterations"] = len(history["correction"])
    return x, history
