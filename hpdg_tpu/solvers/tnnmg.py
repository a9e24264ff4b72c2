"""TNNMG: truncated nonsmooth Newton multigrid for obstacle problems.

Rebuild of the reference's obstacle pipeline
(buildingblocks/solve.hh:40-124 + iterationsteps/partnnmgstep.hh:29-232,
which wraps dune-tnnmg): minimize J(x) = 1/2 x^T A x - b^T x subject to
box constraints lo <= x <= up.  One TNNMG sweep is

1. nonlinear (projected) block Gauss-Seidel pre-smoothing
   (dune-tnnmg NonlinearGSStep + ScalarObstacleSolver analog; here a
   colored sweep whose local solver is a projected scalar GS inside each
   diagonal block — batched over all blocks of a color);
2. truncation: dofs at an active obstacle are frozen
   (partnnmgstep.hh:147-158);
3. one linear multigrid step on the truncated defect problem;
4. projection of the correction into the defect constraints;
5. exact quadratic line search, NaN-guarded (partnnmgstep.hh:183-188).

Energy monotonicity comes from (1) and (5); the TPU twist is that every
stage is a fixed-shape batched kernel.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.linalg import blockvector as bv
from hpdg_tpu.linalg import blockmatrix as bm
from hpdg_tpu.solvers import smoothers as sm


def projected_block_gs_step(A: bm.BlockSparseMatrix, basis: DGBasis,
                            lo: dict, up: dict, colors=None,
                            inner_sweeps: int = 2):
    """Colored block GS whose local solve is a projected scalar GS on the
    diagonal block (the nested GSCore of dynamicblockgs.hh:17-40 plus
    obstacle clamping = dune-tnnmg's ScalarObstacleSolver)."""
    colors = sm.greedy_coloring(basis.mesh) if colors is None else colors
    ncol = int(colors.max()) + 1
    D = bm.extract_diagonal(A)
    masks = {}
    for p in basis.bucket_degrees:
        cc = colors[basis.bucket_elems[p]]
        masks[p] = [np.where(cc == c)[0].astype(np.int32) for c in range(ncol)]

    def local_projected_gs(Dm, r, x0, lo_b, up_b):
        """Solve argmin over the box of the local quadratic; Dm [n,bs,bs],
        r = local block rhs (residual + Dm x0), x0 [n,bs] start."""
        bs = Dm.shape[1]
        y = x0

        def one_sweep(y):
            for i in range(bs):
                # y_i = clip((r_i - sum_{j != i} D_ij y_j) / D_ii)
                s = jnp.einsum("nj,nj->n", Dm[:, i, :], y) \
                    - Dm[:, i, i] * y[:, i]
                yi = (r[:, i] - s) / Dm[:, i, i]
                yi = jnp.clip(yi, lo_b[:, i], up_b[:, i])
                y = y.at[:, i].set(yi)
            return y

        for _ in range(inner_sweeps):
            y = one_sweep(y)
        return y

    def step(x, b):
        for c in range(ncol):
            r = bv.sub(b, bm.matvec(A, x))
            newx = {}
            for p in x:
                pos = masks[p][c]
                if len(pos) == 0:
                    newx[p] = x[p]
                    continue
                posj = jnp.asarray(pos)
                Dm = D[p][posj]
                x_loc = x[p][posj]
                # local rhs: block residual + D x_loc (so the local solve
                # recomputes the block unknowns from scratch)
                r_loc = r[p][posj] + jnp.einsum("nij,nj->ni", Dm, x_loc)
                y = local_projected_gs(Dm, r_loc, x_loc, lo[p][posj],
                                       up[p][posj])
                newx[p] = x[p].at[posj].set(y)
            x = newx
        return x

    return step


def truncated_matrix(A: bm.BlockSparseMatrix, free: dict
                     ) -> bm.BlockSparseMatrix:
    """Zero the rows/cols of non-free (active-obstacle) dofs and put a
    unit diagonal there — dune-tnnmg's truncated linearization matrix."""
    vals = {}
    for (pr, pc), (rows, cols) in A.pattern.entries.items():
        fr = free[pr][jnp.asarray(rows)].astype(A.values[(pr, pc)].dtype)
        fc = free[pc][jnp.asarray(cols)].astype(A.values[(pr, pc)].dtype)
        vals[(pr, pc)] = A.values[(pr, pc)] * fr[:, :, None] * fc[:, None, :]
    for p in A.pattern.row_sizes:
        n = A.pattern.row_sizes[p]
        br = vals[(p, p)].shape[1]
        eye = jnp.eye(br, dtype=vals[(p, p)].dtype)
        inactive = 1.0 - free[p][:n].astype(vals[(p, p)].dtype)
        vals[(p, p)] = vals[(p, p)].at[:n].add(
            inactive[:, :, None] * eye[None])
    return bm.BlockSparseMatrix(A.pattern, A.dim, vals, A.block_shape)


def _fused_prog(one_iter, tol, maxiter, stall_window):
    """The whole TNNMG loop as ONE lax.while_loop device program.

    One dispatch + one fetch for the entire solve; per-iteration
    diagnostics accumulate in fixed ``maxiter``-slot device arrays and
    are trimmed after the single download.  The stopping logic is the
    stepwise path's, evaluated on-device: correction < tol, or (with
    ``stall_window``) corrections small relative to the first AND flat
    over the window (the f32 correction floor)."""
    f32 = jnp.float32

    def prog(xv):
        def cond(st):
            return (st[1] < maxiter) & jnp.logical_not(st[6])

        def body(st):
            xv, k, corrs, alphas, ens, ntrs, _ = st
            x_new, (corr, alpha, en, nt) = one_iter(xv)
            corr = corr.astype(f32)
            corrs = corrs.at[k].set(corr)
            alphas = alphas.at[k].set(alpha.astype(f32))
            ens = ens.at[k].set(en.astype(f32))
            ntrs = ntrs.at[k].set(nt)
            done = corr < tol
            if stall_window:
                prev = corrs[jnp.maximum(k - stall_window, 0)]
                stall = ((k >= stall_window)
                         & (corr < 1e-3 * corrs[0])
                         & (corr > 0.9 * prev))
                done = done | stall
            return (x_new, k + 1, corrs, alphas, ens, ntrs, done)

        st = (xv, jnp.int32(0),
              jnp.full((maxiter,), jnp.nan, f32),
              jnp.zeros((maxiter,), f32),
              jnp.zeros((maxiter,), f32),
              jnp.zeros((maxiter,), jnp.int32),
              jnp.bool_(False))
        return jax.lax.while_loop(cond, body, st)

    return prog


def _trim_fused(out, tol, maxiter):
    x = out[0]                       # stays on device, like stepwise
    k, corrs, alphas, ens, ntrs = jax.device_get(out[1:6])
    nit = int(k)
    history = {"correction": [float(v) for v in corrs[:nit]],
               "damping": [float(v) for v in alphas[:nit]],
               "truncated": [int(v) for v in ntrs[:nit]],
               "energy": [float(v) for v in ens[:nit]],
               "iterations": nit}
    if nit and nit < maxiter and not (corrs[nit - 1] < tol):
        history["stalled"] = True
    return x, history


def tnnmg_fused_solver(A: bm.BlockSparseMatrix, b: dict, basis: DGBasis,
                       lo: dict, up: dict, mg_step=None, tol: float = 1e-9,
                       maxiter: int = 100, pre_sweeps: int = 1,
                       active_eps: float = 1e-13, stall_window: int = 0):
    """Build once, solve many: the fused TNNMG loop as a reusable
    callable whose traced+compiled program persists across calls.

    ``solve_tnnmg(fused=True)`` re-traces per call (fresh closures);
    this builder pays the trace/compile once — the right shape for
    repeated solves (time stepping, benchmarking warm runs).  Returns
    ``solve(x0=None) -> (x, history)``."""
    if mg_step is None:
        from hpdg_tpu.solvers.multigrid import multigrid_solver
        mg_step, _ = multigrid_solver(
            basis, A, dtype=next(iter(b.values())).dtype)
    one_iter = _tnnmg_one_iter(A, b, basis, lo, up, mg_step, pre_sweeps,
                               active_eps)
    from hpdg_tpu.solvers.cg import hoist_constants
    x_ex = jax.tree.map(jnp.clip, bv.zeros_like(b), lo, up)
    prog = _fused_prog(one_iter, tol, maxiter, stall_window)
    g, consts = hoist_constants(prog, x_ex)
    jg = jax.jit(g)

    def solve(x0: dict | None = None):
        x = bv.zeros_like(b) if x0 is None else x0
        x = jax.tree.map(jnp.clip, x, lo, up)
        return _trim_fused(jg(consts, x), tol, maxiter)

    return solve


def _tnnmg_one_iter(A, b, basis, lo, up, mg_step, pre_sweeps, active_eps):
    """One full TNNMG iteration (stages 1-5 + diagnostics) as a pure
    traceable function xv -> (x_new, (corr, alpha, energy, ntrunc))."""
    smoother = projected_block_gs_step(A, basis, lo, up)
    energy = lambda v: 0.5 * bv.dot(v, bm.matvec(A, v)) - bv.dot(b, v)  # noqa: E731

    def masks(xv):
        free = {}
        ntrunc = jnp.int32(0)
        for p in xv:
            tol_p = active_eps * (1 + jnp.abs(xv[p]))
            at_lo = jnp.isfinite(lo[p]) & (xv[p] - lo[p] <= tol_p)
            at_up = jnp.isfinite(up[p]) & (up[p] - xv[p] <= tol_p)
            free[p] = jnp.logical_not(at_lo | at_up)
            ntrunc += jnp.sum(~free[p], dtype=jnp.int32)
        return free, ntrunc

    def finish_iter(x_pre, free, c, x_old):
        r = bv.sub(b, bm.matvec(A, x_pre))
        c = {p: jnp.where(free[p], c[p], 0.0) for p in c}
        c = jax.tree.map(lambda cc, xx, ll, uu:
                         jnp.clip(xx + cc, ll, uu) - xx, c, x_pre, lo, up)
        cAc = bv.dot(c, bm.matvec(A, c))
        rc = bv.dot(r, c)
        alpha = jnp.where(cAc > 0, rc / cAc, 1.0)
        alpha = jnp.clip(jnp.nan_to_num(alpha, nan=0.0), 0.0, 1.0)
        x_new = bv.axpy(alpha, c, x_pre)
        corr = bv.norm(bv.sub(x_new, x_old))
        return x_new, corr, alpha, energy(x_new)

    def one_iter(xv):
        x_pre = xv
        for _ in range(pre_sweeps):
            x_pre = smoother(x_pre, b)
        free, ntrunc = masks(x_pre)
        r = bv.sub(b, bm.matvec(A, x_pre))
        r_masked = {p: jnp.where(free[p], r[p], 0.0) for p in r}
        c = mg_step(bv.zeros_like(b), r_masked)
        x_new, corr, alpha, en = finish_iter(x_pre, free, c, xv)
        return x_new, (corr, alpha, en, ntrunc)

    return one_iter


def solve_tnnmg(A: bm.BlockSparseMatrix, b: dict, basis: DGBasis,
                lo: dict, up: dict, mg_step=None, x0: dict | None = None,
                tol: float = 1e-9, maxiter: int = 100, pre_sweeps: int = 1,
                active_eps: float = 1e-13, verbose: bool = False,
                truncate_hierarchy: bool = False, stall_window: int = 0,
                fused: bool = False):
    """Full TNNMG loop (solveObstacle analog, buildingblocks/solve.hh:40-124).

    Returns (x, info) with per-iteration correction norms, damping
    factors and truncated-dof counts (the reference's custom LoopSolver
    criterion columns, solve.hh:101-119).

    ``truncate_hierarchy=True`` re-Galerkin-restricts the TRUNCATED
    matrix (zeroed active rows/cols, unit diagonal) down the hierarchy
    every iteration — the reference's preprocess-per-iterate behavior
    (renewMatrixHierachy, solversetup.hh:151-190 driven by TNNMGStep).
    The hierarchy structure (transfers, patterns, coloring) is built
    once; each iteration only renews the matrix values and runs ONE
    jitted parametric cycle (no per-iteration setup or re-tracing).
    The default applies the truncation masks only on the fine level
    around an untruncated V-cycle (cheaper; the line search keeps the
    iteration monotone either way).

    ``fused=True`` (default path only) puts the WHOLE solve — all
    iterations, the tol check and the stall criterion — into one
    ``lax.while_loop`` device program: one dispatch, one fetch for the
    entire obstacle solve, instead of one round trip per iteration
    (the dominant cost on remote/tunneled chips).  History arrays are
    fixed at ``maxiter`` slots and trimmed after the single download;
    semantics (iterates, stopping) match the stepwise path exactly.
    """
    if fused and truncate_hierarchy:
        raise ValueError(
            "fused=True needs the default path: truncate_hierarchy "
            "renews the Galerkin hierarchy on the host every iteration")
    tr_data = tr_cycle = None
    if truncate_hierarchy:
        from hpdg_tpu.solvers.multigrid import (setup_hierarchy,
                                                parametric_cycle)
        dtype = next(iter(b.values())).dtype
        tr_data = setup_hierarchy(basis, A, dtype=dtype)
        tr_cycle = jax.jit(parametric_cycle(tr_data, dtype=dtype))
    elif mg_step is None:
        from hpdg_tpu.solvers.multigrid import multigrid_solver
        mg_step, _ = multigrid_solver(
            basis, A, dtype=next(iter(b.values())).dtype)
    x = bv.zeros_like(b) if x0 is None else x0
    # make the start feasible
    x = jax.tree.map(jnp.clip, x, lo, up)

    if truncate_hierarchy:
        smoother = projected_block_gs_step(A, basis, lo, up)
        energy = lambda v: 0.5 * bv.dot(v, bm.matvec(A, v)) - bv.dot(b, v)  # noqa: E731

        def masks(xv):
            free = {}
            ntrunc = jnp.int32(0)
            for p in xv:
                tol_p = active_eps * (1 + jnp.abs(xv[p]))
                at_lo = jnp.isfinite(lo[p]) & (xv[p] - lo[p] <= tol_p)
                at_up = jnp.isfinite(up[p]) & (up[p] - xv[p] <= tol_p)
                free[p] = jnp.logical_not(at_lo | at_up)
                ntrunc += jnp.sum(~free[p], dtype=jnp.int32)
            return free, ntrunc

        def finish_iter(x_pre, free, c, x_old):
            """Stages 4-5 + diagnostics: project the truncated
            correction, line-search, one fused device program."""
            r = bv.sub(b, bm.matvec(A, x_pre))
            c = {p: jnp.where(free[p], c[p], 0.0) for p in c}
            c = jax.tree.map(lambda cc, xx, ll, uu:
                             jnp.clip(xx + cc, ll, uu) - xx, c, x_pre,
                             lo, up)
            cAc = bv.dot(c, bm.matvec(A, c))
            rc = bv.dot(r, c)
            alpha = jnp.where(cAc > 0, rc / cAc, 1.0)
            alpha = jnp.clip(jnp.nan_to_num(alpha, nan=0.0), 0.0, 1.0)
            x_new = bv.axpy(alpha, c, x_pre)
            corr = bv.norm(bv.sub(x_new, x_old))
            return x_new, corr, alpha, energy(x_new)

        jsmooth = jax.jit(smoother)
        jmasks = jax.jit(masks)
        jfinish = jax.jit(finish_iter)
    else:
        if fused:
            return tnnmg_fused_solver(
                A, b, basis, lo, up, mg_step=mg_step, tol=tol,
                maxiter=maxiter, pre_sweeps=pre_sweeps,
                active_eps=active_eps, stall_window=stall_window)(x)
        # default path: the WHOLE iteration is one jitted program
        one_iter = _tnnmg_one_iter(A, b, basis, lo, up, mg_step,
                                   pre_sweeps, active_eps)
        from hpdg_tpu.solvers.cg import hoist_constants
        g1, c1 = hoist_constants(one_iter, x)
        jg1 = jax.jit(g1)

    history = {"correction": [], "damping": [], "truncated": [],
               "energy": []}
    for it in range(maxiter):
        if truncate_hierarchy:
            x_old = x
            for _ in range(pre_sweeps):
                x = jsmooth(x, b)
            free, ntrunc_d = jmasks(x)
            ntrunc = int(ntrunc_d)
            r = bv.sub(b, bm.matvec(A, x))
            r_masked = {p: jnp.where(free[p], r[p], 0.0) for p in r}
            # reference-faithful: renew the Galerkin hierarchy on the
            # truncated matrix (numeric-only — symbolic plans and the
            # jitted cycle are reused across iterations)
            tr_data.renew(truncated_matrix(A, free),
                          dtype=next(iter(b.values())).dtype)
            dinvs = [sm.inverse_diagonal_blocks(M)
                     for M in tr_data.matrices]
            c = tr_cycle(tr_data.matrices, dinvs, bv.zeros_like(b),
                         r_masked)
            x, corr_d, alpha_d, en_d = jfinish(x, free, c, x_old)
            corr, alpha, en = float(corr_d), float(alpha_d), float(en_d)
        else:
            x, stats = jg1(c1, x)
            corr, alpha, en, ntr = jax.device_get(stats)
            corr, alpha, en, ntrunc = (float(corr), float(alpha),
                                       float(en), int(ntr))
        history["correction"].append(corr)
        history["damping"].append(float(alpha))
        history["truncated"].append(ntrunc)
        history["energy"].append(float(en))
        if verbose:
            print(f"tnnmg it={it} corr={corr:.3e} alpha={float(alpha):.3f} "
                  f"trunc={ntrunc}")
        if corr < tol:
            break
        if stall_window and len(history["correction"]) > stall_window:
            # correction floored (the f32 arithmetic floor on device
            # runs): require BOTH that corrections have become small
            # relative to the first one (the contact set has settled —
            # early iterations legitimately plateau while it moves) AND
            # that the window shows no further decrease.  A production
            # criterion alongside tol — the reference's LoopSolver
            # supports pluggable criteria (solve.hh:101-119).
            small = corr < 1e-3 * history["correction"][0]
            flat = corr > 0.9 * history["correction"][-1 - stall_window]
            if small and flat:
                history["stalled"] = True
                break
    history["iterations"] = len(history["correction"])
    return x, history
