"""Preconditioned conjugate gradients on bucketed block vectors.

The Krylov outer loop the reference gets from dune-solvers; here it is a
jitted ``lax.while_loop`` over pytrees, with the residual history
recorded into a fixed-size buffer (the analog of LoopSolver's verbose
residual table, which BASELINE parity checks read off).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from hpdg_tpu.linalg import blockvector as bv


def pcg(matvec_fn, b: dict, x0: dict | None = None, precond=None,
        tol: float = 1e-8, maxiter: int = 500, rtol: bool = True):
    """Solve A x = b with (preconditioned) CG.

    matvec_fn / precond: callables dict -> dict (jit-safe).
    Returns (x, info) with info = {"iterations", "residuals"} where
    residuals[k] = ||b - A x_k||_2 (length maxiter+1, padded with the
    final value after convergence).
    """
    if x0 is None:
        x0 = bv.zeros_like(b)
    M = precond or (lambda r: r)

    r0 = bv.sub(b, matvec_fn(x0))
    z0 = M(r0)
    rz0 = bv.dot(r0, z0)
    nb = bv.norm(b)
    target = tol * jnp.where(rtol & (nb > 0), nb, 1.0) if rtol else tol

    def cond(state):
        _, _, _, _, k, hist = state
        return (k < maxiter) & (hist[k] > target)

    def body(state):
        x, r, z, p, k, hist = state
        Ap = matvec_fn(p)
        rz = bv.dot(r, z)
        alpha = rz / bv.dot(p, Ap)
        x = bv.axpy(alpha, p, x)
        r = bv.axpy(-alpha, Ap, r)
        z = M(r)
        beta = bv.dot(r, z) / rz
        p = bv.axpy(beta, p, z)
        hist = hist.at[k + 1].set(bv.norm(r))
        return x, r, z, p, k + 1, hist

    hist = jnp.full(maxiter + 1, jnp.inf, dtype=rz0.dtype)
    hist = hist.at[0].set(bv.norm(r0))
    state = (x0, r0, z0, z0, jnp.array(0), hist)
    x, r, z, p, k, hist = jax.lax.while_loop(cond, body, state)
    hist = jnp.where(jnp.isinf(hist), hist[k], hist)
    return x, {"iterations": k, "residuals": hist}


def hoist_constants(fn, *example_args):
    """Return (g, consts) with g(consts, *args) == fn(*args) and all of
    fn's closed-over arrays turned into explicit inputs.

    Plain jit embeds closure arrays — e.g. hundreds of MB of multigrid
    level matrices — as HLO *constants*: the program text carries the
    bytes (breaking remote-compile size limits and bloating every
    recompile).  Tracing once with make_jaxpr exposes the jaxpr consts;
    evaluating the jaxpr with them passed as arguments keeps the program
    small and the arrays as ordinary device buffers."""
    flat_ex, in_tree = jax.tree.flatten(example_args)
    out_tree_box = []

    def flat_fn(*flat):
        args = jax.tree.unflatten(in_tree, flat)
        out = fn(*args)
        flat_out, out_tree = jax.tree.flatten(out)
        out_tree_box.append(out_tree)
        return flat_out

    closed = jax.make_jaxpr(flat_fn)(*flat_ex)
    out_tree = out_tree_box[0]
    consts = closed.consts

    def g(consts, *args):
        flat = jax.tree.leaves(args)
        out_flat = jax.core.eval_jaxpr(closed.jaxpr, consts, *flat)
        return jax.tree.unflatten(out_tree, out_flat)

    return g, consts


def jit_step(step_fn, x, b):
    """jit an (x, b) -> x iteration step with its captured arrays hoisted
    to arguments (see hoist_constants)."""
    try:
        g, consts = hoist_constants(step_fn, x, b)
        jg = jax.jit(g)
        return lambda xx, bb: jg(consts, xx, bb)
    except Exception:
        return jax.jit(step_fn)


def loop_solve(step_fn, x0: dict, b: dict, matvec_fn=None, tol: float = 1e-8,
               maxiter: int = 100, norm_fn=None):
    """dune-solvers ``LoopSolver`` analog: iterate an IterationStep
    ``x_{k+1} = step_fn(x_k, b)`` until the norm of the correction drops
    below tol (the reference's default criterion with EnergyNorm,
    buildingblocks/solve.hh:162-168).

    norm_fn(correction) defaults to the energy norm sqrt(c^T A c) if
    matvec_fn is given, else the 2-norm.  Runs as a host loop so the
    history is exact (each step_fn call is jitted internally).
    """
    if norm_fn is None:
        if matvec_fn is not None:
            norm_fn = lambda c: jnp.sqrt(jnp.abs(bv.dot(c, matvec_fn(c))))  # noqa: E731
        else:
            norm_fn = bv.norm
    step_fn = jit_step(step_fn, x0, b)
    norm_fn = jax.jit(norm_fn)
    x = x0
    history = []
    for k in range(maxiter):
        xn = step_fn(x, b)
        c = bv.sub(xn, x)
        err = float(norm_fn(c))
        history.append(err)
        x = xn
        if err < tol:
            break
    return x, {"iterations": len(history), "history": history}
