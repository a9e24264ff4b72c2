"""Double-f32 ("double-single") arithmetic + exact chunk splitting.

f64 is unusable on this TPU generation (pathological remote compiles;
ROADMAP item 2), so quantities that need more than f32 precision are
carried as an unevaluated pair ``(hi, lo)`` of f32 arrays with
``hi + lo`` exact to ~2^-48 relative (Dekker/Knuth two_sum building
blocks, no FMA required).  The pair type is deliberately bare — two
arrays, not a class — so it stays a jit-friendly pytree.

The chunk splitters feed the exact-GEMM scheme
(:mod:`hpdg_tpu.matrixfree.exact`): values are decomposed as
``sigma * sum_j c_j 2^{-t(j+1)}`` with ``sigma`` a power of two and
``c_j`` integer-valued f32 chunks with ``|c_j| <= 2^t``.  Chunks this
small are exactly representable in bf16 (t <= 8), so a single-pass MXU
f32 GEMM over them is *bit-exact* as long as the accumulated integer
sums stay below 2^24.

All ops here rely only on IEEE f32 +,-,* semantics, which XLA preserves
(it does not reassociate or fast-math float arithmetic by default) —
with ONE measured exception: XLA:CPU's simplifier rewrites two_sum's
error extraction to drop the low half when one operand is embedded in
the program as a LITERAL constant (6e-8 abs loss; parameters are safe,
and the TPU backend is unaffected).  Consumers that close over pair
constants must either hoist them to arguments (solvers.cg
.hoist_constants — what every production driver does) or wrap them in
``jax.lax.optimization_barrier`` before the pair op (what the
matrixfree.exact residual builders do).

No reference analog: dune-hpdg computes in native f64 throughout; this
module exists so the TPU path can anchor residuals on-chip instead of
round-tripping to a host f64 operator.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def two_sum(a, b):
    """Exact addition: returns (s, e) with s = fl(a+b) and s + e = a + b
    exactly (Knuth's branch-free TwoSum, 6 flops)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def df_norm(hi, lo):
    """Renormalize a pair so |lo| <= ulp(hi)/2."""
    return two_sum(hi, lo)


def df_add(hi, lo, v):
    """(hi, lo) + v for an f32 array v; error ~2^-48 |result| per call."""
    s, e = two_sum(hi, v)
    return two_sum(s, lo + e)


def df_add_df(ahi, alo, bhi, blo):
    """(ahi, alo) + (bhi, blo)."""
    s, e = two_sum(ahi, bhi)
    return two_sum(s, e + alo + blo)


def df_sub_df(ahi, alo, bhi, blo):
    return df_add_df(ahi, alo, -bhi, -blo)


def df_from_f64(x64):
    """Host split of an f64 numpy array into an exact (hi, lo) f32 pair:
    hi = fl32(x), lo = fl32(x - hi) — error <= 2^-49 relative."""
    x64 = np.asarray(x64, np.float64)
    hi = x64.astype(np.float32)
    lo = (x64 - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def df_to_f64(hi, lo):
    return np.asarray(hi, np.float64) + np.asarray(lo, np.float64)


def pow2_rowscale(x, axis=-1):
    """Per-row power-of-two scale sigma >= max|x| along ``axis``
    (keepdims), exactly 1.0 for all-zero rows.  Division by sigma is
    exact (exponent shift)."""
    m = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    _, ex = jnp.frexp(m)  # m = mant * 2^ex, mant in [0.5, 1); frexp(0)=(0,0)
    return jnp.ldexp(jnp.asarray(1.0, x.dtype), ex)


def split_chunks(xh, xl, sigma, t: int, nchunks: int):
    """Split the pair value ``xh + xl`` (pre-scaled by the power-of-two
    ``sigma``, so |(xh+xl)/sigma| <= 1) into ``nchunks`` integer-valued
    f32 chunks:

        xh + xl = sigma * sum_j chunks[j] 2^{-t(j+1)}  +  O(sigma 2^{-t n})

    with |chunks[0]| <= 2^t, |chunks[j>0]| <= 2^{t-1}.  The recursion
    runs in pair arithmetic (two_sum renormalization per step), so bits
    flow correctly across the 24-bit f32 boundary: nchunks*t bits of the
    pair are captured at shared row scale.  Every step is exact in f32
    (power-of-two scaling, Sterbenz subtraction, exact two_sum); the
    remainder below 2^{-t*nchunks}*sigma is the only truncation.

    Pass ``xl=None`` for a plain f32 input."""
    rh = xh / sigma
    rl = jnp.zeros_like(rh) if xl is None else xl / sigma
    scale = jnp.asarray(2.0 ** t, xh.dtype)
    chunks = []
    for _ in range(nchunks):
        rh = rh * scale
        rl = rl * scale
        c = jnp.rint(rh)
        rh = rh - c
        rh, rl = two_sum(rh, rl)
        chunks.append(c)
    return chunks


def split_matrix_chunks(W, t: int, nchunks: int):
    """Host-side (numpy f64) split of a matrix along its OUTPUT axis:
    per-column power-of-two scales tau[r] and integer f32 chunks with

        W[:, r] = tau[r] * sum_i chunks[i][:, r] * 2^{-t(i+1)} + O(2^{-t n} tau)

    The truncation after ``nchunks`` chunks is below 2^{-t*nchunks}
    relative to each column's max entry."""
    W = np.asarray(W, np.float64)
    m = np.max(np.abs(W), axis=0)
    ex = np.frexp(m)[1]
    tau = np.ldexp(1.0, ex)  # power of two >= column max; 1.0 for zero col
    r = W / tau
    chunks = []
    for _ in range(nchunks):
        r = r * (2.0 ** t)
        c = np.rint(r)
        chunks.append(c.astype(np.float32))
        r = r - c
    return tau.astype(np.float32), chunks
