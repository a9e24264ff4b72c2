"""Block-scaled int16 codec for host<->device vector transfers.

The measured iterative-refinement solve (bench.py) moves one f32 vector
per refinement step in each direction through the host<->TPU tunnel
(16.4 MB at 4.1M dofs).  On tunnelled single-chip setups the wire is the
bottleneck (~30 MB/s measured in every transfer path tried — ROADMAP
item 17), so at the headline size the tunnel is over half of the
wall-clock solve.  Both transported vectors are *relative* quantities —
the normalized residual going up, the correction coming down — whose
next-step effect only needs to be accurate to the f32 V-cycle chain's
own contraction floor (~5e-5 per chain, measured), so a 2-byte
block-scaled integer encoding is loss-free in effect while halving the
wire bytes.

Encoding: flatten, pad to a multiple of ``block``, and per block of
``block`` entries store ``q = round(v / s)`` as int16 with the f32 scale
``s = max|v| / 32767``.  Worst-case per-block relative L2 error is
``sqrt(block) / 32767`` (~1.7e-4 at block=32) when a single entry
dominates its block; for smooth fields (neighbouring dofs of comparable
magnitude) the typical error is ~1e-5.  Scales add 4/block bytes per
entry (12% at block=32), so the wire cost is ~0.56x of f32.

No reference analog: the reference's MPI runs on the host fabric
(communicationhpdg.hh) and never crosses a PCIe/tunnel boundary; this
is TPU-deployment infrastructure.
"""

from __future__ import annotations

import numpy as np

QMAX = 32767  # int16 full scale


def _pad_len(n: int, block: int) -> int:
    return (-n) % block


def encode_np(v: np.ndarray, block: int = 32):
    """Host-side encode: f32/f64 array -> (q int16 [nb, block], s f32 [nb])."""
    flat = np.asarray(v, np.float32).reshape(-1)
    pad = _pad_len(flat.size, block)
    if pad:
        flat = np.concatenate([flat, np.zeros(pad, np.float32)])
    vb = flat.reshape(-1, block)
    s = np.abs(vb).max(axis=1) / QMAX
    s = np.where(s == 0, 1.0, s).astype(np.float32)
    q = np.rint(vb / s[:, None]).astype(np.int16)
    return q, s


def decode_np(q: np.ndarray, s: np.ndarray, n: int) -> np.ndarray:
    """Host-side decode -> f32 array of length ``n``."""
    vb = q.astype(np.float32) * np.asarray(s, np.float32)[:, None]
    return vb.reshape(-1)[:n]


def encode_jnp(v, block: int = 32):
    """Device-side (jit-safe) encode; static shapes from ``v.size``."""
    import jax.numpy as jnp

    flat = jnp.asarray(v, jnp.float32).reshape(-1)
    pad = _pad_len(flat.size, block)
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros(pad, jnp.float32)])
    vb = flat.reshape(-1, block)
    s = jnp.abs(vb).max(axis=1) / QMAX
    s = jnp.where(s == 0, 1.0, s).astype(jnp.float32)
    q = jnp.rint(vb / s[:, None]).astype(jnp.int16)
    return q, s


def decode_jnp(q, s, n: int):
    """Device-side (jit-safe) decode -> f32 [n]."""
    import jax.numpy as jnp

    vb = q.astype(jnp.float32) * jnp.asarray(s, jnp.float32)[:, None]
    return vb.reshape(-1)[:n]
