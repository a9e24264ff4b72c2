"""Block-scaled int16 transfer codec: roundtrip accuracy + cross
(numpy <-> jax) compatibility.  The codec ships the refinement-loop
residual/correction vectors over the host<->TPU tunnel at half the
bytes; its error must sit well below the f32 V-cycle chain floor
(~5e-5 measured) for smooth fields."""

import numpy as np
import jax.numpy as jnp

from hpdg_tpu.utils import qtransfer as qt


def _rel(a, b):
    return np.linalg.norm(a - b) / np.linalg.norm(b)


def test_roundtrip_smooth_field():
    # smooth field: neighbouring entries of comparable magnitude, the
    # shape the codec actually carries (residuals of smooth solutions)
    x = np.linspace(0, 7 * np.pi, 100_001)
    v = (np.sin(x) * np.exp(-x / 30)).astype(np.float32)
    q, s = qt.encode_np(v)
    out = qt.decode_np(q, s, v.size)
    assert q.dtype == np.int16 and s.dtype == np.float32
    assert _rel(out, v) < 2e-5


def test_roundtrip_random():
    rng = np.random.default_rng(1887)
    v = rng.standard_normal(12_345).astype(np.float32)
    q, s = qt.encode_np(v, block=32)
    out = qt.decode_np(q, s, v.size)
    assert _rel(out, v) < 3e-5


def test_worst_case_spike_bounded():
    # one dominating entry per block: worst case sqrt(B)/QMAX per block
    v = np.full(64, 1e-4, np.float32)
    v[0] = 1.0
    v[32] = -1.0
    q, s = qt.encode_np(v, block=32)
    out = qt.decode_np(q, s, v.size)
    assert _rel(out, v) < np.sqrt(32) / qt.QMAX + 1e-6
    # the dominating entries themselves are exact to 1/QMAX
    assert abs(out[0] - 1.0) <= 1.0 / qt.QMAX


def test_zero_blocks_exact():
    v = np.zeros(100, np.float32)
    q, s = qt.encode_np(v)
    assert np.all(qt.decode_np(q, s, 100) == 0)


def test_jnp_np_cross_roundtrip():
    rng = np.random.default_rng(3)
    v = rng.standard_normal(5_000).astype(np.float32) * 1e-3
    # encode on device, decode on host (the download direction)
    qd, sd = qt.encode_jnp(jnp.asarray(v))
    out = qt.decode_np(np.asarray(qd), np.asarray(sd), v.size)
    assert _rel(out, v) < 3e-5
    # encode on host, decode on device (the upload direction)
    qh, sh = qt.encode_np(v)
    out2 = np.asarray(qt.decode_jnp(jnp.asarray(qh), jnp.asarray(sh), v.size))
    assert _rel(out2, v) < 3e-5
    # identical layouts: device and host encodings agree exactly
    assert np.array_equal(np.asarray(qd), qh) and np.allclose(
        np.asarray(sd), sh)


def test_padding_lengths():
    for n in [1, 31, 32, 33, 63, 64, 65]:
        v = np.arange(1, n + 1, dtype=np.float32)
        q, s = qt.encode_np(v)
        out = qt.decode_np(q, s, n)
        assert out.shape == (n,)
        assert _rel(out, v) < 3e-5
