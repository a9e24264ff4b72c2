"""Bucketed block vectors.

The analog of ``DynamicBlockVector`` (common/dynamicbvector.hh:46): a
coefficient vector for an hp-DG basis, stored as a pytree
``{degree: jnp.ndarray[n_elements_of_degree, (p+1)^dim]}``.

Where the reference keeps one flat buffer with per-block windows, the
TPU-native layout keeps one dense 2D array per degree bucket so every
kernel sees a static shape and vector-space ops are pure ``tree_map``.
Conversion to/from the flat (element-ordered) layout — needed for IO and
for differential tests against the numpy oracle — goes through the
host-side metadata on :class:`~hpdg_tpu.basis.dgbasis.DGBasis`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hpdg_tpu.basis.dgbasis import DGBasis

# A BlockVector is just: dict[int, jnp.ndarray]  (degree -> [n_p, bs_p])


def zeros(basis: DGBasis, dtype=jnp.float64, ncomp: int = 1) -> dict:
    """ncomp > 1: vector-valued block vector (component-major per element)."""
    return {
        p: jnp.zeros((basis.bucket_size(p), ncomp * basis.n_local(p)),
                     dtype=dtype)
        for p in basis.bucket_degrees
    }


def from_flat(basis: DGBasis, flat: np.ndarray, dtype=None,
              ncomp: int = 1) -> dict:
    flat = np.asarray(flat)
    dtype = dtype or flat.dtype
    out = {}
    for p in basis.bucket_degrees:
        elems = basis.bucket_elems[p]
        bs = ncomp * basis.n_local(p)
        idx = ncomp * basis.offsets[elems][:, None] + np.arange(bs)[None, :]
        out[p] = jnp.asarray(flat[idx], dtype=dtype)
    return out


def to_flat(basis: DGBasis, x: dict, ncomp: int = 1) -> np.ndarray:
    flat = np.zeros(ncomp * basis.ndof,
                    dtype=np.asarray(x[basis.bucket_degrees[0]]).dtype)
    for p in basis.bucket_degrees:
        elems = basis.bucket_elems[p]
        bs = ncomp * basis.n_local(p)
        idx = ncomp * basis.offsets[elems][:, None] + np.arange(bs)[None, :]
        flat[idx] = np.asarray(x[p])
    return flat


# ---- vector space ops (jit-safe, work on the pytree) ----------------------

def dot(x: dict, y: dict) -> jnp.ndarray:
    parts = [jnp.vdot(x[p], y[p]) for p in x]
    return sum(parts[1:], parts[0])


def norm(x: dict) -> jnp.ndarray:
    return jnp.sqrt(dot(x, x))


def axpy(a, x: dict, y: dict) -> dict:
    return jax.tree.map(lambda u, v: a * u + v, x, y)


def add(x: dict, y: dict) -> dict:
    return jax.tree.map(jnp.add, x, y)


def sub(x: dict, y: dict) -> dict:
    return jax.tree.map(jnp.subtract, x, y)


def scale(a, x: dict) -> dict:
    return jax.tree.map(lambda u: a * u, x)


def zeros_like(x: dict) -> dict:
    return jax.tree.map(jnp.zeros_like, x)


def random(basis: DGBasis, seed: int = 1887, dtype=jnp.float64,
           ncomp: int = 1) -> dict:
    """Deterministic pseudo-random vector (fixed seed 1887, mirroring the
    reference's test fixture test/randomvector.hh:11-24)."""
    rng = np.random.default_rng(seed)
    return {
        p: jnp.asarray(
            rng.standard_normal((basis.bucket_size(p),
                                 ncomp * basis.n_local(p))),
            dtype=dtype,
        )
        for p in basis.bucket_degrees
    }
