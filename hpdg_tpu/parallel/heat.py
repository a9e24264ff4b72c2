"""Sharded heat / parabolic operators: M + dt*A on the device mesh.

The reference's heat machinery is the diagonal-block family
(matrix-free/localoperators/heatdiagonalblock.hh) consumed by implicit
Euler steps.  On the sharded layout the mass operator is EMBARRASSINGLY
parallel — DG mass blocks are element-local, so the apply is one
batched GEMM per degree with zero communication; composing it with the
sharded SIPG apply gives the implicit-Euler operator M + dt*A whose
only communication is A's halo exchange.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from hpdg_tpu import mesh as hmesh
from hpdg_tpu.basis import tensor
from hpdg_tpu.parallel.hp import HPSharded


def hp_mass_apply(prob: HPSharded, weight=None, dtype=jnp.float64):
    """Sharded (u, v) mass apply on the HPSharded layout: per-degree
    batched dense GEMM times per-element detJ — element-local, no
    communication (SumFactMassOperator on the device mesh).

    ``weight``: optional scalar weight w(x) evaluated at element
    centers-of-mass quadrature... evaluated exactly per quad point."""
    gmesh = prob.gmesh if prob.gmesh is not None \
        else hmesh.structured(prob.cells)
    dim = prob.ndim
    M0 = {}
    det = {}
    wq_data = {}
    for p in prob.degree_set:
        vt = tensor.volume_tables(p, dim, p + 2, family="lobatto")
        M0[p] = jnp.asarray(np.einsum("iq,q,jq->ij", vt["V"], vt["weights"],
                                      vt["V"]), dtype)
        buf = np.zeros(prob.ndev * prob.m_own[p])
        wbuf = None
        if weight is not None:
            nq = len(vt["weights"])
            wbuf = np.zeros((prob.ndev * prob.m_own[p], nq))
        for s in range(prob.ndev):
            ids = prob.owned_slots[(s, p)]
            off = s * prob.m_own[p]
            if len(ids):
                buf[off:off + len(ids)] = np.prod(gmesh.extent[ids], axis=1)
                if weight is not None:
                    x = (gmesh.lower[ids][:, None, :]
                         + vt["points"][None, :, :]
                         * gmesh.extent[ids][:, None, :])
                    wbuf[off:off + len(ids)] = np.asarray(
                        weight(jnp.asarray(x)))
        det[p] = jax.device_put(
            jnp.asarray(buf, dtype),
            jax.sharding.NamedSharding(prob.device_mesh,
                                       jax.sharding.PartitionSpec(
                                           tuple(prob.axes))))
        if weight is not None:
            V = jnp.asarray(vt["V"], dtype)
            w = jnp.asarray(vt["weights"], dtype)
            wq_data[p] = (jax.device_put(
                jnp.asarray(wbuf, dtype),
                jax.sharding.NamedSharding(prob.device_mesh,
                                           jax.sharding.PartitionSpec(
                                               tuple(prob.axes), None))),
                V, w)

    def apply(x):
        out = {}
        for p in prob.degree_set:
            if weight is None:
                out[p] = jnp.einsum("ni,ij->nj", x[p],
                                    M0[p].astype(x[p].dtype),
                                    preferred_element_type=x[p].dtype) \
                    * det[p].astype(x[p].dtype)[:, None]
            else:
                wb, V, w = wq_data[p]
                uq = x[p] @ V.astype(x[p].dtype)
                g = uq * wb.astype(x[p].dtype) * w.astype(x[p].dtype)[None]
                out[p] = (g @ V.T.astype(x[p].dtype)
                          * det[p].astype(x[p].dtype)[:, None])
        return out

    return apply


def hp_heat_apply(prob: HPSharded, dt: float, weight=None,
                  dtype=jnp.float64):
    """Implicit-Euler heat operator x -> (M + dt A) x on sharded bucket
    dicts (heatdiagonalblock.hh role on the device mesh)."""
    mass = hp_mass_apply(prob, weight=weight, dtype=dtype)

    def apply(x):
        ax = prob.apply(x)
        mx = mass(x)
        return {p: mx[p] + dt * ax[p] for p in x}

    return apply
