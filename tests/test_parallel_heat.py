"""Sharded heat / parabolic operators (M + dt*A on the device mesh)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hpdg_tpu import mesh as hmesh
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.matrixfree import sipg_operator
from hpdg_tpu.matrixfree.sumfact import mass_operator
from hpdg_tpu.parallel.hp import (build_hp_sharded,
                                  build_hp_sharded_general, hp_dot,
                                  hp_axpy, hp_norm)
from hpdg_tpu.parallel.heat import hp_mass_apply, hp_heat_apply

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _rel_err(y_ref, y):
    return max(np.abs(np.asarray(y_ref[p]) - np.asarray(y[p])).max()
               / max(np.abs(np.asarray(y_ref[p])).max(), 1.0) for p in y_ref)


@pytest.mark.parametrize("general", [False, True])
def test_sharded_heat_apply_matches_serial(general):
    rng = np.random.default_rng(1887)
    cells = (8, 3)
    if general:
        from hpdg_tpu.mesh.adaptive import refine_local, close_marks
        m0 = hmesh.structured(cells)
        gmesh = refine_local(m0, close_marks(m0, rng.random(24) < 0.3))
    else:
        gmesh = hmesh.structured(cells)
    degrees = rng.choice([2, 3], size=gmesh.n_elements)
    gbasis = DGBasis(gmesh, degrees)
    dt = 0.07
    A = sipg_operator(gbasis, penalty=2.0, dirichlet=True,
                      penalty_scaling="normal")
    M = mass_operator(gbasis)
    x = {p: jnp.asarray(rng.standard_normal(
        (gbasis.bucket_size(p), (p + 1) ** 2)))
        for p in gbasis.bucket_degrees}
    mx, ax = M(x), A(x)
    y_ref = {p: mx[p] + dt * ax[p] for p in x}

    if general:
        prob = build_hp_sharded_general(gmesh, degrees,
                                        devices=jax.devices()[:8],
                                        penalty=2.0, dirichlet=True,
                                        penalty_scaling="normal")
    else:
        prob = build_hp_sharded(cells, degrees, devices=jax.devices()[:8],
                                penalty=2.0, dirichlet=True,
                                penalty_scaling="normal")
    heat = hp_heat_apply(prob, dt)
    ys = heat(prob.scatter_global(x, gbasis))
    yg = prob.gather_global(ys, gbasis)
    assert _rel_err(y_ref, yg) < 1e-11


def test_sharded_implicit_euler_steps():
    """A few implicit-Euler steps of the heat equation solved by sharded
    CG on M + dt*A: energy decays monotonically."""
    rng = np.random.default_rng(5)
    cells = (8, 4)
    degrees = rng.choice([2, 3], size=32)
    gbasis = DGBasis(hmesh.structured(cells), degrees)
    prob = build_hp_sharded(cells, degrees, devices=jax.devices()[:8],
                            penalty=2.0, dirichlet=True,
                            penalty_scaling="normal")
    dt = 0.01
    heat = hp_heat_apply(prob, dt)
    mass = hp_mass_apply(prob)

    def safe_div(a, d):
        return jnp.where(jnp.abs(d) > 0, a / jnp.where(d == 0, 1.0, d), 0.0)

    @jax.jit
    def solve(b):
        x = jax.tree.map(jnp.zeros_like, b)
        r = b
        rz = hp_dot(r, r)

        def body(i, st):
            x, r, pv, rz = st
            Ap = heat(pv)
            alpha = safe_div(rz, hp_dot(pv, Ap))
            x = hp_axpy(alpha, pv, x)
            r = hp_axpy(-alpha, Ap, r)
            rz_new = hp_dot(r, r)
            pv = hp_axpy(safe_div(rz_new, rz), pv, r)
            return x, r, pv, rz_new

        st = jax.lax.fori_loop(0, 200, body, (x, r, r, rz))
        return st[0]

    from hpdg_tpu.blocks import api
    u = prob.scatter_global(api.interpolate(
        gbasis, lambda x: jnp.sin(jnp.pi * x[..., 0])
        * jnp.sin(jnp.pi * x[..., 1])), gbasis)
    energies = []
    for _ in range(3):
        b = mass(u)
        u = solve(b)
        energies.append(float(hp_norm(u)))
    assert energies[0] > energies[1] > energies[2]  # heat decays
