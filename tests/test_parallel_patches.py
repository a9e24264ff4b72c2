"""Sharded vertex-patch Schwarz sweeps (parallel/patches.py) on the
8-device CPU mesh: differential vs the serial smoother, and the
elasticity h+p V-cycle rate with patch smoothing."""

import numpy as np
import jax
import jax.numpy as jnp

from hpdg_tpu import mesh as hmesh
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.assemble.elasticity import assemble_elasticity
from hpdg_tpu.linalg import blockvector as bv
from hpdg_tpu.solvers import patches as spat
from hpdg_tpu.parallel.elasticity import (build_sharded_elasticity,
                                          build_sharded_elasticity_pmg)
from hpdg_tpu.parallel.patches import sharded_patch_sweeps


def test_sharded_patch_sweep_matches_serial():
    """One full multiplicative sweep on the 8-device mesh equals the
    serial colored patch smoother at ~1e-10 (cut patches solved
    redundantly from halo-exchanged residuals, owned lanes kept)."""
    cells, p = (16, 2, 2), 2
    pen = 11.0
    prob = build_sharded_elasticity(cells, p, mu=1.0, lam=1.5,
                                    penalty=pen, dirichlet=True,
                                    penalty_scaling="measure")
    mesh = hmesh.structured(cells)
    basis = DGBasis(mesh, np.full(mesh.n_elements, p, dtype=np.int32))
    A = assemble_elasticity(basis, mu=1.0, lam=1.5, penalty=pen,
                            dirichlet=True, penalty_scaling="measure",
                            dtype=jnp.float64)
    fwd, bwd = sharded_patch_sweeps(prob, A, basis)

    rng = np.random.default_rng(1887)
    x0 = rng.standard_normal((prob.n_global, prob.bs))
    b0 = rng.standard_normal((prob.n_global, prob.bs))
    xs = jax.device_put(jnp.asarray(x0), prob.sharding)
    bsrd = jax.device_put(jnp.asarray(b0), prob.sharding)

    serial_fwd = spat.patch_smoother_step(A, basis)
    serial_bwd = spat.patch_smoother_step(A, basis, reverse=True)
    for sharded, serial in ((fwd, serial_fwd), (bwd, serial_bwd)):
        got = np.asarray(sharded(xs, bsrd))
        want = np.asarray(serial({p: jnp.asarray(x0)},
                                 {p: jnp.asarray(b0)})[p])
        err = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert err < 1e-9, err


def test_sharded_elasticity_pmg_patch_rate():
    """h+p sharded elasticity V-cycle with patch smoothing: rate ~0.33
    where the Chebyshev element-block cycle sits at ~0.85 (measured on
    this config — the ROADMAP-22 plateau, fixed on the device mesh).
    Cells are 1:2 stretched (unit cube, (16,8,8) lattice); isotropic
    meshes contract at ~0.12 (serial twin in test_patches.py) —
    the residual gap is anisotropy, the line smoother's territory."""
    cells, p = (16, 8, 8), 2

    def rate(smoother):
        pmg = build_sharded_elasticity_pmg(cells, p, mu=1.0, lam=1.0,
                                           penalty=24.0, dirichlet=True,
                                           penalty_scaling="normal",
                                           h_levels=1, smoother=smoother)
        fine = pmg.levels[-1]
        rng = np.random.default_rng(7)
        b = jax.device_put(
            jnp.asarray(rng.standard_normal((fine.n_global, fine.bs))),
            fine.sharding)
        x = jnp.zeros_like(b)
        nb = float(jnp.linalg.norm(b))
        res = [1.0]
        step = jax.jit(pmg.step)
        for _ in range(6):
            x = step(x, b)
            res.append(float(jnp.linalg.norm(b - fine.apply(x))) / nb)
        return (res[-1] / max(res[1], 1e-300)) ** (1.0 / 5)

    r_patch = rate("patch")
    assert r_patch < 0.4, r_patch


def test_scalar_sharded_pmg_patch_rate():
    """Scalar sharded p-multigrid with patch smoothing: the p=4 chain
    contracts at ~0.02/cycle serially; on the 8-device mesh with 1:2
    stretched cells assert a conservative < 0.2 (Jacobi sits ~0.9)."""
    from hpdg_tpu.parallel.multigrid import build_sharded_pmg
    pmg = build_sharded_pmg((16, 8, 8), 2, penalty=2.0, dirichlet=True,
                            dtype=jnp.float64, smoother="patch")
    fine = pmg.levels[-1]
    rng = np.random.default_rng(7)
    b = jax.device_put(
        jnp.asarray(rng.standard_normal(
            (fine.n_global, (fine.p + 1) ** 3))), fine.sharding)
    x = jnp.zeros_like(b)
    nb = float(jnp.linalg.norm(b))
    res = [1.0]
    step = jax.jit(pmg.step)
    for _ in range(6):
        x = step(x, b)
        res.append(float(jnp.linalg.norm(b - fine.apply(x))) / nb)
    r = (res[-1] / max(res[1], 1e-300)) ** (1.0 / 5)
    assert r < 0.2, r


def test_sharded_elasticity_stretched_rate_below_02():
    """VERDICT r3 item 7 'done' bar: the stretched-cell sharded
    elasticity V-cycle contracts at <= 0.2/cycle.  Two patch sweeps per
    smoothing leg do it (measured 0.141 vs 0.334 single-sweep; each
    sweep is already an overlapping Schwarz round on owned+ghost data,
    so a second round is exactly 'one more overlap exchange')."""
    cells, p = (16, 8, 8), 2
    pmg = build_sharded_elasticity_pmg(cells, p, mu=1.0, lam=1.0,
                                       penalty=24.0, dirichlet=True,
                                       penalty_scaling="normal",
                                       h_levels=1, smoother="patch",
                                       smoother_sweeps=2)
    fine = pmg.levels[-1]
    rng = np.random.default_rng(7)
    b = jax.device_put(
        jnp.asarray(rng.standard_normal((fine.n_global, fine.bs))),
        fine.sharding)
    x = jnp.zeros_like(b)
    nb = float(jnp.linalg.norm(b))
    res = [1.0]
    step = jax.jit(pmg.step)
    for _ in range(6):
        x = step(x, b)
        res.append(float(jnp.linalg.norm(b - fine.apply(x))) / nb)
    r = (res[-1] / max(res[1], 1e-300)) ** (1.0 / 5)
    assert r < 0.2, (r, res)
