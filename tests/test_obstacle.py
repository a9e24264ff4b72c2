"""Obstacle problems via TNNMG (BASELINE config 5)."""

import numpy as np
import jax.numpy as jnp

from hpdg_tpu import mesh as hmesh
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.blocks import api
from hpdg_tpu.linalg import blockmatrix as bm, blockvector as bv
from hpdg_tpu.solvers.tnnmg import projected_block_gs_step, solve_tnnmg


def setup_problem(n=4, p=2):
    m = hmesh.structured((n, n), lower=(-1, -1), upper=(1, 1))
    basis = DGBasis(m, np.full(m.n_elements, p))
    A = api.laplace(basis, penalty=2.0, dirichlet=True)
    # constant downward load pushes the membrane into the lower obstacle
    b = api.l2_functional(basis, lambda x: -8.0 + 0.0 * x[..., 0])
    lo, up = api.constant_bounds(basis, lower=-0.2)
    return basis, A, b, lo, up


def energy(A, b, x):
    return float(0.5 * bv.dot(x, bm.matvec(A, x)) - bv.dot(b, x))


def test_projected_gs_respects_bounds_and_decreases_energy():
    basis, A, b, lo, up = setup_problem(3, 2)
    step = projected_block_gs_step(A, basis, lo, up)
    x = bv.zeros_like(b)
    e_prev = energy(A, b, x)
    for _ in range(10):
        x = step(x, b)
        e = energy(A, b, x)
        assert e <= e_prev + 1e-12
        e_prev = e
    for p in x:
        assert np.all(np.asarray(x[p]) >= np.asarray(lo[p]) - 1e-12)


def test_tnnmg_converges_and_activates_obstacle():
    basis, A, b, lo, up = setup_problem(4, 2)
    x, info = api.solve_obstacle(basis, A, b, lo, up, tol=1e-10, maxiter=60)
    # energy decreased monotonically
    en = info["energy"]
    assert all(b2 <= a2 + 1e-10 for a2, b2 in zip(en, en[1:]))
    # contact zone exists: some dofs sit at the obstacle
    assert max(info["truncated"]) > 0
    # feasibility
    for p in x:
        assert np.all(np.asarray(x[p]) >= np.asarray(lo[p]) - 1e-10)
    # complementarity: residual <= 0 at active lower-obstacle dofs (pushing
    # down), ~0 at free dofs
    r = bv.sub(b, bm.matvec(A, x))
    for p in x:
        xa, la, ra = (np.asarray(x[p]), np.asarray(lo[p]), np.asarray(r[p]))
        active = xa - la < 1e-9
        assert np.all(ra[active] <= 1e-7)
        assert np.max(np.abs(ra[~active])) < 1e-6


def test_tnnmg_matches_long_projected_gs():
    basis, A, b, lo, up = setup_problem(3, 1)
    x_t, _ = api.solve_obstacle(basis, A, b, lo, up, tol=1e-12, maxiter=200)
    step = projected_block_gs_step(A, basis, lo, up, inner_sweeps=3)
    x_gs = bv.zeros_like(b)
    import jax as _jax
    step = _jax.jit(step)
    for _ in range(3000):
        x_gs = step(x_gs, b)
    d = float(bv.norm(bv.sub(x_t, x_gs)))
    assert d < 1e-7, d


def test_unconstrained_tnnmg_equals_linear_solve():
    basis, A, b, lo, up = setup_problem(3, 2)
    lo, up = api.constant_bounds(basis)  # infinite bounds
    x_t, info = api.solve_obstacle(basis, A, b, lo, up, tol=1e-11,
                                   maxiter=100)
    x_l, _ = api.solve_linear(basis, A, b, tol=1e-12, maxiter=100)
    assert float(bv.norm(bv.sub(x_t, x_l))) < 1e-7
    assert max(info["truncated"]) == 0


def test_tnnmg_truncated_hierarchy_option():
    """Reference-faithful variant: Galerkin hierarchy of the truncated
    matrix rebuilt per iteration (solversetup preprocess behavior)."""
    basis, A, b, lo, up = setup_problem(3, 2)
    x_t, info = solve_tnnmg(A, b, basis, lo, up, tol=1e-10, maxiter=40,
                            truncate_hierarchy=True)
    x_ref, _ = solve_tnnmg(A, b, basis, lo, up, tol=1e-11, maxiter=80)
    assert float(bv.norm(bv.sub(x_t, x_ref))) < 1e-7
    en = info["energy"]
    assert all(b2 <= a2 + 1e-10 for a2, b2 in zip(en, en[1:]))


def test_tnnmg_elasticity_contact():
    """Vector-valued obstacle problem: elasticity with a rigid lower
    obstacle on the vertical displacement (Signorini-type, solved by the
    same TNNMG machinery — blocks are just bigger)."""
    from hpdg_tpu.assemble.elasticity import (assemble_elasticity,
                                              l2_functional_vec)
    from hpdg_tpu import mesh as hmesh2
    m = hmesh2.structured((4, 4), lower=(-1, -1), upper=(1, 1))
    basis = DGBasis(m, np.full(16, 2))
    d = 2
    A = assemble_elasticity(basis, mu=1.0, lam=1.0, penalty=6.0,
                            dirichlet=True)
    # downward body force on the y component
    force = lambda x: jnp.stack([jnp.zeros_like(x[..., 0]),
                                 -8.0 + 0.0 * x[..., 0]], axis=-1)
    b = l2_functional_vec(basis, force)
    # bounds: u_y >= -0.05, u_x free  (component-major layout)
    nl = 9
    lo = {2: jnp.concatenate([jnp.full((16, nl), -jnp.inf),
                              jnp.full((16, nl), -0.05)], axis=1)}
    up = {2: jnp.full((16, d * nl), jnp.inf)}
    from hpdg_tpu.solvers.multigrid import multigrid_solver
    step, _ = multigrid_solver(basis, A, pre_steps=5, post_steps=5)
    x, info = solve_tnnmg(A, b, basis, lo, up, mg_step=step, tol=1e-9,
                          maxiter=80)
    assert max(info["truncated"]) > 0  # contact happens
    en = info["energy"]
    assert all(b2 <= a2 + 1e-9 for a2, b2 in zip(en, en[1:]))
    xv = np.asarray(x[2])
    assert np.all(xv[:, nl:] >= -0.05 - 1e-9)  # feasible u_y


def test_tnnmg_fused_matches_stepwise():
    """fused=True (one lax.while_loop device program) must reproduce the
    stepwise iterates: same iteration count, same history, same x."""
    basis, A, b, lo, up = setup_problem(4, 2)
    x_s, h_s = solve_tnnmg(A, b, basis, lo, up, tol=1e-8, maxiter=30,
                           stall_window=3)
    x_f, h_f = solve_tnnmg(A, b, basis, lo, up, tol=1e-8, maxiter=30,
                           stall_window=3, fused=True)
    assert h_f["iterations"] == h_s["iterations"]
    assert float(bv.norm(bv.sub(x_f, x_s))) < 1e-10
    np.testing.assert_allclose(h_f["correction"], h_s["correction"],
                               rtol=1e-4)
    assert h_f["truncated"] == h_s["truncated"]
    assert h_f.get("stalled", False) == h_s.get("stalled", False)


def test_tnnmg_fused_stall_criterion():
    """The on-device stall criterion fires like the host one: run in f32
    to a correction floor and check both paths stop at the same spot."""
    basis, A, b64, lo64, up64 = setup_problem(4, 2)
    A32 = bm.BlockSparseMatrix(
        A.pattern, A.dim,
        {k: jnp.asarray(v, jnp.float32) for k, v in A.values.items()},
        A.block_shape)
    b32 = {k: jnp.asarray(v, jnp.float32) for k, v in b64.items()}
    lo = {k: jnp.asarray(v, jnp.float32) for k, v in lo64.items()}
    up = {k: jnp.asarray(v, jnp.float32) for k, v in up64.items()}
    x_s, h_s = solve_tnnmg(A32, b32, basis, lo, up, tol=0.0, maxiter=60,
                           stall_window=3)
    x_f, h_f = solve_tnnmg(A32, b32, basis, lo, up, tol=0.0, maxiter=60,
                           stall_window=3, fused=True)
    assert h_s.get("stalled") or h_s["iterations"] == 60
    assert h_f["iterations"] == h_s["iterations"]
    assert h_f.get("stalled", False) == h_s.get("stalled", False)


def test_tnnmg_fused_rejects_truncate_hierarchy():
    basis, A, b, lo, up = setup_problem(3, 1)
    import pytest
    with pytest.raises(ValueError):
        solve_tnnmg(A, b, basis, lo, up, fused=True,
                    truncate_hierarchy=True)


def test_solve_obstacle_verified_reaches_1e8():
    """Phase-1 f32 TNNMG + PDAS with on-chip exact-split anchors must
    produce a VERIFIED f64 free-dof residual <= 1e-8 (the deep-tolerance
    bar the f32 correction floor alone cannot meet; solve.hh:40-124
    solves to any requested tol in f64)."""
    from hpdg_tpu.solvers.tnnmg import solve_obstacle_verified
    basis, A, b, lo, up = setup_problem(8, 2)
    x64, info = solve_obstacle_verified(A, b, basis, lo, up, tol=1e-8,
                                        maxiter=30, max_outer=6)
    assert info["verified"], info
    assert info["free_residual"] <= 1e-8
    assert info["feasible"]
    assert info["complementarity"] <= 1e-8
    assert info["truncated"] > 0  # contact zone exists
    # matches a deep f64 TNNMG solve of the same problem
    x_ref, _ = solve_tnnmg(A, b, basis, lo, up, tol=1e-12, maxiter=200)
    for p in x64:
        err = np.max(np.abs(x64[p] - np.asarray(x_ref[p])))
        assert err < 1e-7, err
