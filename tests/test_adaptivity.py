"""hp-adaptivity building blocks: marking, smoothness, persistence, and a
full p-adaptive loop on the L-shape (BASELINE config 3 machinery)."""

import numpy as np
import jax.numpy as jnp

from hpdg_tpu import mesh as hmesh
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.blocks import api
from hpdg_tpu.blocks.persist import (save_state, interpolate_to,
                                     degrees_after_refine)
from hpdg_tpu.estimators.utility import quantile, fraction, mark_fraction
from hpdg_tpu.estimators.smoothness import smoothness_indicator
from hpdg_tpu.linalg import blockvector as bv
from hpdg_tpu.estimators import l2_error


def test_quantile_and_fraction():
    e = np.array([1.0, 2.0, 3.0, 10.0])
    assert quantile(e, 0.5) == 3.0
    # Dörfler: top errors covering 60% of total (16): 10 alone = 62% -> t=10
    t = fraction(e, 0.6)
    assert t == 10.0
    marks = mark_fraction(e, 0.6)
    assert marks.sum() == 1 and marks[3]
    # frac ~ 1 marks everything
    assert mark_fraction(e, 0.999).sum() == 4


def test_smoothness_indicator_separates():
    m = hmesh.structured((2, 2))
    basis = DGBasis(m, np.full(4, 6))
    smooth_f = lambda x: jnp.sin(2 * x[..., 0]) * jnp.cos(x[..., 1])
    rough_f = lambda x: (jnp.abs(x[..., 0] - 0.52) ** 1.4
                         * (1 + 0.3 * jnp.sin(3 * x[..., 1])))
    xs = api.interpolate(basis, smooth_f)
    xr = api.interpolate(basis, rough_f)
    ind_s = smoothness_indicator(basis, xs)
    ind_r = smoothness_indicator(basis, xr)
    # analytic function decays fast (small indicator); the elements
    # containing the kink (x around 0.52: elements 2, 3) decay slowly
    assert ind_s.max() < ind_r[2:].min(), (ind_s, ind_r)


def test_persist_p_change():
    m = hmesh.structured((3, 3))
    basis = DGBasis(m, np.full(9, 2))
    f = lambda x: x[..., 0] ** 2 + x[..., 0] * x[..., 1]
    x = api.interpolate(basis, f)
    saved = save_state(basis, x)
    new_deg = np.full(9, 2)
    new_deg[[0, 4]] = 5
    nb = basis.with_degrees(new_deg)
    xn = interpolate_to(saved, nb)
    # p-raise is exact for the quadratic
    assert float(l2_error(nb, xn, f)) < 1e-13


def test_persist_through_refinement():
    m = hmesh.structured((2, 2))
    basis = DGBasis(m, np.array([1, 2, 3, 2]))
    f = lambda x: (1 + x[..., 0]) * x[..., 1]  # bilinear: exact at p>=1
    x = api.interpolate(basis, f)
    saved = save_state(basis, x)
    m1 = hmesh.refine(m)
    m2 = hmesh.refine(m1)
    deg2 = degrees_after_refine(degrees_after_refine(basis.degrees, m1), m2)
    nb = DGBasis(m2, deg2)
    xn = interpolate_to(saved, nb)
    assert float(l2_error(nb, xn, f)) < 1e-13


def test_p_adaptive_loop_lshape():
    """Full adaptive cycle on the L-shape: solve -> estimate (hierarchic
    difference in the DG norm) -> Dörfler-mark -> raise p -> persist ->
    re-solve.  The true L2 error must drop."""
    m = hmesh.lshape(2)
    u = lambda x: jnp.sin(jnp.pi * x[..., 0]) * jnp.sin(jnp.pi * x[..., 1])
    f = lambda x: 2 * jnp.pi**2 * u(x)
    basis = DGBasis(m, np.full(m.n_elements, 1))

    def solve(basis):
        A = api.laplace(basis, penalty=2.0, dirichlet=True)
        b = api.l2_functional(basis, f)
        x, _ = api.solve_linear(basis, A, b, tol=1e-10, maxiter=60)
        return A, b, x

    A, b, x = solve(basis)
    err1 = float(l2_error(basis, x, u))
    # hierarchic-style estimator: DG-norm of (interp of u_h into p+1 space
    # minus the p+1 Galerkin correction surrogate) — here simply the
    # local DG norm of the residual lift via difference to a smoothed
    # iterate; for the test, use the true local error in the DG norm:
    saved = save_state(basis, x)
    eta = np.asarray(api.local_norm(
        basis, {p: x[p] - api.interpolate(basis, u)[p] for p in x},
        penalty=2.0))
    marks = mark_fraction(eta, 0.6)
    assert marks.any() and not marks.all()
    new_deg = basis.degrees.copy()
    new_deg[marks] += 1
    basis2 = basis.with_degrees(new_deg)
    x0 = interpolate_to(saved, basis2)  # persistence warm start
    A2, b2, x2 = solve(basis2)
    err2 = float(l2_error(basis2, x2, u))
    assert err2 < 0.7 * err1, (err1, err2)
    # warm start is usable (finite, right shape) and close-ish to x2
    assert float(bv.norm(x0)) > 0


def test_checkpoint_roundtrip(tmp_path):
    from hpdg_tpu.blocks.persist import save_npz, load_npz
    m = hmesh.structured((3, 2))
    basis = DGBasis(m, np.array([1, 2, 3, 2, 1, 2]))
    x = api.interpolate(basis, lambda p: p[..., 0] * p[..., 1] + 1)
    saved = save_state(basis, x)
    path = str(tmp_path / "state.npz")
    save_npz(path, saved)
    loaded = load_npz(path)
    assert np.allclose(loaded.flat, saved.flat)
    assert tuple(loaded.basis.degrees) == tuple(basis.degrees)
    # usable for re-interpolation (on the reloaded mesh object)
    nb = loaded.basis.with_degrees(np.full(6, 3))
    xn = interpolate_to(loaded, nb)
    err = float(l2_error(nb, xn, lambda p: p[..., 0] * p[..., 1] + 1))
    assert err < 1e-12


def test_renew_hierarchy():
    from hpdg_tpu.solvers.multigrid import setup_hierarchy
    from hpdg_tpu.linalg import blockmatrix as bm
    import jax.numpy as jnp
    m = hmesh.structured((2, 2))
    basis = DGBasis(m, np.full(4, 4))
    A = api.laplace(basis, penalty=2.0, dirichlet=True)
    data = setup_hierarchy(basis, A)
    coarse_before = np.asarray(data.matrices[0].values[(1, 1)])
    # scale the fine matrix by 2 and renew: all levels must scale by 2
    A2 = bm.BlockSparseMatrix(A.pattern, A.dim,
                              {k: 2.0 * v for k, v in A.values.items()},
                              A.block_shape)
    data.renew(A2)
    coarse_after = np.asarray(data.matrices[0].values[(1, 1)])
    assert np.allclose(coarse_after, 2.0 * coarse_before, atol=1e-11)


def test_restrict_to_coarse():
    """Coarsening direction of persistence: children -> parent nodal
    interpolation; exact where the fine field is a polynomial that lives
    in the coarse space."""
    from hpdg_tpu.blocks.persist import restrict_to_coarse
    mc = hmesh.structured((2, 2))
    mf = hmesh.refine(mc)
    fine = DGBasis(mf, np.full(16, 2))
    f = lambda x: (x[..., 0] - 0.3) ** 2 + x[..., 0] * x[..., 1]
    x = api.interpolate(fine, f)
    saved = save_state(fine, x)
    coarse = DGBasis(mc, np.full(4, 2))
    xc = restrict_to_coarse(saved, coarse)
    assert float(l2_error(coarse, xc, f)) < 1e-12
    # mixed child degrees route correctly too
    fine2 = DGBasis(mf, np.array([1, 2, 3, 2] * 4))
    g = lambda x: x[..., 0] + 2 * x[..., 1]  # linear: in every space
    saved2 = save_state(fine2, api.interpolate(fine2, g))
    xc2 = restrict_to_coarse(saved2, coarse)
    assert float(l2_error(coarse, xc2, g)) < 1e-12


def test_restrict_to_coarse_partial_unrefine():
    """Mixed kept/merged coarsening (mesh.adaptive.unrefine) persists:
    kept elements get identity/degree-change transfer, merged groups the
    child-routed evaluation.  Regression for the former ValueError."""
    from hpdg_tpu.blocks.persist import restrict_to_coarse, save_state
    from hpdg_tpu.mesh.adaptive import unrefine

    m = hmesh.structured((2, 2))
    f = hmesh.refine(m)
    fine = DGBasis(f, np.array([2, 3, 2, 2] * 4))
    g = lambda x: (x[..., 0] - 0.4) ** 2 + 0.5 * x[..., 1] ** 2
    saved = save_state(fine, api.interpolate(fine, g))
    # merge back only the children of parents 0 and 3 -> 8 kept + 2 merged
    marks = np.isin(f.parent, [0, 3])
    c = unrefine(f, marks)
    assert c.n_elements == 10
    coarse = DGBasis(c, np.full(10, 2))
    xc = restrict_to_coarse(saved, coarse)
    assert float(l2_error(coarse, xc, g)) < 1e-12


def test_restrict_to_coarse_after_refine_local():
    """Inverse of a LOCAL refinement: unmarked (kept) fine elements map
    back to the original coarse elements by identity."""
    from hpdg_tpu.blocks.persist import restrict_to_coarse, save_state
    from hpdg_tpu.mesh.adaptive import refine_local

    m = hmesh.structured((2, 2))
    f = refine_local(m, np.array([True, False, False, True]))
    fine = DGBasis(f, np.full(f.n_elements, 2))
    g = lambda x: x[..., 0] * x[..., 1] + x[..., 1] ** 2
    saved = save_state(fine, api.interpolate(fine, g))
    coarse = DGBasis(m, np.array([2, 3, 2, 2]))  # degree change on a kept elem
    xc = restrict_to_coarse(saved, coarse)
    assert float(l2_error(coarse, xc, g)) < 1e-12
