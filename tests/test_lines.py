"""Line-block smoothers (solvers/lines.py): exact block-Thomas solves
along element lines — the anisotropy-robust smoother class.

The reference reaches anisotropy robustness through sequential GS sweeps
in DUNE iterator order (dynamicblockgs.hh:94-126), which on a structured
grid is lexicographic-by-line; the TPU-native equivalent is a batched
block-tridiagonal factorization over all lines at once.
"""

import jax.numpy as jnp
import numpy as np

from hpdg_tpu import mesh as hmesh
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.assemble import assemble_laplace
from hpdg_tpu.linalg import blockmatrix as bm
from hpdg_tpu.linalg import blockvector as bv
from hpdg_tpu.solvers.lines import (build_lines, line_tridiag_factor,
                                    line_solve, line_jacobi_step)


def _dense_tridiag_part(A, basis, lines):
    """Dense matrix keeping only blocks (i, j) with i == j or i, j
    adjacent in the same line — the line-block-tridiagonal part M."""
    Ad = np.asarray(bm.to_dense(A, basis))
    keep = np.zeros_like(Ad, dtype=bool)
    off, bs = basis.offsets, basis.block_sizes

    def mark(i, j):
        keep[off[i]:off[i] + bs[i], off[j]:off[j] + bs[j]] = True

    for line in lines:
        seg = [int(e) for e in line if e >= 0]
        for k, e in enumerate(seg):
            mark(e, e)
            if k + 1 < len(seg):
                mark(e, seg[k + 1])
                mark(seg[k + 1], e)
    return np.where(keep, Ad, 0.0)


def test_line_tridiag_factor_exact_mixed_degrees():
    """Factored line solve == dense solve with the line-tridiagonal part
    of A, on a stretched mesh with MIXED degrees (hp padding path)."""
    rng = np.random.default_rng(3)
    mesh = hmesh.structured((6, 2))
    degrees = rng.choice([1, 2, 3], size=mesh.n_elements)
    basis = DGBasis(mesh, degrees)
    A = assemble_laplace(basis, penalty=6.0, dirichlet=True,
                         penalty_scaling="normal", dtype=jnp.float64)
    axis = 0  # 6x2 on the unit square: short extent along x
    lines = build_lines(mesh, axis)
    assert lines.shape == (2, 6)
    fac = line_tridiag_factor(A, basis, axis=axis)
    solve = line_solve(fac)

    r = bv.random(basis, seed=11)
    x = solve(r)

    T = _dense_tridiag_part(A, basis, lines)
    rf = np.asarray(bv.to_flat(basis, r))
    xf = np.asarray(bv.to_flat(basis, x))
    ref = np.linalg.solve(T, rf)
    assert np.max(np.abs(xf - ref)) < 1e-11 * max(1.0, np.abs(ref).max())


def test_line_precond_conditioning_beats_block_jacobi():
    """On 4:1-stretched cells the line-tridiagonal preconditioner cuts
    the condition number of the preconditioned operator by well over 2x
    vs element-block Jacobi — the spectral fact behind the measured MG
    rates (0.12 line vs 0.48 element-block Chebyshev, sharded config)."""
    mesh = hmesh.structured((8, 2))
    basis = DGBasis(mesh, np.full(mesh.n_elements, 2))
    A = assemble_laplace(basis, penalty=6.0, dirichlet=True,
                         penalty_scaling="normal", dtype=jnp.float64)
    Ad = np.asarray(bm.to_dense(A, basis))
    lines = build_lines(mesh, 0)
    T = _dense_tridiag_part(A, basis, lines)

    # block-diagonal part
    D = np.zeros_like(Ad)
    off, bs = basis.offsets, basis.block_sizes
    for e in range(mesh.n_elements):
        D[off[e]:off[e] + bs[e], off[e]:off[e] + bs[e]] = \
            Ad[off[e]:off[e] + bs[e], off[e]:off[e] + bs[e]]

    def cond(M):
        w = np.abs(np.linalg.eigvals(np.linalg.solve(M, Ad)))
        return w.max() / w.min()

    c_line, c_jac = cond(T), cond(D)
    assert c_line < 0.5 * c_jac, (c_line, c_jac)

    # and the factored jit solve agrees with the dense T on this config
    fac = line_tridiag_factor(A, basis, axis=0)
    solve = line_solve(fac)
    r = bv.random(basis, seed=5)
    xf = np.asarray(bv.to_flat(basis, solve(r)))
    ref = np.linalg.solve(T, np.asarray(bv.to_flat(basis, r)))
    assert np.max(np.abs(xf - ref)) < 1e-11 * np.abs(ref).max()


def test_line_jacobi_step_converges():
    """The damped line-Jacobi stationary iteration converges with the
    spectrally safe damping omega = 1/rho(M^-1 A)."""
    mesh = hmesh.structured((8, 2))
    basis = DGBasis(mesh, np.full(mesh.n_elements, 2))
    A = assemble_laplace(basis, penalty=6.0, dirichlet=True,
                         penalty_scaling="normal", dtype=jnp.float64)
    Ad = np.asarray(bm.to_dense(A, basis))
    T = _dense_tridiag_part(A, basis, build_lines(mesh, 0))
    rho = np.abs(np.linalg.eigvals(np.linalg.solve(T, Ad))).max()

    step = line_jacobi_step(A, basis, axis=0, omega=1.0 / rho)
    b = bv.random(basis, seed=5)
    x = bv.zeros_like(b)
    r0 = float(bv.norm(b))
    for _ in range(60):
        x = step(x, b)
    r1 = float(bv.norm(bv.sub(b, bm.matvec(A, x))))
    assert r1 / r0 < 5e-2, r1 / r0


def test_serial_multigrid_line_smoother_anisotropy():
    """Serial MG with smoother="line" fixes anisotropy WITHOUT a
    semicoarsened chain: plain p-hierarchy on 4:1-stretched cells runs at
    rate ~0.27 where colored block-GS smoothing degrades to ~0.63."""
    import jax
    from hpdg_tpu.assemble import l2_functional
    from hpdg_tpu.solvers.multigrid import multigrid_solver

    cells = (8, 2, 2)
    gb = DGBasis(hmesh.structured(cells), np.full(32, 2))
    kw = dict(penalty=6.0, dirichlet=True, penalty_scaling="normal")
    A = assemble_laplace(gb, **kw)
    b = l2_functional(
        gb, lambda x: 3 * jnp.pi**2 * jnp.sin(jnp.pi * x[..., 0])
        * jnp.sin(jnp.pi * x[..., 1]) * jnp.sin(jnp.pi * x[..., 2]))
    nb = float(bv.norm(b))

    def rate_of(**mg_kw):
        step, _ = multigrid_solver(gb, A, **mg_kw)
        js = jax.jit(step)
        x = bv.zeros_like(b)
        res = [1.0]
        for _ in range(10):
            x = js(x, b)
            res.append(float(bv.norm(bv.sub(b, bm.matvec(A, x)))) / nb)
        return (res[-1] / max(res[1], 1e-300)) ** (1.0 / 9)

    r_line = rate_of(smoother="line", jacobi_damping=1.0)
    r_gs = rate_of(smoother="gs")
    assert r_line < 0.35, r_line
    assert r_line < r_gs - 0.2, (r_line, r_gs)


def test_serial_multigrid_adi_line_smoother_two_axes():
    """Cells stretched along TWO axes: alternating-direction line sweeps
    (one exact line solve per short axis) reach rate ~0.34 where colored
    block-GS smoothing degrades to ~0.73."""
    import jax
    from hpdg_tpu.assemble import l2_functional
    from hpdg_tpu.solvers.multigrid import multigrid_solver

    cells = (8, 8, 2)  # extents (1/8, 1/8, 1/2): short axes {0, 1}
    gb = DGBasis(hmesh.structured(cells), np.full(int(np.prod(cells)), 2))
    kw = dict(penalty=6.0, dirichlet=True, penalty_scaling="normal")
    A = assemble_laplace(gb, **kw)
    b = l2_functional(
        gb, lambda x: 3 * jnp.pi**2 * jnp.sin(jnp.pi * x[..., 0])
        * jnp.sin(jnp.pi * x[..., 1]) * jnp.sin(jnp.pi * x[..., 2]))
    nb = float(bv.norm(b))

    def rate_of(**mg_kw):
        step, _ = multigrid_solver(gb, A, **mg_kw)
        js = jax.jit(step)
        x = bv.zeros_like(b)
        res = [1.0]
        for _ in range(10):
            x = js(x, b)
            res.append(float(bv.norm(bv.sub(b, bm.matvec(A, x)))) / nb)
        return (res[-1] / max(res[1], 1e-300)) ** (1.0 / 9)

    r_line = rate_of(smoother="line", jacobi_damping=1.0)
    r_gs = rate_of(smoother="gs")
    assert r_line < 0.45, r_line
    assert r_line < r_gs - 0.25, (r_line, r_gs)


def test_line_tridiag_factor_vector_blocks_exact():
    """Vector-valued (elasticity) line solve: on a single-line mesh the
    line-tridiagonal part IS the whole operator, so the factored solve
    must invert A exactly — mixed degrees exercise the hp padding with
    ncomp = dim component blocks."""
    from hpdg_tpu.assemble.elasticity import assemble_elasticity

    rng = np.random.default_rng(5)
    mesh = hmesh.structured((6, 1))
    degrees = rng.choice([1, 2], size=mesh.n_elements)
    basis = DGBasis(mesh, degrees)
    A = assemble_elasticity(basis, mu=1.0, lam=2.0, penalty=8.0,
                            dirichlet=True, penalty_scaling="normal",
                            dtype=jnp.float64)
    assert A.block_shape == (2, 2)
    fac = line_tridiag_factor(A, basis, axis=0)
    solve = line_solve(fac)

    r = {p: jnp.asarray(rng.standard_normal((v, 2 * (p + 1) ** 2)))
         for p, v in ((1, int(np.sum(degrees == 1))),
                      (2, int(np.sum(degrees == 2))))}
    r = {p: v for p, v in r.items() if v.shape[0] > 0}
    x = solve(r)
    Ax = bm.matvec(A, x)
    err = max(np.abs(np.asarray(Ax[p]) - np.asarray(r[p])).max()
              for p in r)
    assert err < 1e-10, err


def test_line_jacobi_vector_blocks_converges_anisotropic():
    """Damped line-Jacobi on STRETCHED-cell elasticity (1:8 aspect):
    lines along the strong-coupling axis give a convergent stationary
    iteration where element-block Jacobi needs far smaller damping."""
    from hpdg_tpu.assemble.elasticity import assemble_elasticity
    from hpdg_tpu.solvers.lines import line_jacobi_step

    mesh = hmesh.structured((8, 2), upper=(1.0, 0.03125))  # thin in y
    basis = DGBasis(mesh, np.full(mesh.n_elements, 2))
    A = assemble_elasticity(basis, mu=1.0, lam=1.0, penalty=8.0,
                            dirichlet=True, penalty_scaling="normal",
                            dtype=jnp.float64)
    rng = np.random.default_rng(9)
    b = {2: jnp.asarray(rng.standard_normal((mesh.n_elements, 2 * 9)))}
    # cells are 0.125 x 0.015625 (thin in y): the y-face penalty scales
    # as 1/h_y, so the STRONG coupling runs along axis 1 — solve those
    # chains exactly and relax across the weak x-coupling.
    step = line_jacobi_step(A, basis, axis=1, omega=0.9)
    x = {2: jnp.zeros_like(b[2])}
    r0 = float(bv.norm(bv.sub(b, bm.matvec(A, x))))
    for _ in range(40):
        x = step(x, b)
    r1 = float(bv.norm(bv.sub(b, bm.matvec(A, x))))
    assert r1 < 1e-3 * r0, (r0, r1)


def test_elasticity_multigrid_line_smoother_anisotropy():
    """End-to-end: hp-multigrid with smoother="line" solves STRETCHED
    -cell elasticity (vector blocks through the line factorization) —
    the system analog of the scalar anisotropy tests above."""
    from hpdg_tpu.assemble.elasticity import (assemble_elasticity,
                                              l2_functional_vec)
    from hpdg_tpu.blocks import api

    mesh = hmesh.structured((8, 4), upper=(1.0, 0.0625))  # 2:1 stretch
    basis = DGBasis(mesh, np.full(mesh.n_elements, 2))
    kw = dict(mu=1.0, lam=1.5, penalty=8.0, dirichlet=True,
              penalty_scaling="normal")
    A = assemble_elasticity(basis, dtype=jnp.float64, **kw)
    b = l2_functional_vec(basis, lambda x: jnp.stack(
        [jnp.sin(jnp.pi * x[..., 0]), jnp.cos(jnp.pi * x[..., 1])], -1))
    factory = lambda bas: assemble_elasticity(  # noqa: E731
        bas, dtype=jnp.float64, **kw)
    x, info = api.solve_linear(basis, A, b, tol=1e-9, maxiter=60,
                               operator_factory=factory, smoother="line")
    r = bv.sub(b, bm.matvec(A, x))
    assert float(bv.norm(r)) < 1e-8 * max(float(bv.norm(b)), 1.0)
