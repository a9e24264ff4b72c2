"""Round-2 gap closers: L1-projected smoother, weighted-heat diagonal
blocks, elasticity diagonal blocks, mixed-degree lexicographic GS,
coefficient diagonal blocks."""

import numpy as np
import jax
import jax.numpy as jnp

from hpdg_tpu import mesh as hmesh
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.assemble import assemble_laplace, assemble_mass, l2_functional
from hpdg_tpu.linalg import blockmatrix as bm, blockvector as bv
from hpdg_tpu.solvers import smoothers as sm


def _basis2d(degrees=(2, 1, 3, 2, 2, 1), cells=(3, 2)):
    m = hmesh.structured(cells)
    return DGBasis(m, np.array(degrees))


def test_mixed_degree_lexicographic_gs_matches_dense_sweep():
    """The parity smoother for hp cases: bit-exact variable-block-size
    sequential sweep (dynamicblockgs.hh:94-126)."""
    basis = _basis2d()
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True)
    b = l2_functional(basis, lambda x: 1.0 + x[..., 0])
    step = jax.jit(sm.lexicographic_block_gs_step(A, basis))

    # dense oracle: sequential block sweep in element order
    Ad = np.asarray(bm.to_dense(A, basis))
    bf = np.asarray(bv.to_flat(basis, b))
    off = basis.offsets
    sizes = [(int(p) + 1) ** 2 for p in basis.degrees]
    x = np.zeros_like(bf)
    for sweep in range(2):
        for e in range(basis.mesh.n_elements):
            i0, i1 = off[e], off[e] + sizes[e]
            r = bf[i0:i1] - Ad[i0:i1] @ x + Ad[i0:i1, i0:i1] @ x[i0:i1]
            x[i0:i1] = np.linalg.solve(Ad[i0:i1, i0:i1], r)
    xj = bv.zeros_like(b)
    for _ in range(2):
        xj = step(xj, b)
    xflat = np.asarray(bv.to_flat(basis, xj))
    assert np.abs(xflat - x).max() < 1e-12

    # reverse sweep differs from forward (sanity that the flag acts)
    stepr = jax.jit(sm.lexicographic_block_gs_step(A, basis, reverse=True))
    xr = stepr(bv.zeros_like(b), b)
    assert np.abs(np.asarray(bv.to_flat(basis, xr)) - x).max() > 1e-8


def test_l1_projected_smoother_converges_and_respects_bounds():
    """l1projected.hh analog: monotone, feasible, converges to the
    constrained solution on an obstacle problem."""
    basis = _basis2d(degrees=[2] * 16, cells=(4, 4))
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True)
    b = l2_functional(basis, lambda x: jnp.ones_like(x[..., 0]))
    lo = {p: jnp.full_like(v, -jnp.inf) for p, v in b.items()}
    up = {p: jnp.full_like(v, 0.012) for p, v in b.items()}
    # treat ALL off-diagonal couplings as ghost (worst-case shift)
    ghost = {}
    for (pr, pc), (rows, cols) in A.pattern.entries.items():
        re = basis.bucket_elems[pr][rows]
        ce = basis.bucket_elems[pc][cols]
        ghost[(pr, pc)] = np.where(re != ce)[0].astype(np.int32)
    shifts = sm.l1_shifts(A, ghost)
    step = jax.jit(sm.l1_projected_jacobi_step(A, shifts, lo, up))
    x = bv.zeros_like(b)
    en = []
    for _ in range(300):
        x = step(x, b)
        en.append(float(0.5 * bv.dot(x, bm.matvec(A, x)) - bv.dot(b, x)))
    assert all(float(jnp.max(x[p] - up[p])) <= 1e-14 for p in x)  # feasible
    assert all(e2 <= e1 + 1e-12 for e1, e2 in zip(en, en[1:]))  # monotone
    # converges toward the TNNMG solution (it is a smoother, not a
    # solver: the L1 shift makes it conservative, hence slow)
    from hpdg_tpu.blocks import api
    xt, _ = api.solve_obstacle(basis, A, b, lo, up, tol=1e-12, maxiter=200)
    assert float(bv.norm(bv.sub(x, xt))) < 1e-3


def test_weighted_heat_diagonal_blocks_match_assembled():
    from hpdg_tpu.matrixfree.jacobi import weighted_heat_diagonal_blocks
    basis = _basis2d()
    wfun = lambda x: 1.0 + x[..., 0] * x[..., 1]
    kfun = lambda x: 1.0 + 0.5 * x[..., 0]
    D = weighted_heat_diagonal_blocks(basis, weight=wfun, diffusion=kfun,
                                      penalty=2.0, mass_coef=0.7,
                                      dirichlet=True)
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True, diffusion=kfun)
    M = assemble_mass(basis, weight=wfun)
    Dref = bm.extract_diagonal(A)
    Mref = bm.extract_diagonal(M)
    for p in D:
        want = 0.7 * np.asarray(Mref[p]) + np.asarray(Dref[p])
        assert np.abs(np.asarray(D[p]) - want).max() < 1e-11, p


def test_coefficient_diagonal_blocks_match_assembled():
    from hpdg_tpu.matrixfree.diagonal import sipg_diagonal_blocks
    basis = _basis2d()
    kfun = lambda x: 1.0 + x[..., 1] ** 2
    D = sipg_diagonal_blocks(basis, penalty=1.5, dirichlet=True,
                             diffusion=kfun, penalty_scaling="normal")
    A = assemble_laplace(basis, penalty=1.5, dirichlet=True, diffusion=kfun,
                         penalty_scaling="normal")
    Dref = bm.extract_diagonal(A)
    for p in D:
        assert np.abs(np.asarray(D[p]) - np.asarray(Dref[p])).max() < 1e-11


def test_elasticity_diagonal_blocks_smooth():
    """Matrix-free block-Jacobi smoothing for elasticity via the
    diagonal-block factory (ROADMAP round-1 item 6)."""
    from hpdg_tpu.matrixfree.elasticity import (elasticity_operator,
                                                elasticity_diagonal_blocks)
    from hpdg_tpu.assemble.elasticity import (assemble_elasticity,
                                              l2_functional_vec)
    m = hmesh.structured((3, 3))
    basis = DGBasis(m, np.full(9, 2))
    kw = dict(mu=1.0, lam=1.0, penalty=6.0, dirichlet=True)
    A = assemble_elasticity(basis, **kw)
    D = elasticity_diagonal_blocks(basis, **kw)
    Dref = bm.extract_diagonal(A)
    for p in D:
        assert np.abs(np.asarray(D[p]) - np.asarray(Dref[p])).max() < 1e-12
    # matrix-free damped Jacobi with these blocks converges
    op = elasticity_operator(basis, **kw)
    Dinv = {p: jnp.asarray(np.linalg.inv(np.asarray(d))) for p, d in D.items()}
    force = lambda x: jnp.stack(
        [jnp.zeros_like(x[..., 0]), -jnp.ones_like(x[..., 0])], axis=-1)
    b = l2_functional_vec(basis, force)
    x = bv.zeros_like(b)
    nb = float(bv.norm(b))
    for _ in range(200):
        r = bv.sub(b, op(x))
        x = bv.axpy(0.5, sm.apply_blockdiag(Dinv, r), x)
    assert float(bv.norm(bv.sub(b, op(x)))) / nb < 0.05
