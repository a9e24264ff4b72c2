"""hp-multigrid: V-cycle convergence on the BASELINE ladder configs.

Mirrors test_solversetup.cc (15 iterations to tol 1e-8 on a small grid)
but with real convergence assertions.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from hpdg_tpu import mesh as hmesh
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.assemble import assemble_laplace, l2_functional
from hpdg_tpu.linalg import blockmatrix as bm, blockvector as bv
from hpdg_tpu.solvers.multigrid import multigrid_solver, setup_hierarchy
from hpdg_tpu.solvers.cg import loop_solve
from hpdg_tpu.estimators import l2_error


def f_rhs(x):
    return 2 * jnp.pi**2 * jnp.sin(jnp.pi * x[..., 0]) * jnp.sin(jnp.pi * x[..., 1])


def u_exact(x):
    return jnp.sin(jnp.pi * x[..., 0]) * jnp.sin(jnp.pi * x[..., 1])


def test_p_multigrid_uniform_p4():
    m = hmesh.structured((4, 4))
    basis = DGBasis(m, np.full(16, 4))
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True)
    step, data = multigrid_solver(basis, A)
    # hierarchy: degrees 4 -> 2 -> 1
    assert [b.max_degree() for b in data.bases] == [1, 2, 4]
    b = l2_functional(basis, f_rhs)
    x, info = loop_solve(step, bv.zeros(basis), b,
                         matvec_fn=lambda v: bm.matvec(A, v),
                         tol=1e-8, maxiter=30)
    assert info["iterations"] <= 15  # reference smoke test bound
    r = float(bv.norm(bv.sub(b, bm.matvec(A, x))))
    assert r < 1e-7 * float(bv.norm(b)) * 100


def test_hp_multigrid_mixed_degrees():
    m = hmesh.structured((4, 4))
    rng = np.random.default_rng(1887)
    basis = DGBasis(m, rng.integers(1, 5, 16))
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True)
    step, data = multigrid_solver(basis, A)
    b = l2_functional(basis, f_rhs)
    x, info = loop_solve(step, bv.zeros(basis), b,
                         matvec_fn=lambda v: bm.matvec(A, v),
                         tol=1e-8, maxiter=40)
    r = float(bv.norm(bv.sub(b, bm.matvec(A, x))))
    assert r < 1e-6


def test_hp_multigrid_with_h_levels():
    mc = hmesh.structured((2, 2))
    m1 = hmesh.refine(mc)
    m2 = hmesh.refine(m1)
    basis = DGBasis(m2, np.full(m2.n_elements, 2))
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True)
    step, data = multigrid_solver(basis, A, meshes=[mc, m1, m2])
    # levels: h(4x4@p1... coarsest 2x2@p1), then p: 8x8 p1, p2
    assert len(data.bases) == 4
    assert data.bases[0].mesh.n_elements == 4
    b = l2_functional(basis, f_rhs)
    x, info = loop_solve(step, bv.zeros(basis), b,
                         matvec_fn=lambda v: bm.matvec(A, v),
                         tol=1e-9, maxiter=30)
    r = float(bv.norm(bv.sub(b, bm.matvec(A, x))))
    assert r < 1e-7
    # and the solution is actually the PDE solution
    err = float(l2_error(basis, x, u_exact))
    assert err < 5e-3


def test_mg_vs_jacobi_smoother_variant():
    m = hmesh.structured((4, 4))
    basis = DGBasis(m, np.full(16, 2))
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True)
    b = l2_functional(basis, f_rhs)
    for smoother in ["gs", "jacobi"]:
        step, _ = multigrid_solver(basis, A, smoother=smoother)
        x, info = loop_solve(step, bv.zeros(basis), b,
                             matvec_fn=lambda v: bm.matvec(A, v),
                             tol=1e-8, maxiter=40)
        r = float(bv.norm(bv.sub(b, bm.matvec(A, x))))
        assert r < 1e-6, smoother


def test_mg_convergence_rate_is_h_independent():
    """With re-assembled (non-inherited) coarse operators the V-cycle is
    exactly h-independent; with Galerkin (inherited, the reference's
    renewMatrixHierachy) counts grow mildly per level — both behaviors
    are checked."""
    counts_fact, counts_gal = [], []
    for levels in [1, 2]:
        meshes = [hmesh.structured((2, 2))]
        for _ in range(levels):
            meshes.append(hmesh.refine(meshes[-1]))
        basis = DGBasis(meshes[-1], np.full(meshes[-1].n_elements, 2))
        A = assemble_laplace(basis, penalty=2.0, dirichlet=True)
        b = l2_functional(basis, f_rhs)
        factory = lambda bas: assemble_laplace(bas, penalty=2.0,  # noqa: E731
                                               dirichlet=True)
        for counts, kw in [(counts_fact, dict(operator_factory=factory)),
                           (counts_gal, {})]:
            step, _ = multigrid_solver(basis, A, meshes=meshes, **kw)
            x, info = loop_solve(step, bv.zeros(basis), b,
                                 matvec_fn=lambda v: bm.matvec(A, v),
                                 tol=1e-9, maxiter=60)
            counts.append(info["iterations"])
    assert counts_fact[1] <= counts_fact[0] + 1, counts_fact
    assert counts_gal[1] <= 2 * counts_gal[0], counts_gal


def test_chebyshev_smoothed_matrixfree_mg():
    """Fully matrix-free multigrid: sum-factorized applies + Chebyshev
    smoothing on block-Jacobi-preconditioned operators (no assembled
    matrices above the coarse level)."""
    from hpdg_tpu import matrixfree as mf
    from hpdg_tpu.solvers import smoothers as sm
    from hpdg_tpu.solvers.multigrid import Level, vcycle, dense_coarse_solver
    from hpdg_tpu.transfer import p_transfer
    from hpdg_tpu.assemble import build_plan

    m = hmesh.structured((4, 4))
    basis = DGBasis(m, np.full(16, 4))
    plan = build_plan(basis)
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True, plan=plan)
    b = l2_functional(basis, f_rhs)

    # build levels p=4 -> 2 -> 1, all operators matrix-free
    levels = []
    bases, transfers = [basis], []
    while bases[0].max_degree() > 1:
        T = p_transfer(bases[0], max(1, bases[0].max_degree() // 2))
        bases.insert(0, T.coarse)
        transfers.insert(0, T)
    ops, pcs = [], []
    for bas in bases:
        planl = build_plan(bas)
        op = mf.sipg_operator(bas, penalty=2.0, dirichlet=True, plan=planl)
        D = mf.sipg_diagonal_blocks(bas, penalty=2.0, dirichlet=True,
                                    plan=planl)
        Dinv = {p: jnp.asarray(np.linalg.inv(np.asarray(d))) for p, d in D.items()}
        pc = lambda r, Dinv=Dinv: sm.apply_blockdiag(Dinv, r)
        ops.append(op)
        pcs.append(pc)
    import jax.numpy as jnp2
    for l, bas in enumerate(bases):
        xl = bv.zeros(bas)
        rho = sm.estimate_rho(ops[l], pcs[l], xl)
        smooth = sm.chebyshev_smoother(ops[l], pcs[l], lmax=1.05 * rho,
                                       degree=3)
        restrict = prolong = None
        if l > 0:
            T = transfers[l - 1]
            restrict = (lambda TT: lambda r: TT.restrict(r))(T)
            prolong = (lambda TT: lambda c: TT.prolong(c))(T)
        levels.append(Level(apply=ops[l], pre_smooth=smooth,
                            post_smooth=smooth, restrict=restrict,
                            prolong=prolong, pre_steps=1, post_steps=1))
    # coarse: assembled dense solve at p=1
    Ac = assemble_laplace(bases[0], penalty=2.0, dirichlet=True)
    csolve = dense_coarse_solver(bases[0], Ac)
    x = bv.zeros(basis)
    for _ in range(25):
        x = vcycle(levels, csolve, x, b)
    r = float(bv.norm(bv.sub(b, bm.matvec(A, x))))
    assert r < 1e-8 * float(bv.norm(b)) * 100, r


def test_semicoarsened_anisotropic_multigrid():
    """Serial anisotropy robustness: semicoarsen the short axis at full p
    (h_first hierarchy) — rate ~0.15 where p-first degrades to ~0.6."""
    import jax
    from hpdg_tpu.mesh.adaptive import semicoarsen_chain
    cells = (8, 2, 2)
    meshes = semicoarsen_chain(hmesh.structured(cells))
    assert [m.n_elements for m in meshes] == [8, 16, 32]
    gb = DGBasis(meshes[-1], np.full(32, 2))
    kw = dict(penalty=6.0, dirichlet=True, penalty_scaling="normal")
    A = assemble_laplace(gb, **kw)
    fac = lambda bas: assemble_laplace(bas, **kw)
    b = l2_functional(
        gb, lambda x: 3 * jnp.pi**2 * jnp.sin(jnp.pi * x[..., 0])
        * jnp.sin(jnp.pi * x[..., 1]) * jnp.sin(jnp.pi * x[..., 2]))
    step, _ = multigrid_solver(gb, A, operator_factory=fac, meshes=meshes,
                               h_first=True)
    js = jax.jit(step)
    x = bv.zeros_like(b)
    nb = float(bv.norm(b))
    res = [1.0]
    for _ in range(10):
        x = js(x, b)
        res.append(float(bv.norm(bv.sub(b, bm.matvec(A, x)))) / nb)
    rate = (res[-1] / max(res[1], 1e-300)) ** (1.0 / 9)
    assert rate < 0.3, rate
