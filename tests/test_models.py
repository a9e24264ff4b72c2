"""Problem presets (the framework's model families) end-to-end."""

import numpy as np
import jax.numpy as jnp

from hpdg_tpu import mesh as hmesh
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.models import (PoissonProblem, HeatProblem, ElasticityProblem,
                             ObstacleProblem)
from hpdg_tpu.linalg import blockmatrix as bm, blockvector as bv
from hpdg_tpu.estimators import l2_error


def test_poisson_problem_preset():
    m = hmesh.structured((8, 8))
    basis = DGBasis(m, np.full(64, 2))
    prob = PoissonProblem(basis)
    u = lambda x: jnp.sin(jnp.pi * x[..., 0]) * jnp.sin(jnp.pi * x[..., 1])
    b = prob.rhs(lambda x: 2 * jnp.pi**2 * u(x))
    x, info = prob.solve(b, tol=1e-9)
    assert float(l2_error(basis, x, u)) < 1e-3
    # matrix-free operator agrees with the assembled one
    op = prob.operator()
    v = bv.random(basis)
    d = bv.sub(op(v), bm.matvec(prob.A, v))
    assert float(bv.norm(d)) < 1e-10


def test_heat_problem_preset():
    m = hmesh.structured((6, 6))
    basis = DGBasis(m, np.full(36, 2))
    prob = HeatProblem(basis, dt=0.01)
    from hpdg_tpu.blocks import api
    u = api.interpolate(basis, lambda x: jnp.exp(
        -30 * ((x[..., 0] - 0.5) ** 2 + (x[..., 1] - 0.5) ** 2)))
    e0 = float(bv.dot(u, bm.matvec(prob.M, u)))
    for _ in range(3):
        u, _ = prob.advance(u)
        e = float(bv.dot(u, bm.matvec(prob.M, u)))
        assert e <= e0 + 1e-12
        e0 = e


def test_elasticity_problem_preset():
    m = hmesh.structured((4, 4))
    basis = DGBasis(m, np.full(16, 2))
    prob = ElasticityProblem(basis, mu=1.0, lam=1.0, penalty=6.0)
    force = lambda x: jnp.stack([jnp.ones_like(x[..., 0]),
                                 jnp.zeros_like(x[..., 0])], axis=-1)
    b = prob.rhs(force)
    x, info = prob.solve(b, tol=1e-8)
    r = float(bv.norm(bv.sub(b, bm.matvec(prob.A, x))))
    assert r < 1e-6 * max(1.0, float(bv.norm(b)))


def test_obstacle_problem_preset():
    m = hmesh.structured((4, 4), lower=(-1, -1), upper=(1, 1))
    basis = DGBasis(m, np.full(16, 2))
    prob = ObstacleProblem(basis)
    from hpdg_tpu.blocks import api
    b = api.l2_functional(basis, lambda x: -8.0 + 0 * x[..., 0])
    x, info = prob.solve(b, lower=-0.2, tol=1e-9, maxiter=60)
    assert max(info["truncated"]) > 0
    for p in x:
        assert np.all(np.asarray(x[p]) >= -0.2 - 1e-9)


def test_poisson_problem_tensor_diffusion():
    """The Poisson preset carries TENSOR coefficients end-to-end
    (anisotropic medium / affine-geometry pullback)."""
    import jax.numpy as jnp
    from hpdg_tpu.assemble import pullback_diffusion
    S = np.array([[1.0, 0.4], [0.0, 1.0]])  # shear map
    m = hmesh.structured((6, 6))
    basis = DGBasis(m, np.full(36, 2))
    prob = PoissonProblem(basis, penalty=4.0, dirichlet=True,
                                 diffusion=pullback_diffusion(S))
    b = prob.rhs(lambda x: jnp.ones_like(x[..., 0]))
    x, info = prob.solve(b, tol=1e-10, maxiter=80)
    from hpdg_tpu.linalg import blockmatrix as bm, blockvector as bv
    r = bv.sub(b, bm.matvec(prob.A, x))
    assert float(bv.norm(r)) / float(bv.norm(b)) < 1e-8
    # matrix-free apply agrees with the assembled operator
    op = prob.operator()
    y1, y2 = op(x), bm.matvec(prob.A, x)
    err = max(np.abs(np.asarray(y1[p]) - np.asarray(y2[p])).max()
              for p in y1)
    assert err < 1e-11
