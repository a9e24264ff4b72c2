"""Problem presets: the framework's "model zoo".

The reference has no neural models — its model families are PDE problem
classes (SURVEY.md §1: Poisson/Laplace SIPG, coefficient diffusion, heat
blocks, elasticity, obstacle problems).  These dataclasses bundle the
assemble/solve pipeline for each family behind one call, mirroring the
BASELINE config ladder:

1. ``PoissonProblem``    — (weighted) SIPG Poisson, CG/MG solvers
2. ``HeatProblem``       — implicit Euler heat flow (M + dt A)
3. ``ElasticityProblem`` — linear elasticity hp-DG
4. ``ObstacleProblem``   — box-constrained membrane via TNNMG
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.assemble.plan import build_plan
from hpdg_tpu.linalg import blockmatrix as bm, blockvector as bv
from hpdg_tpu.blocks import api


@dataclass
class PoissonProblem:
    """-div(K grad u) = f with SIPG; BASELINE configs 1-3."""

    basis: DGBasis
    penalty: float = 2.0
    dirichlet: bool = True
    diffusion: object = None
    dtype: object = jnp.float64

    def __post_init__(self):
        self.plan = build_plan(self.basis)
        self.A = api.laplace(self.basis, penalty=self.penalty,
                             dirichlet=self.dirichlet,
                             diffusion=self.diffusion, plan=self.plan,
                             dtype=self.dtype)

    def rhs(self, f, g=None):
        b = api.l2_functional(self.basis, f, dtype=self.dtype)
        if g is not None:
            b = bv.add(b, api.dirichlet_data(self.basis, g,
                                             penalty=self.penalty,
                                             plan=self.plan,
                                             dtype=self.dtype))
        return b

    def solve(self, b, method: str = "multigrid", tol: float = 1e-8,
              maxiter: int = 100, **kw):
        return api.solve_linear(self.basis, self.A, b, tol=tol,
                                maxiter=maxiter, method=method,
                                dtype=self.dtype, **kw)

    def operator(self):
        """Matrix-free sum-factorized apply (config 2 production path)."""
        from hpdg_tpu.matrixfree import sipg_operator
        return sipg_operator(self.basis, penalty=self.penalty,
                             dirichlet=self.dirichlet,
                             diffusion=self.diffusion, plan=self.plan,
                             dtype=self.dtype)


@dataclass
class HeatProblem:
    """du/dt = div(grad u), implicit Euler: (M + dt A) u+ = M u."""

    basis: DGBasis
    dt: float
    penalty: float = 2.0
    dtype: object = jnp.float64

    def __post_init__(self):
        from hpdg_tpu.assemble import assemble_mass, assemble_laplace
        self.plan = build_plan(self.basis)
        self.A = assemble_laplace(self.basis, penalty=self.penalty,
                                  dirichlet=True, plan=self.plan,
                                  dtype=self.dtype)
        self.M = assemble_mass(self.basis, plan=self.plan, dtype=self.dtype)
        self.S = bm.add_scaled(self.M, self.A, self.dt)
        from hpdg_tpu.solvers.multigrid import multigrid_solver
        self._step, _ = multigrid_solver(self.basis, self.S,
                                         dtype=self.dtype)

    def advance(self, u, tol: float = 1e-10, maxiter: int = 40):
        from hpdg_tpu.solvers.cg import loop_solve
        rhs = bm.matvec(self.M, u)
        u, info = loop_solve(self._step, u, rhs,
                             matvec_fn=lambda v: bm.matvec(self.S, v),
                             tol=tol, maxiter=maxiter)
        return u, info


@dataclass
class ElasticityProblem:
    """Linear elasticity hp-DG (BASELINE config 4)."""

    basis: DGBasis
    mu: float = 1.0
    lam: float = 1.0
    penalty: float = 8.0
    dirichlet: bool = True
    dtype: object = jnp.float64

    def __post_init__(self):
        from hpdg_tpu.assemble.elasticity import assemble_elasticity
        self.plan = build_plan(self.basis)
        self.A = assemble_elasticity(self.basis, mu=self.mu, lam=self.lam,
                                     penalty=self.penalty,
                                     dirichlet=self.dirichlet,
                                     plan=self.plan, dtype=self.dtype)

    def rhs(self, force):
        from hpdg_tpu.assemble.elasticity import l2_functional_vec
        return l2_functional_vec(self.basis, force, dtype=self.dtype)

    def solve(self, b, tol: float = 1e-8, maxiter: int = 60, meshes=None):
        from hpdg_tpu.assemble.elasticity import assemble_elasticity
        factory = lambda bas: assemble_elasticity(  # noqa: E731
            bas, mu=self.mu, lam=self.lam, penalty=self.penalty,
            dirichlet=self.dirichlet, dtype=self.dtype)
        return api.solve_linear(self.basis, self.A, b, tol=tol,
                                maxiter=maxiter, meshes=meshes,
                                operator_factory=factory,
                                pre_steps=5, post_steps=5,
                                dtype=self.dtype)


@dataclass
class ObstacleProblem:
    """min 1/2 u^T A u - b^T u  s.t.  lo <= u <= up (BASELINE config 5)."""

    basis: DGBasis
    penalty: float = 2.0
    dtype: object = jnp.float64

    def __post_init__(self):
        self.plan = build_plan(self.basis)
        self.A = api.laplace(self.basis, penalty=self.penalty,
                             dirichlet=True, plan=self.plan,
                             dtype=self.dtype)

    def solve(self, b, lower=-np.inf, upper=np.inf, tol: float = 1e-9,
              maxiter: int = 100):
        lo, up = api.constant_bounds(self.basis, lower=lower, upper=upper,
                                     dtype=self.dtype)
        return api.solve_obstacle(self.basis, self.A, b, lo, up, tol=tol,
                                  maxiter=maxiter)
