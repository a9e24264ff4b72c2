"""Implicit-Euler heat equation with hp-multigrid per step.

The heat-operator blocks (mass + dt * stiffness) are the reference's
HeatDiagonalBlock use case (matrix-free/localoperators/heatdiagonalblock.hh);
here the full implicit system (M + dt A) is solved with multigrid each
step.

    python examples/heat.py --n 16 --p 2 --dt 0.01 --steps 10
"""

import sys as _sys
import pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax

# honor an explicit JAX_PLATFORMS=cpu invocation even where a
# sitecustomize hook pre-selects a TPU tunnel backend; an ambient
# (harness-wide) JAX_PLATFORMS=axon must NOT undo a host's deliberate
# platform choice (e.g. the test conftest pinning cpu)
import os as _os
_plat = _os.environ.get("JAX_PLATFORMS", "")
if "cpu" in _plat.split(","):
    jax.config.update("jax_platforms", _plat)
import jax.numpy as jnp

from hpdg_tpu import mesh
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.blocks import api
from hpdg_tpu.assemble import assemble_mass, assemble_laplace, build_plan
from hpdg_tpu.linalg import blockmatrix as bm, blockvector as bv
from hpdg_tpu.utils import parse_cli


def main():
    cfg = parse_cli(help_text=__doc__)
    jax.config.update("jax_enable_x64", True)
    n, p = cfg.get_path("n", 16), cfg.get_path("p", 2)
    dt, steps = cfg.get_path("dt", 0.01), cfg.get_path("steps", 10)

    m = mesh.structured((n, n))
    basis = DGBasis(m, np.full(m.n_elements, p))
    plan = build_plan(basis)
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True, plan=plan)
    M = assemble_mass(basis, plan=plan)  # skeleton pattern -> addable
    # implicit Euler system: (M + dt A) u_{k+1} = M u_k
    S = bm.add_scaled(M, A, dt)
    u0 = api.interpolate(basis, lambda x: jnp.exp(
        -50 * ((x[..., 0] - 0.5) ** 2 + (x[..., 1] - 0.5) ** 2)))

    from hpdg_tpu.solvers.multigrid import multigrid_solver
    from hpdg_tpu.solvers.cg import loop_solve
    step_mg, _ = multigrid_solver(basis, S)
    u = u0
    mass_op = lambda v: bm.matvec(M, v)  # noqa: E731
    energy0 = float(bv.dot(u, mass_op(u)))
    for k in range(steps):
        rhs = mass_op(u)
        u, info = loop_solve(step_mg, u, rhs,
                             matvec_fn=lambda v: bm.matvec(S, v),
                             tol=1e-10, maxiter=40)
        l2sq = float(bv.dot(u, mass_op(u)))
        print(f"t={dt*(k+1):.3f}: ||u||_M^2 = {l2sq:.6f} "
              f"(mg iters {info['iterations']})")
        assert l2sq <= energy0 + 1e-10, "heat flow must dissipate"


if __name__ == "__main__":
    main()
