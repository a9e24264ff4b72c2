"""Generate golden regression artifacts for the BASELINE config ladder.

BASELINE.md: "baseline numbers must be generated ... record golden
artifacts (assembled operator entries, residual histories)".  The DUNE
reference cannot be built in this environment, so the goldens are pinned
from this framework's oracle-verified implementation (f64, CPU): any
future refactor that changes operators or solver behavior beyond
tolerance trips the comparison test.

Run:  python tests/make_golden.py   (writes tests/golden.npz)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from hpdg_tpu import mesh as hmesh  # noqa: E402
from hpdg_tpu.basis.dgbasis import DGBasis  # noqa: E402
from hpdg_tpu.blocks import api  # noqa: E402
from hpdg_tpu.linalg import blockmatrix as bm, blockvector as bv  # noqa: E402
from hpdg_tpu.solvers.cg import loop_solve  # noqa: E402
from hpdg_tpu.solvers.multigrid import multigrid_solver  # noqa: E402


def f2(x):
    return 2 * jnp.pi**2 * jnp.sin(jnp.pi * x[..., 0]) * jnp.sin(jnp.pi * x[..., 1])


def f3(x):
    return (3 * jnp.pi**2 * jnp.sin(jnp.pi * x[..., 0])
            * jnp.sin(jnp.pi * x[..., 1]) * jnp.sin(jnp.pi * x[..., 2]))


def make():
    out = {}

    # config 1: 2D Poisson p=2 uniform — operator fingerprint + CG history
    m = hmesh.structured((4, 4))
    basis = DGBasis(m, np.full(16, 2))
    A = api.laplace(basis, penalty=2.0, dirichlet=True)
    Ad = bm.to_dense(A, basis)
    out["c1_fro"] = np.linalg.norm(Ad)
    out["c1_diag"] = np.diag(Ad)[:32].copy()
    w = np.linalg.eigvalsh(0.5 * (Ad + Ad.T))
    out["c1_eigs"] = np.array([w.min(), w.max()])

    # config 1 solver: MG residual history (energy-norm corrections)
    b = api.l2_functional(basis, f2)
    step, _ = multigrid_solver(basis, A)
    x, info = loop_solve(step, bv.zeros(basis), b,
                         matvec_fn=lambda v: bm.matvec(A, v),
                         tol=1e-9, maxiter=25)
    out["c1_history"] = np.asarray(info["history"])

    # config 2: 3D p=4 hex — operator fingerprint (small mesh)
    m3 = hmesh.structured((2, 2, 2))
    b3 = DGBasis(m3, np.full(8, 4))
    A3 = api.laplace(b3, penalty=2.0, dirichlet=True)
    A3d = bm.to_dense(A3, b3)
    out["c2_fro"] = np.linalg.norm(A3d)
    out["c2_row0"] = A3d[0, :64].copy()

    # config 3: hp L-shape — mixed-degree fingerprint
    ml = hmesh.lshape(2)
    rng = np.random.default_rng(1887)
    bl = DGBasis(ml, rng.integers(1, 7, ml.n_elements))
    Al = api.laplace(bl, penalty=2.0, dirichlet=True)
    out["c3_fro"] = np.linalg.norm(bm.to_dense(Al, bl))
    out["c3_degrees"] = bl.degrees.copy()

    # config 4: elasticity fingerprint
    from hpdg_tpu.assemble.elasticity import assemble_elasticity
    me = hmesh.structured((2, 2, 2))
    be = DGBasis(me, np.full(8, 2))
    Ae = assemble_elasticity(be, mu=1.0, lam=1.0, penalty=4.0,
                             dirichlet=True)
    out["c4_fro"] = np.linalg.norm(bm.to_dense(Ae, be))

    # config 5: obstacle — TNNMG energy history
    mo = hmesh.structured((4, 4), lower=(-1, -1), upper=(1, 1))
    bo = DGBasis(mo, np.full(16, 2))
    Ao = api.laplace(bo, penalty=2.0, dirichlet=True)
    bb = api.l2_functional(bo, lambda x: -8.0 + 0.0 * x[..., 0])
    lo, up = api.constant_bounds(bo, lower=-0.2)
    xo, infoo = api.solve_obstacle(bo, Ao, bb, lo, up, tol=1e-10, maxiter=40)
    out["c5_energy"] = np.asarray(infoo["energy"])
    out["c5_final"] = bv.to_flat(bo, xo)

    np.savez(os.path.join(os.path.dirname(__file__), "golden.npz"), **out)
    print("wrote golden.npz with", sorted(out))


if __name__ == "__main__":
    make()
