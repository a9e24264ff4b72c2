"""Poisson SIPG on a general (affine-element) domain.

First-class geometry demo: the same solver stack runs on a sheared
parallelogram domain (one global affine map) and on a twisted 3D column
(per-element affinized smooth map) — the reference's per-quad-point
jacobianInverseTransposed consumed as mesh data (mesh/geometry.py).

    python examples/affine_geometry.py --case shear --n 12 --p 2
    python examples/affine_geometry.py --case twist --n 6  --p 2
"""

import sys as _sys
import pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from hpdg_tpu import mesh
from hpdg_tpu.mesh import geometry as geo
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.assemble import assemble_laplace, l2_functional
from hpdg_tpu.linalg import blockmatrix as bm
from hpdg_tpu.solvers.cg import pcg
from hpdg_tpu.solvers import smoothers
from hpdg_tpu.utils import parse_cli


def main():
    cfg = parse_cli(help_text=__doc__)
    case = cfg.get_path("case", "shear")
    n = cfg.get_path("n", 12)
    p = cfg.get_path("p", 2)
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_platforms", "cpu")

    if case == "shear":
        S = np.array([[1.0, 0.5], [0.0, 1.0]])
        m = geo.affine_image(mesh.structured((n, n)), S)
    elif case == "twist":
        def phi(x):
            th = 0.6 * x[..., 2]
            c, s = np.cos(th), np.sin(th)
            return np.stack([c * x[..., 0] - s * x[..., 1],
                             s * x[..., 0] + c * x[..., 1],
                             x[..., 2]], -1)
        m = geo.affinize(mesh.structured((n, n, n)), phi)
    else:
        raise SystemExit(f"unknown --case {case}")

    basis = DGBasis(m, np.full(m.n_elements, p))
    A = assemble_laplace(basis, penalty=4.0, dirichlet=True,
                         penalty_scaling="normal")
    b = l2_functional(basis, lambda x: jnp.ones_like(x[..., 0]))
    M = smoothers.block_jacobi_preconditioner(A)
    x, info = pcg(lambda v: bm.matvec(A, v), b, precond=M, tol=1e-10,
                  maxiter=800)
    vol = float(np.sum(m.volumes))
    nb = float(np.sqrt(sum(float(jnp.vdot(v, v)) for v in b.values())))
    rel = float(info["residuals"][info["iterations"]]) / nb
    print(f"case={case}: {m.n_elements} affine elements, "
          f"domain volume {vol:.4f}, solved to rel residual "
          f"{rel:.2e} in {info['iterations']} PCG iterations")


if __name__ == "__main__":
    main()
