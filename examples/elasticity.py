"""3D linear elasticity hp-DG with h+p multigrid (BASELINE config 4).

    python examples/elasticity.py --n 2 --levels 1 --p 2
"""

import sys as _sys
import pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from hpdg_tpu import mesh
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.models import ElasticityProblem
from hpdg_tpu.linalg import blockmatrix as bm, blockvector as bv
from hpdg_tpu.utils import parse_cli


def main():
    cfg = parse_cli(help_text=__doc__)
    jax.config.update("jax_enable_x64", True)
    n = cfg.get_path("n", 2)
    levels = cfg.get_path("levels", 1)
    p = cfg.get_path("p", 2)

    meshes = mesh.hierarchy(mesh.structured((n, n, n)), levels)
    basis = DGBasis(meshes[-1], np.full(meshes[-1].n_elements, p))
    prob = ElasticityProblem(basis, mu=1.0, lam=1.0, penalty=4.0)

    def force(x):
        f0 = 3 * jnp.pi**2 * (jnp.sin(jnp.pi * x[..., 0])
                              * jnp.sin(jnp.pi * x[..., 1])
                              * jnp.sin(jnp.pi * x[..., 2]))
        z = jnp.zeros_like(f0)
        return jnp.stack([f0, z, z], axis=-1)

    b = prob.rhs(force)
    x, info = prob.solve(b, tol=1e-8, meshes=meshes)
    r = float(bv.norm(bv.sub(b, bm.matvec(prob.A, x))))
    print(f"elasticity: {3 * basis.ndof} dofs, {info['iterations']} V-cycles, "
          f"residual {r:.2e}")


if __name__ == "__main__":
    main()
