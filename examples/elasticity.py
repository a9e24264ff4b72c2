"""3D linear elasticity hp-DG with h+p multigrid (BASELINE config 4).

    python examples/elasticity.py --n 2 --levels 1 --p 2
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

    if cfg.get_path("sharded", 0):
        # multi-chip: curved-domain elasticity, p-MG V-cycle-PCG over all
        # devices (per-shard geometry tables through one SPMD program)
        from hpdg_tpu.mesh import geometry as geo
        from hpdg_tpu.parallel.elasticity import (
            build_sharded_elasticity_pmg, elasticity_pmg_pcg_solve)
        ndev = len(jax.devices())
        cells = (2 * ndev, 4)

        def wavy(xx):
            xx = np.asarray(xx, np.float64)
            return np.stack(
                [xx[..., 0] + 0.06 * np.sin(np.pi * xx[..., 1]),
                 xx[..., 1] + 0.05 * np.sin(np.pi * xx[..., 0] / 2)], -1)

        gm = geo.isoparametric(mesh.structured(cells), wavy)
        pmg = build_sharded_elasticity_pmg(
            cells, 2, mu=1.0, lam=1.5, penalty=8.0, dirichlet=True,
            penalty_scaling="normal", gmesh=gm)
        fine = pmg.levels[-1]
        rng = np.random.default_rng(0)
        bsh = jax.device_put(
            jnp.asarray(rng.standard_normal((fine.n_global, fine.bs))),
            fine.sharding)
        xs, rel = elasticity_pmg_pcg_solve(pmg, bsh, iters=25)
        print(f"sharded curved elasticity: {ndev} devices, "
              f"{fine.n_global * fine.bs} dofs, rel residual {float(rel):.2e}")


if __name__ == "__main__":
    main()
