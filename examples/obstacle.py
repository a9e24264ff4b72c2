"""Membrane obstacle problem via TNNMG (BASELINE config 5 driver).

    python examples/obstacle.py --n 8 --p 2 --obstacle -0.15
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
from hpdg_tpu.utils import parse_cli


def main():
    cfg = parse_cli(help_text=__doc__)
    jax.config.update("jax_enable_x64", True)
    n, p = cfg.get_path("n", 8), cfg.get_path("p", 2)
    psi = cfg.get_path("obstacle", -0.15)

    m = mesh.structured((n, n), lower=(-1, -1), upper=(1, 1))
    basis = DGBasis(m, np.full(m.n_elements, p))
    A = api.laplace(basis, penalty=2.0, dirichlet=True)
    b = api.l2_functional(basis, lambda x: -8.0 + 0.0 * x[..., 0])
    lo, up = api.constant_bounds(basis, lower=psi)
    x, info = api.solve_obstacle(basis, A, b, lo, up, tol=1e-10, maxiter=80)
    print(f"TNNMG: {info['iterations']} iterations, "
          f"final correction {info['correction'][-1]:.2e}, "
          f"truncated dofs at convergence: {info['truncated'][-1]}")
    if cfg.get_path("vtu"):
        from hpdg_tpu.blocks.plot import write_vtu
        write_vtu(cfg.get_path("vtu"), basis, x)


if __name__ == "__main__":
    main()
