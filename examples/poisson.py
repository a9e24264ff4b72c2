"""Poisson SIPG with hp-multigrid, 2D or 3D.

    python examples/poisson.py --dim 2 --n 16 --p 3 --tol 1e-8 \
        --vtu out.vtu
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
from hpdg_tpu.blocks.plot import write_vtu
from hpdg_tpu.estimators import l2_error
from hpdg_tpu.utils import parse_cli


def main():
    cfg = parse_cli(help_text=__doc__)
    dim = cfg.get_path("dim", 2)
    n = cfg.get_path("n", 16)
    p = cfg.get_path("p", 2)
    tol = cfg.get_path("tol", 1e-8)
    jax.config.update("jax_enable_x64", cfg.get_path("x64", True))

    m = mesh.structured((n,) * dim)
    basis = DGBasis(m, np.full(m.n_elements, p))

    def u(x):
        out = 1.0
        for a in range(dim):
            out = out * jnp.sin(jnp.pi * x[..., a])
        return out

    f = lambda x: dim * jnp.pi**2 * u(x)  # noqa: E731
    A = api.laplace(basis, penalty=2.0, dirichlet=True)
    b = api.l2_functional(basis, f)
    x, info = api.solve_linear(basis, A, b, tol=tol, maxiter=100)
    print(f"solved in {info['iterations']} V-cycles; "
          f"L2 error = {float(l2_error(basis, x, u)):.3e}")
    if cfg.get_path("vtu"):
        write_vtu(cfg.get_path("vtu"), basis, x)
        print("wrote", cfg.get_path("vtu"))


if __name__ == "__main__":
    main()
