"""Anisotropic diffusion on stretched cells: line-smoothed multigrid.

On meshes with stretched elements (or strongly anisotropic media) the
strong coupling runs along one axis; element-block smoothers leave the
along-line error modes undamped and multigrid degrades.  This example
solves 3D SIPG Poisson on 4:1-stretched cells twice — element-block
smoothing vs line smoothing (exact batched block-Thomas solves along
the short axis) — and prints both convergence histories.

Serial:

    JAX_PLATFORMS=cpu python examples/anisotropic_line_mg.py

Sharded over visible devices (lines kept whole by an auto-chosen
device grid orthogonal to the line axis):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python examples/anisotropic_line_mg.py --sharded 1 --cells 16,8,8
"""

import sys as _sys
import pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))

import os

import numpy as np
import jax

# only an explicit cpu request overrides the configured platform (an
# ambient JAX_PLATFORMS=axon must not undo the conftest's cpu pin)
if "cpu" in os.environ.get("JAX_PLATFORMS", "").split(","):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp

from hpdg_tpu import mesh as hmesh
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.assemble import assemble_laplace, l2_functional
from hpdg_tpu.linalg import blockmatrix as bm, blockvector as bv
from hpdg_tpu.utils import parse_cli

KW = dict(penalty=6.0, dirichlet=True, penalty_scaling="normal")


def rhs(basis):
    return l2_functional(
        basis, lambda x: 3 * jnp.pi**2 * jnp.sin(jnp.pi * x[..., 0])
        * jnp.sin(jnp.pi * x[..., 1]) * jnp.sin(jnp.pi * x[..., 2]))


def run_serial(cells, p, cycles):
    from hpdg_tpu.solvers.multigrid import multigrid_solver
    basis = DGBasis(hmesh.structured(cells), np.full(int(np.prod(cells)), p))
    A = assemble_laplace(basis, **KW)
    b = rhs(basis)
    nb = float(bv.norm(b))
    for smoother, damp in [("gs", 1.0), ("line", 1.0)]:
        step, _ = multigrid_solver(basis, A, smoother=smoother,
                                   jacobi_damping=damp)
        js = jax.jit(step)
        x = bv.zeros_like(b)
        hist = []
        for _ in range(cycles):
            x = js(x, b)
            hist.append(float(bv.norm(bv.sub(b, bm.matvec(A, x)))) / nb)
        rate = (hist[-1] / hist[0]) ** (1.0 / (len(hist) - 1))
        print(f"serial {smoother:>4}: rate/cycle {rate:.3f}  "
              f"history {['%.1e' % h for h in hist]}")


def run_sharded(cells, p, cycles):
    from hpdg_tpu.parallel.hp import build_hp_sharded_hmg, hp_norm
    n = int(np.prod(cells))
    # semicoarsen the stretched (line) axis down to isotropy
    lax = int(np.argmax(cells))
    chain = [cells]
    while chain[0][lax] > 2 * min(cells):
        c = list(chain[0])
        c[lax] //= 2
        chain.insert(0, tuple(c))
    gbasis = DGBasis(hmesh.structured(cells), np.full(n, p))
    b_dict = rhs(gbasis)
    for smoother in ("cheb", "line"):
        pmg = build_hp_sharded_hmg(cells, np.full(n, p), cells_chain=chain,
                                   h_first=True, smoother=smoother,
                                   dtype=jnp.float64, **KW)
        fine = pmg.levels[-1]
        print(f"sharded {smoother:>4}: device grid "
              f"{fine.device_mesh.devices.shape}")
        b = fine.scatter_global(b_dict, gbasis)
        step = jax.jit(pmg.step)
        x = jax.tree.map(jnp.zeros_like, b)
        nb = float(hp_norm(b))
        hist = []
        for _ in range(cycles):
            x = step(x, b)
            r = {q: b[q] - v for q, v in fine.apply(x).items()}
            hist.append(float(hp_norm(r)) / nb)
        rate = (hist[-1] / hist[0]) ** (1.0 / (len(hist) - 1))
        print(f"sharded {smoother:>4}: rate/cycle {rate:.3f}  "
              f"history {['%.1e' % h for h in hist]}")


def main():
    cfg = parse_cli(help_text=__doc__)
    jax.config.update("jax_enable_x64", True)
    cells = tuple(int(c) for c in
                  str(cfg.get_path("cells", "8,2,2")).split(","))
    p = int(cfg.get_path("p", 2))
    cycles = int(cfg.get_path("cycles", 8))
    if int(cfg.get_path("sharded", 0)):
        run_sharded(cells, p, cycles)
    else:
        run_serial(cells, p, cycles)


if __name__ == "__main__":
    main()
