"""Multi-chip hp Poisson: sharded mixed-degree SIPG + sharded hp-multigrid.

Runs on however many devices are visible (TPU pod slice or a virtual
CPU mesh).  To simulate 8 chips on CPU:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python examples/parallel_poisson.py --cells 16,8

Demonstrates: per-degree halo exchange (ppermute), padded per-shard
bucket layouts, V-cycle-preconditioned CG with psum reductions, and a
sharded-state checkpoint.
"""

import sys as _sys
import pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))

import os

import numpy as np
import jax

# honor an explicit JAX_PLATFORMS=cpu invocation even where a
# sitecustomize hook force-selects a TPU backend at interpreter start;
# an ambient (harness-wide) JAX_PLATFORMS=axon must NOT undo a host's
# deliberate platform choice (e.g. the test conftest pinning cpu)
if "cpu" in os.environ.get("JAX_PLATFORMS", "").split(","):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp

from hpdg_tpu import mesh as hmesh
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.assemble import l2_functional
from hpdg_tpu.parallel.hp import (build_hp_sharded_pmg, hp_pmg_pcg_solve,
                                  hp_norm)
from hpdg_tpu.utils import parse_cli


def main():
    cfg = parse_cli(help_text=__doc__)
    jax.config.update("jax_enable_x64", True)
    cells = tuple(int(c) for c in
                  str(cfg.get_path("cells", "16,8")).split(","))
    degs = [int(d) for d in str(cfg.get_path("degrees", "2,3")).split(",")]
    iters = cfg.get_path("iters", 25)
    ckpt = cfg.get_path("checkpoint", "")

    devices = jax.devices()
    ndev = len(devices)
    while cells[0] % ndev:
        ndev -= 1
    devices = devices[:ndev]
    print(f"devices: {ndev} x {devices[0].platform}")

    rng = np.random.default_rng(1887)
    n = int(np.prod(cells))
    degrees = rng.choice(degs, size=n)
    gbasis = DGBasis(hmesh.structured(cells), degrees)
    print(f"mesh {cells}, degrees {sorted(set(degrees.tolist()))}, "
          f"{gbasis.ndof} dofs")

    pmg = build_hp_sharded_pmg(cells, degrees, devices=devices,
                               penalty=2.0, dirichlet=True,
                               penalty_scaling="normal")
    fine = pmg.levels[-1]
    b = fine.scatter_global(
        l2_functional(gbasis, lambda x: jnp.ones_like(x[..., 0])), gbasis)
    x, rel = hp_pmg_pcg_solve(pmg, b, iters=iters)
    print(f"sharded MG-PCG: rel residual {float(rel):.2e} "
          f"after {iters} iterations; |x| = {float(hp_norm(x)):.6f}")

    if ckpt:
        from hpdg_tpu.utils.checkpoint import save_solver_state
        save_solver_state(ckpt, x, degrees, iteration=iters, cells=cells)
        print(f"checkpointed sharded state to {ckpt}")


if __name__ == "__main__":
    main()
