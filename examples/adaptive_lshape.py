"""hp-adaptive L-shape Poisson (BASELINE config 3 style driver).

Solve -> estimate (DG-norm of hierarchic surrogate) -> Dörfler-mark ->
hp decision (smoothness indicator: raise p where smooth, refine h where
rough) -> persist -> repeat.

    python examples/adaptive_lshape.py --steps 4 --frac 0.4
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
from hpdg_tpu.mesh.adaptive import refine_local
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.blocks import api
from hpdg_tpu.blocks.persist import save_state, interpolate_to, \
    degrees_after_refine
from hpdg_tpu.estimators.utility import mark_fraction
from hpdg_tpu.estimators.smoothness import smoothness_indicator
from hpdg_tpu.utils import parse_cli


def main():
    cfg = parse_cli(help_text=__doc__)
    jax.config.update("jax_enable_x64", True)
    steps = cfg.get_path("steps", 4)
    frac = cfg.get_path("frac", 0.4)
    smooth_cut = cfg.get_path("smooth_cut", 0.5)

    m = mesh.lshape(cfg.get_path("n", 2))
    basis = DGBasis(m, np.full(m.n_elements, 1))
    f = lambda x: 1.0 + 0.0 * x[..., 0]  # noqa: E731

    for it in range(steps):
        A = api.laplace(basis, penalty=2.0, dirichlet=True)
        b = api.l2_functional(basis, f)
        x, info = api.solve_linear(basis, A, b, tol=1e-9, maxiter=80)
        from hpdg_tpu.matrixfree.norms import jump_indicator
        eta = np.asarray(jump_indicator(basis, penalty=2.0)(x))
        total = float(np.sqrt(eta.sum()))
        print(f"step {it}: {basis.ndof} dofs, max p = {basis.max_degree()}, "
              f"eta = {total:.4e}, iters = {info['iterations']}")
        marks = mark_fraction(eta, frac)
        smooth = smoothness_indicator(basis, x)
        raise_p = marks & (smooth < smooth_cut)
        refine_h = marks & ~raise_p
        saved = save_state(basis, x)
        new_deg = basis.degrees.copy()
        new_deg[raise_p] += 1
        if refine_h.any():
            newmesh = refine_local(basis.mesh, refine_h)
            new_deg = degrees_after_refine(new_deg, newmesh)
            basis = DGBasis(newmesh, new_deg)
        else:
            basis = basis.with_degrees(new_deg)
        _ = interpolate_to(saved, basis)  # warm start available


if __name__ == "__main__":
    main()
