"""Poisson SIPG on a genuinely CURVED (trilinear Q1) domain.

Isoparametric geometry demo: an annulus quarter is meshed by mapping a
structured lattice through polar coordinates and sampling the map at
the element corners (`geometry.isoparametric`) — every operator then
consumes the resulting per-quad-point Jacobians, the full analog of the
reference's jacobianInverseTransposed
(gausslobattoipdgassembler.hh:337-350).  A manufactured solution shows
the convergence rate under uniform refinement; the coarse map restricts
exactly to the children, so the refined geometry stays conforming.

    python examples/curved_geometry.py --n 6 --p 2 --levels 2
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
from hpdg_tpu.assemble import assemble_laplace, l2_functional, dirichlet_rhs
from hpdg_tpu.linalg import blockmatrix as bm
from hpdg_tpu.linalg.blockvector import to_flat
from hpdg_tpu.solvers.cg import pcg
from hpdg_tpu.solvers import smoothers
from hpdg_tpu.utils import parse_cli


def annulus(x):
    """Map the unit square to the annulus quarter r in [1, 2]."""
    x = np.asarray(x, np.float64)
    r = 1.0 + x[..., 0]
    th = 0.5 * np.pi * x[..., 1]
    return np.stack([r * np.cos(th), r * np.sin(th)], -1)


def uex_np(x):
    return np.sin(np.pi * x[..., 0]) * np.sin(np.pi * x[..., 1])


def main():
    cfg = parse_cli(help_text=__doc__)
    n = cfg.get_path("n", 6)
    p = cfg.get_path("p", 2)
    levels = cfg.get_path("levels", 2)
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_platforms", "cpu")

    mp = mesh.structured((n, n))  # parametric lattice
    errs = []
    for lvl in range(levels):
        if lvl:
            mp = mesh.refine(mp)
        # re-sample the map on each (uniformly refined, conforming)
        # level: the geometry converges with the mesh.  On hierarchies
        # with hanging nodes, refine the isoparametric mesh instead —
        # children restrict the parent map exactly, keeping nc
        # interfaces geometrically conforming.
        m = geo.isoparametric(mp, annulus)
        basis = DGBasis(m, np.full(m.n_elements, p))
        A = assemble_laplace(basis, penalty=4.0, dirichlet=True,
                             penalty_scaling="normal")
        f = lambda x: (2 * jnp.pi ** 2  # noqa: E731
                       * jnp.sin(jnp.pi * x[..., 0])
                       * jnp.sin(jnp.pi * x[..., 1]))
        b = l2_functional(basis, f, quad_order=2 * p + 4)
        bd = dirichlet_rhs(basis,
                           lambda x: jnp.sin(jnp.pi * x[..., 0])
                           * jnp.sin(jnp.pi * x[..., 1]),
                           penalty=4.0, penalty_scaling="normal")
        b = {q: b[q] + bd[q] for q in b}
        M = smoothers.block_jacobi_preconditioner(A)
        x, info = pcg(lambda v: bm.matvec(A, v), b, precond=M,
                      tol=1e-12, maxiter=4000)
        # nodal L2-ish error against the exact solution
        from hpdg_tpu.basis import lagrange, tensor as btensor
        nodes = lagrange.nodes_1d(p, basis.family)
        mi = btensor.multiindices(p, 2)
        xg = (m.lower[:, None, :]
              + nodes[mi][None] * m.extent[:, None, :])
        xph = geo.apply_map(m, np.arange(m.n_elements), xg)
        vals = np.asarray(to_flat(basis, x)).reshape(m.n_elements, -1)
        err = float(np.sqrt(((vals - uex_np(xph)) ** 2).mean()))
        errs.append(err)
        vol = float(m.volumes.sum())
        print(f"level {lvl}: {m.n_elements} curved elements, "
              f"volume {vol:.6f} (exact {3 * np.pi / 4:.6f}), "
              f"nodal err {err:.3e}"
              + (f", ratio {errs[-2] / err:.1f}x" if lvl else ""))


if __name__ == "__main__":
    main()
