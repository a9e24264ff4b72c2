"""Unstructured (non-lattice) hex import + continuous Q_k solve.

Builds an annulus ring of trapezoidal cells — CYCLIC connectivity that
no lattice ordering can express — imports it through
``geometry.from_cell_vertices`` (face matching + BFS parametric frame
assignment; native C++ matcher when available), then solves Poisson on
it twice:

1. in the continuous Gauss-Lobatto Q_k space (``basis.cgbasis`` +
   ``assemble.cg``: matrix-free gather -> sum-factorized bulk apply ->
   scatter, CG iteration), and
2. in the DG-Q_k SIPG space (the usual pipeline),

and reports both solutions' agreement at the shared GL nodes.
Reference path this mirrors: UGGrid + QkGLNodalBasis /
DynamicDGQkGLBasis (qkglnodalbasis.hh, dynamicdgqkglbasis.hh).

    JAX_PLATFORMS=cpu python examples/unstructured_cg.py
"""

import sys as _sys
import pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax

import os as _os
_plat = _os.environ.get("JAX_PLATFORMS", "")
if "cpu" in _plat.split(","):
    jax.config.update("jax_platforms", _plat)
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from hpdg_tpu.mesh.geometry import from_cell_vertices
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.basis.cgbasis import cg_basis
from hpdg_tpu.assemble.cg import cg_laplace_operator, cg_l2_functional
from hpdg_tpu.blocks import api
from hpdg_tpu.linalg import blockvector as bv


def annulus(nseg=16, r0=1.0, r1=2.0):
    th = np.linspace(0.0, 2 * np.pi, nseg, endpoint=False)
    inner = np.stack([r0 * np.cos(th), r0 * np.sin(th)], axis=-1)
    outer = np.stack([r1 * np.cos(th), r1 * np.sin(th)], axis=-1)
    ring = np.concatenate([inner, outer])
    pts = np.concatenate([np.concatenate(
        [ring, np.full((2 * nseg, 1), z)], axis=1) for z in (0.0, 1.0)])
    cells = []
    up = 2 * nseg
    for i in range(nseg):
        j = (i + 1) % nseg
        base = [i, nseg + i, nseg + j, j]
        cells.append(base + [v + up for v in base])
    return pts, np.asarray(cells)


def main(nseg=16, k=2):
    pts, cells = annulus(nseg)
    m = from_cell_vertices(pts, cells)
    print(f"imported annulus ring: {m.n_elements} hexes, "
          f"{len(m.faces)} interior faces (cyclic), "
          f"{len(m.bfaces)} boundary faces, "
          f"{'Q1 corners' if m.corners is not None else 'affine'}")

    f = lambda x: jnp.exp(-((x[..., 0] - 1.5) ** 2  # noqa: E731
                            + x[..., 1] ** 2) * 2.0)

    # --- continuous Q_k solve (matrix-free CG iteration) ---
    cg = cg_basis(m, k)
    print(f"CG-Q{k} space: {cg.n_dofs} dofs, per-entity counts "
          f"{np.bincount(cg.entity_dim).tolist()}")
    op = jax.jit(cg_laplace_operator(cg, dirichlet=True))
    b = cg_l2_functional(cg, f, dirichlet=True)
    x = jnp.zeros_like(b)
    r = b - op(x)
    pdir = r
    rs = jnp.vdot(r, r)
    nb = float(jnp.linalg.norm(b))
    for it in range(400):
        Ap = op(pdir)
        a = rs / jnp.vdot(pdir, Ap)
        x = x + a * pdir
        r = r - a * Ap
        rs2 = jnp.vdot(r, r)
        if float(jnp.sqrt(rs2)) < 1e-10 * nb:
            break
        pdir = r + (rs2 / rs) * pdir
        rs = rs2
    print(f"CG solve: {it + 1} iterations, rel residual "
          f"{float(jnp.sqrt(rs2)) / nb:.2e}")

    # --- DG-Q_k SIPG solve on the same mesh ---
    from hpdg_tpu.linalg import blockmatrix as bm
    basis = DGBasis(m, np.full(m.n_elements, k))
    A = api.laplace(basis, penalty=6.0, dirichlet=True)
    bd = api.l2_functional(basis, f)
    xd, info = api.solve_linear(basis, A, bd, tol=1e-10, maxiter=200,
                                method="cg+mg")
    rd = float(bv.norm(bv.sub(bd, bm.matvec(A, xd))))
    print(f"DG solve: {info['iterations']} PCG iterations, rel residual "
          f"{rd / float(bv.norm(bd)):.2e}")

    # --- agreement at the shared GL nodes ---
    u_cg_local = np.asarray(cg.gather(x))        # (n, (k+1)^dim)
    u_dg = np.asarray(xd[k])
    num = np.abs(u_cg_local - u_dg).max()
    den = max(np.abs(u_dg).max(), 1e-30)
    print(f"CG vs DG nodal agreement: max |u_cg - u_dg| / max|u_dg| = "
          f"{num / den:.2e} (methods differ at the discretization "
          "error scale, as expected)")
    return num / den


if __name__ == "__main__":
    main()
