"""Twist-tolerant unstructured import (r4 verdict item 5).

Meshes whose cells meet with twisted faces — e.g. anything with a
SINGULAR edge/vertex, where walking around the edge composes face
transitions to a net rotation — admit no identity-aligned global frame
assignment and used to raise (return code 2).  The reference handles
them through UGGrid's arbitrary intersection orientation
(functionspacebases/dynamicdgqkglbasis.hh:36-151, grid-agnostic).  Here
``from_cell_vertices`` assigns per-face chart codes
(in_side/out_axis/out_side/twist, mesh.structured.Faces) instead, and
the assembler/oracle/matrix-free paths thread them through.

The fixture is the canonical singular case: a disk split into three
quads meeting at a valence-3 center vertex (2D), extruded to three
hexes sharing a singular edge (3D).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.assemble import assemble_laplace
from hpdg_tpu.linalg import blockmatrix as bm, blockvector as bv
from hpdg_tpu.mesh import geometry as geo
from hpdg_tpu.testing import oracle
from hpdg_tpu import matrixfree as mf


def _disk3_points_2d():
    """Disk as three quads sharing the center (valence-3 singular
    vertex).  Points: center O, spokes A_k (angle 120k), rim B_k
    (angle 120k+60)."""
    ang_a = np.deg2rad([0.0, 120.0, 240.0])
    ang_b = ang_a + np.deg2rad(60.0)
    O = np.zeros((1, 2))
    A = np.stack([np.cos(ang_a), np.sin(ang_a)], axis=1)
    B = 1.15 * np.stack([np.cos(ang_b), np.sin(ang_b)], axis=1)
    pts = np.concatenate([O, A, B])  # 0; A=1,2,3; B=4,5,6
    cells = np.array([[0, 1, 4, 2],   # VTK quad: O, A0, B0, A1 (CCW)
                      [0, 2, 5, 3],
                      [0, 3, 6, 1]])
    return pts, cells


def _extrude_hex(pts2, cells2, height=1.0):
    n = len(pts2)
    pts = np.concatenate([
        np.concatenate([pts2, np.zeros((n, 1))], axis=1),
        np.concatenate([pts2, np.full((n, 1), height)], axis=1)])
    cells = np.concatenate([cells2, cells2 + n], axis=1)  # VTK hex
    return pts, cells


def _flat(basis, x):
    return bv.to_flat(basis, x)


@pytest.mark.parametrize("dim", [2, 3])
def test_singular_mesh_imports_with_twists(dim):
    pts, cells = _disk3_points_2d()
    if dim == 3:
        pts, cells = _extrude_hex(pts, cells)
    m = geo.from_cell_vertices(pts, cells)
    assert m.n_elements == 3
    # the whole point: this mesh NEEDS non-classic charts
    assert not m.faces.is_classic
    assert len(m.faces) == 3  # ring around the singular entity
    # boundary faces: 2D has 2 rim edges + nothing else shared... each
    # quad has 4 edges, 2 interior-ring -> 2 boundary each
    assert len(m.bfaces) == (6 if dim == 2 else 3 * 4)


@pytest.mark.parametrize("dim,p", [(2, 3), (3, 2)])
def test_twisted_assembly_matches_oracle(dim, p):
    """Batched assembly == independent dense oracle at 1e-11 on the
    singular (twisted) mesh — the r4 verdict item-5 'done' bar."""
    pts, cells = _disk3_points_2d()
    if dim == 3:
        pts, cells = _extrude_hex(pts, cells)
    m = geo.from_cell_vertices(pts, cells)
    basis = DGBasis(m, np.full(3, p))
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True,
                         penalty_scaling="normal")
    Ad = bm.to_dense(A, basis)
    Ao = oracle.sipg_matrix(basis, penalty=2.0, dirichlet=True,
                            penalty_scaling="normal")
    err = np.abs(Ad - Ao).max() / np.abs(Ao).max()
    assert err < 1e-11, err
    # symmetry of the SIPG form survives the twisted charts
    assert np.abs(Ad - Ad.T).max() < 1e-11 * np.abs(Ad).max()


def test_twisted_matrixfree_matches_assembled():
    """Sum-factorized apply == assembled matvec on the twisted 3D mesh
    (the kmat path with per-side face axes and signs)."""
    pts, cells = _extrude_hex(*_disk3_points_2d())
    m = geo.from_cell_vertices(pts, cells)
    basis = DGBasis(m, np.array([2, 3, 2]))
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True)
    op = mf.sipg_operator(basis, penalty=2.0, dirichlet=True)
    x = bv.random(basis)
    y1 = _flat(basis, op(x))
    y2 = _flat(basis, bm.matvec(A, x))
    assert np.linalg.norm(y1 - y2) / np.linalg.norm(y2) < 1e-12


def test_twisted_solve_spd():
    """CG solve on the twisted singular-edge mesh: the assembled SIPG
    operator stays SPD and the solve reaches 1e-10."""
    pts, cells = _extrude_hex(*_disk3_points_2d())
    m = geo.from_cell_vertices(pts, cells)
    basis = DGBasis(m, np.full(3, 2))
    A = assemble_laplace(basis, penalty=4.0, dirichlet=True,
                         penalty_scaling="normal")
    b = {p: jnp.ones_like(v) for p, v in bv.random(basis).items()}
    from hpdg_tpu.solvers.cg import pcg
    x, info = pcg(lambda v: bm.matvec(A, v), b, tol=1e-10, maxiter=500)
    r = bv.sub(b, bm.matvec(A, x))
    assert bv.norm(r) / bv.norm(b) < 1e-9


def test_twisted_mesh_guards_raise():
    """Paths that still assume classic charts refuse loudly."""
    pts, cells = _extrude_hex(*_disk3_points_2d())
    m = geo.from_cell_vertices(pts, cells)
    basis = DGBasis(m, np.full(3, 2))
    from hpdg_tpu.assemble.elasticity import assemble_elasticity
    with pytest.raises(NotImplementedError):
        assemble_elasticity(basis)
    from hpdg_tpu.matrixfree.diagonal import sipg_diagonal_blocks
    with pytest.raises(NotImplementedError):
        sipg_diagonal_blocks(basis)


def test_classic_import_still_identity():
    """A plain lattice imported through from_cell_vertices keeps the
    classic contract (no twist codes) and matches its oracle."""
    # 2 x 1 x 1 hex lattice, VTK ordering
    pts = np.array([[x, y, z] for z in (0, 1) for y in (0, 1)
                    for x in (0, 1, 2)], float)

    def vid(x, y, z):
        return z * 6 + y * 3 + x

    cells = []
    for x0 in (0, 1):
        cells.append([vid(x0, 0, 0), vid(x0 + 1, 0, 0),
                      vid(x0 + 1, 1, 0), vid(x0, 1, 0),
                      vid(x0, 0, 1), vid(x0 + 1, 0, 1),
                      vid(x0 + 1, 1, 1), vid(x0, 1, 1)])
    m = geo.from_cell_vertices(pts, np.asarray(cells))
    assert m.faces.is_classic
    basis = DGBasis(m, np.full(2, 2))
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True)
    Ao = oracle.sipg_matrix(basis, penalty=2.0, dirichlet=True)
    err = np.abs(bm.to_dense(A, basis) - Ao).max() / np.abs(Ao).max()
    assert err < 1e-11, err
