"""General (non-lattice) hex/quad topology import (VERDICT r3 item 8).

from_cell_vertices derives topology from shared-face matching + BFS
parametric frame assignment — no lattice ordering, arbitrary per-cell
VTK orientation, cyclic connectivity.  Differential oracles: (a) the
SIPG energy of an interpolated smooth field is invariant under cell
shuffling and per-cell rotation of a lattice mesh; (b) a genuinely
non-lattice annulus ring (cyclic topology, trapezoidal cells) matches
the from-scratch numpy oracle at 1e-11.  Reference path: UGGrid +
dynamicdgqkglbasis.hh (any cube grid).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from hpdg_tpu import mesh as hmesh
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.mesh.geometry import from_cell_vertices, _bits
from hpdg_tpu.assemble import assemble_laplace
from hpdg_tpu.linalg import blockmatrix as bm
from hpdg_tpu.testing import oracle


_ROT_Z = np.array([1, 2, 3, 0, 5, 6, 7, 4])  # VTK hex rotated 90 deg in xy
_ROT_Q = np.array([1, 2, 3, 0])              # VTK quad rotation


def _lattice_points_cells(shape):
    """points/cells arrays (VTK ordering) of a structured lattice."""
    dim = len(shape)
    grids = np.meshgrid(*[np.arange(s + 1) for s in shape], indexing="ij")
    pts = np.stack(grids, axis=-1).reshape(-1, dim).astype(np.float64)
    strides = [int(np.prod([s + 1 for s in shape[a + 1:]]))
               for a in range(dim)]
    idx = np.stack(np.meshgrid(*[np.arange(s) for s in shape],
                               indexing="ij"), axis=-1).reshape(-1, dim)
    B = _bits(dim).astype(np.int64)
    corners = np.zeros((len(idx), 2 ** dim), dtype=np.int64)
    for c in range(2 ** dim):
        pos = idx + B[c]
        corners[:, c] = pos @ np.asarray(strides)
    if dim == 3:
        ref = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                        [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]])
    else:
        ref = np.array([[0, 0], [1, 0], [1, 1], [0, 1]])
    # VTK ref coords are (x, y, z) = axis order 0..dim-1, same as B
    bit_of_vtk = [int(np.where((B == r).all(axis=1))[0][0]) for r in ref]
    return pts, corners[:, bit_of_vtk]


def _energy(mesh, p, penalty=2.0, dirichlet=True):
    """a(u_I, u_I) for the interpolant of a fixed smooth u — a geometric
    invariant (independent of cell order and parametric frames)."""
    basis = DGBasis(mesh, np.full(mesh.n_elements, p))
    A = assemble_laplace(basis, penalty=penalty, dirichlet=dirichlet,
                         penalty_scaling="normal")
    xp = basis.node_positions(p)  # physical node coords, bucket order
    u = np.sin(xp[..., 0] + 0.3) * np.cos(0.7 * xp[..., 1])
    if mesh.dim == 3:
        u = u * (1.0 + 0.2 * xp[..., 2])
    x = {p: jnp.asarray(u)}
    return float(sum(jnp.vdot(x[q], bm.matvec(A, x)[q]).real
                     for q in x))


@pytest.mark.parametrize("dim,shape,p", [(2, (3, 2), 2), (3, (2, 2, 2), 2)])
def test_shuffled_rotated_lattice_matches_structured(dim, shape, p):
    pts, cells = _lattice_points_cells(shape)
    m_ref = hmesh.structured(shape, lower=(0,) * dim, upper=shape)
    e_ref = _energy(m_ref, p)
    rng = np.random.default_rng(0)
    perm = rng.permutation(len(cells))
    cells = cells[perm]
    rot = _ROT_Z if dim == 3 else _ROT_Q
    for i in range(len(cells)):
        for _ in range(int(rng.integers(0, 4))):
            cells[i] = cells[i][rot]
    m = from_cell_vertices(pts, cells)
    assert m.n_elements == m_ref.n_elements
    assert len(m.faces) == len(m_ref.faces)
    assert len(m.bfaces) == len(m_ref.bfaces)
    e_imp = _energy(m, p)
    assert abs(e_imp - e_ref) < 1e-10 * abs(e_ref), (e_imp, e_ref)


def _annulus_ring(nseg=8, r0=1.0, r1=2.0, three_d=False):
    """nseg trapezoidal cells around a square-ish annulus — CYCLIC
    topology (no lattice ordering exists).  3D: extruded in z."""
    th = np.linspace(0.0, 2 * np.pi, nseg, endpoint=False)
    inner = np.stack([r0 * np.cos(th), r0 * np.sin(th)], axis=-1)
    outer = np.stack([r1 * np.cos(th), r1 * np.sin(th)], axis=-1)
    if not three_d:
        pts = np.concatenate([inner, outer])  # ids: 0..n-1 inner, n.. outer
        cells = []
        for i in range(nseg):
            j = (i + 1) % nseg
            cells.append([i, nseg + i, nseg + j, j])  # CCW VTK quad
        return pts, np.asarray(cells)
    ring = np.concatenate([inner, outer])
    pts = np.concatenate([np.concatenate([ring, np.full((2 * nseg, 1), z)],
                                         axis=1) for z in (0.0, 1.0)])
    cells = []
    up = 2 * nseg
    for i in range(nseg):
        j = (i + 1) % nseg
        base = [i, nseg + i, nseg + j, j]
        cells.append(base + [v + up for v in base])
    return pts, np.asarray(cells)


@pytest.mark.parametrize("three_d", [False, True])
def test_annulus_ring_matches_oracle(three_d):
    pts, cells = _annulus_ring(8, three_d=three_d)
    m = from_cell_vertices(pts, cells)
    # cyclic: every segment has 2 ring neighbors -> nseg interior faces
    # per layer; no lattice_shape can express this
    assert m.n_elements == 8
    assert len(m.faces) == 8
    assert m.corners is not None  # trapezoids are genuinely multilinear
    p = 2
    basis = DGBasis(m, np.full(m.n_elements, p))
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True,
                         penalty_scaling="normal")
    Ad = bm.to_dense(A, basis)
    Ao = oracle.sipg_matrix(basis, penalty=2.0, dirichlet=True,
                            penalty_scaling="normal")
    err = np.abs(Ad - Ao).max() / np.abs(Ao).max()
    assert err < 1e-11, err


def test_disconnected_components_raise():
    pts, cells = _lattice_points_cells((2, 2))
    pts2 = np.concatenate([pts, pts + 100.0])
    cells2 = np.concatenate([cells, cells + len(pts)])
    with pytest.raises(ValueError, match="disconnected"):
        from_cell_vertices(pts2, cells2)


def test_overshared_face_raises():
    pts, cells = _lattice_points_cells((2, 1))
    cells2 = np.concatenate([cells, cells[:1]])  # duplicate first cell
    with pytest.raises(ValueError, match="more than two"):
        from_cell_vertices(pts, cells2)


def test_native_frame_matcher_matches_python():
    """cpp/meshkit.cc::hpdg_frame_cells vs the Python BFS: identical
    topology on the shuffled/rotated lattice and the 3D annulus ring."""
    from hpdg_tpu import native
    if not native.available():
        pytest.skip("native toolchain unavailable")
    import os
    cases = []
    pts, cells = _lattice_points_cells((2, 3, 2))
    rng = np.random.default_rng(5)
    cells = cells[rng.permutation(len(cells))]
    for i in range(len(cells)):
        for _ in range(int(rng.integers(0, 4))):
            cells[i] = cells[i][_ROT_Z]
    cases.append((pts, cells))
    cases.append(_annulus_ring(8, three_d=True))
    for pts, cells in cases:
        try:
            os.environ["HPDG_NATIVE_TOPOLOGY"] = "0"
            m_py = from_cell_vertices(pts, cells)
        finally:
            os.environ.pop("HPDG_NATIVE_TOPOLOGY", None)
        m_nat = from_cell_vertices(pts, cells)
        def face_set(m):
            return {(int(i), int(o), int(a)) for i, o, a in
                    zip(m.faces.inside, m.faces.outside, m.faces.axis)}
        assert face_set(m_nat) == face_set(m_py)
        assert len(m_nat.bfaces) == len(m_py.bfaces)
        src = m_nat.corners if m_nat.corners is not None else m_nat.jac
        ref = m_py.corners if m_py.corners is not None else m_py.jac
        # frames may differ by a global symmetry per BFS order, but both
        # BFS start identically from cell 0 -> identical corner orders
        assert np.allclose(np.asarray(src), np.asarray(ref), atol=1e-14)
