import numpy as np

from hpdg_tpu import mesh as hmesh
from hpdg_tpu.basis.dgbasis import DGBasis


def test_structured_2d_faces():
    m = hmesh.structured((3, 2))
    assert m.n_elements == 6
    # interior faces: axis0: 2*2=4, axis1: 3*1=3
    assert len(m.faces) == 7
    assert len(m.bfaces) == 2 * 2 + 2 * 3
    assert np.isclose(m.volumes.sum(), 1.0)
    # normals: inside element must be on the low side along the axis
    for f in range(len(m.faces)):
        a = m.faces.axis[f]
        assert (m.lower[m.faces.inside[f], a] < m.lower[m.faces.outside[f], a])


def test_structured_3d_faces():
    m = hmesh.structured((2, 2, 2))
    assert m.n_elements == 8
    assert len(m.faces) == 3 * 4
    assert len(m.bfaces) == 6 * 4
    fm = m.face_measure()
    assert np.allclose(fm, 0.25)


def test_lshape():
    m = hmesh.lshape(2)
    assert m.n_elements == 12  # 16 cells minus 4
    # total area = 3
    assert np.isclose(m.volumes.sum(), 3.0)


def test_refine():
    m = hmesh.structured((2, 2))
    f = hmesh.refine(m)
    assert f.n_elements == 16
    assert np.isclose(f.volumes.sum(), 1.0)
    assert f.parent is not None
    # children tile the parent
    for e in range(f.n_elements):
        p = f.parent[e]
        assert np.all(f.lower[e] >= m.lower[p] - 1e-14)
        assert np.all(f.lower[e] + f.extent[e] <= m.lower[p] + m.extent[p] + 1e-14)
    # child_pos: bit per axis, last axis fastest
    e0 = np.where((f.parent == 0) & (f.child_pos == 1))[0][0]
    assert np.allclose(f.lower[e0], [0.0, 0.25])


def test_dgbasis_buckets():
    m = hmesh.structured((4, 4))
    degrees = np.full(16, 2)
    degrees[[3, 7, 9]] = 4
    b = DGBasis(m, degrees)
    assert b.bucket_degrees == (2, 4)
    assert b.bucket_size(2) == 13 and b.bucket_size(4) == 3
    assert b.ndof == 13 * 9 + 3 * 25
    # offsets are contiguous in element order
    assert b.offsets[0] == 0
    assert b.offsets[1] == 9
    assert b.offsets[4] == 9 * 3 + 25  # elem 3 has degree 4


def test_node_positions():
    m = hmesh.structured((2, 1))
    b = DGBasis(m, np.array([1, 1]))
    pos = b.node_positions(1)
    assert pos.shape == (2, 4, 2)
    # element 0 corners; C-order multiindex, last dim fastest
    assert np.allclose(pos[0], [[0, 0], [0, 1], [0.5, 0], [0.5, 1]])


def test_unmatched_interior_faces_raise():
    """4:1 level jumps (and non-2:1 inputs) must raise, not silently
    become spurious domain boundary (ADVICE round-1 regression)."""
    import pytest
    from hpdg_tpu.mesh.structured import from_boxes

    # a unit cell next to a column of four quarter-cells: 4:1 jump
    lower = np.array([[0.0, 0.0]] + [[1.0, 0.25 * k] for k in range(4)])
    extent = np.array([[1.0, 1.0]] + [[0.25, 0.25]] * 4)
    with pytest.raises(ValueError, match="could not be matched"):
        from_boxes(lower, extent)
    m = from_boxes(lower, extent, validate=False)  # opt-out still works
    # the 4:1 interface is (mis)classified as boundary, as before; only
    # the 3 conforming faces among the quarter-cells remain interior
    assert len(m.faces) == 3


def test_2to1_matching_thirds_extents():
    """Regression: 2:1 probe keys must quantize FLOAT arithmetic —
    rint(2x*s) != 2*rint(x*s) for extents like 1/3, which used to make
    valid hanging-node faces fail to match (caught by the strict
    topology validator)."""
    import numpy as np
    from hpdg_tpu import mesh as hmesh
    from hpdg_tpu.mesh.adaptive import refine_local, close_marks
    from hpdg_tpu.mesh.structured import from_boxes
    rng = np.random.default_rng(21)
    m0 = hmesh.structured((8, 3))  # y-extent 1/3: the rounding trap
    g = refine_local(m0, close_marks(m0, rng.random(24) < 0.3))
    assert g.faces.nc_code.max() > 0
    # python and native matchers agree exactly
    g2 = from_boxes(g.lower, g.extent, topology="native")
    if g2 is not None:
        fs = lambda m: set(zip(m.faces.inside.tolist(),  # noqa: E731
                               m.faces.outside.tolist(),
                               m.faces.axis.tolist(),
                               m.faces.nc_code.tolist()))
        assert fs(g) == fs(g2)
    # 3D thirds too
    m3 = hmesh.structured((4, 3, 3))
    g3 = refine_local(m3, close_marks(m3, rng.random(36) < 0.3))
    assert np.isclose(g3.volumes.sum(), 1.0)


def test_degenerate_geometry_raises():
    """from_boxes must reject non-finite coordinates and non-positive
    extents instead of flowing NaN/inf into the quantized face keys
    (int-casting NaN is undefined behavior)."""
    import pytest
    from hpdg_tpu.mesh.structured import from_boxes
    with pytest.raises(ValueError):
        from_boxes(np.zeros((2, 2)), np.zeros((2, 2)))  # zero extent
    with pytest.raises(ValueError):
        from_boxes(np.array([[0.0, np.nan]]), np.ones((1, 2)))
    with pytest.raises(ValueError):
        from_boxes(np.zeros((1, 2)), np.array([[1.0, np.inf]]))
