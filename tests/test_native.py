"""Native C++ topology kernel vs the Python face matcher."""

import numpy as np
import pytest

from hpdg_tpu import native
from hpdg_tpu import mesh as hmesh
from hpdg_tpu.mesh.structured import from_boxes
from hpdg_tpu.mesh.adaptive import refine_local


def canon(faces):
    """Canonical sorted face tuple set for comparison."""
    return sorted(zip(faces.inside.tolist(), faces.outside.tolist(),
                      faces.axis.tolist(), faces.nc_code.tolist()))


def canon_b(bf):
    return sorted(zip(bf.elem.tolist(), bf.axis.tolist(), bf.side.tolist()))


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
@pytest.mark.parametrize("dim", [2, 3])
def test_native_matches_python_conforming(dim):
    cells = (5, 4) if dim == 2 else (3, 2, 4)
    m_py = hmesh.structured(cells)
    m_nat = from_boxes(m_py.lower, m_py.extent, topology="native")
    assert canon(m_nat.faces) == canon(m_py.faces)
    assert canon_b(m_nat.bfaces) == canon_b(m_py.bfaces)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_matches_python_hanging_nodes():
    m = hmesh.structured((2, 2))
    f = refine_local(m, np.array([True, False, False, True]))
    f_nat = from_boxes(f.lower, f.extent, topology="native")
    assert canon(f_nat.faces) == canon(f.faces)
    assert canon_b(f_nat.bfaces) == canon_b(f.bfaces)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_matches_python_hanging_nodes_3d():
    m = hmesh.structured((2, 1, 1))
    f = refine_local(m, np.array([True, False]))
    f_nat = from_boxes(f.lower, f.extent, topology="native")
    assert canon(f_nat.faces) == canon(f.faces)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_hanging_nodes_exceeding_naive_face_cap():
    """Checkerboard-refined mesh has more interior faces than dim*n (the
    old native buffer cap) — regression for the out-of-bounds write."""
    m = hmesh.structured((8, 8))
    idx = np.arange(64)
    f = refine_local(m, (idx // 8 + idx % 8) % 2 == 0)
    n = f.n_elements
    assert len(f.faces) > f.dim * n  # the scenario the old cap missed
    f_nat = from_boxes(f.lower, f.extent, topology="native")
    assert canon(f_nat.faces) == canon(f.faces)
    assert canon_b(f_nat.bfaces) == canon_b(f.bfaces)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_large_mesh_speed():
    import time
    cells = (32, 32, 16)  # 16384 elements -> native path by default
    t0 = time.time()
    m = hmesh.structured(cells)
    dt = time.time() - t0
    assert len(m.faces) == (31 * 32 * 16 + 32 * 31 * 16 + 32 * 32 * 15)
    assert dt < 10.0
