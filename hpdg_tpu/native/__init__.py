"""Native (C++) runtime kernels, bound via ctypes.

The compute path of hpdg_tpu is JAX/XLA on the TPU; the host-side
runtime around it — mesh-topology construction (the grid "graph
builder") — has a native C++ implementation (cpp/meshkit.cc), compiled
on demand into this package.  Pure-numpy fallbacks exist for every
native kernel, so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_REPO = _HERE.parent.parent
_SRC = _REPO / "cpp" / "meshkit.cc"
_LIB = _HERE / "libmeshkit.so"

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if (not _LIB.exists()
                or _LIB.stat().st_mtime < _SRC.stat().st_mtime):
            base = ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                    "-fPIC", "-o", str(_LIB), str(_SRC)]
            try:  # threaded kernels when OpenMP is available
                subprocess.run(base[:1] + ["-fopenmp"] + base[1:],
                               check=True, capture_output=True, timeout=120)
            except subprocess.CalledProcessError:
                subprocess.run(base, check=True, capture_output=True,
                               timeout=120)
        lib = ctypes.CDLL(str(_LIB))
        lib.hpdg_build_faces.restype = ctypes.c_int
        lib.hpdg_build_faces.argtypes = [
            ctypes.c_int64, ctypes.c_int32,
            np.ctypeslib.ndpointer(np.float64), np.ctypeslib.ndpointer(np.float64),
            ctypes.c_double,
            np.ctypeslib.ndpointer(np.int32), np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.int32), np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.int32), np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.int32),
            ctypes.c_int64, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64), np.ctypeslib.ndpointer(np.int64),
        ]
        if hasattr(lib, "hpdg_sipg_fact_apply3"):
            lib.hpdg_sipg_fact_apply3.restype = ctypes.c_int
            lib.hpdg_sipg_fact_apply3.argtypes = (
                [ctypes.c_int64] * 3 + [ctypes.c_int32]
                + [np.ctypeslib.ndpointer(np.float64)] * 11)
        if hasattr(lib, "hpdg_frame_cells"):
            lib.hpdg_frame_cells.restype = ctypes.c_int
            lib.hpdg_frame_cells.argtypes = [
                ctypes.c_int64, ctypes.c_int32,
                np.ctypeslib.ndpointer(np.int64),
                np.ctypeslib.ndpointer(np.int64),
                np.ctypeslib.ndpointer(np.int32),
                np.ctypeslib.ndpointer(np.int32),
                np.ctypeslib.ndpointer(np.int32), ctypes.c_int64,
                np.ctypeslib.ndpointer(np.int32),
                np.ctypeslib.ndpointer(np.int32),
                np.ctypeslib.ndpointer(np.int32), ctypes.c_int64,
                np.ctypeslib.ndpointer(np.int64),
                np.ctypeslib.ndpointer(np.int64),
            ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def build_faces(lower: np.ndarray, extent: np.ndarray, tol: float):
    """Native face matcher; returns (inside, outside, axis, nc_code,
    b_elem, b_axis, b_side) or None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n, dim = lower.shape
    lower = np.ascontiguousarray(lower, dtype=np.float64)
    extent = np.ascontiguousarray(extent, dtype=np.float64)
    # Provable bound: every face (interior or boundary) consumes at least
    # one unique (element, axis, half) slot, of which there are 2*dim*n.
    # Hanging-node meshes exceed the naive dim*n interior-face count.
    cap_f = 2 * dim * n
    cap_b = 2 * dim * n
    f_in = np.empty(cap_f, np.int32)
    f_out = np.empty(cap_f, np.int32)
    f_ax = np.empty(cap_f, np.int32)
    f_nc = np.empty(cap_f, np.int32)
    b_el = np.empty(cap_b, np.int32)
    b_ax = np.empty(cap_b, np.int32)
    b_sd = np.empty(cap_b, np.int32)
    nf = np.zeros(1, np.int64)
    nbf = np.zeros(1, np.int64)
    rc = lib.hpdg_build_faces(n, dim, lower, extent, tol, f_in, f_out, f_ax,
                              f_nc, b_el, b_ax, b_sd, cap_f, cap_b, nf, nbf)
    if rc != 0:
        return None
    k, m = int(nf[0]), int(nbf[0])
    return (f_in[:k].copy(), f_out[:k].copy(), f_ax[:k].copy(),
            f_nc[:k].copy(), b_el[:m].copy(), b_ax[:m].copy(),
            b_sd[:m].copy())


class SipgFactApply3:
    """Reusable f64 factorized uniform-lattice SIPG apply (3D).

    Holds the 1D factor blocks and scratch buffers; ``__call__`` maps a
    flat (n_elements, nb^3) f64 array to the operator image.  The math
    twin of matrixfree.uniform.uniform_sipg_factorized — see the kernel
    comment in cpp/meshkit.cc.  Construct via
    matrixfree.uniform.uniform_sipg_factorized_host (which builds the
    factor blocks); returns None-equivalent if the library is missing.
    """

    def __init__(self, cells, nb, Mm, Dint, Dlo, Dhi, F12, F21):
        if len(cells) != 3:
            raise ValueError("native factorized apply is 3D-only")
        self.cells = tuple(int(c) for c in cells)
        self.nb = int(nb)
        c = lambda a: np.ascontiguousarray(a, np.float64)  # noqa: E731
        self.Mm = c(Mm)
        self.Dint, self.Dlo, self.Dhi = c(Dint), c(Dlo), c(Dhi)
        self.F12, self.F21 = c(F12), c(F21)
        n = int(np.prod(self.cells)) * self.nb ** 3
        self._s1 = np.empty(n, np.float64)
        self._s2 = np.empty(n, np.float64)
        self._s3 = np.empty(n, np.float64)
        self._lib = _load()
        if self._lib is None or not hasattr(self._lib,
                                            "hpdg_sipg_fact_apply3"):
            raise RuntimeError("native library unavailable")

    def __call__(self, u: np.ndarray, out: np.ndarray | None = None
                 ) -> np.ndarray:
        n = int(np.prod(self.cells)) * self.nb ** 3
        u = np.ascontiguousarray(u, np.float64).reshape(-1)
        if u.shape[0] != n:
            raise ValueError("size mismatch")
        y = out.reshape(-1) if out is not None else np.empty(n, np.float64)
        rc = self._lib.hpdg_sipg_fact_apply3(
            self.cells[0], self.cells[1], self.cells[2], self.nb,
            self.Mm, self.Dint, self.Dlo, self.Dhi, self.F12, self.F21,
            u, y, self._s1, self._s2, self._s3)
        if rc != 0:
            raise RuntimeError("native factorized apply failed")
        return y.reshape(int(np.prod(self.cells)), self.nb ** 3)


def frame_cells(cells_bit: np.ndarray, dim: int):
    """Native BFS parametric-frame assignment + face matching for
    ARBITRARY hex/quad connectivity (cpp/meshkit.cc::hpdg_frame_cells;
    the non-lattice import of mesh/geometry.py::from_cell_vertices).

    Returns ``(order, faces, bfaces)`` arrays or None when the native
    library is unavailable OR when the mesh needs per-face twist codes
    (rc=2: no identity-aligned frame assignment exists — the Python
    path handles those); raises ValueError for the topology errors the
    Python fallback also reports (shared >2, disconnected,
    degenerate)."""
    lib = _load()
    if lib is None or not hasattr(lib, "hpdg_frame_cells"):
        return None
    n, nc = cells_bit.shape
    cells_bit = np.ascontiguousarray(cells_bit, np.int64)
    order = np.empty((n, nc), np.int64)
    cap_f = dim * n + 1
    cap_b = 2 * dim * n + 1
    f_in = np.empty(cap_f, np.int32)
    f_out = np.empty(cap_f, np.int32)
    f_ax = np.empty(cap_f, np.int32)
    b_el = np.empty(cap_b, np.int32)
    b_ax = np.empty(cap_b, np.int32)
    b_sd = np.empty(cap_b, np.int32)
    nf = np.zeros(1, np.int64)
    nbf = np.zeros(1, np.int64)
    rc = lib.hpdg_frame_cells(n, dim, cells_bit, order, f_in, f_out, f_ax,
                              cap_f, b_el, b_ax, b_sd, cap_b, nf, nbf)
    if rc == 1:
        raise ValueError("a face is shared by more than two cells")
    if rc == 2:
        # twisted faces (no identity-aligned frame assignment): defer to
        # the Python path, which assigns per-face twist codes instead
        return None
    if rc == 3:
        raise ValueError("hex mesh has disconnected components")
    if rc == 4:
        raise ValueError("degenerate cell (bad vertex connectivity)")
    if rc != 0:
        return None
    k, m = int(nf[0]), int(nbf[0])
    return (order, (f_in[:k].copy(), f_out[:k].copy(), f_ax[:k].copy()),
            (b_el[:m].copy(), b_ax[:m].copy(), b_sd[:m].copy()))
