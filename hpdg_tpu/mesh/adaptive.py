"""Local (adaptive) refinement with hanging nodes and 2:1 balance.

Analog of the reference's adaptive machinery: ``marker`` enforces a
maximum level difference while marking (estimators/utility.hh:66-83) and
the grid produces non-conforming intersections that the assemblers
handle by re-evaluating 1D tables on sub-faces
(gausslobattoipdgassembler.hh:444-462, sfipdg.hh:471-491).

``refine_local(mesh, marks)`` splits the marked elements into 2^dim
children after closing the marks so that neighboring elements never
differ by more than one refinement level (2:1 balance) — so every
non-conforming face is a half-face, which is what the face matcher in
mesh.structured detects (Faces.nc_code).
"""

from __future__ import annotations

import numpy as np

from hpdg_tpu.mesh.structured import Mesh, from_boxes


def _levels(mesh: Mesh) -> np.ndarray:
    """Refinement level per element, inferred from volumes relative to the
    coarsest element (robust to anisotropic base meshes)."""
    vol = mesh.volumes
    dim = mesh.dim
    lev = np.rint(np.log2(vol.max() / vol) / dim).astype(np.int32)
    return lev


def close_marks(mesh: Mesh, marks: np.ndarray) -> np.ndarray:
    """Extend the marked set so refining it keeps 2:1 balance
    (the recursive max-level-difference enforcement of utility.hh:66-83)."""
    marks = np.asarray(marks, dtype=bool).copy()
    lev = _levels(mesh)
    changed = True
    while changed:
        changed = False
        tgt = lev + marks.astype(np.int32)
        for i, o in zip(mesh.faces.inside, mesh.faces.outside):
            if tgt[i] - tgt[o] > 1 and not marks[o]:
                marks[o] = True
                tgt[o] += 1
                changed = True
            if tgt[o] - tgt[i] > 1 and not marks[i]:
                marks[i] = True
                tgt[i] += 1
                changed = True
    return marks


def refine_local(mesh: Mesh, marks: np.ndarray) -> Mesh:
    """Refine marked elements (marks auto-closed for 2:1 balance).

    Unmarked elements keep their geometry and map to themselves via
    ``parent`` (scale-1 groups in transfer/persistence); marked elements
    are replaced by their 2^dim children (parent-major, child C-order).
    """
    marks = close_marks(mesh, marks)
    n, dim = mesh.lower.shape
    nc = 2**dim
    bits = ((np.arange(nc)[:, None] >> np.arange(dim - 1, -1, -1)[None, :]) & 1)

    lowers, extents, parent, child_pos = [], [], [], []
    for e in range(n):
        if marks[e]:
            off = bits * (mesh.extent[e][None, :] * 0.5)
            lowers.append(mesh.lower[e][None, :] + off)
            extents.append(np.repeat(mesh.extent[e][None, :] * 0.5, nc, axis=0))
            parent.append(np.full(nc, e, dtype=np.int32))
            child_pos.append(np.arange(nc, dtype=np.int32))
        else:
            lowers.append(mesh.lower[e][None, :])
            extents.append(mesh.extent[e][None, :])
            parent.append(np.array([e], dtype=np.int32))
            child_pos.append(np.array([-1], dtype=np.int32))  # kept as-is

    return from_boxes(np.concatenate(lowers), np.concatenate(extents),
                      parent=np.concatenate(parent),
                      child_pos=np.concatenate(child_pos), parent_mesh=mesh)
