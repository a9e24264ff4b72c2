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


def unrefine(mesh: Mesh, marks: np.ndarray) -> Mesh:
    """Merge marked sibling groups back into their parent elements
    (the coarsening half of grid adaptation).

    A sibling group is merged only if ALL its members are marked and the
    mesh has parent links (i.e. it came from refine/refine_local).  The
    result's ``parent``/``child_pos`` link back to ``mesh`` (identity for
    kept elements, multi-child merges tracked via child_pos = -2) so
    persistence can route through ``blocks.persist``.
    """
    if mesh.parent is None or mesh.parent_mesh is None:
        raise ValueError("unrefine needs refinement links")
    marks = np.asarray(marks, dtype=bool)
    nc = 2**mesh.dim
    pm = mesh.parent_mesh
    # full sibling groups, all marked
    groups = {}
    for k in range(mesh.n_elements):
        if mesh.child_pos[k] >= 0:
            groups.setdefault(int(mesh.parent[k]), []).append(k)
    merge = {pe: ks for pe, ks in groups.items()
             if len(ks) == nc and marks[ks].all()}
    merged_children = set(k for ks in merge.values() for k in ks)

    lowers, extents, parent, child_pos = [], [], [], []
    for k in range(mesh.n_elements):
        if k in merged_children:
            continue
        lowers.append(mesh.lower[k])
        extents.append(mesh.extent[k])
        parent.append(k)
        child_pos.append(-1)
    for pe in sorted(merge):
        lowers.append(pm.lower[pe])
        extents.append(pm.extent[pe])
        # parent link meaningless for a merged element (points to the
        # first child; persistence uses restrict_to_coarse instead)
        parent.append(merge[pe][0])
        child_pos.append(-2)
    return from_boxes(np.asarray(lowers), np.asarray(extents),
                      parent=np.asarray(parent, dtype=np.int32),
                      child_pos=np.asarray(child_pos, dtype=np.int32),
                      parent_mesh=mesh)
