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
    (the recursive max-level-difference enforcement of utility.hh:66-83).

    Vectorized batch sweeps: marking is a monotone operator, so batch
    fixed-point iteration reaches the same (least) closure as the
    original sequential per-face propagation — in O(#level-spread)
    sweeps of O(n_faces) numpy work instead of a Python face loop."""
    marks = np.asarray(marks, dtype=bool).copy()
    lev = _levels(mesh)
    fi, fo = mesh.faces.inside, mesh.faces.outside
    while True:
        tgt = lev + marks
        bad_o = (tgt[fi] - tgt[fo] > 1) & ~marks[fo]
        bad_i = (tgt[fo] - tgt[fi] > 1) & ~marks[fi]
        if not (bad_o.any() or bad_i.any()):
            return marks
        marks[fo[bad_o]] = True
        marks[fi[bad_i]] = True


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

    # vectorized: every element contributes 1 (kept) or nc (refined)
    # rows, parent-major with children in C order — no per-element loop
    # (the loop cost dominated adaptive replanning at 1e5+ elements)
    marks = np.asarray(marks, dtype=bool)
    counts = np.where(marks, nc, 1)
    starts = np.concatenate([[0], np.cumsum(counts)])
    total = int(starts[-1])
    parent_cat = np.repeat(np.arange(n, dtype=np.int32), counts)
    # position within the parent's row group = global row - group start
    local = np.arange(total, dtype=np.int64) - starts[parent_cat]
    refined = marks[parent_cat]
    child_pos = np.where(refined, local, -1).astype(np.int32)
    half = 0.5 * mesh.extent[parent_cat]
    lowers = mesh.lower[parent_cat] + np.where(
        refined[:, None], bits[np.clip(child_pos, 0, nc - 1)] * half, 0.0)
    extents = np.where(refined[:, None], half, mesh.extent[parent_cat])
    jac = shift = corners = None
    if mesh.jac is not None:  # children inherit the parent's affine map
        jac = mesh.jac[parent_cat]
        shift = mesh.shift[parent_cat]
    if mesh.corners is not None:
        # refined rows get the parent trilinear map evaluated at the
        # child corners (exact restriction); kept rows copy verbatim
        from hpdg_tpu.mesh import geometry as _geo
        corners = mesh.corners[parent_cat].copy()
        ref = np.where(refined)[0]
        if len(ref):
            corners[ref] = _geo.q1_child_corners(
                mesh.corners, parent_cat[ref], child_pos[ref])
    return from_boxes(lowers, extents, parent=parent_cat,
                      child_pos=child_pos, parent_mesh=mesh,
                      jac=jac, shift=shift, corners=corners)


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

    has_jac = mesh.jac is not None
    has_corn = mesh.corners is not None
    nd = mesh.dim
    lowers, extents, parent, child_pos = [], [], [], []
    jacs, shifts, corns = [], [], []
    for k in range(mesh.n_elements):
        if k in merged_children:
            continue
        lowers.append(mesh.lower[k])
        extents.append(mesh.extent[k])
        parent.append(k)
        child_pos.append(-1)
        if has_jac:
            jacs.append(mesh.jac[k])
            shifts.append(mesh.shift[k])
        if has_corn:
            corns.append(mesh.corners[k])
    for pe in sorted(merge):
        lowers.append(pm.lower[pe])
        extents.append(pm.extent[pe])
        # parent link meaningless for a merged element (points to the
        # first child; persistence uses restrict_to_coarse instead)
        parent.append(merge[pe][0])
        child_pos.append(-2)
        if has_jac:  # siblings share the parent's global affine map
            jacs.append(mesh.jac[merge[pe][0]])
            shifts.append(mesh.shift[merge[pe][0]])
        if has_corn:
            # parent corner c = corner c of the child at position c
            # (exact inverse of q1_child_corners' restriction)
            kids = sorted(merge[pe], key=lambda k_: int(mesh.child_pos[k_]))
            corns.append(np.stack([mesh.corners[kids[c], c]
                                   for c in range(2**nd)]))
    return from_boxes(np.asarray(lowers), np.asarray(extents),
                      parent=np.asarray(parent, dtype=np.int32),
                      child_pos=np.asarray(child_pos, dtype=np.int32),
                      parent_mesh=mesh,
                      jac=np.asarray(jacs) if has_jac else None,
                      shift=np.asarray(shifts) if has_jac else None,
                      corners=np.asarray(corns) if has_corn else None)


def semicoarsen(mesh: Mesh, axis: int) -> Mesh:
    """Merge element pairs along ONE axis (semicoarsening) — the
    anisotropy-robust coarsening the reference lacks: h-coarsen only the
    short axis until elements are isotropic, then coarsen normally.

    Requires a structured pairing: every element must have a partner with
    identical extent adjacent along ``axis``.  Returns the coarse mesh;
    the FINE mesh's links are not touched — use the returned mesh's
    ``parent``-linked twin from ``relink`` for transfer setup.
    """
    n, dim = mesh.lower.shape
    tol = mesh.extent.min() * 1e-6
    # pair low/high elements along the axis by quantized geometry keys
    key_lo = np.rint(np.delete(mesh.lower, axis, 1) / tol).astype(np.int64)
    ax_lo = np.rint(mesh.lower[:, axis] / tol).astype(np.int64)
    ax_hi = np.rint((mesh.lower[:, axis] + mesh.extent[:, axis])
                    / tol).astype(np.int64)
    ext_key = np.rint(mesh.extent / tol).astype(np.int64)
    table = {}
    for e in range(n):
        table[(tuple(key_lo[e]), tuple(ext_key[e]), ax_lo[e])] = e
    parent = np.full(n, -1, dtype=np.int32)
    child_pos = np.full(n, -1, dtype=np.int32)
    lowers, extents = [], []
    jacs, shifts, corns = [], [], []
    for e in range(n):
        if parent[e] >= 0:
            continue
        mate = table.get((tuple(key_lo[e]), tuple(ext_key[e]), ax_hi[e]))
        if mate is None or parent[mate] >= 0:
            raise ValueError(f"element {e} has no semicoarsening partner "
                             f"along axis {axis}")
        pe = len(lowers)
        parent[e], child_pos[e] = pe, 0
        parent[mate], child_pos[mate] = pe, 1
        lo = mesh.lower[e].copy()
        ex = mesh.extent[e].copy()
        ex[axis] *= 2.0
        lowers.append(lo)
        extents.append(ex)
        if mesh.jac is not None:
            jacs.append(mesh.jac[e])
            shifts.append(mesh.shift[e])
        if mesh.corners is not None:
            # coarse corner c: low-side corners from the low mate, high-
            # side from the high mate (exact for hierarchy-compatible Q1)
            bit = dim - 1 - axis
            corns.append(np.stack([
                mesh.corners[mate if (c >> bit) & 1 else e, c]
                for c in range(2**dim)]))
    coarse = from_boxes(
        np.asarray(lowers), np.asarray(extents),
        jac=np.asarray(jacs) if mesh.jac is not None else None,
        shift=np.asarray(shifts) if mesh.jac is not None else None,
        corners=np.asarray(corns) if mesh.corners is not None else None)
    # relinked twin of the fine mesh pointing at the coarse one
    from dataclasses import replace as _replace
    fine_linked = _replace(mesh, parent=parent, child_pos=child_pos,
                           parent_mesh=coarse)
    return fine_linked, coarse


def semicoarsen_chain(mesh: Mesh, max_levels: int = 10):
    """Repeatedly semicoarsen the axis with the SMALLEST element extent
    until the mesh is (nearly) isotropic or no axis can halve; returns
    the coarse-to-fine mesh list for multigrid_solver(meshes=...), whose
    last entry is a relinked twin of ``mesh``."""
    chain = [mesh]
    cur = mesh
    for _ in range(max_levels):
        hmin = cur.extent.min(axis=0)
        axis = int(np.argmin(hmin))
        if hmin[axis] * 2.0 > hmin.max() * 1.0001:
            break  # isotropic enough
        try:
            fine_linked, coarse = semicoarsen(cur, axis)
        except ValueError:
            break
        chain[-1] = fine_linked
        chain.append(coarse)
        cur = coarse
    return chain[::-1]
