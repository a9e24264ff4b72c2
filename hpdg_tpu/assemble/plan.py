"""Host-side assembly planning: sparsity pattern + face/boundary groups.

The TPU-native replacement of the dune-fufem global assembler loops
(``assembleSkeletonPattern`` / ``assembleSkeletonEntries``,
buildingblocks/matrices.hh:42-86): instead of visiting intersections one
by one, all faces are grouped by (degree_in, degree_out, axis) so every
group is one fixed-shape batch, and every contribution is assigned a
static *slot* into the per-(p_row, p_col) block-value arrays up front.

Pattern layout invariant: in bucket (p, p) the first n_p slots are the
diagonal blocks in bucket order (slot of block (r, r) == r); face-driven
off-diagonal blocks follow in group order.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.linalg.blockmatrix import BlockPattern


@dataclass(frozen=True)
class FaceGroup:
    p_in: int
    p_out: int
    axis: int
    face_ids: np.ndarray  # indices into mesh.faces
    in_pos: np.ndarray  # bucket positions of inside elements
    out_pos: np.ndarray
    fmeas: np.ndarray  # face measures (of the intersection = fine face)
    inv_h_in: np.ndarray  # 1 / extent[inside, axis]
    inv_h_out: np.ndarray
    slot12: np.ndarray  # slots into values[(p_in, p_out)]
    slot21: np.ndarray  # slots into values[(p_out, p_in)]
    # M11 slot == in_pos (diagonal), M22 slot == out_pos.
    nc_code: int = 0  # 0 conforming; else hanging-node sub-face code

    def tang_maps(self, dim: int):
        """(tang_map_in, tang_map_out) for tensor.face_tables."""
        if self.nc_code == 0:
            return None, None
        nt = dim - 1
        sub = (self.nc_code - 1) % (2**nt)
        coarse_out = (self.nc_code - 1) // (2**nt)
        bits = [(sub >> (nt - 1 - t)) & 1 for t in range(nt)]
        m = tuple((0.5 * b, 0.5) for b in bits)
        return (None, m) if coarse_out else (m, None)


@dataclass(frozen=True)
class BoundaryGroup:
    p: int
    axis: int
    side: int  # 0 = low face (normal -e_axis), 1 = high face (+e_axis)
    face_ids: np.ndarray
    pos: np.ndarray  # bucket positions of the boundary elements
    fmeas: np.ndarray
    inv_h: np.ndarray


@dataclass(frozen=True)
class AssemblyPlan:
    basis: DGBasis
    pattern: BlockPattern
    face_groups: tuple
    boundary_groups: tuple


def build_plan(basis: DGBasis) -> AssemblyPlan:
    mesh = basis.mesh
    deg = basis.degrees
    faces = mesh.faces
    nf = len(faces)

    # pattern accumulators: start with the diagonal of every bucket
    rows = {}
    cols = {}
    row_sizes = {p: basis.bucket_size(p) for p in basis.bucket_degrees}
    for p in basis.bucket_degrees:
        n = basis.bucket_size(p)
        rows[(p, p)] = [np.arange(n, dtype=np.int32)]
        cols[(p, p)] = [np.arange(n, dtype=np.int32)]
    counters = {k: row_sizes[k[0]] for k in rows}

    fmeas_all = mesh.face_measure()
    face_groups = []
    if nf:
        # group faces by (deg_in, deg_out, axis, nc_code) via ONE int64
        # key sort — same lexicographic group order as np.unique(axis=0)
        # but ~10x faster at 1e6 faces (no void-dtype comparisons)
        key = (((deg[faces.inside].astype(np.int64) * 256
                 + deg[faces.outside]) * 16 + faces.axis) * 256
               + faces.nc_code)
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(ks)) + 1,
                                 [nf]])
        for g in range(len(starts) - 1):
            fids = order[starts[g]:starts[g + 1]].astype(np.int32)
            fids.sort()
            kk = int(ks[starts[g]])
            ncc = kk % 256
            ax = (kk // 256) % 16
            po = (kk // (256 * 16)) % 256
            pi = kk // (256 * 16 * 256)
            ein = faces.inside[fids]
            eout = faces.outside[fids]
            in_pos = basis.elem_bucket_pos[ein]
            out_pos = basis.elem_bucket_pos[eout]

            def _alloc(key, r, c):
                if key not in rows:
                    rows[key], cols[key] = [], []
                    counters[key] = 0
                start = counters[key]
                rows[key].append(r.astype(np.int32))
                cols[key].append(c.astype(np.int32))
                counters[key] = start + len(r)
                return start + np.arange(len(r), dtype=np.int32)

            slot12 = _alloc((pi, po), in_pos, out_pos)
            slot21 = _alloc((po, pi), out_pos, in_pos)
            face_groups.append(FaceGroup(
                p_in=pi, p_out=po, axis=ax, face_ids=fids,
                in_pos=in_pos, out_pos=out_pos,
                fmeas=fmeas_all[fids],
                inv_h_in=1.0 / mesh.extent[ein, ax],
                inv_h_out=1.0 / mesh.extent[eout, ax],
                slot12=slot12, slot21=slot21, nc_code=ncc,
            ))

    bmeas_all = mesh.bface_measure()
    boundary_groups = []
    if len(mesh.bfaces):
        bkey = ((deg[mesh.bfaces.elem].astype(np.int64) * 16
                 + mesh.bfaces.axis) * 2 + mesh.bfaces.side)
        border = np.argsort(bkey, kind="stable")
        bs_ = bkey[border]
        bstarts = np.concatenate([[0], np.flatnonzero(np.diff(bs_)) + 1,
                                  [len(bs_)]])
        for g in range(len(bstarts) - 1):
            fids = border[bstarts[g]:bstarts[g + 1]].astype(np.int32)
            fids.sort()
            kk = int(bs_[bstarts[g]])
            side = kk % 2
            ax = (kk // 2) % 16
            p = kk // 32
            elems = mesh.bfaces.elem[fids]
            boundary_groups.append(BoundaryGroup(
                p=p, axis=ax, side=side, face_ids=fids,
                pos=basis.elem_bucket_pos[elems],
                fmeas=bmeas_all[fids],
                inv_h=1.0 / mesh.extent[elems, ax],
            ))

    entries = {
        k: (np.concatenate(rows[k]), np.concatenate(cols[k])) for k in rows
    }
    col_sizes = dict(row_sizes)
    pattern = BlockPattern(row_sizes, col_sizes, entries)
    return AssemblyPlan(basis=basis, pattern=pattern,
                        face_groups=tuple(face_groups),
                        boundary_groups=tuple(boundary_groups))


def face_group_tables(basis, fg: FaceGroup, nq1: int):
    """Trace tables for both sides of a face group, with the hanging-node
    sub-face mapping applied to the coarse side (if any)."""
    from hpdg_tpu.basis import tensor
    dim = basis.mesh.dim
    tm_in, tm_out = fg.tang_maps(dim)
    fin = tensor.face_tables(fg.p_in, dim, fg.axis, 1, nq1,
                             family=basis.family, tang_map=tm_in)
    fout = tensor.face_tables(fg.p_out, dim, fg.axis, 0, nq1,
                              family=basis.family, tang_map=tm_out)
    return fin, fout


def face_phys_points(basis, fg: FaceGroup, pts: np.ndarray,
                     side: str = "in") -> np.ndarray:
    """Parametric quadrature points of a face group, on the intersection
    (= the fine face for non-conforming pairs).  (nf, nq, dim).

    Lattice-style meshes share one global parametric chart, so the same
    point array serves both sides.  Meshes with PER-ELEMENT charts
    (geometry.from_cell_vertices: disjoint unit boxes, faces paired at
    identity tangential correspondence) need the point expressed in the
    requested side's own chart — ``side`` picks "in" or "out" for those
    faces (conforming only; hanging nodes always live on shared
    charts)."""
    mesh = basis.mesh
    dim = mesh.dim
    ein = mesh.faces.inside[fg.face_ids]
    eout = mesh.faces.outside[fg.face_ids]
    lo = np.maximum(mesh.lower[ein], mesh.lower[eout])
    ext = np.minimum(mesh.extent[ein], mesh.extent[eout])
    lo[:, fg.axis] = mesh.lower[eout][:, fg.axis]  # the face plane
    nq = len(pts)
    x = np.repeat(lo[:, None, :], nq, axis=1)
    tang = [a for a in range(dim) if a != fg.axis]
    for t, a in enumerate(tang):
        x[:, :, a] += pts[None, :, t] * ext[:, a][:, None]
    # per-element-chart faces: parametrically non-adjacent pairs
    adj = np.abs(mesh.lower[ein][:, fg.axis]
                 + mesh.extent[ein][:, fg.axis]
                 - mesh.lower[eout][:, fg.axis]) \
        <= 1e-9 * np.maximum(1.0, mesh.extent[ein][:, fg.axis])
    if not adj.all():
        if fg.nc_code != 0:
            raise ValueError("hanging-node faces need a shared "
                             "parametric chart")
        e = ein if side == "in" else eout
        nlo = mesh.lower[e].copy()
        next_ = mesh.extent[e]
        xn = np.repeat(nlo[:, None, :], nq, axis=1)
        xn[:, :, fg.axis] += (next_[:, fg.axis][:, None]
                              if side == "in" else 0.0)
        for t, a in enumerate(tang):
            xn[:, :, a] += pts[None, :, t] * next_[:, a][:, None]
        x = np.where(adj[:, None, None], x, xn)
    return x


def penalty_coef(fg: FaceGroup, penalty: float, pmax: int,
                 scaling: str = "measure") -> np.ndarray:
    """Per-face penalty coefficient c_f such that the penalty term is
    c_f * sum_q w_q [u][v]  (i.e. c_f = mu_f * |f|).

    scaling="measure": mu = sigma p^2 / |f| (the reference convention,
    gausslobattoipdgassembler.hh:167) -> c_f = sigma p^2, constant.
    scaling="normal": mu = sigma p^2 * mean(1/h_normal) of the two
    elements -> c_f = sigma p^2 |f| mean(1/h_n).  Robust on anisotropic
    elements, where the measure convention under-penalizes (the SIPG
    matrix can become indefinite; see ROADMAP.md item 3).
    """
    if scaling == "measure":
        return penalty * pmax**2 * np.ones(len(fg.face_ids))
    if scaling == "normal":
        hinv = 0.5 * (fg.inv_h_in + fg.inv_h_out)
        return penalty * pmax**2 * fg.fmeas * hinv
    raise ValueError(scaling)


def boundary_penalty_coef(bg: BoundaryGroup, penalty: float,
                          scaling: str = "measure") -> np.ndarray:
    if scaling == "measure":
        return penalty * bg.p**2 * np.ones(len(bg.face_ids))
    if scaling == "normal":
        return penalty * bg.p**2 * bg.fmeas * bg.inv_h
    raise ValueError(scaling)
