"""Colored overlapping vertex-patch (Schwarz) smoothers.

A *patch* is the set of (up to) 2^dim elements sharing an interior
lattice vertex; the patch solve inverts the SIPG operator restricted to
the union of their dofs, so the penalty coupling across all faces
meeting at the vertex is handled *exactly*.  Patches are colored by
vertex parity: same-color patches are element-disjoint, so one color is
ONE batched dense solve (MXU-shaped ``[n_patches, K, K] @ [n_patches,
K]``) plus a collision-free scatter — a multiplicative Schwarz sweep
becomes 2^dim data-parallel steps.

Why it exists: element-block smoothers plateau on penalty-dominated
DG-Q1 h-levels.  Measured two-grid contraction (8-cell -> 64-cell
uniform refinement, penalty 24):

    3D DG-Q1 elasticity   element-GS 3+3: 0.918   patch 1+1: 0.235
    3D DG-Q1 Poisson      element-GS 3+3: 0.379   patch 1+1: 0.074
    2D DG-Q1 elasticity   element-GS 3+3: 0.725   patch 1+1: 0.281

The reference has no overlapping smoother; its closest analog is the
sequential ``DynamicBlockGS`` (iterationsteps/dynamicblockgs.hh:87-126)
whose TPU port (colored element-block GS, solvers/smoothers.py) is the
baseline the patch smoother beats.  Patch solves generalize the
reference's per-element ``LocalSolver`` idea to overlapping element
groups.

Patch inverses are precomputed on the host at setup time (f64 LU does
not compile on all TPU generations — same convention as
``smoothers.inverse_diagonal_blocks``) and shipped as device constants.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from hpdg_tpu.linalg import blockvector as bv
from hpdg_tpu.linalg.blockmatrix import BlockSparseMatrix, matvec


def lattice_coords(mesh) -> tuple[np.ndarray, tuple]:
    """Integer lattice coordinates of each element (host).

    Requires a uniform lattice: every element the same extent (the
    geometric h-levels built by ``mesh.structured``/``refine`` qualify;
    ``jac``/``corners`` geometry is irrelevant — patches are a topology
    construct).  Raises ValueError otherwise.
    """
    ext = mesh.extent
    if not np.allclose(ext, ext[0], rtol=1e-12, atol=0.0):
        raise ValueError("vertex patches need a uniform element lattice")
    lo = mesh.lower.min(axis=0)
    coords = (mesh.lower - lo) / ext[0]
    icoords = np.rint(coords).astype(np.int64)
    if not np.allclose(coords, icoords, atol=1e-9):
        raise ValueError("elements do not sit on a uniform lattice")
    return icoords.astype(np.int32), tuple(icoords.max(axis=0) + 1)


def build_vertex_patches(mesh) -> list[np.ndarray]:
    """Vertex patches grouped by parity color.

    Returns a list of 2^dim int32 arrays ``[n_patches_c, 2^dim]`` of
    element ids, entry -1 where the lattice cell is absent (masked
    domains like the L-shape).  Every element is covered by at least
    one patch; colors are ordered by parity tuple (C order).
    """
    dim = mesh.dim
    coords, cells = lattice_coords(mesh)
    if any(c < 2 for c in cells):
        raise ValueError("vertex patches need >= 2 cells per axis")
    eid = {tuple(c): i for i, c in enumerate(coords)}
    k = 1 << dim
    # corner offsets in the same C-order convention as refine()'s
    # child_pos: bit (dim-1-a) of c gives the high/low side along axis a
    offs = np.array([[(c >> (dim - 1 - a)) & 1 for a in range(dim)]
                     for c in range(k)], dtype=np.int64)
    by_color: dict[tuple, list] = {}
    covered = np.zeros(mesh.n_elements, dtype=bool)
    for v in np.ndindex(*[c - 1 for c in cells]):
        els = np.full(k, -1, dtype=np.int32)
        for ci in range(k):
            cell = tuple(np.asarray(v) + offs[ci])
            if cell in eid:
                els[ci] = eid[cell]
        if (els >= 0).sum() == 0:
            continue
        covered[els[els >= 0]] = True
        color = tuple(int(x) % 2 for x in v)
        by_color.setdefault(color, []).append(els)
    if not covered.all():
        # masked domains can strand elements whose every surrounding
        # vertex is outside the interior vertex range; give each its
        # own singleton patch in color 0
        key = tuple([0] * dim)
        for e in np.nonzero(~covered)[0]:
            els = np.full(k, -1, dtype=np.int32)
            els[0] = e
            by_color.setdefault(key, []).append(els)
    return [np.stack(by_color[c]) for c in sorted(by_color)]


def patch_inverses(A: BlockSparseMatrix, basis, colors: list[np.ndarray],
                   dtype=jnp.float64) -> list:
    """Per color: the dense inverse of every patch operator.

    Patch operator = A restricted to the patch's element dofs: diagonal
    blocks on the (slot a, slot a) positions, face-coupling blocks where
    the pattern has them (vertex-diagonal element pairs share no face,
    so their coupling is structurally zero in SIPG).  Absent elements
    (-1) get an identity lane, making the solve a no-op there.

    Returns [n_patches_c, K, K] jnp arrays, K = 2^dim * block size.
    """
    (p,) = basis.bucket_degrees  # uniform degree only
    vals = np.asarray(A.values[(p, p)])
    bs = vals.shape[1]
    slot_ix = A.pattern._slot_index((p, p))
    pos = basis.elem_bucket_pos
    out = []
    for els in colors:
        npat, k = els.shape
        K = k * bs
        M = np.zeros((npat, K, K), dtype=vals.dtype)
        for a in range(k):
            for b in range(k):
                ea, eb = els[:, a], els[:, b]
                valid = (ea >= 0) & (eb >= 0)
                slots = np.full(npat, -1, dtype=np.int64)
                for i in np.nonzero(valid)[0]:
                    s = slot_ix.get((int(pos[ea[i]]), int(pos[eb[i]])))
                    if s is not None:
                        slots[i] = s
                got = slots >= 0
                if got.any():
                    M[got, a * bs:(a + 1) * bs, b * bs:(b + 1) * bs] = \
                        vals[slots[got]]
            missing = els[:, a] < 0
            if missing.any():
                rng = np.arange(a * bs, (a + 1) * bs)
                M[np.ix_(np.nonzero(missing)[0], rng, rng)] = np.eye(bs)
        out.append(jnp.asarray(np.linalg.inv(M), dtype))
    return out


def general_vertex_patches(mesh) -> list[list[np.ndarray]]:
    """Vertex patches on ARBITRARY box meshes: hanging nodes and mixed
    element sizes included (the lattice constructor above only serves
    uniform lattices).

    Anchors are all distinct element corners.  A patch contains (a) the
    elements sharing the corner and (b) every face-neighbor of those
    elements whose shared face contains the corner — at a hanging
    vertex this pulls in the COARSE element the fine corners sit on, so
    the penalty coupling across the non-conforming face is solved
    exactly.  Patches covering < 2 elements are dropped (corners of the
    domain boundary), then stranded elements get singleton patches.

    Colors come from a greedy coloring of the patch-overlap graph
    (same-color patches share no element), so each color remains one
    batched solve.  Returns colors as lists of variable-length element
    arrays; batching by size/degree signature happens in
    ``general_patch_smoother_step``.
    """
    n = mesh.n_elements
    dim = mesh.dim
    lo, ext = mesh.lower, mesh.extent
    scale = ext.min()
    eps = 1e-6 * scale
    # per-axis quantum = half the smallest extent along that axis: under
    # 2:1 refinement every corner coordinate is an integer multiple of
    # the axis minimum, so quantized keys are exact (never half-integer)
    quant = 0.5 * ext.min(axis=0)

    def qkey(pt):
        return tuple(np.rint(pt / quant).astype(np.int64))

    # corner -> elements sharing it
    corners_of = {}
    k = 1 << dim
    offs = np.array([[(c >> (dim - 1 - a)) & 1 for a in range(dim)]
                     for c in range(k)], dtype=np.float64)
    pts = lo[:, None, :] + offs[None, :, :] * ext[:, None, :]  # [n, k, dim]
    anchor_pt = {}
    for e in range(n):
        for c in range(k):
            key = qkey(pts[e, c])
            corners_of.setdefault(key, set()).add(e)
            anchor_pt[key] = pts[e, c]
    # element -> incident interior faces (for hanging-face neighbors)
    efaces = [[] for _ in range(n)]
    fi, fo = mesh.faces.inside, mesh.faces.outside
    for i in range(len(mesh.faces)):
        efaces[int(fi[i])].append(i)
        efaces[int(fo[i])].append(i)
    fax = mesh.faces.axis

    def face_box(i):
        a, b = int(fi[i]), int(fo[i])
        blo = np.maximum(lo[a], lo[b])
        bhi = np.minimum(lo[a] + ext[a], lo[b] + ext[b])
        return blo, bhi

    patches = []
    covered = np.zeros(n, dtype=bool)
    seen_sets = set()
    for key, els in corners_of.items():
        v = anchor_pt[key]
        grow = set(els)
        for e in list(els):
            for i in efaces[e]:
                blo, bhi = face_box(i)
                if np.all(v >= blo - eps) and np.all(v <= bhi + eps):
                    grow.add(int(fi[i]))
                    grow.add(int(fo[i]))
        if len(grow) < 2:
            continue
        sig = tuple(sorted(grow))
        if sig in seen_sets:
            continue
        seen_sets.add(sig)
        patches.append(np.asarray(sig, dtype=np.int32))
        covered[patches[-1]] = True
    for e in np.nonzero(~covered)[0]:
        patches.append(np.asarray([e], dtype=np.int32))
    # greedy-color the patch-overlap graph (patches sharing an element
    # must differ); same-color patches are disjoint = one batched solve
    owner = {}
    colors: list[list[np.ndarray]] = []
    for pa in patches:
        used = set()
        for e in pa:
            for c in owner.get(int(e), ()):
                used.add(c)
        c = 0
        while c in used:
            c += 1
        while c >= len(colors):
            colors.append([])
        colors[c].append(pa)
        for e in pa:
            owner.setdefault(int(e), []).append(c)
    return colors


def general_patch_smoother_step(A: BlockSparseMatrix, basis,
                                colors: list[list[np.ndarray]] | None = None,
                                damping: float = 1.0,
                                reverse: bool = False, dtype=jnp.float64):
    """Multiplicative colored vertex-patch sweep on GENERAL meshes
    (hanging nodes + mixed degrees): ``step(x, b) -> x``.

    Within a color, patches are grouped by their exact (lane-degree)
    signature so every group is one batched dense solve; lanes gather
    from / scatter into their own degree buckets.  Patch inverses are
    per patch (no translation classes on irregular meshes), computed on
    the host at setup.
    """
    if colors is None:
        colors = general_vertex_patches(basis.mesh)
    dim = basis.mesh.dim
    ncomp = A.block_shape[0]
    pos = basis.elem_bucket_pos
    degs = basis.degrees

    def bsz(p):
        return ncomp * (p + 1) ** dim

    prepared = []  # per color: list of groups
    for color in colors:
        by_sig = {}
        for pa in color:
            sig = tuple(int(degs[e]) for e in pa)
            by_sig.setdefault(sig, []).append(pa)
        groups = []
        for sig, pas in sorted(by_sig.items()):
            E = np.stack(pas)  # [npat, k]
            npat, k = E.shape
            sizes = [bsz(p) for p in sig]
            offs = np.concatenate([[0], np.cumsum(sizes)])
            K = int(offs[-1])
            M = np.zeros((npat, K, K))
            for a in range(k):
                pa_deg = sig[a]
                for b2 in range(k):
                    pb_deg = sig[b2]
                    if (pa_deg, pb_deg) not in A.pattern.entries:
                        continue
                    six = A.pattern._slot_index((pa_deg, pb_deg))
                    vals = np.asarray(A.values[(pa_deg, pb_deg)])
                    for i in range(npat):
                        s = six.get((int(pos[E[i, a]]), int(pos[E[i, b2]])))
                        if s is not None:
                            M[i, offs[a]:offs[a + 1],
                              offs[b2]:offs[b2 + 1]] = vals[s]
            inv = jnp.asarray(np.linalg.inv(M), dtype)
            lanes = [(sig[a], jnp.asarray(pos[E[:, a]]),
                      int(offs[a]), sizes[a]) for a in range(k)]
            groups.append((inv, lanes, K))
        prepared.append(groups)
    if reverse:
        prepared = prepared[::-1]

    def step(x: dict, b: dict) -> dict:
        for groups in prepared:
            r = bv.sub(b, matvec(A, x))
            xn = dict(x)
            for inv, lanes, K in groups:
                rg = jnp.concatenate(
                    [r[p][idx] for (p, idx, o, s) in lanes], axis=1)
                y = jnp.einsum("nij,nj->ni", inv, rg,
                               preferred_element_type=rg.dtype)
                for (p, idx, o, s) in lanes:
                    xn[p] = xn[p].at[idx].add(damping * y[:, o:o + s])
            x = xn
        return x

    return step


def uniform_patch_smoother(op, basis, penalty: float,
                           dirichlet: bool = True,
                           penalty_scaling: str = "measure",
                           reverse: bool = False, dtype=jnp.float64):
    """Vertex-patch sweep for MATRIX-FREE operators on uniform box
    lattices: ``step(x, b) -> x`` with ``op`` any dict->dict apply.

    The level operator is never assembled.  Patch operators on a
    uniform lattice with constant coefficients depend only on which
    patch faces touch the domain boundary, so the (at most 3^dim)
    distinct inverses are extracted from a tiny PROBE lattice (<= 4
    cells per axis at the same h, serially assembled) — memory is one
    [K, K] inverse per class no matter how large the level is.  This is
    what makes patch smoothing usable inside the production
    ``matrixfree_multigrid_solver`` at headline sizes.
    """
    from hpdg_tpu import mesh as hmesh
    from hpdg_tpu.assemble.sipg import assemble_laplace
    from hpdg_tpu.basis.dgbasis import DGBasis

    mesh = basis.mesh
    dim = mesh.dim
    (p,) = basis.bucket_degrees
    coords, cells = lattice_coords(mesh)
    if mesh.n_elements != int(np.prod(cells)):
        raise ValueError("uniform patch smoother needs a full box lattice")
    if any(c < 2 for c in cells):
        raise ValueError("vertex patches need >= 2 cells per axis")
    h = mesh.extent[0]

    # probe lattice: smallest box exhibiting every boundary class of the
    # real lattice along each axis (4 cells give low/interior/high; 3
    # give low/high-only; 2 gives the degenerate low==high vertex)
    pcells = tuple(min(int(c), 4) for c in cells)
    pmesh = hmesh.structured(pcells, upper=tuple(c * hh
                                                 for c, hh in zip(pcells, h)))
    pbasis = DGBasis(pmesh, np.full(pmesh.n_elements, p, dtype=np.int32))
    Ap = assemble_laplace(pbasis, penalty=penalty, dirichlet=dirichlet,
                          penalty_scaling=penalty_scaling,
                          dtype=jnp.float64)

    k = 1 << dim
    offs = np.array([[(c >> (dim - 1 - a)) & 1 for a in range(dim)]
                     for c in range(k)], dtype=np.int64)
    strides = np.array([int(np.prod(cells[a + 1:])) for a in range(dim)],
                       dtype=np.int64)
    pstrides = np.array([int(np.prod(pcells[a + 1:])) for a in range(dim)],
                        dtype=np.int64)

    def class_of(v, cc):
        return tuple((int(v[a]) == 0, int(v[a]) == cc[a] - 2)
                     for a in range(dim))

    # representative probe vertex for a class: low -> 0, high ->
    # pcells-2, interior -> 1 (exists iff the real axis has one)
    inv_cache = {}

    def class_inv(key):
        if key not in inv_cache:
            pv = np.array([0 if lo else (pcells[a] - 2 if hi else 1)
                           for a, (lo, hi) in enumerate(key)])
            els = ((pv[None, :] + offs) @ pstrides).astype(np.int32)
            inv = patch_inverses(Ap, pbasis, [els[None, :]],
                                 dtype=dtype)[0]
            inv_cache[key] = inv[0]
        return inv_cache[key]

    verts = np.stack(np.meshgrid(*[np.arange(c - 1) for c in cells],
                                 indexing="ij"), axis=-1).reshape(-1, dim)
    par = verts % 2
    color_groups = []  # per color: list of (els [n,k], inv [K,K])
    for ckey in sorted({tuple(r) for r in par}):
        sel = verts[np.all(par == np.asarray(ckey), axis=1)]
        by_class = {}
        for v in sel:
            by_class.setdefault(class_of(v, cells), []).append(
                (v[None, :] + offs) @ strides)
        color_groups.append([
            (jnp.asarray(np.stack(e).astype(np.int32)), class_inv(key))
            for key, e in sorted(by_class.items())])
    if reverse:
        color_groups = color_groups[::-1]
    bs = basis.n_local(p)
    K = k * bs

    def step(x: dict, b: dict) -> dict:
        for groups in color_groups:
            r = bv.sub(b, op(x))
            xp = x[p]
            for els, inv in groups:
                n = els.shape[0]
                rg = r[p][els].reshape(n, K)
                y = (rg @ inv.T).reshape(n, k, bs)
                xp = xp.at[els].add(y)
            x = {p: xp}
        return x

    return step


def class_patch_smoother_step(A: BlockSparseMatrix, basis,
                              damping: float = 1.0, reverse: bool = False,
                              dtype=jnp.float64):
    """Vertex-patch sweep with CLASS-DEDUPLICATED inverses: the
    assembled-matrix companion of :func:`uniform_patch_smoother`.

    On a FULL uniform lattice with translation-invariant assembly
    (constant coefficients — scalar SIPG, elasticity, ...), every patch
    operator depends only on which patch faces touch the domain
    boundary, so at most 3^dim distinct [K, K] inverses exist no matter
    how large the level is.  This is what keeps patch smoothing usable
    for ASSEMBLED systems at M-DOF sizes, where per-patch storage
    (``patch_inverses``) would need tens of GB — e.g. the bench's
    1.12M-DOF elasticity config: 12k patches of K=648 would be 20 GB;
    the class store is ~27 * 1.7 MB.

    Translation invariance is VERIFIED, not assumed: for every class
    with >= 2 members a second member's inverse is computed and
    compared (rtol 1e-10); a mismatch raises ValueError, which callers
    (solvers.multigrid ``smoother="patch"``) treat as "fall back to
    per-patch inverses".

    Semantics match :func:`patch_smoother_step` exactly (same parity
    coloring, same per-color fresh residual, multiplicative sweep).
    """
    mesh = basis.mesh
    dim = mesh.dim
    coords, cells = lattice_coords(mesh)
    if mesh.n_elements != int(np.prod(cells)):
        raise ValueError("class-dedup patches need a full box lattice")
    if any(c < 2 for c in cells):
        raise ValueError("vertex patches need >= 2 cells per axis")
    (p,) = basis.bucket_degrees
    pos = basis.elem_bucket_pos
    k = 1 << dim
    offs = np.array([[(c >> (dim - 1 - a)) & 1 for a in range(dim)]
                     for c in range(k)], dtype=np.int64)
    grid = np.empty(cells, dtype=np.int64)
    grid[tuple(coords.T)] = np.arange(mesh.n_elements)

    def class_of(v):
        return tuple((int(v[a]) == 0, int(v[a]) == cells[a] - 2)
                     for a in range(dim))

    inv_cache = {}

    def inv_of(els_one):
        return patch_inverses(A, basis, [els_one[None, :].astype(np.int32)],
                              dtype=dtype)[0][0]

    verts = np.stack(np.meshgrid(*[np.arange(c - 1) for c in cells],
                                 indexing="ij"), axis=-1).reshape(-1, dim)
    par = verts % 2
    # classify every patch GLOBALLY first so the translation-invariance
    # check compares members across colors too (a small lattice can
    # have only one member of a class per color)
    global_classes: dict = {}
    per_color: dict = {}
    for v in verts:
        els = np.array([grid[tuple(v + o)] for o in offs], dtype=np.int64)
        key = class_of(v)
        global_classes.setdefault(key, []).append(els)
        per_color.setdefault(tuple(int(x) % 2 for x in v),
                             {}).setdefault(key, []).append(els)
    for key, elist in sorted(global_classes.items()):
        inv = inv_of(elist[0])
        if len(elist) > 1:  # verify translation invariance
            inv2 = inv_of(elist[-1])
            if not np.allclose(np.asarray(inv), np.asarray(inv2),
                               rtol=1e-10, atol=0.0):
                raise ValueError("patch operators are not translation-"
                                 "invariant; use per-patch inverses")
        inv_cache[key] = inv
    color_groups = []
    for ckey in sorted(per_color):
        groups = []
        for key, elist in sorted(per_color[ckey].items()):
            els_all = np.stack(elist).astype(np.int32)
            groups.append((jnp.asarray(pos[els_all]), inv_cache[key]))
        color_groups.append(groups)
    if reverse:
        color_groups = color_groups[::-1]

    def step(x: dict, b: dict) -> dict:
        for groups in color_groups:
            r = bv.sub(b, matvec(A, x))
            xp = x[p]
            bs = r[p].shape[1]
            for bpos, inv in groups:
                n = bpos.shape[0]
                rg = r[p][bpos].reshape(n, k * bs)
                y = jnp.matmul(rg, inv.T,
                               preferred_element_type=rg.dtype)
                xp = xp.at[bpos].add(
                    damping * y.reshape(n, k, bs))
            x = {p: xp}
        return x

    return step


def patch_smoother_step(A: BlockSparseMatrix, basis,
                        colors: list[np.ndarray] | None = None,
                        invs: list | None = None,
                        damping: float = 1.0, reverse: bool = False,
                        dtype=jnp.float64):
    """Multiplicative colored vertex-patch sweep: ``step(x, b) -> x``.

    Per color: fresh residual, batched patch solve, collision-free
    scatter-add (same-color patches are element-disjoint).  ``reverse``
    runs the colors backward (the symmetric post-smooth companion).
    """
    if colors is None:
        colors = build_vertex_patches(basis.mesh)
    if invs is None:
        invs = patch_inverses(A, basis, colors, dtype=dtype)
    (p,) = basis.bucket_degrees
    pos = basis.elem_bucket_pos
    prepared = []
    for els, inv in zip(colors, invs):
        bpos = np.where(els >= 0, pos[np.maximum(els, 0)], 0)
        prepared.append((jnp.asarray(bpos), jnp.asarray(els >= 0), inv))
    if reverse:
        prepared = prepared[::-1]

    def step(x: dict, b: dict) -> dict:
        for bpos, valid, inv in prepared:
            r = bv.sub(b, matvec(A, x))
            npat, k = bpos.shape
            bs = r[p].shape[1]
            rg = r[p][bpos] * valid[..., None]          # [npat, k, bs]
            y = jnp.einsum("nij,nj->ni", inv, rg.reshape(npat, k * bs),
                           preferred_element_type=rg.dtype)
            y = y.reshape(npat, k, bs) * valid[..., None]
            x = {p: x[p].at[bpos].add(damping * y)}
        return x

    return step
