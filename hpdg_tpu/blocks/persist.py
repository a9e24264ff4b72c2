"""State persistence across mesh/degree adaptation.

Rebuild of the reference's adaptation checkpoint machinery:
``SavedBasis`` / ``saveDegrees`` / ``updateDegrees`` /
``interpolateIntoRefinedBasis`` (buildingblocks/persistentbasis.hh:12-74)
with ``PersistentGridView`` + ``GridAdaptor``
(functionspacebases/persistentgridview.hh, gridadaptor.hh:18-209)
underneath.

TPU-native shape: the "persistent grid view" is simply the old mesh's
arrays (plain data, nothing to snapshot); re-interpolation groups the new
elements by (old degree, new degree, affine map to the ancestor cell) and
evaluates the old polynomial at the new node positions in one batched
einsum per group — the batched analog of GridAdaptor's per-element
LocalCoarseFunction climb (gridadaptor.hh:18-65).

Checkpointing to disk falls out for free: a SavedState is a pytree of
numpy arrays (degrees + flat coefficients), np.savez-able.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from hpdg_tpu.basis import lagrange, tensor
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.linalg import blockvector as bv


@dataclass(frozen=True)
class SavedState:
    basis: DGBasis
    flat: np.ndarray  # flat coefficient vector (element order)


def save_state(basis: DGBasis, x: dict) -> SavedState:
    return SavedState(basis=basis, flat=bv.to_flat(basis, x))


def _ancestor_chain(new_mesh, old_mesh):
    """Per-new-element ancestor index in old_mesh (walk parent links)."""
    if new_mesh is old_mesh:
        return np.arange(new_mesh.n_elements, dtype=np.int32)
    chain = []
    m = new_mesh
    while m is not None and m is not old_mesh:
        if m.parent is None:
            raise ValueError("new mesh is not a refinement of the saved mesh")
        chain.append(m.parent)
        m = m.parent_mesh
    if m is not old_mesh:
        raise ValueError("saved mesh not found in ancestor chain")
    anc = chain[0]
    for par in chain[1:]:
        anc = par[anc]
    return anc.astype(np.int32)


def interpolate_to(saved: SavedState, new_basis: DGBasis,
                   dtype=jnp.float64) -> dict:
    """Re-interpolate the saved coefficients into the new basis
    (interpolateIntoRefinedBasis analog).  Supports degree changes on the
    same mesh and any number of uniform/local refinements of the saved
    mesh (coarsening is not supported yet)."""
    old = saved.basis
    new_mesh = new_basis.mesh
    anc = _ancestor_chain(new_mesh, old.mesh)

    # affine map of each new element into its ancestor's reference cell
    scale = new_mesh.extent / old.mesh.extent[anc]
    shift = (new_mesh.lower - old.mesh.lower[anc]) / old.mesh.extent[anc]

    # group by (p_new, p_old, quantized map)
    q = np.rint(np.concatenate([scale, shift], axis=1) * 2**20).astype(np.int64)
    keys = np.concatenate(
        [new_basis.degrees[:, None], old.degrees[anc][:, None], q], axis=1)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)

    out = {p: jnp.zeros((new_basis.bucket_size(p), new_basis.n_local(p)),
                        dtype=dtype) for p in new_basis.bucket_degrees}
    dim = new_mesh.dim
    for gi in range(len(uniq)):
        sel = np.where(inv == gi)[0]
        pn = int(new_basis.degrees[sel[0]])
        po = int(old.degrees[anc[sel[0]]])
        sc, sh = scale[sel[0]], shift[sel[0]]
        # new nodes mapped into the ancestor's reference coords
        nodes_n = lagrange.nodes_1d(pn, new_basis.family)
        mi = tensor.multiindices(pn, dim)
        xo = sh[None, :] + nodes_n[mi] * sc[None, :]  # (nl_new, dim)
        nodes_o = lagrange.nodes_1d(po, old.family)
        per_axis = [lagrange.lagrange_values(nodes_o, xo[:, a])
                    for a in range(dim)]
        mio = tensor.multiindices(po, dim)
        T = np.ones((len(mi), len(mio)))
        for a in range(dim):
            T = T * per_axis[a][mio[:, a], :].T
        # gather old coefficients of the ancestors
        bs_o = (po + 1) ** dim
        idx = old.offsets[anc[sel]][:, None] + np.arange(bs_o)[None, :]
        xold = jnp.asarray(saved.flat[idx], dtype)
        vals = jnp.einsum("nj,ij->ni", xold, jnp.asarray(T, dtype),
                          preferred_element_type=dtype)
        pos = new_basis.elem_bucket_pos[sel]
        out[pn] = out[pn].at[jnp.asarray(pos)].set(vals)
    return out


def save_degrees(basis: DGBasis) -> np.ndarray:
    """Snapshot the degree map (saveDegrees, persistentbasis.hh:29-39)."""
    return basis.degrees.copy()


def degrees_after_refine(old_degrees: np.ndarray, new_mesh) -> np.ndarray:
    """Carry per-element degrees to a refined mesh: children inherit the
    parent's degree (updateDegrees analog, persistentbasis.hh:41-48)."""
    if new_mesh.parent is None:
        return old_degrees.copy()
    return old_degrees[new_mesh.parent].astype(np.int32)


def save_npz(path: str, saved: SavedState):
    """Checkpoint a solver/adaptation state to disk (mesh geometry +
    degree map + coefficients) — the serialization the reference never
    had (SURVEY.md §5.4); everything is plain arrays."""
    m = saved.basis.mesh
    np.savez(path, lower=m.lower, extent=m.extent,
             degrees=saved.basis.degrees, flat=saved.flat,
             family=np.array(saved.basis.family))


def load_npz(path: str) -> SavedState:
    from hpdg_tpu.mesh.structured import from_boxes
    d = np.load(path)
    mesh = from_boxes(d["lower"], d["extent"])
    basis = DGBasis(mesh, d["degrees"], family=str(d["family"]))
    return SavedState(basis=basis, flat=d["flat"])


def restrict_to_coarse(saved: SavedState, new_basis: DGBasis,
                       dtype=jnp.float64) -> dict:
    """Interpolate a saved fine-mesh state onto a coarser mesh
    (coarsening direction of GridAdaptor: the old function is only
    piecewise-polynomial on the children, so each coarse node is
    evaluated in the child that contains it).

    Two mesh layouts are accepted:
    * ``new_basis.mesh is saved.basis.mesh.parent_mesh`` — undo of a
      ``refine``/``refine_local`` step; kept fine elements
      (``child_pos == -1``) get an identity/degree-change transfer.
    * ``new_basis.mesh.parent_mesh is saved.basis.mesh`` — the mesh came
      from ``mesh.adaptive.unrefine`` (kept elements ``child_pos == -1``,
      merged groups ``child_pos == -2``).
    """
    old = saved.basis
    fine_mesh = old.mesh
    new_mesh = new_basis.mesh
    dim = fine_mesh.dim
    nc = 2**dim

    # childmap[e]: {-1: k} for a kept element (identity geometry), else a
    # full {child_pos: fine_elem} sibling group.
    childmap = {}
    if new_mesh is fine_mesh.parent_mesh:
        for k in range(fine_mesh.n_elements):
            pe = int(fine_mesh.parent[k])
            cp = int(fine_mesh.child_pos[k])
            if cp < 0:
                childmap[pe] = {-1: k}
            else:
                childmap.setdefault(pe, {})[cp] = k
    elif new_mesh.parent_mesh is fine_mesh and new_mesh.parent is not None:
        # unrefine links forward: recover merged sibling groups through
        # the fine mesh's own parent links.
        sib_groups = {}
        if fine_mesh.parent is not None:
            for k in range(fine_mesh.n_elements):
                if int(fine_mesh.child_pos[k]) >= 0:
                    sib_groups.setdefault(int(fine_mesh.parent[k]), {})[
                        int(fine_mesh.child_pos[k])] = k
        for e in range(new_mesh.n_elements):
            k = int(new_mesh.parent[e])
            cp = int(new_mesh.child_pos[e])
            if cp == -1:
                childmap[e] = {-1: k}
            else:  # -2: merged group, k is one member
                childmap[e] = sib_groups[int(fine_mesh.parent[k])]
    else:
        raise ValueError("new basis must live on the saved mesh's parent "
                         "or on an unrefine() of the saved mesh")

    out = {p: jnp.zeros((new_basis.bucket_size(p), new_basis.n_local(p)),
                        dtype=dtype) for p in new_basis.bucket_degrees}

    # group coarse elements by (p_new, kept?, tuple of child degrees)
    groups = {}
    for e in range(new_mesh.n_elements):
        ch = childmap.get(e)
        pn = int(new_basis.degrees[e])
        if ch is None or (-1 not in ch and len(ch) < nc):
            raise ValueError("restrict_to_coarse: coarse element without a "
                             "full child set")
        if -1 in ch:
            key = (pn, int(old.degrees[ch[-1]]))  # kept: identity transfer
        else:
            key = (pn,) + tuple(int(old.degrees[ch[c]]) for c in range(nc))
        groups.setdefault(key, []).append(e)

    for key, elems in groups.items():
        elems_np = np.asarray(elems)
        pn = key[0]
        if len(key) == 2:  # kept elements: identity/degree-change transfer
            po = key[1]
            nodes_n = lagrange.nodes_1d(pn, new_basis.family)
            mi = tensor.multiindices(pn, dim)
            xref = nodes_n[mi]
            nodes_o = lagrange.nodes_1d(po, old.family)
            per_axis = [lagrange.lagrange_values(nodes_o, xref[:, a])
                        for a in range(dim)]
            mio = tensor.multiindices(po, dim)
            T = np.ones((len(mi), len(mio)))
            for a in range(dim):
                T = T * per_axis[a][mio[:, a], :].T
            fine_ids = np.array([childmap[e][-1] for e in elems_np])
            bs_o = (po + 1) ** dim
            idx = old.offsets[fine_ids][:, None] + np.arange(bs_o)[None, :]
            xold = jnp.asarray(saved.flat[idx], dtype)
            vals = jnp.einsum("nj,ij->ni", xold, jnp.asarray(T, dtype))
            pos = new_basis.elem_bucket_pos[elems_np]
            out[pn] = out[pn].at[jnp.asarray(pos)].set(vals)
            continue
        pchild = key[1:]
        children = childmap  # merged groups below
        nodes_n = lagrange.nodes_1d(pn, new_basis.family)
        mi = tensor.multiindices(pn, dim)
        xref = nodes_n[mi]  # (nl_new, dim) in parent coords
        # route each node to the child containing it
        bits = np.minimum((xref >= 0.5).astype(int), 1)
        cidx = np.zeros(len(mi), dtype=int)
        for a in range(dim):
            cidx = cidx * 2 + bits[:, a]
        vals = jnp.zeros((len(elems), len(mi)), dtype)
        elems_np = np.asarray(elems)
        for c in range(nc):
            sel = np.where(cidx == c)[0]
            if not len(sel):
                continue
            po = pchild[c]
            nodes_o = lagrange.nodes_1d(po, old.family)
            xc = 2.0 * xref[sel] - bits[sel]  # child-local coords
            per_axis = [lagrange.lagrange_values(nodes_o, xc[:, a])
                        for a in range(dim)]
            mio = tensor.multiindices(po, dim)
            T = np.ones((len(sel), len(mio)))
            for a in range(dim):
                T = T * per_axis[a][mio[:, a], :].T
            child_ids = np.array([children[e][c] for e in elems_np])
            bs_o = (po + 1) ** dim
            idx = old.offsets[child_ids][:, None] + np.arange(bs_o)[None, :]
            xold = jnp.asarray(saved.flat[idx], dtype)
            vals = vals.at[:, jnp.asarray(sel)].set(
                jnp.einsum("nj,ij->ni", xold, jnp.asarray(T, dtype)))
        pos = new_basis.elem_bucket_pos[elems_np]
        out[pn] = out[pn].at[jnp.asarray(pos)].set(vals)
    return out
