"""Element-to-element transfer operators and Galerkin coarse matrices.

One generic structure covers both of the reference's transfer flavors:

* **p-transfer** (DGOrderTransfer, transferoperators/ordertransfer.hh:28-169):
  every element maps to itself with a lower degree, block = nodal
  interpolation high-p <- low-p (identity if unchanged);
* **h-transfer** (DynamicBlockTransferOperator + the transfer assembler,
  transferoperators/dynamicblocktransfer.hh:23-130,
  assemblers/dgtodggridtransferassembler.hh:227-341): every fine element
  maps to its parent, block = parent basis evaluated at the child's
  nodes.

In both cases each fine element has exactly ONE coarse partner, so the
transfer is ``prolong = blockdiag-ish scatter`` / ``restrict = T^T`` and
the Galerkin product RtAR (ordertransfer.hh:120-169,
dynamicblocktransfer.hh:78-130) is a per-entry batched ``T_r^T A T_c``
einsum plus a host-side symbolic pass for the coarse pattern.

Fine elements are grouped by (fine degree, coarse degree, variant) —
variant = child position for h-transfer — so each group shares one fixed
interpolation tensor and everything batches.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from hpdg_tpu.basis import tensor, lagrange
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.linalg.blockmatrix import (BlockPattern, BlockSparseMatrix,
                                         zeros_values)


@dataclass(frozen=True)
class TGroup:
    pf: int  # fine degree
    pc: int  # coarse degree
    fine_pos: np.ndarray  # positions in fine bucket pf
    coarse_pos: np.ndarray  # positions in coarse bucket pc
    T: np.ndarray  # (bs_f, bs_c) interpolation block (prolongation)


@dataclass(frozen=True)
class ElementTransfer:
    fine: DGBasis
    coarse: DGBasis
    coarse_elem: np.ndarray  # (n_fine,) coarse partner of each fine element
    groups: tuple  # of TGroup
    group_of_fine: np.ndarray  # (n_fine,) group index

    # ------------------------------------------------------------------
    def prolong(self, xc: dict, dtype=jnp.float64, ncomp: int = 1) -> dict:
        """ncomp > 1: vector-valued (component-major) coefficients — the
        transfer block acts on the node index of every component."""
        xf = {p: jnp.zeros((self.fine.bucket_size(p),
                            ncomp * self.fine.n_local(p)),
                           dtype=dtype) for p in self.fine.bucket_degrees}
        for g in self.groups:
            xloc = xc[g.pc][jnp.asarray(g.coarse_pos)]
            xloc = xloc.reshape(xloc.shape[0], ncomp, -1)
            vals = jnp.einsum("ncj,ij->nci", xloc, jnp.asarray(g.T, dtype),
                              preferred_element_type=dtype)
            vals = vals.reshape(vals.shape[0], -1)
            xf[g.pf] = xf[g.pf].at[jnp.asarray(g.fine_pos)].set(vals)
        return xf

    def restrict(self, rf: dict, dtype=jnp.float64, ncomp: int = 1) -> dict:
        rc = {p: jnp.zeros((self.coarse.bucket_size(p),
                            ncomp * self.coarse.n_local(p)),
                           dtype=dtype) for p in self.coarse.bucket_degrees}
        for g in self.groups:
            rloc = rf[g.pf][jnp.asarray(g.fine_pos)]
            rloc = rloc.reshape(rloc.shape[0], ncomp, -1)
            vals = jnp.einsum("nci,ij->ncj", rloc, jnp.asarray(g.T, dtype),
                              preferred_element_type=dtype)
            vals = vals.reshape(vals.shape[0], -1)
            rc[g.pc] = rc[g.pc].at[jnp.asarray(g.coarse_pos)].add(vals)
        return rc

    # ------------------------------------------------------------------
    def _galerkin_plan(self, A: BlockSparseMatrix):
        """Symbolic phase of the Galerkin product, cached per fine
        pattern: the coarse pattern plus per-work-item static slot
        arrays.  Repeated products with the same sparsity (e.g. the
        truncated matrices of a TNNMG loop, solversetup.hh:151-157's
        renewMatrixHierachy) then run the numeric phase only — and reuse
        the SAME coarse-pattern object, so jitted consumers don't
        re-trace."""
        cache = getattr(self, "_gcache", None)
        if cache is None:
            cache = {}
            object.__setattr__(self, "_gcache", cache)
        # key on the pattern object itself (identity-hashed; the strong
        # reference keeps it alive so the key can't be recycled)
        ckey = (A.pattern, A.block_shape)
        if ckey in cache:
            return cache[ckey]
        fine, coarse = self.fine, self.coarse
        ngroups = len(self.groups)
        # symbolic phase: map each fine entry to a coarse (bucket, row, col)
        per_key = {}  # (prc, pcc) -> list of code arrays
        work = []  # (fine key, subgroup sel, gri, gci, coarse key, codes)
        for (pr, pc), (rows, cols) in A.pattern.entries.items():
            relems = fine.bucket_elems[pr][rows]
            celems = fine.bucket_elems[pc][cols]
            gr = self.group_of_fine[relems]
            gc = self.group_of_fine[celems]
            gcodes = gr.astype(np.int64) * ngroups + gc
            for gcode in np.unique(gcodes):
                sel = np.where(gcodes == gcode)[0]
                gri, gci = int(gcode) // ngroups, int(gcode) % ngroups
                Gr, Gc = self.groups[gri], self.groups[gci]
                key = (Gr.pc, Gc.pc)
                crow = coarse.elem_bucket_pos[self.coarse_elem[relems[sel]]]
                ccol = coarse.elem_bucket_pos[self.coarse_elem[celems[sel]]]
                ncol = coarse.bucket_size(key[1])
                codes = crow.astype(np.int64) * ncol + ccol
                per_key.setdefault(key, []).append(codes)
                work.append(((pr, pc), sel, gri, gci, key, codes))

        # dedup coarse entries per key; diagonal-first layout
        entries = {}
        slotmaps = {}  # key -> (sorted_entry_codes, slot_of_sorted)
        for key, code_lists in per_key.items():
            nrow = coarse.bucket_size(key[0])
            ncol = coarse.bucket_size(key[1])
            codes = np.concatenate(code_lists)
            if key[0] == key[1]:
                diag = np.arange(nrow, dtype=np.int64) * ncol + np.arange(nrow)
                codes = np.concatenate([diag, codes])
            uniq = np.unique(codes)  # sorted
            if key[0] == key[1]:
                diag = np.arange(nrow, dtype=np.int64) * ncol + np.arange(nrow)
                isdiag = np.isin(uniq, diag)
                ordered = np.concatenate([diag, uniq[~isdiag]])
            else:
                ordered = uniq
            entries[key] = ((ordered // ncol).astype(np.int32),
                            (ordered % ncol).astype(np.int32))
            # code -> slot map via searchsorted on the sorted codes
            order = np.argsort(ordered, kind="stable")
            slotmaps[key] = (ordered[order], order.astype(np.int32))

        row_sizes = {p: coarse.bucket_size(p) for p in coarse.bucket_degrees}
        pattern = BlockPattern(row_sizes, dict(row_sizes), entries,
                               diag_first=True)
        # resolve slots now so the numeric phase is pure device work
        plan = []
        for (fkey, sel, gri, gci, key, codes) in work:
            sorted_codes, order = slotmaps[key]
            slots = order[np.searchsorted(sorted_codes, codes)]
            plan.append((fkey, jnp.asarray(sel), gri, gci, key,
                         jnp.asarray(slots)))
        cache[ckey] = (pattern, plan)
        return pattern, plan

    def galerkin(self, A: BlockSparseMatrix, dtype=jnp.float64
                 ) -> BlockSparseMatrix:
        """Coarse matrix RtAR: symbolic pass on the host (coarse pattern +
        static slot arrays, cached per fine pattern), numeric pass on the
        device (batched T_r^T A T_c einsums + scatter-add)."""
        pattern, plan = self._galerkin_plan(A)
        vals = zeros_values(pattern, self.fine.dim, block_shape=A.block_shape,
                            dtype=dtype)
        for (fkey, sel, gri, gci, key, slots) in plan:
            Gr, Gc = self.groups[gri], self.groups[gci]
            blocks = A.values[fkey][sel]
            nb = blocks.shape[0]
            cr, cc = A.block_shape
            blocks = blocks.reshape(nb, cr, Gr.T.shape[0], cc, Gc.T.shape[0])
            tr = jnp.einsum("naibj,ik,jl->nakbl", blocks,
                            jnp.asarray(Gr.T, dtype), jnp.asarray(Gc.T, dtype),
                            preferred_element_type=dtype)
            tr = tr.reshape(nb, cr * Gr.T.shape[1], cc * Gc.T.shape[1])
            vals[key] = vals[key].at[slots].add(tr)
        return BlockSparseMatrix(pattern, self.fine.dim, vals,
                                 block_shape=A.block_shape)


# ---------------------------------------------------------------------------
def p_coarse_degrees(degrees: np.ndarray, max_order: int) -> np.ndarray:
    """Coarse degree map: min(k_e, max_order)
    (DGOrderTransfer::setup, ordertransfer.hh:45-92)."""
    return np.minimum(degrees, max_order).astype(np.int32)


def _build_groups(fine: DGBasis, coarse: DGBasis, coarse_elem: np.ndarray,
                  variant: np.ndarray, Tfun):
    """Group fine elements by (pf, pc, variant); Tfun(pf, pc, var) -> T."""
    keys = np.stack([fine.degrees, coarse.degrees[coarse_elem], variant],
                    axis=-1)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    groups = []
    group_of_fine = inv.astype(np.int32)
    for gi, (pf, pc, var) in enumerate(uniq):
        pf, pc, var = int(pf), int(pc), int(var)
        fels = np.where(inv == gi)[0]
        groups.append(TGroup(
            pf=pf, pc=pc,
            fine_pos=fine.elem_bucket_pos[fels],
            coarse_pos=coarse.elem_bucket_pos[coarse_elem[fels]],
            T=Tfun(pf, pc, var),
        ))
    return tuple(groups), group_of_fine


def p_transfer(fine: DGBasis, max_order: int) -> ElementTransfer:
    """p-coarsening transfer: coarse basis on the same mesh with degrees
    min(k_e, max_order); block = nodal interpolation (exact embedding)."""
    coarse = fine.with_degrees(p_coarse_degrees(fine.degrees, max_order))
    n = fine.mesh.n_elements
    coarse_elem = np.arange(n, dtype=np.int32)
    variant = np.zeros(n, dtype=np.int32)

    def Tfun(pf, pc, var):
        return tensor.interpolation_matrix(pc, pf, fine.dim,
                                           family=fine.family)

    groups, gof = _build_groups(fine, coarse, coarse_elem, variant, Tfun)
    return ElementTransfer(fine=fine, coarse=coarse, coarse_elem=coarse_elem,
                           groups=groups, group_of_fine=gof)


def h_transfer(fine: DGBasis, coarse: DGBasis) -> ElementTransfer:
    """Grid transfer fine mesh -> parent mesh (dgtodggridtransferassembler
    analog): block = coarse basis evaluated at the child's node positions
    mapped into the parent reference cell.

    The per-child map is derived GEOMETRICALLY from the boxes (offset and
    per-axis scale of the child inside its parent), so uniform 2^d
    refinement, kept elements (child_pos = -1) and single-axis
    semicoarsening all take the same path — child_pos only serves as the
    grouping variant."""
    mesh = fine.mesh
    if mesh.parent is None:
        raise ValueError("fine mesh has no refinement hierarchy links")
    coarse_elem = mesh.parent.astype(np.int32)
    variant = mesh.child_pos.astype(np.int32)
    dim = mesh.dim

    # representative fine element per (pf, pc, var) group for the map
    keys = np.stack([fine.degrees, coarse.degrees[coarse_elem], variant],
                    axis=-1)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    rep = {tuple(int(v) for v in uniq[g]): int(np.where(inv == g)[0][0])
           for g in range(len(uniq))}

    def Tfun(pf, pc, var):
        e = rep[(pf, pc, var)]
        pe = coarse_elem[e]
        off = ((mesh.lower[e] - coarse.mesh.lower[pe])
               / coarse.mesh.extent[pe])
        scl = mesh.extent[e] / coarse.mesh.extent[pe]
        nodes_f = lagrange.nodes_1d(pf, fine.family)
        mi = tensor.multiindices(pf, dim)
        xp = off[None, :] + nodes_f[mi] * scl[None, :]  # (nl_f, dim)
        nodes_c = lagrange.nodes_1d(pc, coarse.family)
        per_axis = [lagrange.lagrange_values(nodes_c, xp[:, a])
                    for a in range(dim)]  # each (pc+1, nl_f)
        mic = tensor.multiindices(pc, dim)
        T = np.ones((len(mi), len(mic)))
        for a in range(dim):
            T = T * per_axis[a][mic[:, a], :].T
        return T

    groups, gof = _build_groups(fine, coarse, coarse_elem, variant, Tfun)
    return ElementTransfer(fine=fine, coarse=coarse, coarse_elem=coarse_elem,
                           groups=groups, group_of_fine=gof)
