"""Degree-bucketed block-sparse matrices.

The analog of ``DynamicBCRSMatrix`` (common/dynamicbcrs.hh:18-212): a
sparse matrix whose (i,j) entry is a dense (p_i+1)^d x (p_j+1)^d block.
Where the reference stores all blocks in one flat buffer with
MatrixWindow views, the TPU-native layout groups blocks by their
(row-degree, col-degree) pair so each group is one dense
``[nnz, br, bc]`` array — SpMV is a batched matmul (MXU) plus a
segment-sum scatter, with zero dynamic shapes.

Structure (the *pattern*) is host-side numpy and static under jit;
values are jnp arrays and form the pytree leaves.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


class BlockPattern:
    """Static sparsity pattern, hashable by identity (jit aux data).

    entries[(pr, pc)] = (rows, cols): int32 arrays of *bucket positions*
    (row r is the r-th element of row-bucket pr, likewise cols).
    """

    def __init__(self, row_sizes: dict, col_sizes: dict, entries: dict,
                 diag_first: bool = True):
        self.row_sizes = dict(row_sizes)  # p -> number of block rows in bucket
        self.col_sizes = dict(col_sizes)
        #: if True, bucket (p, p) stores its diagonal blocks at slots 0..n-1
        #: in row order (the layout assemble.plan.build_plan produces)
        self.diag_first = diag_first
        self.entries = {}
        self._slot_index_cache = {}
        for key, (rows, cols) in entries.items():
            rows = np.asarray(rows, dtype=np.int32)
            cols = np.asarray(cols, dtype=np.int32)
            self.entries[key] = (rows, cols)

    def _slot_index(self, key):
        if key not in self._slot_index_cache:
            rows, cols = self.entries[key]
            self._slot_index_cache[key] = {
                (int(r), int(c)): s for s, (r, c) in enumerate(zip(rows, cols))
            }
        return self._slot_index_cache[key]

    def slot(self, pr: int, pc: int, row: int, col: int) -> int:
        return self._slot_index((pr, pc))[(row, col)]

    def slots(self, pr: int, pc: int, rows, cols) -> np.ndarray:
        if pr == pc and self.diag_first and np.array_equal(rows, cols):
            return np.asarray(rows, dtype=np.int32)
        ix = self._slot_index((pr, pc))
        return np.array([ix[(int(r), int(c))] for r, c in zip(rows, cols)],
                        dtype=np.int32)

    def nnz(self, pr: int, pc: int) -> int:
        return len(self.entries[(pr, pc)][0])


@jax.tree_util.register_pytree_node_class
@dataclass
class BlockSparseMatrix:
    pattern: BlockPattern
    dim: int  # spatial dimension (block size = (p+1)^dim)
    values: dict  # (pr, pc) -> jnp [nnz, (pr+1)^dim, (pc+1)^dim]
    block_shape: tuple = (1, 1)  # per-dof components (rows, cols), >1 for systems

    def tree_flatten(self):
        keys = sorted(self.values.keys())
        return [self.values[k] for k in keys], (self.pattern, self.dim, tuple(keys), self.block_shape)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        pattern, dim, keys, block_shape = aux
        return cls(pattern, dim, dict(zip(keys, leaves)), block_shape)

    # ------------------------------------------------------------------
    def br(self, p: int) -> int:
        return (p + 1) ** self.dim * self.block_shape[0]

    def bc(self, p: int) -> int:
        return (p + 1) ** self.dim * self.block_shape[1]


def zeros_values(pattern: BlockPattern, dim: int, block_shape=(1, 1),
                 dtype=jnp.float64) -> dict:
    vals = {}
    for (pr, pc), (rows, _) in pattern.entries.items():
        br = (pr + 1) ** dim * block_shape[0]
        bc = (pc + 1) ** dim * block_shape[1]
        vals[(pr, pc)] = jnp.zeros((len(rows), br, bc), dtype=dtype)
    return vals


def matvec(A: BlockSparseMatrix, x: dict) -> dict:
    """y = A x for bucketed block vectors (jit-safe)."""
    out = {}
    for (pr, pc), (rows, cols) in A.pattern.entries.items():
        vals = A.values[(pr, pc)]
        xg = x[pc][jnp.asarray(cols)]  # [nnz, bc]
        contrib = jnp.einsum("nij,nj->ni", vals, xg,
                             preferred_element_type=vals.dtype)
        y = jax.ops.segment_sum(contrib, jnp.asarray(rows),
                                num_segments=A.pattern.row_sizes[pr])
        out[pr] = out.get(pr) + y if pr in out else y
    return out


def matvec_t(A: BlockSparseMatrix, x: dict) -> dict:
    """y = A^T x (restriction direction for transfer operators)."""
    out = {}
    for (pr, pc), (rows, cols) in A.pattern.entries.items():
        vals = A.values[(pr, pc)]
        xg = x[pr][jnp.asarray(rows)]  # [nnz, br]
        contrib = jnp.einsum("nij,ni->nj", vals, xg,
                             preferred_element_type=vals.dtype)
        y = jax.ops.segment_sum(contrib, jnp.asarray(cols),
                                num_segments=A.pattern.col_sizes[pc])
        out[pc] = out.get(pc) + y if pc in out else y
    return out


def diag_slots(pattern: BlockPattern) -> dict:
    """For a square pattern: p -> int32 array s.t. slot of block (r, r)
    of bucket (p, p) is out[p][r]."""
    out = {}
    for p, n in pattern.row_sizes.items():
        rng = np.arange(n)
        out[p] = pattern.slots(p, p, rng, rng)
    return out


def extract_diagonal(A: BlockSparseMatrix) -> dict:
    """p -> [n_p, br, br] diagonal blocks (for block-Jacobi/GS smoothers)."""
    out = {}
    for p, slots in diag_slots(A.pattern).items():
        out[p] = A.values[(p, p)][jnp.asarray(slots)]
    return out


def to_dense(A: BlockSparseMatrix, basis_row, basis_col=None) -> np.ndarray:
    """Flat dense matrix in element order (host, for tests/oracle diff)."""
    basis_col = basis_col or basis_row
    cr, cc = A.block_shape
    M = np.zeros((basis_row.ndof * cr, basis_col.ndof * cc))
    for (pr, pc), (rows, cols) in A.pattern.entries.items():
        vals = np.asarray(A.values[(pr, pc)])
        relems = basis_row.bucket_elems[pr][rows]
        celems = basis_col.bucket_elems[pc][cols]
        ro = basis_row.offsets[relems] * cr
        co = basis_col.offsets[celems] * cc
        br, bc = vals.shape[1], vals.shape[2]
        for k in range(len(rows)):
            M[ro[k]:ro[k] + br, co[k]:co[k] + bc] += vals[k]
    return M


def add_scaled(A: BlockSparseMatrix, B: BlockSparseMatrix, beta
               ) -> BlockSparseMatrix:
    """A + beta * B for matrices with structurally identical patterns
    (same plan / same deterministic Galerkin construction)."""
    vals = {k: A.values[k] + beta * B.values[k] for k in A.values}
    return BlockSparseMatrix(A.pattern, A.dim, vals, A.block_shape)
