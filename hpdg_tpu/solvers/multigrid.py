"""Functional hp-multigrid: LevelOperations + V/mu-cycle.

Faithful redesign of the reference's functional multigrid
(iterationsteps/mg/multigrid.hh:26-79, multigrid_impl.hh:16-117): a level
is a bundle of callables (apply, pre/post smoother, restrict, prolong),
the cycle is a recursion over them, and smoothers are applied in
defect-correction form (multigrid_impl.hh:66-82).  Here every callable
is jit-safe on bucketed block vectors and the whole cycle jits into one
XLA program.

The setup factory mirrors MultigridSetup
(iterationsteps/solversetup.hh:70-218): p-levels halve the max degree
down to 1 (per element: min(k_e, order)), then h-levels follow the mesh
hierarchy; coarse matrices are Galerkin products; the coarse solve is a
dense Cholesky (replacing the reference's rank-local Gauss-Seidel loop —
on TPU a small dense solve is cheaper than a sequential sweep).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.linalg import blockvector as bv
from hpdg_tpu.linalg import blockmatrix as bm
from hpdg_tpu.transfer import p_transfer, h_transfer
from hpdg_tpu.solvers import smoothers as sm


@dataclass
class Level:
    """Operations of one multigrid level (LevelOperations analog)."""

    apply: Callable  # x -> A x
    pre_smooth: Callable  # (x, b) -> x  (one step)
    post_smooth: Callable
    restrict: Callable | None = None  # residual -> coarser (None on coarsest)
    prolong: Callable | None = None  # coarser correction -> this level
    pre_steps: int = 3
    post_steps: int = 3


def vcycle(levels: list, coarse_solve: Callable, x: dict, b: dict,
           mu: int = 1) -> dict:
    """One multigrid cycle on the finest level (multigrid_impl.hh:85-117).

    levels[0] is the coarsest; coarse_solve(b) -> x solves level 0.
    """

    def sweeps(smooth, steps, x, b):
        # rolled (fori_loop) so the smoother body appears once per level
        # in the XLA program instead of `steps` times
        if steps <= 1:
            return smooth(x, b) if steps == 1 else x
        return jax.lax.fori_loop(0, steps, lambda i, xx: smooth(xx, b), x)

    def run(l: int, x, b):
        if l == 0:
            return coarse_solve(b)
        L = levels[l]
        x = sweeps(L.pre_smooth, L.pre_steps, x, b)
        r = bv.sub(b, L.apply(x))
        rc = L.restrict(r)
        xc = jax.tree.map(jnp.zeros_like, rc)
        for _ in range(mu):
            xc = run(l - 1, xc, rc)
        x = bv.add(x, L.prolong(xc))
        x = sweeps(L.post_smooth, L.post_steps, x, b)
        return x

    return run(len(levels) - 1, x, b)


@dataclass
class MultigridData:
    """Matrices + transfers of the hierarchy (solversetup.hh:22-39 analog)."""

    bases: list  # coarsest ... finest
    matrices: list  # BlockSparseMatrix per level
    transfers: list  # ElementTransfer: transfers[l] maps level l+1 -> level l

    def renew(self, A_fine: "bm.BlockSparseMatrix", dtype=jnp.float64):
        """Re-Galerkin-restrict all coarse matrices after the fine matrix
        changed (renewMatrixHierachy, solversetup.hh:151-157) — e.g. for
        the truncated systems inside a TNNMG loop."""
        self.matrices[-1] = A_fine
        cur = A_fine
        for l in range(len(self.transfers) - 1, -1, -1):
            cur = self.transfers[l].galerkin(cur, dtype=dtype)
            self.matrices[l] = cur
        return self


def setup_hierarchy(basis: DGBasis, A: bm.BlockSparseMatrix,
                    meshes: list | None = None, coarse_bases: list | None = None,
                    dtype=jnp.float64, h_first: bool = False) -> MultigridData:
    """Build the p+h hierarchy with Galerkin coarse matrices.

    p-levels: max degree halves each level down to 1
    (solversetup.hh:71-108: pLevels = log2(maxDegree)).
    h-levels: if ``meshes`` (coarse-to-fine list whose last entry is
    basis.mesh) is given, grid transfers extend the hierarchy below p=1.

    ``h_first=True`` puts the h-levels at the TOP of the hierarchy (at
    the full degree) and the p-levels below, on the coarsest mesh — the
    right order for ANISOTROPIC meshes with a semicoarsening chain
    (mesh.adaptive.semicoarsen_chain): p-coarsening on stretched
    elements is a weak level pair (rate ~0.6 even with an exact coarse
    solve), while semicoarsening at full p contracts at ~0.13.
    """
    bases = [basis]
    matrices = [A]
    transfers = []
    cur = basis
    curA = A

    def do_h():
        nonlocal cur, curA
        fine_mesh_chain = list(meshes)
        assert fine_mesh_chain[-1] is basis.mesh, \
            "meshes must end with the basis' mesh"
        for coarse_mesh in reversed(fine_mesh_chain[:-1]):
            coarse_b = DGBasis(
                coarse_mesh,
                np.full(coarse_mesh.n_elements, cur.max_degree(),
                        dtype=np.int32),
                family=cur.family)
            T = h_transfer(cur, coarse_b)
            curA = T.galerkin(curA, dtype=dtype)
            cur = coarse_b
            bases.insert(0, cur)
            matrices.insert(0, curA)
            transfers.insert(0, T)

    def do_p():
        nonlocal cur, curA
        order = cur.max_degree()
        while order > 1:
            order = max(1, order // 2)
            T = p_transfer(cur, order)
            curA = T.galerkin(curA, dtype=dtype)
            cur = T.coarse
            bases.insert(0, cur)
            matrices.insert(0, curA)
            transfers.insert(0, T)
            if order == 1:
                break

    if h_first and meshes is not None:
        do_h()
        do_p()
    else:
        do_p()
        if meshes is not None:
            do_h()

    return MultigridData(bases=bases, matrices=matrices, transfers=transfers)


def dense_coarse_solver(basis: DGBasis, A: bm.BlockSparseMatrix,
                        dtype=jnp.float64):
    """Direct coarse solve via dense Cholesky, precomputed once.

    Replaces the reference's coarse Gauss-Seidel loop
    (solversetup.hh:207-215) — on TPU a small dense factorization
    beats a sequential sweep.
    """
    ncomp = A.block_shape[0]
    Ad = bm.to_dense(A, basis)
    Ad = 0.5 * (Ad + Ad.T)
    try:
        fac = jnp.asarray(np.linalg.cholesky(Ad), dtype)
        solve_dense = lambda f: jax.scipy.linalg.cho_solve((fac, True), f)  # noqa: E731
    except np.linalg.LinAlgError:
        # not SPD (e.g. under-penalized SIPG): fall back to a dense inverse
        inv = jnp.asarray(np.linalg.inv(Ad), dtype)
        solve_dense = lambda f: inv @ f  # noqa: E731

    def idx_of(p):
        elems = basis.bucket_elems[p]
        bs = ncomp * basis.n_local(p)
        return ncomp * basis.offsets[elems][:, None] + np.arange(bs)[None, :]

    def solve(b: dict) -> dict:
        # flatten in element order on device
        flat = jnp.zeros(ncomp * basis.ndof, dtype=dtype)
        for p in basis.bucket_degrees:
            flat = flat.at[jnp.asarray(idx_of(p))].set(b[p])
        y = solve_dense(flat)
        return {p: y[jnp.asarray(idx_of(p))] for p in basis.bucket_degrees}

    return solve


def gs_coarse_solver(basis: DGBasis, A: bm.BlockSparseMatrix,
                     iterations: int = 40):
    """Colored block-GS coarse solve (the reference's choice,
    solversetup.hh:207-215, with coloring instead of lexicographic order).
    Rolled as a lax.fori_loop so the XLA program stays small."""
    step = sm.colored_block_gs_step(A, basis)

    def solve(b: dict) -> dict:
        x = bv.zeros_like(b)
        return jax.lax.fori_loop(0, iterations, lambda i, xx: step(xx, b), x)

    return solve


def multigrid_solver(basis: DGBasis, A: bm.BlockSparseMatrix,
                     meshes: list | None = None, h_first: bool = False,
                     smoother: str = "gs", pre_steps: int = 3,
                     post_steps: int = 3, jacobi_damping: float = 0.6,
                     coarse: str = "auto", coarse_gs_iterations: int = 40,
                     operator_factory=None, penalty_matrix=None,
                     penalty_damping: float = 1.0, mu: int = 1,
                     dtype=jnp.float64):
    """Build the full hp-multigrid V-cycle step (x, b) -> x
    (MultigridSetup::multigridSolver analog, solversetup.hh:198-218).

    ``operator_factory``: optional callable (level_basis) -> matrix.  If
    given, coarse-level operators are *re-assembled* on each level
    instead of Galerkin-restricted.  Inherited (Galerkin) SIPG coarse
    operators over-penalize by 2x per h-level and cost V-cycle level
    independence (the issue the reference's experimental
    dualdgmultigridstep.hh works around by damping the penalty matrix
    per level); re-assembly restores h-independent convergence.
    """
    if penalty_matrix is not None and penalty_damping != 1.0:
        # penalty-damped ("dual") hierarchy, dualdgmultigridstep.hh analog:
        # split A = A_cons + A_pen, Galerkin-restrict both, and damp the
        # penalty part by alpha^(level distance) — counteracting the 2x
        # per-h-level over-penalization of inherited SIPG coarse operators
        A_cons = bm.add_scaled(A, penalty_matrix, -1.0)
        data = setup_hierarchy(basis, A_cons, meshes=meshes, dtype=dtype,
                               h_first=h_first)
        datap = setup_hierarchy(basis, penalty_matrix, meshes=meshes,
                                dtype=dtype, h_first=h_first)
        L = len(data.matrices) - 1
        data.matrices = [
            bm.add_scaled(mc, mp, penalty_damping ** (L - l))
            for l, (mc, mp) in enumerate(zip(data.matrices, datap.matrices))
        ]
    else:
        data = setup_hierarchy(basis, A, meshes=meshes, dtype=dtype,
                               h_first=h_first)
    if operator_factory is not None:
        data.matrices = [operator_factory(bas) for bas in data.bases[:-1]] \
            + [A]
    levels = []
    for l, (bas, M) in enumerate(zip(data.bases, data.matrices)):
        apply = (lambda MM: lambda x: bm.matvec(MM, x))(M)
        if smoother == "gs":
            pre = sm.colored_block_gs_step(M, bas)
            post = sm.colored_block_gs_step(M, bas, reverse=True)
        elif smoother == "jacobi":
            pre = post = sm.block_jacobi_step(M, omega=jacobi_damping)
        elif smoother == "lex":
            # reference-exact sequential sweep order (dynamicblockgs.hh),
            # forward pre / backward post — for residual-history parity
            pre = sm.lexicographic_block_gs_step(M, bas)
            post = sm.lexicographic_block_gs_step(M, bas, reverse=True)
        elif smoother == "patch":
            # colored overlapping vertex-patch Schwarz (solvers.patches):
            # the penalty-dominated-level fix — 2^dim batched dense patch
            # solves per sweep, ~4x the contraction of element-block GS
            # on DG-Q1 h-levels.  Levels where patches don't apply
            # (mixed degrees, non-lattice meshes, or patch blocks past
            # ``patch_max_block`` dofs at high p) fall back to colored
            # element-block GS.
            from hpdg_tpu.solvers import patches as pat
            patch_max_block = 1024
            pre = post = None
            usable = len(bas.bucket_degrees) == 1
            if usable:
                (pd,) = bas.bucket_degrees
                usable = (2 ** bas.mesh.dim * A.block_shape[0]
                          * (pd + 1) ** bas.mesh.dim) <= patch_max_block
            if usable:
                # class-deduplicated inverses first (full uniform
                # lattices, translation-invariant assembly — verified,
                # not assumed): O(3^dim) [K,K] inverses instead of one
                # per patch, which is what makes assembled-matrix patch
                # smoothing possible at M-DOF levels (the 1.12M-DOF
                # elasticity config would need ~20 GB per-patch).
                try:
                    pre = pat.class_patch_smoother_step(M, bas,
                                                        dtype=dtype)
                    post = pat.class_patch_smoother_step(
                        M, bas, reverse=True, dtype=dtype)
                except ValueError:
                    pre = post = None
            if usable and pre is None:
                try:
                    cols_ = pat.build_vertex_patches(bas.mesh)
                    invs_ = pat.patch_inverses(M, bas, cols_, dtype=dtype)
                    pre = pat.patch_smoother_step(M, bas, cols_, invs_,
                                                  dtype=dtype)
                    post = pat.patch_smoother_step(M, bas, cols_, invs_,
                                                   reverse=True, dtype=dtype)
                except ValueError:
                    pre = post = None
            if pre is None:
                # general path: hanging nodes and/or mixed degrees
                try:
                    gcols = pat.general_vertex_patches(bas.mesh)
                    ncmp = A.block_shape[0]
                    maxK = max(sum(ncmp * (int(bas.degrees[e]) + 1)
                                   ** bas.mesh.dim for e in pa)
                               for color in gcols for pa in color)
                    if maxK <= patch_max_block:
                        pre = pat.general_patch_smoother_step(
                            M, bas, gcols, dtype=dtype)
                        post = pat.general_patch_smoother_step(
                            M, bas, gcols, reverse=True, dtype=dtype)
                except ValueError:
                    pre = post = None
            if pre is None:
                pre = sm.colored_block_gs_step(M, bas)
                post = sm.colored_block_gs_step(M, bas, reverse=True)
        elif smoother == "line":
            # anisotropy-robust damped line-Jacobi: exact block-Thomas
            # solves along the strong (short-extent) axes (solvers.lines).
            # Cells stretched along TWO axes get alternating-direction
            # sweeps (one line solve per short axis, ADI-style); pre
            # applies the axes forward, post in reverse.
            from hpdg_tpu.solvers.lines import (line_tridiag_factor,
                                                line_solve)
            ext = np.mean(bas.mesh.extent, axis=0)
            axes = [a for a in range(bas.mesh.dim)
                    if ext[a] < 0.9 * ext.max()] or [int(np.argmin(ext))]
            Mls = [line_solve(line_tridiag_factor(M, bas, axis=a),
                              dtype=dtype) for a in axes]

            def _sweeps(MM, PPs):
                def step(x, b):
                    for PP in PPs:
                        r = bv.sub(b, bm.matvec(MM, x))
                        x = bv.add(x, bv.scale(jacobi_damping, PP(r)))
                    return x
                return step

            pre = _sweeps(M, Mls)
            post = _sweeps(M, Mls[::-1])
        else:
            raise ValueError(smoother)
        restrict = prolong = None
        ncomp = A.block_shape[0]
        if l > 0:
            T = data.transfers[l - 1]
            restrict = (lambda TT: lambda r: TT.restrict(
                r, dtype=dtype, ncomp=ncomp))(T)
            prolong = (lambda TT: lambda c: TT.prolong(
                c, dtype=dtype, ncomp=ncomp))(T)
        levels.append(Level(apply=apply, pre_smooth=pre, post_smooth=post,
                            restrict=restrict, prolong=prolong,
                            pre_steps=pre_steps, post_steps=post_steps))

    cb, cA = data.bases[0], data.matrices[0]
    if coarse == "auto":
        coarse = "dense" if cb.ndof * cA.block_shape[0] <= 6000 else "gs"
    if coarse == "dense":
        coarse_solve = dense_coarse_solver(cb, cA, dtype=dtype)
    elif coarse == "dgcg":
        # DG->CG conforming coarse path (solversetup_dgcg.hh analog):
        # GS sweeps around an exact solve in the CG-P1 subspace
        from hpdg_tpu.transfer.dgtocg import cg_coarse_solver
        cgc = cg_coarse_solver(cb, cA, dtype=dtype)
        gs = sm.colored_block_gs_step(cA, cb)

        def coarse_solve(b: dict) -> dict:
            x = gs(bv.zeros_like(b), b)
            r = bv.sub(b, bm.matvec(cA, x))
            x = bv.add(x, cgc(r))
            for _ in range(2):
                x = gs(x, b)
            return x
    else:
        coarse_solve = gs_coarse_solver(cb, cA, iterations=coarse_gs_iterations)

    if len(levels) == 1:
        # degenerate 1-level hierarchy (e.g. uniform p=1, no h-meshes):
        # vcycle would reduce to coarse_solve(b) and IGNORE the iterate —
        # wrap the coarse solve in defect correction so the step is a
        # genuine iteration
        Af = data.matrices[-1]

        def step(x: dict, b: dict) -> dict:
            r = bv.sub(b, bm.matvec(Af, x))
            return bv.add(x, coarse_solve(r))
    else:
        def step(x: dict, b: dict) -> dict:
            return vcycle(levels, coarse_solve, x, b, mu=mu)

    return step, data


def parametric_cycle(data: MultigridData, pre_steps: int = 3,
                     post_steps: int = 3, coarse_cg_iters: int = 60,
                     dtype=jnp.float64):
    """V-cycle as a pure jittable function of the level matrices.

    Returns ``cycle(mats, dinvs, x, b) -> x`` where ``mats`` is a list of
    per-level BlockSparseMatrix (pytrees — jit ARGUMENTS, not captured
    constants) and ``dinvs`` the matching block-diagonal inverses.  The
    static structure (patterns, colors, transfers) is closed over, so a
    caller that renews the hierarchy every outer iteration (TNNMG's
    truncated systems, solversetup.hh:160-195) reuses ONE jitted cycle:
    as long as ``MultigridData.renew`` reproduces the same pattern
    objects (it does — the Galerkin symbolic plan is cached), no
    re-tracing happens.

    The coarse solve is block-Jacobi-preconditioned CG with a fixed
    iteration count (jit-safe on a traced coarse matrix; replaces the
    host Cholesky, which would force per-iteration host work).
    """
    transfers = data.transfers
    colorings = []
    for bas in data.bases:
        colors = sm.greedy_coloring(bas.mesh)
        ncol = int(colors.max()) + 1
        masks = {p: [np.where(colors[bas.bucket_elems[p]] == c)[0]
                     .astype(np.int32) for c in range(ncol)]
                 for p in bas.bucket_degrees}
        colorings.append((ncol, masks))
    ncomp = data.matrices[0].block_shape[0]

    def gs(M, Dinv, lvl, x, b, reverse=False):
        ncol, masks = colorings[lvl]
        order = range(ncol - 1, -1, -1) if reverse else range(ncol)
        for c in order:
            r = bv.sub(b, bm.matvec(M, x))
            newx = {}
            for p in x:
                pos = masks[p][c]
                if len(pos) == 0:
                    newx[p] = x[p]
                    continue
                upd = jnp.einsum("nij,nj->ni", Dinv[p][pos], r[p][pos],
                                 preferred_element_type=x[p].dtype)
                newx[p] = x[p].at[pos].add(upd)
            x = newx
        return x

    def coarse_solve(M, Dinv, b):
        x = bv.zeros_like(b)
        r = b
        z = sm.apply_blockdiag(Dinv, r)
        pdir = z
        rz = bv.dot(r, z)

        def body(i, st):
            x, r, pdir, rz = st
            Ap = bm.matvec(M, pdir)
            # guards must be dtype-safe: a 1e-300 floor underflows to 0
            # in f32 and turns exact CG convergence into 0/0 = NaN
            den = bv.dot(pdir, Ap)
            alpha = jnp.where(den > 0, rz / jnp.where(den > 0, den, 1.0),
                              0.0)
            x = bv.axpy(alpha, pdir, x)
            r = bv.axpy(-alpha, Ap, r)
            z = sm.apply_blockdiag(Dinv, r)
            rz_new = bv.dot(r, z)
            beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0),
                             0.0)
            pdir = bv.axpy(beta, pdir, z)
            return x, r, pdir, rz_new

        x, _, _, _ = jax.lax.fori_loop(0, coarse_cg_iters, body,
                                       (x, r, pdir, rz))
        return x

    def sweeps(M, Dinv, lvl, steps, x, b, reverse=False):
        if steps <= 1:
            return gs(M, Dinv, lvl, x, b, reverse) if steps == 1 else x
        return jax.lax.fori_loop(
            0, steps, lambda i, xx: gs(M, Dinv, lvl, xx, b, reverse), x)

    def cycle(mats, dinvs, x, b):
        def run(l, x, b):
            if l == 0:
                return coarse_solve(mats[0], dinvs[0], b)
            x = sweeps(mats[l], dinvs[l], l, pre_steps, x, b)
            r = bv.sub(b, bm.matvec(mats[l], x))
            T = transfers[l - 1]
            rc = T.restrict(r, dtype=dtype, ncomp=ncomp)
            xc = run(l - 1, jax.tree.map(jnp.zeros_like, rc), rc)
            x = bv.add(x, T.prolong(xc, dtype=dtype, ncomp=ncomp))
            return sweeps(mats[l], dinvs[l], l, post_steps, x, b,
                          reverse=True)

        return run(len(data.bases) - 1, x, b)

    return cycle


def matrixfree_multigrid_solver(basis: DGBasis, penalty: float = 2.0,
                                dirichlet: bool = True,
                                cheby_degree: int = 3,
                                use_pallas: bool = False,
                                meshes: list | None = None,
                                penalty_scaling: str = "measure",
                                smoother: str = "cheb",
                                dtype=jnp.float64):
    """Fully matrix-free hp-multigrid for the SIPG Laplacian: every level
    applies the sum-factorized operator (no assembled matrices except the
    small coarse solve), smoothed by Chebyshev polynomials on the
    block-Jacobi-preconditioned operator.

    This is the BASELINE config-2 production path (3D p=4 matrix-free
    pipeline) — the reference stops at matrix-free *applies* and smooths
    with assembled-matrix GS; here the entire cycle is matrix-free.
    Returns (step, info_dict).
    """
    from hpdg_tpu import matrixfree as mf
    from hpdg_tpu.assemble.plan import build_plan
    from hpdg_tpu.assemble.sipg import assemble_laplace
    from hpdg_tpu.transfer import p_transfer

    from hpdg_tpu.transfer import h_transfer

    bases, transfers = [basis], []
    while bases[0].max_degree() > 1:
        T = p_transfer(bases[0], max(1, bases[0].max_degree() // 2))
        bases.insert(0, T.coarse)
        transfers.insert(0, T)
    if meshes is not None:
        assert meshes[-1] is basis.mesh
        for coarse_mesh in reversed(list(meshes)[:-1]):
            cb = DGBasis(coarse_mesh,
                         np.full(coarse_mesh.n_elements,
                                 bases[0].max_degree(), dtype=np.int32),
                         family=basis.family)
            T = h_transfer(bases[0], cb)
            bases.insert(0, cb)
            transfers.insert(0, T)

    levels = []
    for l, bas in enumerate(bases):
        planl = build_plan(bas)
        op = None
        if use_pallas:
            # fused Pallas stencil apply (uniform full 3D grids, f32);
            # levels too small for the TPU tiling fall back to the XLA
            # stencil operator (still matrix-free)
            try:
                from hpdg_tpu.ops.pallas_uniform import \
                    pallas_uniform_sipg_operator
                op = pallas_uniform_sipg_operator(
                    bas, penalty=penalty, dirichlet=dirichlet,
                    penalty_scaling=penalty_scaling)
            except ValueError:
                from hpdg_tpu.matrixfree.uniform import uniform_sipg_operator
                op = uniform_sipg_operator(bas, penalty=penalty,
                                           dirichlet=dirichlet, dtype=dtype,
                                           penalty_scaling=penalty_scaling)
        if op is None:
            op = mf.sipg_operator(bas, penalty=penalty, dirichlet=dirichlet,
                                  plan=planl, dtype=dtype,
                                  penalty_scaling=penalty_scaling)
        pre_sm = post_sm = None
        if smoother == "patch":
            # matrix-free vertex-patch sweeps with probe-lattice class
            # inverses (solvers.patches.uniform_patch_smoother): on the
            # p=4 chain one 1+1 sweep pair contracts at ~0.02/cycle
            # where Chebyshev-4 sits at ~0.39.  Levels whose patch
            # blocks exceed 1024 dofs keep Chebyshev.
            (pd,) = bas.bucket_degrees
            if 2 ** bas.mesh.dim * (pd + 1) ** bas.mesh.dim <= 1024:
                try:
                    from hpdg_tpu.solvers.patches import \
                        uniform_patch_smoother
                    pre_sm = uniform_patch_smoother(
                        op, bas, penalty, dirichlet=dirichlet,
                        penalty_scaling=penalty_scaling, dtype=dtype)
                    post_sm = uniform_patch_smoother(
                        op, bas, penalty, dirichlet=dirichlet,
                        penalty_scaling=penalty_scaling, reverse=True,
                        dtype=dtype)
                except ValueError:
                    pre_sm = post_sm = None
        if pre_sm is None:
            # block-Jacobi-preconditioned Chebyshev: invert the diagonal
            # blocks only on levels that actually smooth with them (at
            # 32^3 p=4 the [32768, 125, 125] host inversion alone costs
            # minutes on a small host — skipped entirely under "patch")
            D = mf.sipg_diagonal_blocks(bas, penalty=penalty,
                                        dirichlet=dirichlet, plan=planl,
                                        penalty_scaling=penalty_scaling,
                                        dtype=dtype)
            Dinv = {p: jnp.asarray(np.linalg.inv(np.asarray(d)), dtype)
                    for p, d in D.items()}
            pc = (lambda DD: lambda r: sm.apply_blockdiag(DD, r))(Dinv)
            rho = sm.estimate_rho(op, pc, bv.zeros(bas, dtype=dtype))
            pre_sm = post_sm = sm.chebyshev_smoother(op, pc,
                                                     lmax=1.05 * rho,
                                                     degree=cheby_degree)
        restrict = prolong = None
        if l > 0:
            T = transfers[l - 1]
            restrict = (lambda TT: lambda r: TT.restrict(r, dtype=dtype))(T)
            prolong = (lambda TT: lambda c: TT.prolong(c, dtype=dtype))(T)
        levels.append(Level(apply=op, pre_smooth=pre_sm, post_smooth=post_sm,
                            restrict=restrict, prolong=prolong,
                            pre_steps=1, post_steps=1))

    cb = bases[0]
    Ac = assemble_laplace(cb, penalty=penalty, dirichlet=dirichlet,
                          penalty_scaling=penalty_scaling, dtype=dtype)
    if cb.ndof <= 6000:
        coarse_solve = dense_coarse_solver(cb, Ac, dtype=dtype)
    else:
        coarse_solve = gs_coarse_solver(cb, Ac)

    def step(x: dict, b: dict) -> dict:
        return vcycle(levels, coarse_solve, x, b)

    return step, {"bases": bases, "transfers": transfers}
