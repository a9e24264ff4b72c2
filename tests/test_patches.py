"""Colored overlapping vertex-patch Schwarz smoothers (solvers/patches.py).

The fix for the penalty-dominated DG-Q1 h-level plateau: element-block
smoothers stall at two-grid rho ~0.9 (3D elasticity) while one colored
vertex-patch sweep contracts at ~0.24.  Reference baseline being beaten:
sequential DynamicBlockGS (iterationsteps/dynamicblockgs.hh:87-126)."""

import numpy as np
import jax
import jax.numpy as jnp

from hpdg_tpu import mesh as hmesh
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.assemble.sipg import assemble_laplace
from hpdg_tpu.assemble.elasticity import assemble_elasticity
from hpdg_tpu.assemble import l2_functional
from hpdg_tpu.linalg import blockmatrix as bm, blockvector as bv
from hpdg_tpu.solvers import patches as pat
from hpdg_tpu.solvers.multigrid import multigrid_solver


def test_patch_operator_matches_dense_restriction():
    """Each patch inverse times the dense restriction of A is identity
    (2D elasticity: vector blocks + face couplings + zero vertex-diagonal
    couplings all extracted correctly)."""
    m = hmesh.structured((3, 3))
    basis = DGBasis(m, np.ones(9, dtype=np.int32))
    A = assemble_elasticity(basis, mu=1.0, lam=1.0, penalty=8.0,
                            dirichlet=True, dtype=jnp.float64)
    Ad = np.asarray(bm.to_dense(A, basis))
    colors = pat.build_vertex_patches(m)
    invs = pat.patch_inverses(A, basis, colors)
    ncomp, bs = 2, 2 * basis.n_local(1)
    for els, inv in zip(colors, invs):
        inv = np.asarray(inv)
        for i in range(els.shape[0]):
            idx = np.concatenate([
                np.arange(ncomp * basis.offsets[e],
                          ncomp * basis.offsets[e] + bs)
                for e in els[i] if e >= 0])
            lanes = np.concatenate([
                np.arange(a * bs, (a + 1) * bs)
                for a in range(els.shape[1]) if els[i, a] >= 0])
            got = inv[i][np.ix_(lanes, lanes)]
            res = got @ Ad[np.ix_(idx, idx)]
            assert np.allclose(res, np.eye(len(idx)), atol=1e-9)


def test_patch_smoother_standalone_converges():
    """The sweep alone is a convergent iteration on SIPG Poisson."""
    m = hmesh.structured((4, 4))
    basis = DGBasis(m, np.ones(16, dtype=np.int32))
    A = assemble_laplace(basis, penalty=4.0, dirichlet=True,
                         dtype=jnp.float64)
    b = l2_functional(basis, lambda x: jnp.ones(x.shape[:-1]))
    step = jax.jit(pat.patch_smoother_step(A, basis))
    x = bv.zeros_like(b)
    nb = float(bv.norm(b))
    res = [1.0]
    for _ in range(16):
        x = step(x, b)
        res.append(float(bv.norm(bv.sub(b, bm.matvec(A, x)))) / nb)
    assert res[-1] < 1e-6, res
    assert all(r1 <= r0 * 1.0001 for r0, r1 in zip(res, res[1:]))


def _mg_rate(basis, A, b, iters=8, **mg_kw):
    step, _ = multigrid_solver(basis, A, **mg_kw)
    js = jax.jit(step)
    x = bv.zeros_like(b)
    nb = float(bv.norm(b))
    res = [1.0]
    for _ in range(iters):
        x = js(x, b)
        res.append(float(bv.norm(bv.sub(b, bm.matvec(A, x)))) / nb)
    return (res[-1] / max(res[1], 1e-300)) ** (1.0 / (iters - 1))


def test_elasticity_hpair_patch_breaks_plateau():
    """3D DG-Q1 elasticity h-pair: element-GS 3+3 plateaus (rho ~0.9,
    ROADMAP item 22); vertex-patch 1+1 contracts at ~0.24."""
    mesh_c = hmesh.structured((2, 2, 2))
    mesh_f = hmesh.refine(mesh_c)
    basis = DGBasis(mesh_f, np.ones(mesh_f.n_elements, dtype=np.int32))
    kw = dict(mu=1.0, lam=1.0, penalty=24.0, dirichlet=True,
              dtype=jnp.float64)
    A = assemble_elasticity(basis, **kw)
    b = bv.random(basis, seed=1887, ncomp=3)
    r_patch = _mg_rate(basis, A, b, meshes=[mesh_c, mesh_f],
                       smoother="patch", pre_steps=1, post_steps=1)
    r_gs = _mg_rate(basis, A, b, meshes=[mesh_c, mesh_f], smoother="gs")
    assert r_patch < 0.35, (r_patch, r_gs)
    assert r_patch < r_gs - 0.3, (r_patch, r_gs)


def test_elasticity_full_hp_hierarchy_patch_rate():
    """Config-4 hierarchy (p-chain + two geometric levels, 3D p=2
    elasticity): patch smoothing turns the ~0.93-rate GS V-cycle into a
    0.12-rate standalone solver (patches apply on every level here —
    p=2 3D elasticity patch blocks are 648 dofs, under the 1024 cap)."""
    mc = hmesh.structured((2, 2, 2))
    mm = hmesh.refine(mc)
    mf = hmesh.refine(mm)
    basis = DGBasis(mf, np.full(mf.n_elements, 2, dtype=np.int32))
    A = assemble_elasticity(basis, mu=1.0, lam=1.0, penalty=24.0,
                            dirichlet=True, dtype=jnp.float64)
    b = bv.random(basis, seed=1887, ncomp=3)
    r = _mg_rate(basis, A, b, iters=6, meshes=[mc, mm, mf],
                 smoother="patch", pre_steps=1, post_steps=1)
    assert r < 0.25, r


def test_class_patch_step_matches_per_patch():
    """Class-deduplicated patch sweep == per-patch-inverse sweep on a
    full lattice, scalar SIPG (2D) AND 3D elasticity — the memory fix
    that keeps assembled patch smoothing usable at M-DOF levels
    (bench config 4 at 1.12M vector DOFs)."""
    rng = np.random.default_rng(21)
    cases = []
    m2 = hmesh.structured((5, 4))
    b2 = DGBasis(m2, np.full(m2.n_elements, 2, dtype=np.int32))
    cases.append((b2, assemble_laplace(b2, penalty=2.0, dirichlet=True,
                                       penalty_scaling="normal",
                                       dtype=jnp.float64), 1))
    m3 = hmesh.structured((3, 3, 2))
    b3 = DGBasis(m3, np.ones(m3.n_elements, dtype=np.int32))
    cases.append((b3, assemble_elasticity(b3, mu=1.0, lam=1.0, penalty=4.0,
                                          dirichlet=True,
                                          dtype=jnp.float64), 3))
    for basis, A, ncomp in cases:
        (p,) = basis.bucket_degrees
        n = basis.bucket_size(p)
        bs = ncomp * basis.n_local(p)
        x0 = {p: jnp.asarray(rng.standard_normal((n, bs)))}
        b = {p: jnp.asarray(rng.standard_normal((n, bs)))}
        for rev in (False, True):
            s_ref = pat.patch_smoother_step(A, basis, reverse=rev)
            s_cls = pat.class_patch_smoother_step(A, basis, reverse=rev)
            y1 = np.asarray(s_ref(x0, b)[p])
            y2 = np.asarray(s_cls(x0, b)[p])
            rel = (np.linalg.norm(y1 - y2)
                   / max(np.linalg.norm(y1), 1e-300))
            assert rel < 1e-12, (ncomp, rev, rel)


def test_class_patch_rejects_non_invariant():
    """Variable-coefficient assembly breaks translation invariance;
    the class smoother must detect it and raise (multigrid then falls
    back to per-patch inverses)."""
    import pytest
    m = hmesh.structured((5, 4))
    basis = DGBasis(m, np.full(m.n_elements, 2, dtype=np.int32))
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True,
                         diffusion=lambda x: 1.0 + x[..., 0],
                         dtype=jnp.float64)
    with pytest.raises(ValueError):
        pat.class_patch_smoother_step(A, basis)


def test_patch_smoother_masked_lattice_lshape():
    """Masked lattices (absent cells -> -1 patch lanes) work: L-shape
    Poisson V-cycle with patch smoothing converges."""
    mc = hmesh.lshape(2)
    m = hmesh.refine(mc)
    basis = DGBasis(m, np.ones(m.n_elements, dtype=np.int32))
    A = assemble_laplace(basis, penalty=4.0, dirichlet=True,
                         dtype=jnp.float64)
    b = l2_functional(basis, lambda x: jnp.ones(x.shape[:-1]))
    r = _mg_rate(basis, A, b, meshes=[mc, m], smoother="patch",
                 pre_steps=1, post_steps=1)
    assert r < 0.35, r


def test_matrixfree_patch_smoother_probe_classes():
    """uniform_patch_smoother (probe-lattice class inverses, never
    assembling the level) equals the assembled-matrix patch sweep."""
    from hpdg_tpu.matrixfree.sumfact import sipg_operator
    m = hmesh.structured((4, 3, 2))
    basis = DGBasis(m, np.full(m.n_elements, 2, dtype=np.int32))
    kw = dict(penalty=3.0, dirichlet=True, penalty_scaling="normal")
    op = sipg_operator(basis, dtype=jnp.float64, **kw)
    A = assemble_laplace(basis, dtype=jnp.float64, **kw)
    mf_step = pat.uniform_patch_smoother(op, basis, 3.0, dirichlet=True,
                                         penalty_scaling="normal")
    asm_step = pat.patch_smoother_step(A, basis)
    x = bv.random(basis, seed=3)
    b = bv.random(basis, seed=4)
    got = np.asarray(mf_step(x, b)[2])
    want = np.asarray(asm_step(x, b)[2])
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 1e-11, err


def test_matrixfree_mg_patch_rate():
    """Production matrix-free MG with smoother="patch": p-chain at p=4
    contracts at ~0.02/cycle (Chebyshev-4: ~0.32)."""
    from hpdg_tpu.matrixfree.sumfact import sipg_operator
    from hpdg_tpu.solvers.multigrid import matrixfree_multigrid_solver
    m = hmesh.structured((4, 4, 4))
    basis = DGBasis(m, np.full(64, 4, dtype=np.int32))
    op = sipg_operator(basis, penalty=4.0, dirichlet=True,
                       penalty_scaling="normal", dtype=jnp.float64)
    step, _ = matrixfree_multigrid_solver(basis, penalty=4.0,
                                          dirichlet=True,
                                          penalty_scaling="normal",
                                          smoother="patch")
    js = jax.jit(step)
    b = bv.random(basis, seed=1887)
    nb = float(bv.norm(b))
    x = bv.zeros_like(b)
    res = [1.0]
    for _ in range(5):
        x = js(x, b)
        res.append(float(bv.norm(bv.sub(b, op(x)))) / nb)
    r = (res[-1] / max(res[1], 1e-300)) ** (1.0 / 4)
    assert r < 0.08, r


def test_general_patch_step_matches_dense_oracle():
    """General vertex patches (hanging nodes + mixed degrees): one
    sweep equals a dense multiplicative-Schwarz oracle at 1e-11, and at
    the hanging vertices the patches include the coarse neighbor."""
    from hpdg_tpu.mesh.adaptive import refine_local, close_marks
    m0 = hmesh.structured((3, 3))
    marks = np.zeros(9, dtype=bool)
    marks[4] = True
    m = refine_local(m0, close_marks(m0, marks))
    rng = np.random.default_rng(11)
    degrees = rng.choice([1, 2], size=m.n_elements).astype(np.int32)
    basis = DGBasis(m, degrees)
    A = assemble_laplace(basis, penalty=4.0, dirichlet=True,
                         dtype=jnp.float64)
    colors = pat.general_vertex_patches(m)
    # hanging coupling: some patch mixes element sizes
    assert any(len(np.unique(np.prod(m.extent[pa], axis=1))) > 1
               for color in colors for pa in color)
    step = pat.general_patch_smoother_step(A, basis, colors)
    x = bv.random(basis, seed=5)
    b = bv.random(basis, seed=6)
    got = bv.to_flat(basis, step(x, b))

    Ad = np.asarray(bm.to_dense(A, basis))
    xd = np.asarray(bv.to_flat(basis, x)).copy()
    bd = np.asarray(bv.to_flat(basis, b))

    def dofs(e):
        p = int(degrees[e])
        off = int(basis.offsets[e])
        return np.arange(off, off + (p + 1) ** 2)

    for color in colors:
        r = bd - Ad @ xd
        for pa in color:
            idx = np.concatenate([dofs(e) for e in pa])
            xd[idx] += np.linalg.solve(Ad[np.ix_(idx, idx)], r[idx])
    err = np.linalg.norm(np.asarray(got) - xd) / np.linalg.norm(xd)
    assert err < 1e-11, err


def test_hanging_node_mg_general_patch_rate():
    """h-pair multigrid on a hanging-node mesh: smoother="patch" routes
    to the general patch path and contracts fast."""
    from hpdg_tpu.mesh.adaptive import refine_local, close_marks
    m0 = hmesh.structured((4, 4))
    rng = np.random.default_rng(2)
    mc = refine_local(m0, close_marks(m0, rng.random(16) < 0.4))
    mf = hmesh.refine(mc)
    basis = DGBasis(mf, np.ones(mf.n_elements, dtype=np.int32))
    A = assemble_laplace(basis, penalty=4.0, dirichlet=True,
                         dtype=jnp.float64)
    b = l2_functional(basis, lambda x: jnp.ones(x.shape[:-1]))
    r = _mg_rate(basis, A, b, meshes=[mc, mf], smoother="patch",
                 pre_steps=1, post_steps=1)
    assert r < 0.2, r


def test_patch_fallback_mixed_degrees():
    """Mixed-degree levels route to the general patch path.  On this
    2x2 mesh the single vertex patch covers every element, so the
    "smoother" is an exact solve — assert the solve itself (the rate is
    a floor artifact at 1e-16)."""
    from hpdg_tpu.solvers.multigrid import multigrid_solver
    m = hmesh.structured((2, 2))
    basis = DGBasis(m, np.array([1, 2, 2, 1]))
    A = assemble_laplace(basis, penalty=4.0, dirichlet=True,
                         dtype=jnp.float64)
    b = l2_functional(basis, lambda x: jnp.ones(x.shape[:-1]))
    step, _ = multigrid_solver(basis, A, smoother="patch")
    x = bv.zeros_like(b)
    for _ in range(3):
        x = step(x, b)
    rel = float(bv.norm(bv.sub(b, bm.matvec(A, x)))) / float(bv.norm(b))
    assert rel < 1e-12, rel
