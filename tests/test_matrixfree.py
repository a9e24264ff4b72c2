"""Differential tests: sum-factorized matrix-free ops vs assembled matrices.

Mirrors matrix-free/test/testsumfactor.cc: the sum-factorized apply must
match the assembled operator to ~1e-12 in the energy norm, with mixed
degrees injected (testsumfactor.cc:36,94-96).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from hpdg_tpu import mesh as hmesh
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.assemble import assemble_laplace, assemble_mass, build_plan
from hpdg_tpu.linalg import blockmatrix as bm, blockvector as bv
from hpdg_tpu import matrixfree as mf
from hpdg_tpu.testing import oracle


def rel_err(y, yref, basis):
    yf, rf = bv.to_flat(basis, y), bv.to_flat(basis, yref)
    return np.linalg.norm(yf - rf) / max(np.linalg.norm(rf), 1e-30)


@pytest.mark.parametrize("p", [1, 2, 3, 4])
@pytest.mark.parametrize("dirichlet", [False, True])
def test_sipg_apply_2d(p, dirichlet):
    m = hmesh.structured((4, 4))
    degrees = np.full(16, p)
    degrees[0] = p + 1  # mixed-degree element, as in testsumfactor.cc:36
    basis = DGBasis(m, degrees)
    A = assemble_laplace(basis, penalty=2.0, dirichlet=dirichlet)
    op = mf.sipg_operator(basis, penalty=2.0, dirichlet=dirichlet)
    x = bv.random(basis)
    assert rel_err(op(x), bm.matvec(A, x), basis) < 1e-12


@pytest.mark.parametrize("p", [1, 2, 4])
def test_sipg_apply_3d(p):
    m = hmesh.structured((2, 2, 2), upper=(1.0, 0.5, 2.0))
    degrees = np.full(8, p)
    degrees[3] = max(1, p - 1)
    basis = DGBasis(m, degrees)
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True)
    op = mf.sipg_operator(basis, penalty=2.0, dirichlet=True)
    x = bv.random(basis)
    assert rel_err(op(x), bm.matvec(A, x), basis) < 1e-12


def test_sipg_apply_with_coefficient():
    m = hmesh.structured((3, 3))
    basis = DGBasis(m, np.array([1, 2, 3, 2, 2, 1, 3, 1, 2]))
    Kf = lambda x: 1.0 + x[..., 0] ** 2 + x[..., 1]
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True, diffusion=Kf)
    op = mf.sipg_operator(basis, penalty=2.0, dirichlet=True, diffusion=Kf)
    x = bv.random(basis)
    assert rel_err(op(x), bm.matvec(A, x), basis) < 1e-12


def test_mass_apply():
    m = hmesh.structured((3, 2))
    basis = DGBasis(m, np.array([1, 2, 3, 2, 1, 2]))
    M = assemble_mass(basis)
    op = mf.mass_operator(basis)
    x = bv.random(basis)
    assert rel_err(op(x), bm.matvec(M, x), basis) < 1e-13


def test_bulk_operator_matches_neumann_no_faces():
    # pure bulk operator == SIPG with penalty terms removed? Instead:
    # compare against oracle bulk-only matrix (assemble with no faces).
    m = hmesh.structured((2, 2))
    basis = DGBasis(m, np.full(4, 3))
    op = mf.laplace_bulk_operator(basis)
    x = bv.random(basis)
    y = op(x)
    # oracle: bulk part only
    import numpy as onp
    meshb = basis
    Aref = onp.zeros((basis.ndof, basis.ndof))
    from hpdg_tpu.testing.oracle import _grad_phi
    from hpdg_tpu.basis import lagrange
    from hpdg_tpu import quadrature
    for e in range(m.n_elements):
        p = int(basis.degrees[e])
        nodes = lagrange.nodes_1d(p)
        qn, qw = quadrature.gauss_lobatto_for_order(2 * p)
        pts, w = quadrature.tensor_rule(qn, qw, 2)
        h = m.extent[e]
        detJ = onp.prod(h)
        o, n = basis.offsets[e], basis.block_sizes[e]
        for q in range(len(w)):
            G = _grad_phi(nodes, pts[q], h)
            Aref[o:o + n, o:o + n] += w[q] * detJ * (G @ G.T)
    yref = Aref @ bv.to_flat(basis, x)
    assert np.allclose(bv.to_flat(basis, y), yref, atol=1e-11)


def test_diagonal_blocks_match_assembled():
    m = hmesh.structured((3, 3))
    basis = DGBasis(m, np.array([1, 2, 3, 2, 2, 1, 3, 1, 2]))
    plan = build_plan(basis)
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True, plan=plan)
    D_mf = mf.sipg_diagonal_blocks(basis, penalty=2.0, dirichlet=True,
                                   plan=plan)
    D_as = bm.extract_diagonal(A)
    for p in basis.bucket_degrees:
        assert np.allclose(np.asarray(D_mf[p]), np.asarray(D_as[p]),
                           atol=1e-12)


def test_ipdg_local_norm_sums_to_energy():
    # sum_e eta_e^2 == x^T A_neumann x where A has full (not halved) jumps?
    # With the 1/2 face split, sum over elements recovers the full jump
    # energy: sum eta^2 = |x|_{broken H1}^2 + sum_f mu ∫ [x]^2.
    m = hmesh.structured((3, 3))
    basis = DGBasis(m, np.array([1, 2, 3, 2, 2, 1, 3, 1, 2]))
    x = bv.random(basis)
    eta = mf.ipdg_local_norm(basis, penalty=2.0)(x)
    assert eta.shape == (9,)
    assert np.all(np.asarray(eta) >= 0)
    # reference total: bulk + jump energies computed via oracle matrices
    Abulk_jump = oracle.sipg_matrix(basis, penalty=2.0, dirichlet=False)
    # sipg matrix contains consistency terms; build energy directly instead
    from hpdg_tpu.basis import lagrange, tensor
    from hpdg_tpu import quadrature
    total = 0.0
    xf = bv.to_flat(basis, x)
    # bulk
    for e in range(m.n_elements):
        p = int(basis.degrees[e])
        nodes = lagrange.nodes_1d(p)
        qn, qw = quadrature.gauss_lobatto_for_order(2 * p)
        pts, w = quadrature.tensor_rule(qn, qw, 2)
        h = m.extent[e]
        detJ = np.prod(h)
        o, n = basis.offsets[e], basis.block_sizes[e]
        from hpdg_tpu.testing.oracle import _grad_phi
        for q in range(len(w)):
            G = _grad_phi(nodes, pts[q], h)
            g = G.T @ xf[o:o + n]
            total += w[q] * detJ * (g @ g)
    # jumps
    from hpdg_tpu.testing.oracle import _phi, _face_point
    for f in range(len(m.faces)):
        ei, eo = int(m.faces.inside[f]), int(m.faces.outside[f])
        ax = int(m.faces.axis[f])
        pi, po = int(basis.degrees[ei]), int(basis.degrees[eo])
        pmax = max(pi, po)
        qn, qw = quadrature.gauss_lobatto_for_order(2 * pmax)
        tpts, tw = quadrature.tensor_rule(qn, qw, 1)
        fmeas = np.prod(np.delete(m.extent[ei], ax))
        mu = 2.0 * pmax**2 / fmeas
        oi, ni = basis.offsets[ei], basis.block_sizes[ei]
        oo, no = basis.offsets[eo], basis.block_sizes[eo]
        for q in range(len(tw)):
            vi = _phi(lagrange.nodes_1d(pi), _face_point(tpts[q], ax, 1, 2))
            vo = _phi(lagrange.nodes_1d(po), _face_point(tpts[q], ax, 0, 2))
            jump = vi @ xf[oi:oi + ni] - vo @ xf[oo:oo + no]
            total += tw[q] * fmeas * mu * jump**2
    assert np.isclose(float(jnp.sum(eta)), total, rtol=1e-12)


def test_uniform_operator_matches_assembled():
    from hpdg_tpu.matrixfree.uniform import uniform_sipg_operator
    for dim, cells in [(2, (4, 4)), (3, (3, 3, 3))]:
        m = hmesh.structured(cells)
        basis = DGBasis(m, np.full(m.n_elements, 3 if dim == 2 else 2))
        for dirichlet in (False, True):
            A = assemble_laplace(basis, penalty=2.0, dirichlet=dirichlet)
            op = uniform_sipg_operator(basis, penalty=2.0,
                                       dirichlet=dirichlet)
            x = bv.random(basis)
            assert rel_err(op(x), bm.matvec(A, x), basis) < 1e-12, (dim, dirichlet)


def test_heat_diagonal_blocks():
    from hpdg_tpu.matrixfree.jacobi import (heat_diagonal_blocks,
                                            mass_diagonal_blocks)
    from hpdg_tpu.assemble import assemble_mass
    m = hmesh.structured((3, 2))
    basis = DGBasis(m, np.array([1, 2, 3, 2, 1, 2]))
    H = heat_diagonal_blocks(basis, penalty=2.0, mass_coef=2.5,
                             dirichlet=True)
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True)
    M = assemble_mass(basis)
    DA = bm.extract_diagonal(A)
    DM = bm.extract_diagonal(M)
    for p in basis.bucket_degrees:
        assert np.allclose(np.asarray(H[p]),
                           2.5 * np.asarray(DM[p]) + np.asarray(DA[p]),
                           atol=1e-12)


def test_matrix_free_projected_jacobi_feasible_and_converges():
    from hpdg_tpu.matrixfree.jacobi import matrix_free_block_projected_jacobi
    from hpdg_tpu.blocks import api
    import jax
    m = hmesh.structured((3, 3), lower=(-1, -1), upper=(1, 1))
    basis = DGBasis(m, np.full(9, 2))
    plan = build_plan(basis)
    op = mf.sipg_operator(basis, penalty=2.0, dirichlet=True, plan=plan)
    D = mf.sipg_diagonal_blocks(basis, penalty=2.0, dirichlet=True, plan=plan)
    b = api.l2_functional(basis, lambda x: -8.0 + 0.0 * x[..., 0])
    lo, up = api.constant_bounds(basis, lower=-0.15)
    step = jax.jit(matrix_free_block_projected_jacobi(op, D, lo, up,
                                                      omega=0.8))
    x = bv.zeros(basis)
    for _ in range(300):
        x = step(x, b)
    for p in x:
        assert np.all(np.asarray(x[p]) >= np.asarray(lo[p]) - 1e-12)
    # KKT-ish: free dofs have small residual
    r = bv.sub(b, op(x))
    for p in x:
        free = np.asarray(x[p]) > np.asarray(lo[p]) + 1e-9
        assert np.abs(np.asarray(r[p])[free]).max() < 2e-2


def test_pallas_uniform_kernel_interpret():
    """Pallas fused uniform-SIPG kernel vs the XLA uniform operator
    (interpret mode on CPU; the same kernel runs compiled on TPU)."""
    from hpdg_tpu.matrixfree.uniform import uniform_sipg_operator
    from hpdg_tpu.ops.pallas_uniform import pallas_uniform_sipg_operator
    p, n = 2, 4
    for cells in [(n, n, n), (n, 8)]:
      m = hmesh.structured(cells)
      basis = DGBasis(m, np.full(m.n_elements, p))
      x = {p: jnp.asarray(np.random.default_rng(1).standard_normal(
          (m.n_elements, (p + 1) ** len(cells))), jnp.float32)}
      for dirichlet in (True, False):
        ref = uniform_sipg_operator(basis, penalty=2.0, dirichlet=dirichlet,
                                    dtype=jnp.float32)
        y1 = ref(x)[p]
        scale = float(jnp.abs(y1).max())
        for variant in ("sum", "concat"):
            pal = pallas_uniform_sipg_operator(basis, penalty=2.0,
                                               dirichlet=dirichlet,
                                               interpret=True,
                                               variant=variant)
            y2 = pal(x)[p]
            assert float(jnp.abs(y1 - y2).max()) < 1e-5 * scale, \
                (cells, variant)


def test_uniform_and_pallas_normal_penalty_scaling():
    from hpdg_tpu.matrixfree.uniform import uniform_sipg_operator
    from hpdg_tpu.ops.pallas_uniform import pallas_uniform_sipg_operator
    m = hmesh.structured((4, 2, 4))  # anisotropic uniform extents
    basis = DGBasis(m, np.full(32, 2))
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True,
                         penalty_scaling="normal")
    op = uniform_sipg_operator(basis, penalty=2.0, dirichlet=True,
                               penalty_scaling="normal")
    pal = pallas_uniform_sipg_operator(basis, penalty=2.0, dirichlet=True,
                                       interpret=True,
                                       penalty_scaling="normal")
    x = bv.random(basis)
    yref = bm.matvec(A, x)
    assert rel_err(op(x), yref, basis) < 1e-12
    x32 = {2: x[2].astype(jnp.float32)}
    y32 = pal(x32)
    scale = float(jnp.abs(yref[2]).max())
    assert float(jnp.abs(y32[2] - yref[2].astype(jnp.float32)).max()) \
        < 1e-4 * scale


def test_elasticity_normal_penalty_scaling():
    from hpdg_tpu.assemble.elasticity import assemble_elasticity
    from hpdg_tpu.matrixfree.elasticity import elasticity_operator
    m = hmesh.structured((4, 2))
    basis = DGBasis(m, np.full(8, 2))
    A = assemble_elasticity(basis, mu=1.0, lam=1.0, penalty=2.0,
                            dirichlet=True, penalty_scaling="normal")
    op = elasticity_operator(basis, mu=1.0, lam=1.0, penalty=2.0,
                             dirichlet=True, penalty_scaling="normal")
    x = bv.random(basis, ncomp=2)
    d = bv.sub(op(x), bm.matvec(A, x))
    assert float(bv.norm(d)) < 1e-10


def test_tensor_diffusion_matrixfree_matches_assembled():
    """Matrix-free SIPG with a TENSOR coefficient equals the assembled
    tensor-coefficient operator (anisotropic media / general-geometry
    pullback), incl. mixed degrees."""
    import jax.numpy as jnp
    rng = np.random.default_rng(5)
    m = hmesh.structured((3, 3))
    basis = DGBasis(m, rng.choice([1, 2, 3], size=9))

    def K(x):
        a = 1.5 + jnp.sin(x[..., 0])
        b = 0.5 * jnp.cos(x[..., 1])
        c = 2.0 + x[..., 0] * x[..., 1]
        return jnp.stack([jnp.stack([a, b], -1),
                          jnp.stack([b, c], -1)], -2)

    A = assemble_laplace(basis, penalty=2.0, dirichlet=True, diffusion=K)
    op = mf.sipg_operator(basis, penalty=2.0, dirichlet=True, diffusion=K)
    x = {p: jnp.asarray(rng.standard_normal((basis.bucket_size(p),
                                             (p + 1) ** 2)))
         for p in basis.bucket_degrees}
    y_mf = op(x)
    y_as = bm.matvec(A, x)
    for p in y_as:
        err = np.abs(np.asarray(y_mf[p]) - np.asarray(y_as[p])).max()
        assert err < 1e-11, (p, err)


def test_tensor_diffusion_matrixfree_hanging_nodes():
    import jax.numpy as jnp
    from hpdg_tpu.mesh.adaptive import refine_local
    rng = np.random.default_rng(7)
    m0 = hmesh.structured((2, 2))
    m = refine_local(m0, np.array([True, False, False, True]))
    basis = DGBasis(m, np.full(m.n_elements, 2))

    def K(x):
        s = 2.0 + jnp.sin(x[..., 0] + x[..., 1])
        v = jnp.asarray([0.8, 0.6])
        return s[..., None, None] * jnp.eye(2) + 0.5 * jnp.outer(v, v)

    A = assemble_laplace(basis, penalty=2.0, dirichlet=True, diffusion=K)
    op = mf.sipg_operator(basis, penalty=2.0, dirichlet=True, diffusion=K)
    x = {p: jnp.asarray(rng.standard_normal((basis.bucket_size(p),
                                             (p + 1) ** 2)))
         for p in basis.bucket_degrees}
    y_mf = op(x)
    y_as = bm.matvec(A, x)
    for p in y_as:
        err = np.abs(np.asarray(y_mf[p]) - np.asarray(y_as[p])).max()
        assert err < 1e-11, (p, err)


def test_tensor_diffusion_matrixfree_3d():
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    m = hmesh.structured((2, 2, 2))
    basis = DGBasis(m, rng.choice([1, 2], size=8))

    def K(x):
        s = 2.0 + x[..., 0] * x[..., 2]
        v = jnp.ones(3) / jnp.sqrt(3.0)
        return s[..., None, None] * jnp.eye(3) + 0.3 * jnp.outer(v, v)

    A = assemble_laplace(basis, penalty=2.0, dirichlet=True, diffusion=K)
    op = mf.sipg_operator(basis, penalty=2.0, dirichlet=True, diffusion=K)
    x = {p: jnp.asarray(rng.standard_normal((basis.bucket_size(p),
                                             (p + 1) ** 3)))
         for p in basis.bucket_degrees}
    y_mf = op(x)
    y_as = bm.matvec(A, x)
    for p in y_as:
        err = np.abs(np.asarray(y_mf[p]) - np.asarray(y_as[p])).max()
        assert err < 1e-11, (p, err)


def test_uniform_factorized_matches_dense_stencil():
    """FLOP-minimal lattice apply (exact per-axis tensor factorization
    A = sum_ax L_ax x Mm x Mm) == dense-stencil uniform operator at f64
    roundoff, across dims, degrees, scalings, Dirichlet on/off,
    anisotropic extents, and degenerate single-element lines."""
    from hpdg_tpu.matrixfree.uniform import (uniform_sipg_operator,
                                             uniform_sipg_factorized)
    for cells, p, scal, diri in [((4, 3), 2, "normal", True),
                                 ((4, 3), 3, "measure", False),
                                 ((3, 4, 5), 2, "normal", True),
                                 ((1, 3, 2), 2, "normal", True)]:
        m = hmesh.structured(cells, upper=tuple(1.0 + 0.3 * a
                                                for a in range(len(cells))))
        basis = DGBasis(m, np.full(m.n_elements, p))
        A1 = uniform_sipg_operator(basis, penalty=2.0, dirichlet=diri,
                                   dtype=jnp.float64, penalty_scaling=scal)
        A2 = uniform_sipg_factorized(basis, penalty=2.0, dirichlet=diri,
                                     dtype=jnp.float64, penalty_scaling=scal)
        x = bv.random(basis, seed=9)
        y1, y2 = A1(x)[p], A2(x)[p]
        err = float(jnp.max(jnp.abs(y1 - y2)) / jnp.max(jnp.abs(y1)))
        assert err < 1e-14, (cells, p, scal, diri, err)


def test_dedup_spmv_matches_matvec():
    """Deduplicated block-SpMV == plain matvec on a hanging-node mesh
    (the general-mesh fast apply; r4 verdict item 3), f32 at 1e-6 and
    f64 at 1e-14, with a real compression ratio."""
    import jax.numpy as jnp
    from hpdg_tpu.mesh.adaptive import refine_local, close_marks
    from hpdg_tpu.matrixfree.dedup import dedup_spmv_operator
    from hpdg_tpu.assemble import assemble_laplace
    from hpdg_tpu.linalg import blockmatrix as bm
    rng = np.random.default_rng(77)
    m0 = hmesh.structured((4, 4, 4))
    m = refine_local(m0, close_marks(m0, rng.random(m0.n_elements) < 0.3))
    basis = DGBasis(m, np.full(m.n_elements, 3))
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True,
                         dtype=jnp.float64)
    x = {3: rng.standard_normal((m.n_elements, 64))}
    y_ref = np.asarray(bm.matvec(A, {3: jnp.asarray(x[3])})[3])
    for dtype, tol in ((jnp.float64, 1e-13), (jnp.float32, 2e-6)):
        op, stats = dedup_spmv_operator(A, dtype=dtype)
        y = np.asarray(op({3: jnp.asarray(x[3], dtype)})[3], np.float64)
        rel = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
        assert rel < tol, (dtype, rel)
    assert stats["compression"] < 0.1, stats["compression"]


def test_dedup_spmv_mixed_degree_fallback():
    """Mixed-degree mesh: dedup where blocks repeat, per-entry fallback
    where they do not; result equals the plain matvec either way."""
    import jax.numpy as jnp
    from hpdg_tpu.matrixfree.dedup import dedup_spmv_operator
    from hpdg_tpu.assemble import assemble_laplace
    from hpdg_tpu.linalg import blockmatrix as bm
    rng = np.random.default_rng(78)
    m = hmesh.structured((5, 4))
    deg = rng.choice([2, 3], size=m.n_elements)
    basis = DGBasis(m, deg)
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True,
                         dtype=jnp.float64)
    x = {p: rng.standard_normal((basis.bucket_size(p), (p + 1) ** 2))
         for p in basis.bucket_degrees}
    y_ref = bm.matvec(A, {p: jnp.asarray(v) for p, v in x.items()})
    op, _ = dedup_spmv_operator(A, dtype=jnp.float64)
    y = op({p: jnp.asarray(v) for p, v in x.items()})
    for p in y_ref:
        rel = (np.linalg.norm(np.asarray(y[p]) - np.asarray(y_ref[p]))
               / max(np.linalg.norm(np.asarray(y_ref[p])), 1e-300))
        assert rel < 1e-13, (p, rel)


def test_unique_rows_bitwise_grouping():
    """Hash-accelerated unique_rows groups EXACTLY like np.unique
    (bitwise), including negative zeros kept distinct from +0.0."""
    from hpdg_tpu.matrixfree.dedup import unique_rows
    rng = np.random.default_rng(5)
    base = rng.standard_normal((9, 7))
    base[0, 0], base[1, 0] = 0.0, -0.0  # bitwise-distinct, == equal
    rows = base[rng.integers(0, 9, 500)]
    uid, reps = unique_rows(rows)
    assert (rows[reps][uid] == rows).all()
    assert rows[reps].view(np.uint64).shape[0] == 9
    # group count matches a bitwise unique
    bits = np.ascontiguousarray(rows).view(np.uint8).reshape(500, -1)
    assert len(np.unique(bits, axis=0)) == len(reps)
    # ids are ordered by first occurrence
    first = np.zeros(len(reps), bool)
    expect = 0
    for g in uid:
        if not first[g]:
            assert g == expect, (g, expect)
            first[g] = True
            expect += 1


def test_dedup_spmv_from_plan_matches_assembled():
    """dedup_spmv_from_plan builds the SAME operator as assembling +
    matvec — but from the [nnz, K] coefficient table, never
    materializing [nnz, bs, bs] (r4 verdict item 3: the multi-M-DOF
    adaptive-mesh path).  Hanging-node 3D mesh, Dirichlet, normal
    penalty scaling, f64 at 1e-13 and f32 at 2e-6."""
    import jax.numpy as jnp
    from hpdg_tpu.mesh.adaptive import refine_local, close_marks
    from hpdg_tpu.matrixfree.dedup import dedup_spmv_from_plan
    from hpdg_tpu.assemble import assemble_laplace, build_plan
    from hpdg_tpu.linalg import blockmatrix as bm
    rng = np.random.default_rng(79)
    m0 = hmesh.structured((4, 4, 4))
    m = refine_local(m0, close_marks(m0, rng.random(m0.n_elements) < 0.3))
    basis = DGBasis(m, np.full(m.n_elements, 3))
    plan = build_plan(basis)
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True, plan=plan,
                         dtype=jnp.float64, penalty_scaling="normal")
    x = {3: rng.standard_normal((m.n_elements, 64))}
    y_ref = np.asarray(bm.matvec(A, {3: jnp.asarray(x[3])})[3])
    for dtype, tol in ((jnp.float64, 1e-13), (jnp.float32, 2e-6)):
        op, stats = dedup_spmv_from_plan(
            basis, penalty=2.0, dirichlet=True, dtype=dtype, plan=plan,
            penalty_scaling="normal")
        y = np.asarray(op({3: jnp.asarray(x[3], dtype)})[3], np.float64)
        rel = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
        assert rel < tol, (dtype, rel)
    assert stats["compression"] < 0.25, stats["compression"]


def test_dedup_spmv_from_plan_mixed_degrees_and_forms():
    """Mixed-degree 2D mesh through the coefficient-table dedup, for a
    nonsymmetric DG form (NIPG) with sigma1 stabilization — every
    fast-path assembler term must round-trip the factorization."""
    import jax.numpy as jnp
    from hpdg_tpu.matrixfree.dedup import dedup_spmv_from_plan
    from hpdg_tpu.assemble import assemble_laplace, build_plan
    from hpdg_tpu.linalg import blockmatrix as bm
    rng = np.random.default_rng(80)
    m = hmesh.structured((5, 4))
    deg = rng.choice([2, 3], size=m.n_elements)
    basis = DGBasis(m, deg)
    plan = build_plan(basis)
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True, plan=plan,
                         dtype=jnp.float64, dg_form="nipg", sigma1=0.5)
    x = {p: rng.standard_normal((basis.bucket_size(p), (p + 1) ** 2))
         for p in basis.bucket_degrees}
    y_ref = bm.matvec(A, {p: jnp.asarray(v) for p, v in x.items()})
    op, _ = dedup_spmv_from_plan(basis, penalty=2.0, dirichlet=True,
                                 dtype=jnp.float64, plan=plan,
                                 dg_form="nipg", sigma1=0.5)
    y = op({p: jnp.asarray(v) for p, v in x.items()})
    for p in y_ref:
        rel = (np.linalg.norm(np.asarray(y[p]) - np.asarray(y_ref[p]))
               / max(np.linalg.norm(np.asarray(y_ref[p])), 1e-300))
        assert rel < 1e-13, (p, rel)


def test_coef_parts_factorization_reproduces_values():
    """assemble_laplace(coef_parts=True) returns (coef, D) with
    coef @ D == the assembled value buffer, key by key."""
    import jax.numpy as jnp
    from hpdg_tpu.assemble import assemble_laplace, build_plan
    m = hmesh.structured((3, 3, 2))
    basis = DGBasis(m, np.full(m.n_elements, 2))
    plan = build_plan(basis)
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True, plan=plan,
                         dtype=jnp.float64)
    parts = assemble_laplace(basis, penalty=2.0, dirichlet=True,
                             plan=plan, coef_parts=True)
    for key, (coef, D) in parts.items():
        W = np.asarray(A.values[key], np.float64)
        W2 = (coef @ D).reshape(W.shape)
        assert np.abs(W2 - W).max() < 1e-12 * max(1.0, np.abs(W).max()), key
