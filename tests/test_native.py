"""Native C++ topology kernel vs the Python face matcher."""

import numpy as np
import pytest

from hpdg_tpu import native
from hpdg_tpu import mesh as hmesh
from hpdg_tpu.mesh.structured import from_boxes
from hpdg_tpu.mesh.adaptive import refine_local


def canon(faces):
    """Canonical sorted face tuple set for comparison."""
    return sorted(zip(faces.inside.tolist(), faces.outside.tolist(),
                      faces.axis.tolist(), faces.nc_code.tolist()))


def canon_b(bf):
    return sorted(zip(bf.elem.tolist(), bf.axis.tolist(), bf.side.tolist()))


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
@pytest.mark.parametrize("dim", [2, 3])
def test_native_matches_python_conforming(dim):
    cells = (5, 4) if dim == 2 else (3, 2, 4)
    m_py = hmesh.structured(cells)
    m_nat = from_boxes(m_py.lower, m_py.extent, topology="native")
    assert canon(m_nat.faces) == canon(m_py.faces)
    assert canon_b(m_nat.bfaces) == canon_b(m_py.bfaces)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_matches_python_hanging_nodes():
    m = hmesh.structured((2, 2))
    f = refine_local(m, np.array([True, False, False, True]))
    f_nat = from_boxes(f.lower, f.extent, topology="native")
    assert canon(f_nat.faces) == canon(f.faces)
    assert canon_b(f_nat.bfaces) == canon_b(f.bfaces)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_matches_python_hanging_nodes_3d():
    m = hmesh.structured((2, 1, 1))
    f = refine_local(m, np.array([True, False]))
    f_nat = from_boxes(f.lower, f.extent, topology="native")
    assert canon(f_nat.faces) == canon(f.faces)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_hanging_nodes_exceeding_naive_face_cap():
    """Checkerboard-refined mesh has more interior faces than dim*n (the
    old native buffer cap) — regression for the out-of-bounds write."""
    m = hmesh.structured((8, 8))
    idx = np.arange(64)
    f = refine_local(m, (idx // 8 + idx % 8) % 2 == 0)
    n = f.n_elements
    assert len(f.faces) > f.dim * n  # the scenario the old cap missed
    f_nat = from_boxes(f.lower, f.extent, topology="native")
    assert canon(f_nat.faces) == canon(f.faces)
    assert canon_b(f_nat.bfaces) == canon_b(f.bfaces)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_large_mesh_speed():
    import time
    cells = (32, 32, 16)  # 16384 elements -> native path by default
    t0 = time.time()
    m = hmesh.structured(cells)
    dt = time.time() - t0
    assert len(m.faces) == (31 * 32 * 16 + 32 * 31 * 16 + 32 * 32 * 15)
    assert dt < 10.0


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_factorized_sipg_apply_matches_xla():
    """cpp hpdg_sipg_fact_apply3 == the XLA factorized apply (itself
    differential-tested against the dense stencil and the assembled
    operator) to f64 roundoff, across degrees, boundary conditions,
    penalty conventions and anisotropic lattice shapes."""
    import jax
    import jax.numpy as jnp
    from hpdg_tpu.basis.dgbasis import DGBasis
    from hpdg_tpu.matrixfree.uniform import (
        uniform_sipg_factorized, uniform_sipg_factorized_host)
    rng = np.random.default_rng(1887)
    for cells, p in [((4, 4, 4), 2), ((3, 3, 3), 4), ((6, 2, 3), 3),
                     ((1, 4, 2), 2)]:
        m = hmesh.structured(cells)
        b = DGBasis(m, np.full(int(np.prod(cells)), p))
        u = rng.standard_normal((int(np.prod(cells)), (p + 1) ** 3))
        for diri in (False, True):
            for sc in ("measure", "normal"):
                xla = uniform_sipg_factorized(b, 2.0, diri, jnp.float64, sc)
                nat = uniform_sipg_factorized_host(b, 2.0, diri, sc)
                y1 = np.asarray(xla({p: jnp.asarray(u)})[p])
                y2 = nat(u)
                err = np.abs(y1 - y2).max() / np.abs(y1).max()
                assert err < 1e-14, (cells, p, diri, sc, err)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_factorized_rejects_bad_shapes():
    from hpdg_tpu.basis.dgbasis import DGBasis
    from hpdg_tpu.matrixfree.uniform import uniform_sipg_factorized_host
    m2 = hmesh.structured((3, 3))
    with pytest.raises(ValueError, match="3D"):
        uniform_sipg_factorized_host(DGBasis(m2, np.full(9, 2)))
    m3 = hmesh.structured((2, 2, 2))
    deg = np.array([2, 2, 2, 2, 3, 3, 3, 3])
    with pytest.raises(ValueError, match="single degree"):
        uniform_sipg_factorized_host(DGBasis(m3, deg))


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_refinement_loop_reaches_1e8():
    """The bench.py iterative-refinement structure with the NATIVE host
    residual kernel: f32 matrix-free MG chains + f64 native-apply
    refinement steps drive the true f64 relative residual below 1e-8
    (validates the native host-step integration without TPU access)."""
    import jax
    import jax.numpy as jnp
    from hpdg_tpu.basis.dgbasis import DGBasis
    from hpdg_tpu.assemble import l2_functional
    from hpdg_tpu.solvers.multigrid import matrixfree_multigrid_solver
    from hpdg_tpu.matrixfree.uniform import uniform_sipg_factorized_host
    from hpdg_tpu.linalg import blockvector as bvv

    n, p = 6, 4
    meshes = [hmesh.structured((3, 3, 3))]
    meshes.append(hmesh.refine(meshes[-1]))
    mesh_mg = meshes[-1]
    basis = DGBasis(mesh_mg, np.full(mesh_mg.n_elements, p))
    f = lambda x: (2 * jnp.pi**2  # noqa: E731
                   * jnp.sin(jnp.pi * x[..., 0])
                   * jnp.sin(jnp.pi * x[..., 1])
                   * jnp.sin(jnp.pi * x[..., 2]))
    b64 = l2_functional(basis, f, dtype=jnp.float64)
    nat = uniform_sipg_factorized_host(basis, penalty=2.0, dirichlet=True,
                                       penalty_scaling="normal")
    step, _ = matrixfree_multigrid_solver(
        basis, penalty=2.0, dirichlet=True, meshes=meshes,
        penalty_scaling="normal", use_pallas=False, cheby_degree=4,
        dtype=jnp.float32)

    def chain(rhs, k=6):
        x = bvv.zeros_like(rhs)
        for _ in range(k):
            x = step(x, rhs)
        return x

    jchain = jax.jit(chain)
    b64np = np.asarray(b64[p], np.float64)

    def hstep(x64, c32, s):
        x64 = x64 + float(s) * np.asarray(c32[p], np.float64)
        r64 = b64np - nat(x64)
        nr = float(np.linalg.norm(r64))
        return x64, {p: (r64 / nr).astype(np.float32)}, nr

    nb = float(np.linalg.norm(b64np))
    x64 = np.zeros_like(b64np)
    r32 = {p: jnp.asarray((b64np / nb).astype(np.float32))}
    scale = nb
    hist = [1.0]
    for _ in range(6):
        c32 = jax.device_get(jchain(r32))
        x64, r32n, nr = hstep(x64, c32, scale)
        hist.append(nr / nb)
        if nr / nb <= 1e-8:
            break
        r32 = {p: jnp.asarray(r32n[p])}
        scale = nr
    assert hist[-1] <= 1e-8, hist
    # monotone contraction of the refinement history
    assert all(b2 < a2 for a2, b2 in zip(hist, hist[1:])), hist
