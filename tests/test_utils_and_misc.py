"""Config/CLI, VTU output, L1 smoother, lexicographic GS parity."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hpdg_tpu import mesh as hmesh
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.assemble import assemble_laplace
from hpdg_tpu.blocks import api
from hpdg_tpu.blocks.plot import write_vtu
from hpdg_tpu.linalg import blockmatrix as bm, blockvector as bv
from hpdg_tpu.solvers import smoothers as sm
from hpdg_tpu.utils.config import ParameterTree, parse_cli


def test_parse_cli():
    t = parse_cli(["--solver.tol=1e-8", "--mesh.n", "16", "--verbose",
                   "--name=run1"])
    assert t.get_path("solver.tol") == 1e-8
    assert t.get_path("mesh.n") == 16
    assert t.get_path("verbose") is True
    assert t.get_path("name") == "run1"
    assert t.sub("solver")["tol"] == 1e-8
    assert t.get_path("missing.key", 7) == 7


def test_parse_cli_help_exits():
    with pytest.raises(SystemExit):
        parse_cli(["--help"])


def test_write_vtu(tmp_path):
    m = hmesh.structured((2, 2))
    basis = DGBasis(m, np.array([1, 2, 3, 2]))
    x = api.interpolate(basis, lambda p: p[..., 0] + p[..., 1])
    path = str(tmp_path / "out.vtu")
    write_vtu(path, basis, x)
    data = open(path).read()
    assert "UnstructuredGrid" in data and "degree" in data
    # total sub-cells: 1 + 4 + 9 + 4 = 18
    assert data.count('<Piece') == 1
    ncells = int(data.split('NumberOfCells="')[1].split('"')[0])
    assert ncells == 18


def test_write_vtu_3d(tmp_path):
    m = hmesh.structured((2, 1, 1))
    basis = DGBasis(m, np.array([2, 1]))
    path = str(tmp_path / "out3.vtu")
    write_vtu(path, basis)
    assert os.path.getsize(path) > 0


def test_lexicographic_gs_matches_dense_gs():
    """The scan-GS must reproduce a straightforward dense block-GS sweep
    in exact element order (= the reference's DynamicBlockGS)."""
    m = hmesh.structured((3, 2))
    basis = DGBasis(m, np.full(6, 2))
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True)
    b = api.l2_functional(basis, lambda x: 1.0 + x[..., 0])
    step = sm.lexicographic_block_gs_step(A, basis)
    x = step(bv.zeros(basis), b)
    # dense reference sweep
    Ad = bm.to_dense(A, basis)
    bf = bv.to_flat(basis, b)
    xf = np.zeros_like(bf)
    bs = 9
    for e in range(6):
        sl = slice(e * bs, (e + 1) * bs)
        res = bf[sl] - Ad[sl] @ xf + Ad[sl, sl] @ xf[sl]
        xf[sl] = np.linalg.solve(Ad[sl, sl], res)
    assert np.allclose(bv.to_flat(basis, x), xf, atol=1e-11)


def test_l1_smoother_converges_and_shifts_positive():
    m = hmesh.structured((4, 4))
    basis = DGBasis(m, np.full(16, 2))
    A = assemble_laplace(basis, penalty=2.0, dirichlet=True)
    # declare couplings across the x-midline as "ghost" (a fake 2-shard cut)
    ghost = {}
    for (pr, pc), (rows, cols) in A.pattern.entries.items():
        relems = basis.bucket_elems[pr][rows]
        celems = basis.bucket_elems[pc][cols]
        xr = m.centers()[relems, 0]
        xc = m.centers()[celems, 0]
        sel = np.where((xr < 0.5) != (xc < 0.5))[0]
        if len(sel):
            ghost[(pr, pc)] = sel.astype(np.int32)
    shifts = sm.l1_shifts(A, ghost)
    assert float(sum(jnp.sum(s) for s in shifts.values())) > 0
    step = jax.jit(sm.l1_jacobi_step(A, shifts, omega=0.5))
    b = api.l2_functional(basis, lambda x: 1.0 + 0 * x[..., 0])
    x = bv.zeros(basis)
    r0 = float(bv.norm(b))
    for _ in range(200):
        x = step(x, b)
    r = float(bv.norm(bv.sub(b, bm.matvec(A, x))))
    assert r < 0.2 * r0  # converging (slowly, as Jacobi does)


def test_checkpoint_sharded_roundtrip(tmp_path):
    """orbax checkpoint of a SHARDED bucket dict: save, restore into the
    same shardings, bitwise equality + metadata roundtrip."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    from hpdg_tpu.parallel.hp import build_hp_sharded
    from hpdg_tpu.utils.checkpoint import save_solver_state, load_sharded
    import pytest
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(2)
    cells = (8, 2)
    degrees = rng.choice([1, 2], size=16)
    prob = build_hp_sharded(cells, degrees, devices=jax.devices()[:8])
    x = prob.zeros()
    x = {p: v + p for p, v in x.items()}
    save_solver_state(tmp_path / "ck", x, degrees, iteration=7, cells=cells)
    y, meta = load_sharded(tmp_path / "ck", shardings=prob.shardings)
    assert meta["iteration"] == 7 and tuple(meta["cells"]) == cells
    assert np.array_equal(np.asarray(meta["degrees"]), degrees)
    for p in x:
        assert y[p].sharding == prob.shardings[p] or \
            y[p].sharding.is_equivalent_to(prob.shardings[p], y[p].ndim)
        assert np.array_equal(np.asarray(y[p]), np.asarray(x[p]))


def test_checkpoint_manager_rotation(tmp_path):
    """Rotating solver checkpoints: last max_to_keep survive; restore
    places leaves back into the target shardings."""
    import jax
    import numpy as np
    import pytest
    from hpdg_tpu.parallel.hp import build_hp_sharded
    from hpdg_tpu.utils.checkpoint import SolverCheckpointManager
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    prob = build_hp_sharded((8, 2), np.full(16, 2),
                            devices=jax.devices()[:8])
    mgr = SolverCheckpointManager(tmp_path / "run", max_to_keep=2)
    for step in range(4):
        x = {p: v + step for p, v in prob.zeros().items()}
        assert mgr.save(step, x)
    mgr._mgr.wait_until_finished()
    assert mgr.steps() == [2, 3]
    y = mgr.restore(shardings=prob.shardings)
    for p in y:
        assert float(np.asarray(y[p]).max()) == 3.0
        assert y[p].sharding.is_equivalent_to(prob.shardings[p], y[p].ndim)
    mgr.close()
