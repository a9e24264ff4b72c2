"""Residual-history parity vs the independent C++ hp-MG baseline.

The BASELINE correctness bar asks for solver residual histories matching
a reference implementation to ~1e-10.  DUNE itself cannot be built here
(BASELINE.md), so the independent artifact is cpp/baseline_mg3d.cc: a
from-scratch single-core C++ hp-multigrid (lexicographic block GS 3+3,
re-assembled p/h-levels, dense coarse Cholesky) whose per-cycle residual
history is compared against the python multigrid with the
reference-exact sequential smoother (smoother="lex").
"""

import json
import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hpdg_tpu import mesh as hmesh
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.assemble import assemble_laplace, l2_functional
from hpdg_tpu.solvers.multigrid import multigrid_solver
from hpdg_tpu.linalg import blockmatrix as bm, blockvector as bv

REPO = Path(__file__).resolve().parent.parent


def _binary():
    exe = REPO / "cpp" / "baseline_mg3d"
    src = REPO / "cpp" / "baseline_mg3d.cc"
    if not exe.exists():
        if shutil.which("g++") is None:
            return None
        subprocess.run(["g++", "-O3", "-std=c++17", "-o", str(exe), str(src)],
                       check=True, timeout=300)
    return exe


@pytest.mark.skipif(shutil.which("g++") is None and
                    not (REPO / "cpp" / "baseline_mg3d").exists(),
                    reason="no native toolchain")
def test_mg_residual_history_matches_cpp_baseline():
    exe = _binary()
    n, p = 4, 2
    out = subprocess.run([str(exe), str(n), str(p), "1e-8"],
                         capture_output=True, text=True, check=True,
                         timeout=300)
    cpp = json.loads(out.stdout)

    meshes = hmesh.hierarchy(hmesh.structured((n // 2,) * 3), 1)
    basis = DGBasis(meshes[-1], np.full(meshes[-1].n_elements, p))
    kw = dict(penalty=2.0, dirichlet=True, penalty_scaling="normal")
    A = assemble_laplace(basis, **kw)
    fac = lambda bas: assemble_laplace(bas, **kw)  # noqa: E731
    f = lambda x: (2 * jnp.pi**2 * jnp.sin(jnp.pi * x[..., 0])  # noqa: E731
                   * jnp.sin(jnp.pi * x[..., 1]) * jnp.sin(jnp.pi * x[..., 2]))
    b = l2_functional(basis, f)
    step, _ = multigrid_solver(basis, A, operator_factory=fac, meshes=meshes,
                               smoother="lex", coarse="dense")
    js = jax.jit(step)
    nb = float(bv.norm(b))
    x = bv.zeros_like(b)
    hist = [1.0]
    for _ in range(len(cpp["history"]) - 1):
        x = js(x, b)
        hist.append(float(bv.norm(bv.sub(b, bm.matvec(A, x)))) / nb)

    # early cycles match far below the 1e-10 bar; late cycles sit at the
    # f64 noise floor RELATIVE TO b (absolute ~1e-16*||b||), so compare
    # with a mixed tolerance.
    for k, (a, c) in enumerate(zip(hist, cpp["history"])):
        assert abs(a - c) <= 1e-10 * abs(c) + 5e-16, (k, a, c)


def test_mg_residual_history_matches_cpp_baseline_headline():
    """History parity at the HEADLINE solve config (n=12, p=4, 216k dofs
    — the BASELINE.json MG metric): per-cycle residual histories of the
    python multigrid (reference-exact lexicographic GS, dense coarse)
    against the single-core C++ hp-MG.  The C++ history is committed as
    cpp/golden_mg3d_n12_p4.json so the test also runs toolchain-free;
    when the binary is available the golden is re-verified against a
    fresh run first."""
    n, p = 12, 4
    golden = REPO / "cpp" / "golden_mg3d_n12_p4.json"
    cpp = json.loads(golden.read_text())
    assert (cpp["n"], cpp["p"]) == (n, p)

    exe = REPO / "cpp" / "baseline_mg3d"
    if exe.exists():
        out = subprocess.run([str(exe), str(n), str(p), "1e-8"],
                             capture_output=True, text=True, check=True,
                             timeout=1200)
        fresh = json.loads(out.stdout)
        for a, c in zip(fresh["history"], cpp["history"]):
            assert abs(a - c) <= 1e-12 * abs(c) + 1e-15, (a, c)

    meshes = hmesh.hierarchy(hmesh.structured((3,) * 3), 2)
    basis = DGBasis(meshes[-1], np.full(meshes[-1].n_elements, p))
    kw = dict(penalty=2.0, dirichlet=True, penalty_scaling="normal")
    A = assemble_laplace(basis, **kw)
    fac = lambda bas: assemble_laplace(bas, **kw)  # noqa: E731
    f = lambda x: (2 * jnp.pi**2 * jnp.sin(jnp.pi * x[..., 0])  # noqa: E731
                   * jnp.sin(jnp.pi * x[..., 1]) * jnp.sin(jnp.pi * x[..., 2]))
    b = l2_functional(basis, f)
    step, _ = multigrid_solver(basis, A, operator_factory=fac, meshes=meshes,
                               smoother="lex", coarse="dense")
    js = jax.jit(step)
    nb = float(bv.norm(b))
    x = bv.zeros_like(b)
    hist = [1.0]
    for _ in range(len(cpp["history"]) - 1):
        x = js(x, b)
        hist.append(float(bv.norm(bv.sub(b, bm.matvec(A, x)))) / nb)

    # The 1e-10-relative BASELINE bar holds while the history is above
    # ~1e-4; below that the ABSOLUTE f64 noise floor governs — two
    # correct f64 implementations of the same algorithm differ by
    # ~1e-14 absolute on a 216k-dof residual norm (measured max
    # 1.1e-14), and MG dynamics amplify that into the relative figure.
    # 5e-14 gives ~4x margin over the measured floor.
    for k, (a, c) in enumerate(zip(hist, cpp["history"])):
        assert abs(a - c) <= 1e-10 * abs(c) + 5e-14, (k, a, c)
