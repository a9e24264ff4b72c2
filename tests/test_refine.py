"""Mixed-precision refinement driver (solvers/refine.py): the default
classic anchored loop must reach a VERIFIED f64 residual, and the two
wire-format options must stay correct (just slower to contract, as the
measured error analysis in the module docstring predicts)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hpdg_tpu import mesh as hmesh
from hpdg_tpu.assemble import assemble_laplace, l2_functional
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.linalg import blockmatrix as bm
from hpdg_tpu.matrixfree import sipg_operator
from hpdg_tpu.solvers.multigrid import matrixfree_multigrid_solver
from hpdg_tpu.solvers.refine import tunnel_refinement_solve


@pytest.fixture(scope="module")
def problem():
    meshes = hmesh.hierarchy(hmesh.structured((3, 3, 3)), 1)
    basis = DGBasis(meshes[-1], np.full(meshes[-1].n_elements, 2))
    f = lambda x: jnp.ones(x.shape[:-1])  # noqa: E731
    b64 = l2_functional(basis, f, dtype=jnp.float64)
    A64 = assemble_laplace(basis, penalty=2.0, dirichlet=True,
                           dtype=jnp.float64, penalty_scaling="normal")
    host_res = lambda x64: {  # noqa: E731
        k: np.asarray(v) for k, v in bm_residual(A64, b64, x64).items()}

    def bm_residual(A, b, x64):
        Ax = bm.matvec(A, {q: jnp.asarray(x64[q]) for q in x64})
        return {k: b[k] - Ax[k] for k in b}

    step, _ = matrixfree_multigrid_solver(
        basis, penalty=2.0, dirichlet=True, meshes=meshes,
        penalty_scaling="normal", smoother="patch", dtype=jnp.float32)
    op32 = sipg_operator(basis, penalty=2.0, dirichlet=True,
                         dtype=jnp.float32, penalty_scaling="normal")
    return b64, host_res, step, op32


def _true_rel(host_res, b64, x64):
    r64 = host_res(x64)
    nb = np.sqrt(sum(float(np.vdot(np.asarray(v), np.asarray(v)))
                     for v in b64.values()))
    return np.sqrt(sum(float(np.vdot(v, v)) for v in r64.values())) / nb


def test_classic_anchored_reaches_verified_1e8(problem):
    b64, host_res, step, op32 = problem
    x64, info = tunnel_refinement_solve(step, op32, b64, chain_k=3,
                                        tol=1e-8, host_residual=host_res)
    assert info["verified"]
    assert info["rel_residual"] <= 1e-8
    assert _true_rel(host_res, b64, x64) <= 1e-8
    h = info["history"]  # f64-anchored history is monotone
    assert all(h[i + 1] < h[i] for i in range(len(h) - 1))


def test_tight_tolerance_keeps_anchoring(problem):
    b64, host_res, step, op32 = problem
    x64, info = tunnel_refinement_solve(step, op32, b64, chain_k=3,
                                        tol=1e-12, max_steps=12,
                                        host_residual=host_res)
    assert info["rel_residual"] <= 1e-12
    assert _true_rel(host_res, b64, x64) <= 1e-12


def test_quantized_download_correct_but_slower(problem):
    b64, host_res, step, op32 = problem
    x64, info = tunnel_refinement_solve(step, op32, b64, chain_k=3,
                                        tol=1e-8, max_steps=14,
                                        host_residual=host_res,
                                        quantize_download=True)
    assert info["verified"] and info["rel_residual"] <= 1e-8
    assert _true_rel(host_res, b64, x64) <= 1e-8
    # the eps_i16 * kappa contraction takes more anchored steps than
    # the f32 default (measured 5.7e-2 vs 6.4e-4 per step at 32^3)
    _, info_f32 = tunnel_refinement_solve(step, op32, b64, chain_k=3,
                                          tol=1e-8,
                                          host_residual=host_res)
    assert info["steps"] >= info_f32["steps"]


def test_unanchored_steps_correct_with_final_anchor(problem):
    """anchor_every=2 skips every other upload/host-residual; the
    driver's trailing anchored loop must still deliver a verified
    tolerance despite the measured on-chip estimate drift."""
    b64, host_res, step, op32 = problem
    x64, info = tunnel_refinement_solve(step, op32, b64, chain_k=3,
                                        tol=1e-8, max_steps=12,
                                        host_residual=host_res,
                                        anchor_every=2)
    assert info["verified"] and info["rel_residual"] <= 1e-8
    assert _true_rel(host_res, b64, x64) <= 1e-8


def test_no_anchor_single_shot_estimate(problem):
    b64, host_res, step, op32 = problem
    x64, info = tunnel_refinement_solve(step, op32, b64, chain_k=3,
                                        tol=1e-8, host_residual=None)
    assert not info["verified"]
    assert info["steps"] == 1
    # one f32 chain still contracts by >= 2 decades
    assert _true_rel(host_res, b64, x64) <= 1e-2
