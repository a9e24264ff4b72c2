"""Test configuration: run on CPU with 8 virtual devices and float64.

Mirrors the survey's test strategy (SURVEY.md §4): differential testing
against a slow trusted oracle at ~1e-11 tolerances needs float64, and
multi-chip sharding is validated on a virtual CPU mesh.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# The axon sitecustomize hook force-selects the TPU tunnel backend via
# jax.config.update("jax_platforms", "axon,cpu") at interpreter start;
# override it back — unit tests run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Two test tiers (README "Testing"): the sharded 8-device shard_map tests
# and C++-toolchain parity tests dominate the suite wall time, so they are
# auto-marked `slow`; `pytest -m "not slow"` is the quick tier covering
# the differential core (oracle/golden/solver tests) — ~10 min measured
# on the 1-core bench host, minutes on a normal multi-core machine.
_SLOW_MODULES = ("test_parallel", "test_parallel_hp", "test_parallel_heat",
                 "test_parallel_patches", "test_parity_cpp", "test_examples")
# individually slow tests (> ~8 s on one idle core, measured with
# --durations); each has a faster sibling keeping its feature covered in
# the quick tier
_SLOW_TESTS = (
    "test_native_refinement_loop_reaches_1e8",
    "test_elasticity_full_hp_hierarchy_patch_rate",
    "test_h_multigrid_on_curved_mesh_converges",
    "test_matrixfree_mg_patch_rate",
    "test_neumann_rhs_curved_surface_measure",
    "test_line_jacobi_step_converges",
    "test_line_jacobi_vector_blocks_converges_anisotropic",
    "test_sheared_assembly_matches_oracle",
    "test_matrixfree_elasticity_general_geometry",
    "test_matrixfree_elasticity_matches_assembled",
    "test_elasticity_diagonal_blocks_smooth",
    "test_hp_multigrid_mixed_degrees",
    "test_w_cycle_and_mf_method",
    "test_chebyshev_smoothed_matrixfree_mg",
    "test_twisted_mesh_all_paths_agree",
    "test_elasticity_3d_hp_multigrid_solve",
    "test_tensor_diffusion_vs_oracle",
    "test_tensor_diffusion_matrixfree_matches_assembled",
    "test_penalty_damped_dual_mg",
    "test_p_adaptive_loop_lshape",
    "test_h_adaptive_solve_converges",
    "test_mg_convergence_rate_is_h_independent",
    "test_semicoarsened_anisotropic_multigrid",
    "test_pallas_uniform_kernel_interpret",
    "test_tnnmg_truncated_hierarchy_option",
    # refine-driver option paths (each compiles its own chain; the
    # classic default stays in the quick tier)
    "test_tight_tolerance_keeps_anchoring",
    "test_quantized_download_correct_but_slower",
    "test_unanchored_steps_correct_with_final_anchor",
    "test_no_anchor_single_shot_estimate",
    "test_tnnmg_elasticity_contact",
    "test_heat_problem_preset",
    "test_elasticity_2d_mixed_degrees",
    "test_poisson_problem_tensor_diffusion",
    "test_sipg_with_coefficient",
    "test_mg_with_hanging_node_h_level",
    "test_unconstrained_tnnmg_equals_linear_solve",
    "test_elasticity_problem_preset",
    # onchip-refinement MG-chain drivers (whole-chain compiles; the
    # block-Jacobi quick driver test keeps the contract in the quick tier)
    "test_onchip_refinement_solve_verified",
    "test_onchip_refinement_unverified_flag",
    # 2-sweep stretched-cell rate bar (6.5 min of XLA-CPU compiles; the
    # single-sweep rate test keeps the config in the quick tier)
    "test_sharded_elasticity_stretched_rate_below_02",
    # round-5 retier (quick tier must stay <= 8 min on the 1-core bench
    # host; each entry's feature keeps a faster sibling in the quick
    # tier, named in the comment)
    "test_classic_anchored_reaches_verified_1e8",   # solve_linear onchip +
    #   blocksparse refinement cover the verified-1e-8 driver contract
    "test_onchip_refinement_fused_matches_stepwise",  # fused path exercised
    #   by test_solve_linear_onchip_method + bench; stepwise by blocksparse
    "test_onchip_refinement_block_jacobi_quick",    # same driver, heavier
    #   chain; test_truncated_exact_residual_matches_f64 keeps anchors
    "test_tensor_diffusion_matrixfree_3d",  # 2D tensor sibling in quick
    "test_onchip_refinement_blocksparse_elasticity",  # scalar blocksparse
    #   onchip test stays quick
    "test_cg_q2_coarse_solver_matches_p1_variant",  # q1 variant stays
    "test_uniform_factorized_matches_dense_stencil",  # native parity test
    #   (test_native_factorized_sipg_apply_matches_xla) keeps it covered
    "test_elasticity_multigrid_line_smoother_anisotropy",  # scalar line
    #   smoother anisotropy tests stay quick
    "test_patch_fallback_mixed_degrees",     # general patch-step oracle
    #   + probe-class tests stay quick
    "test_elasticity_hpair_patch_breaks_plateau",  # elasticity patch rate
    #   covered by slow tier; hpair construction by test_patches quick set
    "test_elasticity_normal_penalty_scaling",  # assembly-level scaling
    #   parity (test_normal_penalty_scaling_matches_oracle...) stays quick
    "test_model_zoo_on_curved_mesh",  # per-model presets stay quick
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        base = item.name.split("[")[0]
        if mod in _SLOW_MODULES or base in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
