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
# auto-marked `slow`; `pytest -m "not slow"` is the <5 min quick tier
# covering the differential core (oracle/golden/solver tests).
_SLOW_MODULES = ("test_parallel", "test_parallel_hp", "test_parallel_heat",
                 "test_parity_cpp", "test_examples")


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
