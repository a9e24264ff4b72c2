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

# The axon sitecustomize hook force-selects the TPU tunnel backend via
# jax.config.update("jax_platforms", "axon,cpu") at interpreter start;
# override it back — unit tests run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
