"""Test configuration: force the CPU backend with 8 virtual devices BEFORE
jax is imported anywhere, so sharding/collective tests run without TPU
hardware (the standard jax multi-host-without-a-cluster trick, SURVEY §4.5)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/TPU default
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon sitecustomize force-registers the TPU backend and sets
# jax_platforms="axon,cpu" via jax.config (overriding the env var) — undo it
# here so CI runs on the virtual-device CPU mesh
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
