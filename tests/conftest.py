"""Test harness config: run JAX on a virtual 8-device CPU mesh.

The environment registers a remote TPU backend (axon) via sitecustomize
before conftest runs, so env vars are too late — but backend *selection*
is lazy, so `jax.config.update` still wins. Multi-chip sharding paths are
exercised without TPU hardware via 8 virtual CPU devices (SURVEY.md §4).
"""
import os

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
