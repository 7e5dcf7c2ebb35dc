"""Test configuration: force CPU backend with 8 virtual devices so
multi-chip sharding tests run without TPU hardware (mirrors the
reference's backend-matrix test strategy, tests/scripts/task_unit_test.sh,
adapted to JAX).

Note: the container's sitecustomize.py imports jax with
JAX_PLATFORMS=axon before pytest starts, so the env var alone is not
enough — we must update jax.config before any backend is initialised.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
