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

# Example smokes that stay in the fast subset (each < ~15 s); everything
# else in test_examples.py is marked slow so `-m "not slow"` fits a
# 10-minute budget (the full matrix still runs in CI / the regression
# harness, tools/regression.py).
_FAST_EXAMPLE_SMOKES = {
    "test_train_gcn_example", "test_pagerank_example", "test_partition_tool",
    "test_train_spatial_example",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long example smokes (deselect with -m 'not slow')")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if (os.path.basename(str(item.fspath)) == "test_examples.py"
                and item.name not in _FAST_EXAMPLE_SMOKES):
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
