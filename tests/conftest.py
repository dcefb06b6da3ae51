"""Test configuration: run everything on CPU with 8 simulated devices so
pjit/sharding tests exercise a real multi-device mesh without TPU hardware.

Note: the JAX_PLATFORMS env var is overridden by the axon TPU plugin in this
environment, so we force the platform through jax.config instead (backends
initialize lazily, so doing this at conftest import time is early enough).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)


def pytest_collection_modifyitems(config, items):
    """Every test not marked slow is fast: `pytest -m fast` is the <2-min
    inner-loop suite on this 1-core host; the full suite (including the
    reference-oracle parity, model, kernel and sharded-render modules) runs
    with no marker filter and needs ~10+ min."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)
