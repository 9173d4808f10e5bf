"""Test configuration: force CPU with 8 virtual devices for sharding tests.

Mirrors the reference's test env (JAX_PLATFORMS=cpu, debug NaNs —
differt/pyproject.toml:207-210) plus a fake 8-device mesh so multi-chip
sharding code paths run in CI without TPU hardware (SURVEY.md section 4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS; force CPU via the config too so
# tests never run through the TPU tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_debug_nans", True)

assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for sharding tests"


@pytest.fixture
def key():
    return jax.random.key(1234)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
