"""Test configuration: force CPU JAX with a virtual 8-device mesh so all
sharding tests run without TPU hardware (SURVEY.md §4c strategy)."""

import os

# Must be set before jax import anywhere in the test process.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) forces jax_platforms at registration
# time, overriding the env var — override it back before any backend init.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def eight_devices():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    return jax.devices()
