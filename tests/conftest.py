"""Test configuration: run on a virtual 8-device CPU mesh.

Real TPU hardware is a single chip in this environment; multi-chip sharding
is validated on XLA's host-platform virtual devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon already captured into jax.config, so mutating os.environ
# above is not enough — update the config directly before any backend resolves.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)
