"""Test configuration: run everything on CPU with 8 virtual devices.

This environment's sitecustomize registers a real-TPU ('axon') PJRT backend
and imports jax at interpreter startup, so JAX_PLATFORMS env tweaks from
conftest come too late — the config must be updated through jax.config.
The 8 virtual CPU devices are the 'fake backend' that lets multi-chip
sharding be tested without a real TPU slice.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
