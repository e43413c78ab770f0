"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip pjit/sharding paths
are exercised without TPU hardware (the standard fake-backend technique;
SURVEY §4).  Must be set before JAX initializes its backends.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin in this image ignores the JAX_PLATFORMS env var, so
# pin the platform through the config API before any backend initializes.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1024)
