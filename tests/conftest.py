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

# Persistent XLA compilation cache: the suite's wall time is dominated by
# full-model jit compiles on this 1-core host; caching them makes every
# re-run after the first dramatically cheaper.  Keyed on HLO + backend, so
# code changes invalidate exactly the affected entries.  Opt out (for a
# clean-compile run, or to stop the cache growing) with
# DLV3_TEST_NO_COMPILE_CACHE=1; clear it by deleting the directory below.
if not os.environ.get("DLV3_TEST_NO_COMPILE_CACHE"):
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/deeplabv3plus_keras_tpu/jax_test_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    # NOTE: jax_compilation_cache_max_size (LRU eviction) was tried and
    # reverted — this JAX's eviction races on its '-atime' bookkeeping
    # files under concurrent test runs, and the resulting UserWarning
    # trips warning-sensitive tests (test_kernels probe).  Growth is
    # managed by deleting the directory; see the opt-out above.

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1024)
