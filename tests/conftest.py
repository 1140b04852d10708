"""Test harness: run everything on a virtual 8-device CPU mesh.

This image registers an `axon` TPU backend via sitecustomize and pins
JAX_PLATFORMS=axon in the environment; plain env-var overrides are clobbered,
so we force the CPU backend through jax.config AFTER import (backends resolve
lazily, so this wins).  XLA_FLAGS must still be set before the first backend
initialization to get the 8 virtual CPU devices for sharding tests.

Real-TPU execution is exercised by bench.py, not the test suite.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persist compiles across runs (same cache bench.py uses; .gitignored) —
# the suite is compile-dominated on this 2-core host
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
