"""Test harness configuration (SURVEY.md §5).

Tests run on the CPU backend with float64 enabled and EIGHT virtual XLA
devices, so the data-parallel shard_map/psum path (SURVEY.md §3b) is
exercised without a TPU pod — the TPU-native replacement for "multi-node
tests without a real cluster". The env vars must be set before jax imports.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# The suite's ~40 single-core minutes are dominated by XLA compiles, and
# most tests re-jit identical programs across runs — persist them. (The
# cache key includes backend/flags/jax version, so CPU test entries can't
# collide with the TPU benchmarks sharing the directory.)
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/svax-jax-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # older jax without the knobs — run uncached
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
