"""Test harness: force an 8-device virtual CPU mesh before JAX import.

Real-TPU runs are exercised by bench.py / the driver; unit tests validate
numerics and sharding on host so they run anywhere, fast.
"""

import os

# Force CPU even when the session env pins JAX_PLATFORMS to a TPU backend
# (e.g. the axon tunnel) — unit tests must never grab the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# A site-wide TPU plugin (axon) may have pinned jax_platforms at interpreter
# startup; override it before any backend initializes.
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

# Persistent XLA compile cache: the suite compiles many structurally identical
# programs (same configs across test files); the 2-core CI box pays minutes per
# compile otherwise.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_vloam_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
