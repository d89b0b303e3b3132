"""Test harness configuration.

Runs the whole suite on CPU with 8 virtual XLA devices so the sharding
logic is exercised without TPU hardware (SURVEY.md §4), and enables x64
so SciPy/pandas parity oracles can assert <=1e-8.

Must set env vars before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even if a TPU is attached
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# sitecustomize may have imported jax (registering a TPU plugin) before this
# conftest ran, so the env var alone is not enough — set the config directly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# The suite is compile-dominated (hundreds of small jits at x64 on the
# 8-device virtual mesh); a persistent compilation cache cuts repeat runs
# by several-fold. Keyed by jaxlib version automatically, safe to share.
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.expanduser("~"), ".cache", "ivtpu_test_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # older jaxlib without the knob — cache is best-effort
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
