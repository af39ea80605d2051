"""Test configuration: run everything on a fake 8-device CPU backend.

XLA_FLAGS must be set before jax initialises its backends; the axon TPU
plugin forces ``jax_platforms`` programmatically at sitecustomize time, so
the env var alone is not enough — override via jax.config as well.
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

# Persistent compilation cache: the big detector/train-step graphs dominate
# suite wall time (~minutes each on this 1-core host); cache them across runs.
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache_tests")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:  # older jax without these knobs — cache is best-effort
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
