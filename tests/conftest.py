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
# The dir is keyed by the host CPU feature set: XLA:CPU caches AOT machine
# code, and loading artifacts compiled on a host with different features
# (VM migration between sessions) executes illegal instructions — observed
# as a SIGSEGV mid-suite with cpu_aot_loader "machine features" warnings.
try:
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            info = f.read()
        flags = next((ln for ln in info.splitlines()
                      if ln.startswith("flags")), "")
    except OSError:
        flags = ""
    tag = hashlib.md5(flags.encode()).hexdigest()[:10]
    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/jax_comp_cache_tests_{tag}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:  # older jax without these knobs — cache is best-effort
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bounded_executable_accumulation():
    """Free compiled executables between test modules.

    A full-suite run compiles hundreds of XLA:CPU programs into one
    process; keeping every AOT executable alive for the whole session has
    produced a deterministic late-suite SIGSEGV inside a subsequent
    compile (allocator/map pressure — 125 GB free RAM, same test passes
    in isolation).  The persistent disk cache makes any re-trace after a
    clear cheap."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.RandomState(0)
