"""Persistent XLA compilation cache: kill the cold-start compile.

The reference (eager PyTorch) pays no compile, but every process of this
framework pays XLA compilation up front — measured 18-40 s for the first
jitted step on v5e, and a serving ``Predictor`` compiles one program per
AOT batch bucket.  For production restarts (model-server redeploys,
preemption resume, cron re-runs of an identical recipe) that latency is
pure waste: the programs are byte-identical across runs.

JAX ships a persistent on-disk compilation cache; this module is the one
switch that turns it on with settings that actually cache everything
(JAX's defaults skip "cheap" compiles, which on a remote runtime still
cost a dispatch roundtrip each).  Wired into the drivers via
``Config.compilation_cache`` (train/serving/bench all honor it) and the
CLI ``--compile-cache`` flag; the ``JAX_COMPILATION_CACHE_DIR`` env var
JAX reads natively keeps working too.

Measured: BENCH_DETAILS.json ``coldstart`` records cold vs warm-cache
process start for the jitted predict path (scripts/measure_coldstart.py)
— the warm start recompiles nothing and loads the program from disk.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger(__name__)

_enabled_dir: str | None = None


def enable(cache_dir: str) -> str:
    """Turn on the persistent compilation cache at ``cache_dir``.

    Idempotent; subsequent calls with a different directory re-point the
    cache (JAX re-reads the config value per compile).  Safe to call
    before or after backend initialisation.  Returns the directory.
    """
    global _enabled_dir
    import jax

    cache_dir = os.path.abspath(os.path.expanduser(cache_dir))
    os.makedirs(cache_dir, exist_ok=True)
    prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    if prev and prev != cache_dir:
        # JAX initialises its cache object lazily ONCE; if a compile already
        # ran against the previous dir, re-pointing the config alone is
        # silently ignored — drop the singleton so the next compile re-reads
        from jax._src import compilation_cache as _cc
        _cc.reset_cache()
    # cache EVERYTHING: the default thresholds (1 s compile / 64 KB entry)
    # skip small programs, but on remote runtimes even those cost real
    # wall-clock, and a detector run compiles dozens of them
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    if _enabled_dir != cache_dir:
        log.info("persistent compilation cache: %s", cache_dir)
    _enabled_dir = cache_dir
    return cache_dir


def maybe_enable(cache_dir: str | None) -> str | None:
    """``enable`` when ``cache_dir`` is truthy; no-op (``None``) otherwise.

    Drivers call this with ``Config.compilation_cache`` so an empty config
    field costs nothing.
    """
    if cache_dir:
        return enable(cache_dir)
    return None
