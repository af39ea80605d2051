"""Tracing / profiling / debugging hooks (SURVEY §5: absent in the reference
— its only observability is tqdm bars).

* :func:`trace` — context manager around ``jax.profiler`` emitting a
  Perfetto-compatible trace directory;
* :func:`annotate` — named trace region for labelling phases (data, step,
  eval) inside a trace;
* :func:`enable_nan_checks` — the JAX-native race/corruption analogue:
  every jitted computation re-runs un-jitted when it produces NaNs and
  raises with the offending primitive;
* :func:`device_memory_stats` — per-device live-buffer accounting.
"""

from __future__ import annotations

import contextlib
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Profile everything inside the block -> ``log_dir`` (Perfetto/XPlane)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside an active trace: ``with annotate("train_step"):``."""
    return jax.profiler.TraceAnnotation(name)


def enable_nan_checks(enable: bool = True):
    """Toggle ``jax_debug_nans`` (NaN provenance mode)."""
    jax.config.update("jax_debug_nans", enable)


def device_memory_stats() -> Dict[str, Optional[dict]]:
    """Live memory stats per device (None where the backend lacks support)."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
