"""Multi-process (multi-host) SPMD support.

The reference is strictly single-process (``configs/config.json:6`` pins
``cuda:0``; SURVEY §2 "parallelism strategies: none").  Everything else in
this framework is written against *global* ``jax.sharding`` meshes, which on
a real multi-host TPU slice span processes: each process can only touch the
shards that live on its local chips.  This module supplies the three
process-boundary primitives that make the same training code run under
multiple controllers:

* :func:`init_distributed` — one-call ``jax.distributed`` bring-up (picks
  the gloo CPU collectives backend when running on the CPU platform, so the
  multi-process path is testable without a TPU pod).
* :func:`put_global` / :func:`put_local` — build global arrays from host
  data, for the two data conventions that exist in the train driver: every
  process holds the SAME full value (eval batches, initial params), or each
  process holds only ITS shard (the disjoint per-process Loader batches).
* :func:`fetch_global` — ``device_get`` that works on non-addressable
  global arrays by all-gathering them to every process (eval predictions,
  checkpoint snapshots).

Single-process behaviour is unchanged: every function degrades to plain
``jax.device_put`` / ``jax.device_get`` when ``jax.process_count() == 1``,
so the rest of the codebase calls these unconditionally.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Optional

import jax
import numpy as np

log = logging.getLogger(__name__)


def is_multiprocess() -> bool:
    """True when jax runs under multiple controllers (multi-host SPMD)."""
    return jax.process_count() > 1


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialise ``jax.distributed`` for multi-controller training.

    Call once per process before any other jax use.  Arguments may come
    from the caller or from the environment (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID`` — a plain-env convention for
    launchers that aren't SLURM/TPU-pod, where ``jax.distributed`` has no
    auto-detection).  Returns True if distributed mode was (or already is)
    active, False for the single-process no-op.

    On the CPU platform the gloo collectives backend is selected — XLA:CPU
    has no cross-process collectives by default — which is how the
    multi-process integration test runs on one machine
    (``tests/test_multiprocess.py``).
    """
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    from jax._src import distributed as _dist
    if _dist.global_state.client is not None:      # already initialised
        return True
    if coordinator_address is None:
        return False                               # single-process run

    # XLA:CPU ships no cross-process collectives unless gloo is selected;
    # harmless on TPU (ICI collectives don't consult this option)
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:                              # pragma: no cover
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)
    log.info("jax.distributed up: process %d/%d, %d local / %d global devices",
             jax.process_index(), jax.process_count(),
             jax.local_device_count(), jax.device_count())
    return True


def put_global(x, sharding) -> jax.Array:
    """Place a host array every process holds IN FULL onto a global sharding.

    Single-process: plain ``device_put``.  Multi-process: each process
    uploads only the shards addressable on its local devices
    (``make_array_from_callback`` slices them out of the full value), so
    identical host copies become one coherent global array with no
    communication.
    """
    if not is_multiprocess():
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def put_local(x, sharding) -> jax.Array:
    """Assemble a global array from PER-PROCESS local shards.

    The inverse convention of :func:`put_global`: each process passes only
    its slice (e.g. the disjoint batch its sharded ``Loader`` decoded), and
    the global leading dimension becomes ``process_count`` times the local
    one, laid out in process order — matching the process-major device
    order :func:`~.mesh.make_mesh` builds its ``data`` axis from.
    """
    if not is_multiprocess():
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


def fetch_global(tree: Any) -> Any:
    """``jax.device_get`` that also works on non-addressable global arrays.

    Leaves that are fully addressable (replicated arrays, host numpy,
    single-process anything) fetch directly; arrays sharded across other
    processes are all-gathered so EVERY process returns the same full
    value.  All processes must call this at the same point (the gather is
    a collective).
    """
    if not is_multiprocess():
        return jax.device_get(tree)
    from jax.experimental import multihost_utils

    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            # fully-replicated arrays (params, opt state, losses) read the
            # local replica — no communication; only genuinely sharded
            # data (eval predictions) pays the all-gather
            if x.is_fully_replicated:
                return np.asarray(x)
            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return jax.device_get(x)

    return jax.tree_util.tree_map(fetch, tree)
