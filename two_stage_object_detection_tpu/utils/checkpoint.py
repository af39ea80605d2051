"""Checkpoint save/restore (Orbax).

Equivalent of the reference's ``torch.save``/``load_state_dict`` of
model+optimizer+scheduler dicts with ``*_best`` / ``*_last`` naming
(``train/train.py:60-72,122-129,136-143``).  Stores the full train state
(params, batch_stats, opt_state, step), so restarts resume exactly.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

BEST = "FasterRCNNTrainer_best"    # keep the reference's naming contract
LAST = "FasterRCNNTrainer_last"


def _ckptr() -> ocp.Checkpointer:
    # ocp.PyTreeCheckpointer / the `item=` restore kwarg are deprecated;
    # StandardCheckpointer is the supported pytree save/restore surface.
    return ocp.StandardCheckpointer()


# in-flight async save (at most one: a second wait-free save waits for the
# first — Orbax requires it, and it naturally bounds dirty data to one save)
_inflight: Optional[ocp.Checkpointer] = None


def save_checkpoint(path: str, state: Any, name: str = LAST,
                    wait: bool = True) -> str:
    """Save a pytree (e.g. TrainState) under ``path/name``.

    ``wait=True`` (default) blocks until durable — the reference's
    ``torch.save`` contract (``train/train.py:122-143``).  ``wait=False``
    returns once the host copy of ``state`` is snapshotted and lets the
    disk write proceed in Orbax's background thread, overlapping
    checkpoint IO with the next training steps (the periodic ``_last``
    crash-resume saves don't need read-after-write).  Call
    :func:`wait_for_saves` before relying on the file (end of training,
    or before restoring).
    """
    global _inflight
    from two_stage_object_detection_tpu.parallel.multiprocess import (
        fetch_global)
    full = os.path.abspath(os.path.join(path, name))
    wait_for_saves()                     # one async save in flight at a time
    ckptr = _ckptr()
    # fetch_global: on a multi-controller run, arrays sharded across other
    # processes are all-gathered so every process hands Orbax the same
    # full host tree (all processes MUST call save — Orbax coordinates
    # internally and writes replicated host data from process 0)
    ckptr.save(full, fetch_global(state), force=True)
    if wait:
        ckptr.wait_until_finished()
    else:
        _inflight = ckptr
    return full


def wait_for_saves() -> None:
    """Block until any ``wait=False`` save is durable on disk."""
    global _inflight
    if _inflight is not None:
        _inflight.wait_until_finished()
        _inflight = None


def restore_checkpoint(path: str, target: Any, name: str = BEST,
                       params_only: bool = False) -> Optional[Any]:
    """Restore into the structure of ``target``; None if absent.

    ``params_only`` mirrors the reference's ``pre_train=True`` behaviour
    (weights restored, optimiser state fresh — ``train/train.py:60-72``).
    """
    from two_stage_object_detection_tpu.parallel.multiprocess import (
        fetch_global)
    wait_for_saves()                    # a pending async save may be this file
    full = os.path.abspath(os.path.join(path, name))
    if not os.path.exists(full):
        return None
    restored = _ckptr().restore(full, fetch_global(target))
    if params_only:
        return target.replace(params=restored.params,
                              batch_stats=restored.batch_stats)
    return restored
