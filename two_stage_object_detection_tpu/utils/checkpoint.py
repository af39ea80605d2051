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


def save_checkpoint(path: str, state: Any, name: str = LAST) -> str:
    """Save a pytree (e.g. TrainState) under ``path/name``."""
    full = os.path.abspath(os.path.join(path, name))
    ckptr = _ckptr()
    ckptr.save(full, jax.device_get(state), force=True)
    # StandardCheckpointer writes asynchronously; the reference's torch.save
    # contract is synchronous (train/train.py:122-143) — block until durable
    ckptr.wait_until_finished()
    return full


def restore_checkpoint(path: str, target: Any, name: str = BEST,
                       params_only: bool = False) -> Optional[Any]:
    """Restore into the structure of ``target``; None if absent.

    ``params_only`` mirrors the reference's ``pre_train=True`` behaviour
    (weights restored, optimiser state fresh — ``train/train.py:60-72``).
    """
    full = os.path.abspath(os.path.join(path, name))
    if not os.path.exists(full):
        return None
    restored = _ckptr().restore(full, jax.device_get(target))
    if params_only:
        return target.replace(params=restored.params,
                              batch_stats=restored.batch_stats)
    return restored
