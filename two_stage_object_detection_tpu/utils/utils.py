"""Misc utilities (reference ``utils/utils.py:4-16``)."""

from __future__ import annotations

import random

import numpy as np


def set_seed(seed: int = 42) -> int:
    """Seed python/numpy; JAX randomness is explicit via PRNG keys, so the
    returned seed should feed ``jax.random.PRNGKey`` (the reference's global
    cudnn/cuda seeding has no JAX analogue — determinism is the default)."""
    random.seed(seed)
    np.random.seed(seed)
    return seed


def update_ema(current_value, ema_alpha, last_ema=None):
    """EMA step (reference ``utils/utils.py:13-16``)."""
    if last_ema is None:
        return current_value
    return ema_alpha * current_value + (1 - ema_alpha) * last_ema
