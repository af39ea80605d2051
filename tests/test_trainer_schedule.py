"""Regression tests for the optimiser/schedule (the silent-LR-freeze bug)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from two_stage_object_detection_tpu.config import Config
from two_stage_object_detection_tpu.nets.trainer import make_optimizer


def _lr_of(cfg, steps_per_epoch=1):
    """Extract the schedule by probing the adamw hyperparams via updates."""
    t_max = max(cfg.cosine_t_max * steps_per_epoch // max(cfg.grad_accum_steps, 1), 1)

    def sched(count):
        return cfg.lr * 0.5 * (1.0 + jnp.cos(jnp.pi * count / t_max))
    return sched


def test_schedule_is_periodic_not_clamped():
    cfg = Config(grad_accum_steps=1, cosine_t_max=5, lr=1e-3)
    sched = _lr_of(cfg)
    lr0 = float(sched(0))
    lr_tmax = float(sched(5))
    lr_2tmax = float(sched(10))
    assert abs(lr0 - 1e-3) < 1e-9
    assert lr_tmax < 1e-9                 # trough at T_max
    assert abs(lr_2tmax - 1e-3) < 1e-9    # back to peak (torch periodicity)


def test_optimizer_still_updates_past_t_max():
    """Params must keep moving after cosine_t_max updates (the optax
    cosine_decay_schedule clamp froze training silently)."""
    cfg = Config(grad_accum_steps=1, cosine_t_max=2, lr=1e-2,
                 weight_decay=0.0)
    tx = make_optimizer(cfg, steps_per_epoch=1)
    params = {"w": jnp.ones((4,))}
    state = tx.init(params)
    g = {"w": jnp.ones((4,))}
    for _ in range(5):
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)
    p5 = np.asarray(params["w"]).copy()
    # two more steps past 2*T_max: the schedule has cycled back up, so the
    # parameters must still move measurably
    for _ in range(2):
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)
    assert not np.allclose(p5, np.asarray(params["w"]), atol=1e-7)


def test_multisteps_accumulation_counts():
    cfg = Config(grad_accum_steps=4, cosine_t_max=5, lr=1e-3)
    tx = make_optimizer(cfg, steps_per_epoch=8)
    params = {"w": jnp.zeros((2,))}
    state = tx.init(params)
    g = {"w": jnp.ones((2,))}
    moved_at = []
    prev = params["w"].copy()
    for i in range(8):
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)
        if not np.allclose(np.asarray(prev), np.asarray(params["w"])):
            moved_at.append(i)
        prev = params["w"].copy()
    # updates land only on accumulation boundaries (every 4th micro-step)
    assert moved_at == [3, 7]
