#!/usr/bin/env python
"""Isolate the scan-carry overhead of the real train step.

bench train16 (state carried through lax.scan, the true training semantics)
measures ~304 ms/step while fwd+bwd with CONSTANT params measures ~212 ms.
Hypothesis: with constant params XLA hoists per-step parameter work (bf16
casts / layout transforms) out of the loop, understating the real cost.
This script measures both forms with honest all-leaf probes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

ITERS = int(os.environ.get("ITERS", 12))


def timeit(fn, *args, label=""):
    t0 = time.perf_counter()
    jax.device_get(fn(*args))
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(fn(*args))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label:55s} {dt * 1000:8.2f} ms  (compile {c:.0f}s)", flush=True)
    return dt


def main():
    batch = 16
    from two_stage_object_detection_tpu.config import Config
    from two_stage_object_detection_tpu.nets.trainer import (
        create_train_state, train_step_fn)

    cfg = Config(batch_size=batch, grad_accum_steps=1, max_gt_boxes=16)
    _, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                  init_image_size=(64, 64))
    rng = np.random.RandomState(0)
    g = cfg.max_gt_boxes
    batch_d = {
        "image": jnp.asarray(rng.rand(batch, *cfg.input_size, 3), jnp.float32),
        "boxes": jnp.tile(jnp.array([[50.0, 50.0, 300.0, 300.0]]), (batch, g, 1)),
        "labels": jnp.zeros((batch, g), jnp.int32),
        "valid": jnp.tile(jnp.array([True, True] + [False] * (g - 2)),
                          (batch, 1)),
    }
    rngk = jax.random.PRNGKey(2)
    print(f"devices: {jax.devices()}", flush=True)

    @jax.jit
    def carried(state, b):
        def body(s, _):
            s2, losses = train_step_fn(s, b, rngk)
            return s2, losses["total"]
        s, tot = lax.scan(body, state, None, length=ITERS)
        return tot[-1]
    timeit(carried, state, batch_d, label="train step, state CARRIED (real)")

    @jax.jit
    def const_params(state, b):
        def body(carry, _):
            s2, losses = train_step_fn(
                state, {**b, "image": b["image"] + carry}, rngk)
            probe = sum(jnp.sum(x).astype(jnp.float32)
                        for x in jax.tree_util.tree_leaves(s2.params))
            return losses["total"] * 0.0 + probe * 0.0, None
        c, _ = lax.scan(body, 0.0, None, length=ITERS)
        return c
    timeit(const_params, state, batch_d,
           label="train step, params CONST (hoistable)")

    # grads only (no optimizer), params carried so nothing hoists
    @jax.jit
    def grads_carried(state, b):
        def loss_fn(params, img):
            out = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                img, b["boxes"], b["labels"], b["valid"],
                method="train_forward", mutable=["batch_stats"],
                rngs={"sampling": rngk})
            return out[0]["losses"]["total"]

        def body(params, _):
            gr = jax.grad(loss_fn)(params, b["image"])
            new = jax.tree_util.tree_map(lambda p, g_: p - 1e-6 * g_,
                                         params, gr)
            return new, None
        p, _ = lax.scan(body, state.params, None, length=ITERS)
        return jnp.sum(p["rpn_head"]["loc"]["bias"])
    timeit(grads_carried, state, batch_d,
           label="fwd+bwd+sgd, params carried (no adam)")


if __name__ == "__main__":
    main()
