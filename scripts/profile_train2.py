#!/usr/bin/env python
"""Honest full-train-step variants (all-parameter probes, no DCE traps).

Compares the real optimisation step across structural choices: RoI pool vs
align, frozen BN, f32 vs bf16 compute — to pick the train-path defaults.
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

ITERS = int(os.environ.get("ITERS", 10))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    from two_stage_object_detection_tpu.config import Config
    from two_stage_object_detection_tpu.nets.trainer import (
        create_train_state, train_step_fn)
    print(f"devices: {jax.devices()}  batch={batch}", flush=True)

    rng = np.random.RandomState(0)
    g = 16
    batch_d = {
        "image": jnp.asarray(rng.rand(batch, 600, 600, 3), jnp.float32),
        "boxes": jnp.tile(jnp.array([[50.0, 50.0, 300.0, 300.0]]), (batch, g, 1)),
        "labels": jnp.zeros((batch, g), jnp.int32),
        "valid": jnp.tile(jnp.array([True, True] + [False] * (g - 2)),
                          (batch, 1)),
    }
    rngk = jax.random.PRNGKey(2)

    def bench_cfg(label, **kw):
        cfg = Config(batch_size=batch, grad_accum_steps=1, max_gt_boxes=16,
                     **kw)
        _, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                      init_image_size=(64, 64))

        @jax.jit
        def carried(state, b):
            def body(s, _):
                s2, losses = train_step_fn(s, b, rngk)
                return s2, losses["total"]
            s, tot = lax.scan(body, state, None, length=ITERS)
            return tot[-1]

        t0 = time.perf_counter()
        jax.device_get(carried(state, batch_d))
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.device_get(carried(state, batch_d))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{label:50s} {dt * 1000:8.2f} ms/step  (compile {c:.0f}s)",
              flush=True)
        return dt

    only = os.environ.get("VARIANTS", "all")
    remat = os.environ.get("REMAT", "0") == "1"
    if only in ("all", "default"):
        bench_cfg(f"pool bf16 (default{' remat' if remat else ''})",
                  remat_backbone=remat)
    if only == "all":
        bench_cfg("align bf16", roi_pool_mode="align")
        bench_cfg("pool bf16 freeze_bn", freeze_bn=True)
        bench_cfg("pool bf16 pallas roi_bwd", roi_bwd="pallas")
        bench_cfg("pool f32 compute", compute_dtype="float32")


if __name__ == "__main__":
    main()
