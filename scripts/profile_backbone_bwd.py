#!/usr/bin/env python
"""Honest backbone fwd+bwd cost (grads of ALL params, carried updates)."""

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


def bench(label, fn, *args):
    jit_fn = jax.jit(fn)
    t0 = time.perf_counter()
    jax.device_get(jit_fn(*args))
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(jit_fn(*args))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label:55s} {dt * 1000:8.2f} ms  (compile {c:.0f}s)", flush=True)
    return dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    from two_stage_object_detection_tpu.models.registry import build_backbone
    print(f"devices: {jax.devices()}  batch={batch}", flush=True)

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(batch, 600, 600, 3), jnp.float32)

    for name, dtype, train in [("hardnet39", jnp.bfloat16, True),
                               ("hardnet39", jnp.bfloat16, False),
                               ("resnet50", jnp.bfloat16, True)]:
        extractor, _ = build_backbone(name, dtype)
        variables = jax.jit(extractor.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=True)
        params0 = variables["params"]
        stats0 = variables.get("batch_stats", {})

        def loop(params, img):
            def loss(p, x):
                if train:
                    feats, _ = extractor.apply(
                        {"params": p, "batch_stats": stats0}, x, True,
                        mutable=["batch_stats"])
                else:
                    feats = extractor.apply(
                        {"params": p, "batch_stats": stats0}, x, False)
                return jnp.sum(feats.astype(jnp.float32))

            def body(p, _):
                gr = jax.grad(loss)(p, img)
                p2 = jax.tree_util.tree_map(lambda a, b: a - 1e-6 * b, p, gr)
                return p2, None
            p, _ = lax.scan(body, params, None, length=ITERS)
            return jnp.sum(p["stem0"]["conv"]["kernel"])

        mode = "train-BN" if train else "frozen-BN"
        bench(f"{name} fwd+bwd all-params ({mode})", loop, params0, img)

        def fwd_loop(params, img):
            def body(c, _):
                feats = extractor.apply(
                    {"params": params, "batch_stats": stats0},
                    img + c, train)
                if isinstance(feats, tuple):
                    feats = feats[0]
                return jnp.sum(feats.astype(jnp.float32)) * 0.0, None
            c, _ = lax.scan(body, 0.0, None, length=ITERS)
            return c
        if train:
            continue
        bench(f"{name} fwd only ({mode})", fwd_loop, params0, img)


if __name__ == "__main__":
    main()
