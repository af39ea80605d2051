#!/usr/bin/env python
"""Benchmark: batched true-inference throughput of the flagship model.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}``.

Flagship config = HarDNet-39 Faster R-CNN, 600x600 inputs, batch 16
(BASELINE.md configs #3/#4).  The baseline is the PyTorch reference's
trainer-forward on CPU measured in this container (2026-08-16, single
thread, torchvision nms/RoIPool stubbed with pure-torch equivalents since
torchvision is not installed here): 4.90 s/image = 0.204 images/sec.
Override with env ``BASELINE_IPS``.

Methodology: the timing loop runs *inside* one jitted ``lax.scan`` with a
carry dependency between steps, synced by a device_get of the final scalar.
This measures steady-state device throughput; per-dispatch host sync would
add the remote-runtime roundtrip (~30 ms on the tunneled v5e used here) to
every batch and block_until_ready is acked early by that runtime.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

BASELINE_IPS = float(os.environ.get("BASELINE_IPS", 0.204))
BATCH = int(os.environ.get("BENCH_BATCH", 16))
ITERS = int(os.environ.get("BENCH_ITERS", 20))


def main():
    from two_stage_object_detection_tpu.config import Config
    from two_stage_object_detection_tpu.nets.detector import FasterRCNN

    cfg = Config()
    model = FasterRCNN(cfg)
    rng = jax.random.PRNGKey(0)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    t0 = time.perf_counter()
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, jnp.zeros((1, 64, 64, 3), jnp.float32))
    print(f"init: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    images = jax.random.uniform(jax.random.PRNGKey(1),
                                (BATCH, *cfg.input_size, 3), jnp.float32)

    @jax.jit
    def loop(variables, images, n):
        def body(carry, _):
            out = model.apply(variables, images + carry, method="predict")
            # fold a scalar of the output into the carry so iterations are
            # sequentially dependent and cannot be elided
            return jnp.sum(out[1]) * 0.0, None
        carry, _ = lax.scan(body, 0.0, None, length=ITERS)
        return carry + n

    t0 = time.perf_counter()
    jax.device_get(loop(variables, images, 0.0))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    jax.device_get(loop(variables, images, 1.0))
    dt = (time.perf_counter() - t0) / ITERS
    ips = BATCH / dt
    print(f"batched inference: {dt * 1000:.2f} ms/batch of {BATCH} "
          f"-> {ips:.2f} img/s", file=sys.stderr)

    print(json.dumps({
        "metric": "batched_inference_images_per_sec",
        "value": round(ips, 3),
        "unit": "images/sec",
        "vs_baseline": round(ips / BASELINE_IPS, 2),
    }))


if __name__ == "__main__":
    main()
