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
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_IPS = float(os.environ.get("BASELINE_IPS", 0.204))
BATCH = int(os.environ.get("BENCH_BATCH", 16))
ITERS = int(os.environ.get("BENCH_ITERS", 10))


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

    @jax.jit
    def predict(variables, images):
        return model.apply(variables, images, method="predict")

    images = jax.random.uniform(jax.random.PRNGKey(1),
                                (BATCH, *cfg.input_size, 3), jnp.float32)

    t0 = time.perf_counter()
    out = jax.device_get(predict(variables, images))
    print(f"compile+first run: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # warmup (jax.device_get rather than block_until_ready: the axon remote
    # runtime acks block_until_ready before execution finishes, so only a
    # host roundtrip of the outputs gives honest timings)
    jax.device_get(predict(variables, images))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = jax.device_get(predict(variables, images))
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
