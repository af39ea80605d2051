#!/usr/bin/env python
"""Benchmark harness for the BASELINE.md measurement matrix.

Prints ONE JSON line (the headline metric) to stdout:
``{"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}``.

Headline = config #3: batched (16) true inference on the flagship
HarDNet-39 Faster R-CNN at 600x600.  Other BASELINE configs are selectable
with ``BENCH_CONFIG``:

  batched16 (default) | single1 | resnet50 | rpn8 | train16 | all

The baseline is the PyTorch reference's trainer-forward on CPU measured in
this container (2026-08-16, single thread, torchvision nms/RoIPool stubbed
with pure-torch equivalents since torchvision is not installed): 4.90 s/img
= 0.204 images/sec.  Override with env ``BASELINE_IPS``.

Methodology: the timing loop runs inside one jitted ``lax.scan`` with a
carry dependency between steps, synced by a device_get of the final scalar —
steady-state device throughput.  (Per-dispatch sync would add the remote
runtime's ~30 ms roundtrip to every batch, and block_until_ready is acked
early by that runtime.)
"""

import json
import os
import sys
import time

import jax

# persistent compilation cache: remote TPU compiles take minutes; repeat
# bench/train invocations reuse them
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

BASELINE_IPS = float(os.environ.get("BASELINE_IPS", 0.204))
ITERS = int(os.environ.get("BENCH_ITERS", 20))
CONFIG = os.environ.get("BENCH_CONFIG", "batched16")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def scan_time(step_fn, *args, iters=ITERS):
    """Amortised per-iteration seconds of ``step_fn(*args, carry)``."""

    @jax.jit
    def loop(*a):
        def body(carry, _):
            out = step_fn(*a, carry)
            return out * 0.0, None
        carry, _ = lax.scan(body, 0.0, None, length=iters)
        return carry

    t0 = time.perf_counter()
    jax.device_get(loop(*args))
    log(f"  compile+first: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    jax.device_get(loop(*args))
    return (time.perf_counter() - t0) / iters


def _model_and_vars(cfg):
    from two_stage_object_detection_tpu.nets.detector import FasterRCNN
    model = FasterRCNN(cfg)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    return model, variables


def bench_inference(name, cfg, batch):
    model, variables = _model_and_vars(cfg)
    images = jax.random.uniform(jax.random.PRNGKey(1),
                                (batch, *cfg.input_size, 3), jnp.float32)

    def step(variables, images, carry):
        out = model.apply(variables, images + carry, method="predict")
        return jnp.sum(out[1])

    dt = scan_time(step, variables, images)
    ips = batch / dt
    log(f"{name}: {dt * 1000:.2f} ms/batch of {batch} -> {ips:.2f} img/s")
    return ips


def bench_rpn(batch=8):
    from two_stage_object_detection_tpu.config import Config
    from two_stage_object_detection_tpu.ops.anchors import make_anchors
    from two_stage_object_detection_tpu.ops.pallas_proposals import (
        fused_proposals)
    cfg = Config()
    anchors = jnp.array(make_anchors(cfg))
    n = anchors.shape[0]
    locs = jax.random.normal(jax.random.PRNGKey(0), (batch, n, 4)) * 0.1
    scores = jax.random.uniform(jax.random.PRNGKey(1), (batch, n))

    def step(locs, scores, carry):
        fn = lambda l, s: fused_proposals(
            l, s, anchors, cfg.input_size, nms_iou=cfg.rpn_nms_iou,
            n_post_nms=cfg.n_test_post_nms, min_size=cfg.proposal_min_size)
        out = jax.vmap(fn)(locs + carry, scores)
        return jnp.sum(out[1])

    dt = scan_time(step, locs, scores)
    ips = batch / dt
    log(f"rpn8 (anchors+decode+NMS): {dt * 1000:.2f} ms/batch of {batch} "
        f"-> {ips:.2f} img/s")
    return ips


def bench_train(batch=16):
    import numpy as np
    from two_stage_object_detection_tpu.config import Config
    from two_stage_object_detection_tpu.nets.trainer import create_train_state

    cfg = Config(batch_size=batch, grad_accum_steps=1, max_gt_boxes=16)
    _, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                  init_image_size=(64, 64))
    rng = np.random.RandomState(0)
    g = cfg.max_gt_boxes
    batch_d = {
        "image": jnp.asarray(rng.rand(batch, *cfg.input_size, 3), jnp.float32),
        "boxes": jnp.tile(jnp.array([[50.0, 50.0, 300.0, 300.0]]), (batch, g, 1)),
        "labels": jnp.zeros((batch, g), jnp.int32),
        "valid": jnp.tile(jnp.array([True, True] + [False] * (g - 2)), (batch, 1)),
    }

    def step(params, batch_stats, carry):
        def loss_fn(p):
            out = state.apply_fn(
                {"params": p, "batch_stats": batch_stats},
                batch_d["image"] + carry, batch_d["boxes"],
                batch_d["labels"], batch_d["valid"],
                method="train_forward", mutable=["batch_stats"])
            return out[0]["losses"]["total"]
        g_ = jax.grad(loss_fn)(params)
        return jnp.sum(jax.tree_util.tree_leaves(g_)[0]).astype(jnp.float32)

    dt = scan_time(step, state.params, state.batch_stats, iters=max(ITERS // 4, 3))
    ips = batch / dt
    log(f"train16 (fwd+bwd): {dt * 1000:.2f} ms/step of {batch} "
        f"-> {ips:.2f} img/s")
    return ips


VALID_CONFIGS = ("batched16", "single1", "resnet50", "rpn8", "train16", "all")


def main():
    from two_stage_object_detection_tpu.config import Config
    if CONFIG not in VALID_CONFIGS:
        sys.exit(f"bench: unknown BENCH_CONFIG={CONFIG!r}; "
                 f"expected one of {', '.join(VALID_CONFIGS)}")
    log(f"devices: {jax.devices()}  config={CONFIG}")
    cfg = Config()

    results = {}
    if CONFIG in ("batched16", "all"):
        results["batched16"] = bench_inference("batched16 (flagship)", cfg, 16)
    if CONFIG in ("single1", "all"):
        results["single1"] = bench_inference("single1", cfg, 1)
    if CONFIG in ("resnet50", "all"):
        results["resnet50"] = bench_inference(
            "resnet50 single", cfg.replace(backbone="resnet50",
                                           backbone_channels=1024), 1)
    if CONFIG in ("rpn8", "all"):
        results["rpn8"] = bench_rpn()
    if CONFIG in ("train16", "all"):
        results["train16"] = bench_train()

    if results:
        with open("BENCH_DETAILS.json", "w") as f:
            json.dump(results, f, indent=2)

    headline = results.get("batched16")
    if headline is None:
        headline = next(iter(results.values()))
    print(json.dumps({
        "metric": "batched_inference_images_per_sec",
        "value": round(headline, 3),
        "unit": "images/sec",
        "vs_baseline": round(headline / BASELINE_IPS, 2),
    }))


if __name__ == "__main__":
    main()
