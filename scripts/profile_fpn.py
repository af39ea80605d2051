#!/usr/bin/env python
"""Stage-level timing of the FPN predict path on real hardware.

Builds a ladder of jitted prefixes of ``FasterRCNN.predict`` —
backbone -> +neck -> +rpn_head -> +proposals -> +roi_head -> full predict —
and reports per-stage deltas, so optimisation work lands on the stage that
actually dominates.

Timing methodology matches bench.py: each prefix runs inside one jitted
``lax.scan`` with a carry dependency (the remote runtime acks
``block_until_ready`` early, so per-dispatch timing lies).

Usage: python scripts/profile_fpn.py [batch] [backbone] [input] [iters]
(defaults 16, resnet50, 600, 20)
"""

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

sys.path.insert(0, ".")

from two_stage_object_detection_tpu.config import Config
from two_stage_object_detection_tpu.nets.detector import FasterRCNN


def scan_time(step_fn, *args, iters=20):
    @jax.jit
    def loop(*a):
        def body(carry, _):
            out = step_fn(*a, carry)
            return out * 0.0, None
        carry, _ = lax.scan(body, 0.0, None, length=iters)
        return carry

    t0 = time.perf_counter()
    jax.device_get(loop(*args))
    print(f"    (compile+first {time.perf_counter() - t0:.1f}s)", flush=True)
    t0 = time.perf_counter()
    jax.device_get(loop(*args))
    return (time.perf_counter() - t0) / iters * 1000.0


def _sum_tree(x):
    return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(x))


def main(batch=16, backbone="resnet50", size=600, iters=20):
    cfg = Config(fpn=True, backbone=backbone, input_size=(size, size),
                 num_classes=80)
    model = FasterRCNN(cfg)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    images = jax.random.uniform(jax.random.PRNGKey(1),
                                (batch, size, size, 3), jnp.float32)
    img_size = (size, size)

    def backbone_fn(v, x, c):
        out = model.apply(v, x + c, train=False,
                          method=lambda m, im, train: m.extractor(im, train))
        return _sum_tree(out)

    def neck_fn(v, x, c):
        out = model.apply(v, x + c, train=False, method=FasterRCNN._features)
        return _sum_tree(out)

    def rpn_fn(v, x, c):
        def f(m, im, train):
            return m.rpn_head(m._features(im, train))
        return _sum_tree(model.apply(v, x + c, train=False, method=f))

    def prop_fn(v, x, c):
        def f(m, im, train):
            feats = m._features(im, train)
            locs, scores = m.rpn_head(feats)
            rois, s, valid = m._proposals(locs, scores, img_size, train=False)
            return rois, s
        return _sum_tree(model.apply(v, x + c, train=False, method=f))

    def head_fn(v, x, c):
        def f(m, im, train):
            feats = m._features(im, train)
            locs, scores = m.rpn_head(feats)
            rois, _, valid = m._proposals(locs, scores, img_size, train=False)
            return m.roi_head(feats, rois, img_size)
        return _sum_tree(model.apply(v, x + c, train=False, method=f))

    def predict_fn(v, x, c):
        out = model.apply(v, x + c, method=FasterRCNN.predict)
        return jnp.sum(out[1])

    stages = [
        ("backbone", backbone_fn),
        ("+neck", neck_fn),
        ("+rpn_head", rpn_fn),
        ("+proposals", prop_fn),
        ("+roi_head", head_fn),
        ("full predict", predict_fn),
    ]
    prev = 0.0
    print(f"devices={jax.devices()}  batch={batch} backbone={backbone} "
          f"input={size} iters={iters}", flush=True)
    for name, fn in stages:
        ms = scan_time(fn, variables, images, iters=iters)
        print(f"  {name:14s} cumulative {ms:8.2f} ms   "
              f"delta {ms - prev:8.2f} ms", flush=True)
        prev = ms


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16,
         sys.argv[2] if len(sys.argv) > 2 else "resnet50",
         int(sys.argv[3]) if len(sys.argv) > 3 else 600,
         int(sys.argv[4]) if len(sys.argv) > 4 else 20)
