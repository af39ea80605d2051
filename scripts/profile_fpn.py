#!/usr/bin/env python
"""Stage-level timing of the FPN predict path on real hardware.

Builds a ladder of jitted prefixes of ``FasterRCNN.predict`` —
backbone -> +neck -> +rpn_head -> +proposals -> +roi_head -> full predict —
and reports per-stage deltas, so optimisation work lands on the stage that
actually dominates (fpn_infer_resnet50: 95 ms/batch at 46.8% HBM / 15.2%
MFU — neither roofline binds, so something serial is eating the time).

Usage: python scripts/profile_fpn.py [batch] [backbone] [input]
(defaults 16, resnet50, 600)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from two_stage_object_detection_tpu.config import Config
from two_stage_object_detection_tpu.nets.detector import FasterRCNN


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def main(batch=16, backbone="resnet50", size=600):
    cfg = Config(fpn=True, backbone=backbone, input_size=(size, size),
                 num_classes=80)
    model = FasterRCNN(cfg)
    rng = jax.random.PRNGKey(0)
    images = jnp.asarray(np.random.RandomState(0)
                         .rand(batch, size, size, 3).astype(np.float32))
    variables = model.init(rng, images[:1], train=False)
    img_size = (size, size)

    def backbone_fn(v, x):
        return model.apply(v, x, train=False,
                           method=lambda m, im, train: m.extractor(im, train))

    def neck_fn(v, x):
        return model.apply(v, x, train=False, method=FasterRCNN._features)

    def rpn_fn(v, x):
        def f(m, im, train):
            feats = m._features(im, train)
            return m.rpn_head(feats)
        return model.apply(v, x, train=False, method=f)

    def prop_fn(v, x):
        def f(m, im, train):
            feats = m._features(im, train)
            locs, scores = m.rpn_head(feats)
            return m._proposals(locs, scores, img_size, train=False)
        return model.apply(v, x, train=False, method=f)

    def head_fn(v, x):
        def f(m, im, train):
            feats = m._features(im, train)
            locs, scores = m.rpn_head(feats)
            rois, _, valid = m._proposals(locs, scores, img_size, train=False)
            return m.roi_head(feats, rois, img_size), valid
        return model.apply(v, x, train=False, method=f)

    def predict_fn(v, x):
        return model.apply(v, x, method=FasterRCNN.predict)

    stages = [
        ("backbone", jax.jit(backbone_fn)),
        ("+neck", jax.jit(neck_fn)),
        ("+rpn_head", jax.jit(rpn_fn)),
        ("+proposals", jax.jit(prop_fn)),
        ("+roi_head", jax.jit(head_fn)),
        ("full predict", jax.jit(predict_fn)),
    ]
    prev = 0.0
    print(f"devices={jax.devices()}  batch={batch} backbone={backbone} "
          f"input={size}", flush=True)
    for name, fn in stages:
        ms = timeit(fn, variables, images)
        print(f"  {name:14s} cumulative {ms:8.2f} ms   "
              f"delta {ms - prev:8.2f} ms", flush=True)
        prev = ms


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16,
         sys.argv[2] if len(sys.argv) > 2 else "resnet50",
         int(sys.argv[3]) if len(sys.argv) > 3 else 600)
