#!/usr/bin/env python
"""Training-dynamics sanity check: overfit a tiny synthetic dataset.

Trains the full detector on a handful of synthetic rectangle images and
verifies mAP@0.5 (true-inference path) climbs well above chance — evidence
that proposals, target assignment, losses, and the optimiser all cooperate.

Usage: python scripts/overfit_check.py [steps] [backbone] [roi_pool_mode]
(defaults 300, hardnet39, pool; a ``-fpn`` backbone suffix, e.g.
``resnet50-fpn``, runs the FPN variant)
"""

import sys
import tempfile
import time

import jax
import numpy as np

sys.path.insert(0, ".")

from two_stage_object_detection_tpu.config import Config
from two_stage_object_detection_tpu.data.coco import load_coco
from two_stage_object_detection_tpu.data.pipeline import DetectionDataset, Loader
from two_stage_object_detection_tpu.data.synthetic import generate_synthetic_coco
from two_stage_object_detection_tpu.eval.evaluator import evaluate
from two_stage_object_detection_tpu.nets.trainer import (
    create_train_state, train_step)


def main(steps: int = 300, backbone: str = "hardnet39",
         roi_pool_mode: str = "pool"):
    fpn = backbone.endswith("-fpn")
    backbone = backbone.removesuffix("-fpn")
    cfg = Config(
        fpn=fpn,
        input_size=(320, 320), num_classes=3, batch_size=4, max_gt_boxes=8,
        n_train_pre_nms=2000, n_train_post_nms=256, n_test_pre_nms=1000,
        n_test_post_nms=128, roi_n_sample=64, grad_accum_steps=1, lr=1e-3,
        score_thresh=0.3, predict_nms_iou=0.3, max_detections=16,
        cosine_t_max=steps,   # one cosine period over the whole run
        backbone=backbone, roi_pool_mode=roi_pool_mode,
    )
    print(f"backbone={backbone} roi_pool_mode={roi_pool_mode}", flush=True)
    root = tempfile.mkdtemp(prefix="overfit_")
    ann, img_dir = generate_synthetic_coco(root, num_images=4, num_classes=3,
                                           image_size=(320, 320), seed=3)
    index = load_coco(ann, img_dir)
    ds = DetectionDataset(index, cfg.input_size, cfg.max_gt_boxes, train=False)
    loader = Loader(ds, cfg.batch_size, shuffle=False, num_workers=2)
    batch = next(iter(loader))
    batch = {k: jax.device_put(v) for k, v in batch.items()}

    _, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                  init_image_size=(64, 64))
    t0 = time.time()
    for i in range(steps):
        state, losses = train_step(state, batch, jax.random.PRNGKey(i))
        if i % 25 == 0 or i == steps - 1:
            ls = {k: float(v) for k, v in jax.device_get(losses).items()}
            print(f"step {i:4d}  total={ls['total']:.4f}  rpn_cls={ls['rpn_cls']:.4f} "
                  f"rpn_loc={ls['rpn_loc']:.4f} roi_cls={ls['roi_cls']:.4f} "
                  f"roi_loc={ls['roi_loc']:.4f}", flush=True)
    print(f"trained {steps} steps in {time.time() - t0:.1f}s")

    # diagnostics: raw predict outputs
    from two_stage_object_detection_tpu.nets.trainer import predict_step
    boxes, scores, labels, valid = jax.device_get(
        predict_step(state, batch["image"]))
    print(f"predict: {valid.sum()} detections, "
          f"max score {scores.max():.3f}")

    _, map50_t, _ = evaluate(state, [batch], cfg, map_iou_threshold=0.5,
                             use_predict=False)
    print(f"mAP@0.5 (trainer-parity path) = {map50_t:.3f}")
    _, map50, metrics = evaluate(state, [batch], cfg, map_iou_threshold=0.5,
                                 use_predict=True)
    print(f"mAP@0.5 (true inference path) = {map50:.3f}")
    for c, m in metrics["class_metrics"].items():
        print(f"  class {c}: AP={m['AP']:.3f} TP={m['TP']} FP={m['FP']} "
              f"FN={m['FN']} n_gt={m['n_gt']}")
    assert map50 > 0.3, f"overfit failed: mAP@0.5={map50}"
    print("OK")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 300,
         sys.argv[2] if len(sys.argv) > 2 else "hardnet39",
         sys.argv[3] if len(sys.argv) > 3 else "pool")
