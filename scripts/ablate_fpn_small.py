#!/usr/bin/env python
"""Small-object ablation: single-scale detector vs the FPN variant.

The controlled experiment behind FPN's reason to exist: tiny objects
(9-25 px on 320x320 — about 1 cell on the stride-16 map, 4x4 cells on P2)
with ANCHORS MATCHED per variant, same backbone / steps / data.  Trains
each on 64 synthetic images, evaluates true-inference mAP on 16 held-out
images at IoU 0.5 and 0.75 (localisation precision is where stride-16
features run out for small boxes), writes ABLATE_FPN.json.

Usage: python scripts/ablate_fpn_small.py [steps] [backbone]
(defaults 600, resnet50)
"""

import json
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

SIZE = (320, 320)
BOX_FRAC = (0.03, 0.08)          # 9-25 px boxes


def make_data():
    root = tempfile.mkdtemp(prefix="fpn_small_")
    ann_t, dir_t = generate_synthetic_coco(
        root, split="train2017", num_images=64, num_classes=3,
        image_size=SIZE, max_boxes=6, seed=11, box_frac=BOX_FRAC)
    ann_v, dir_v = generate_synthetic_coco(
        root, split="val2017", num_images=16, num_classes=3,
        image_size=SIZE, max_boxes=6, seed=97, box_frac=BOX_FRAC)
    return (ann_t, dir_t), (ann_v, dir_v)


def batches_for(cfg, ann, img_dir, shuffle):
    ds = DetectionDataset(load_coco(ann, img_dir), cfg.input_size,
                          cfg.max_gt_boxes, train=False)
    loader = Loader(ds, cfg.batch_size, shuffle=shuffle, num_workers=2)
    return loader


def run_variant(name, cfg, train_data, val_data, steps):
    print(f"=== {name} ===", flush=True)
    loader = batches_for(cfg, *train_data, shuffle=True)
    val_batches = [{k: jax.device_put(v) for k, v in b.items()}
                   for b in batches_for(cfg, *val_data, shuffle=False)]

    _, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                  init_image_size=(64, 64))
    t0 = time.time()
    step = 0
    while step < steps:
        for batch in loader:
            if step >= steps:
                break
            batch = {k: jax.device_put(v) for k, v in batch.items()}
            state, losses = train_step(state, batch, jax.random.PRNGKey(step))
            if step % 100 == 0:
                print(f"  step {step:4d} total="
                      f"{float(losses['total']):.4f}", flush=True)
            step += 1
    train_s = time.time() - t0

    out = {"train_seconds": round(train_s, 1), "steps": steps}
    for thr in (0.5, 0.75):
        _, m, _ = evaluate(state, val_batches, cfg, map_iou_threshold=thr,
                           use_predict=True)
        out[f"val_map{int(thr * 100)}"] = round(float(m), 4)
    print(f"  {name}: mAP@0.5={out['val_map50']}  mAP@0.75={out['val_map75']}"
          f"  ({train_s:.0f}s)", flush=True)
    return out


def main(steps=600, backbone="resnet50"):
    common = dict(
        input_size=SIZE, num_classes=3, batch_size=8, max_gt_boxes=8,
        n_train_pre_nms=2000, n_train_post_nms=256, n_test_pre_nms=1000,
        n_test_post_nms=128, roi_n_sample=64, grad_accum_steps=1, lr=1e-3,
        score_thresh=0.3, predict_nms_iou=0.3, max_detections=24,
        cosine_t_max=steps, backbone=backbone, augment=False,
    )
    # anchors matched to the 9-25 px box range in BOTH variants:
    # single-scale gets 16/32/64 px anchors on the stride-16 map; FPN gets
    # its per-level octave starting at 16 px on P2
    single = Config(roi_pool_mode="align", anchor_scales=(2.0, 4.0, 8.0),
                    **common)
    fpn = Config(fpn=True, fpn_anchor_scale=4.0, **common)

    train_data, val_data = make_data()
    results = {
        "task": {"image_size": SIZE, "box_px": [int(SIZE[0] * BOX_FRAC[0]),
                                                int(SIZE[0] * BOX_FRAC[1])],
                 "train_images": 64, "val_images": 16, "backbone": backbone},
        "single_scale": run_variant("single-scale", single, train_data,
                                    val_data, steps),
        "fpn": run_variant("fpn", fpn, train_data, val_data, steps),
    }
    with open("ABLATE_FPN.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 600,
         sys.argv[2] if len(sys.argv) > 2 else "resnet50")
