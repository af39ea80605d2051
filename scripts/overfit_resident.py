#!/usr/bin/env python
"""Training-dynamics check for the HBM-resident fast path.

Same bar as ``overfit_check.py`` (true-inference mAP@0.5 > 0.3 after
overfitting a tiny synthetic set) but through the 214-img/s recipe:
``DeviceDatasetCache`` gathers + ``train_macro_step_resident`` scan with
the device-side augmentation chain (photometric + flip + matrix-form
scale jitter) LIVE — so proposals, target assignment, losses, the
optimiser, the resident gathers, and the augmentations are all validated
together.  Augmentation makes memorisation strictly harder, so clearing
the bar here is stronger evidence than the bare check.

Usage: python scripts/overfit_resident.py [cycles] [backbone] [roi_pool_mode]
(defaults 60 cycles of K=8 micro-steps, hardnet39s, align)
"""

import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from two_stage_object_detection_tpu.config import Config
from two_stage_object_detection_tpu.data.coco import load_coco
from two_stage_object_detection_tpu.data.device_cache import DeviceDatasetCache
from two_stage_object_detection_tpu.data.pipeline import DetectionDataset, Loader
from two_stage_object_detection_tpu.data.synthetic import generate_synthetic_coco
from two_stage_object_detection_tpu.eval.evaluator import evaluate
from two_stage_object_detection_tpu.nets.trainer import (
    create_train_state, train_macro_step_resident)

K = 8


def main(cycles: int = 60, backbone: str = "hardnet39s",
         roi_pool_mode: str = "align"):
    cfg = Config(
        input_size=(320, 320), num_classes=3, batch_size=4, max_gt_boxes=8,
        n_train_pre_nms=2000, n_train_post_nms=256, n_test_pre_nms=1000,
        n_test_post_nms=128, roi_n_sample=64, grad_accum_steps=1, lr=1e-3,
        score_thresh=0.3, predict_nms_iou=0.3, max_detections=16,
        cosine_t_max=cycles * K, backbone=backbone,
        roi_pool_mode=roi_pool_mode, device_augment=True,
        transfer_uint8=True, fused_accum=True,
    )
    print(f"backbone={backbone} roi_pool_mode={roi_pool_mode} "
          f"cycles={cycles} (K={K})", flush=True)
    root = tempfile.mkdtemp(prefix="overfit_resident_")
    ann, img_dir = generate_synthetic_coco(root, num_images=4, num_classes=3,
                                           image_size=(320, 320), seed=3)
    index = load_coco(ann, img_dir)
    ds = DetectionDataset(index, cfg.input_size, cfg.max_gt_boxes,
                          train=True, decode_only=True, uint8_images=True)
    cache = DeviceDatasetCache(ds, cfg.batch_size, shuffle=True, seed=0)
    _, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                  init_image_size=(64, 64))

    t0 = time.time()
    idx = cache.epoch_indices()
    buf = idx
    while len(buf) < K:
        buf = np.concatenate([buf, cache.epoch_indices()])
    for c in range(cycles):
        while len(buf) < K:
            buf = np.concatenate([buf, cache.epoch_indices()])
        sel, buf = buf[:K], buf[K:]
        state, totals = train_macro_step_resident(
            state, cache.data, jnp.asarray(sel), jax.random.PRNGKey(c),
            device_augment=True)
        if c % 10 == 0 or c == cycles - 1:
            t = np.asarray(jax.device_get(totals))
            print(f"cycle {c:3d}  total={t.mean():.4f}", flush=True)
    print(f"trained {cycles * K} micro-steps in {time.time() - t0:.1f}s",
          flush=True)

    eval_ds = DetectionDataset(index, cfg.input_size, cfg.max_gt_boxes,
                               train=False)
    eval_loader = Loader(eval_ds, cfg.batch_size, shuffle=False,
                         num_workers=2, device_put=jax.device_put)
    _, map50, _ = evaluate(state, iter(eval_loader), cfg,
                           map_iou_threshold=0.5, use_predict=True)
    print(f"true-inference mAP@0.5 = {map50:.4f}")
    assert map50 > 0.3, f"training dynamics broken: mAP {map50:.4f}"
    print("OK")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 60, a[1] if len(a) > 1 else "hardnet39s",
         a[2] if len(a) > 2 else "align")
