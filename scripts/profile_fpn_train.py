#!/usr/bin/env python
"""Stage-level timing of the FPN TRAIN path on real hardware.

Cumulative prefixes of ``FasterRCNN.train_forward`` under ``jax.grad`` —
backbone+neck -> +rpn_head -> +rpn losses -> +proposals/targets ->
full forward -> full train step — so FPN train optimisation lands on the
stage that dominates.  Timing matches bench.py (jitted ``lax.scan`` with a
carry dependency; per-dispatch timing lies on the remote runtime).

Usage: python scripts/profile_fpn_train.py [batch] [backbone] [input] [iters]
(defaults 16, resnet50, 600, 10)
"""

import functools
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from two_stage_object_detection_tpu.config import Config
from two_stage_object_detection_tpu.nets.detector import FasterRCNN
from two_stage_object_detection_tpu.nets.losses import (
    fast_rcnn_loc_loss, softmax_cross_entropy_with_ignore)
from two_stage_object_detection_tpu.nets.targets import (
    anchor_target, proposal_target)


def scan_time(step_fn, *args, iters=10, label=""):
    @jax.jit
    def loop(*a):
        def body(carry, _):
            out = step_fn(*a, carry)
            return out * 0.0, None
        carry, _ = lax.scan(body, 0.0, None, length=iters)
        return carry

    t0 = time.perf_counter()
    jax.device_get(loop(*args))
    compile_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(loop(*args))
    dt = (time.perf_counter() - t0) / iters * 1000.0
    print(f"{label:48s} {dt:8.2f} ms  (compile {compile_t:.0f}s)", flush=True)
    return dt


def _sum(x):
    return jnp.sum(x.astype(jnp.float32))


def main(batch=16, backbone="resnet50", size=600, iters=10):
    cfg = Config(fpn=True, backbone=backbone, input_size=(size, size),
                 num_classes=80, batch_size=batch, grad_accum_steps=1,
                 max_gt_boxes=16)
    model = FasterRCNN(cfg)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, size, size, 3), jnp.float32)
    g = cfg.max_gt_boxes
    gt_boxes = jnp.tile(jnp.array([[50.0, 50.0, 300.0, 300.0]]), (batch, g, 1))
    gt_labels = jnp.zeros((batch, g), jnp.int32)
    gt_valid = jnp.tile(jnp.array([True, True] + [False] * (g - 2)), (batch, 1))
    variables = jax.jit(functools.partial(model.init, train=True))(
        jax.random.PRNGKey(0), images[:1])
    params, batch_stats = variables["params"], variables["batch_stats"]
    print(f"devices: {jax.devices()}  batch={batch} backbone={backbone} "
          f"fpn anchors={model.cfg.feat_size}", flush=True)

    def staged(m: FasterRCNN, images, stage: str):
        img_size = images.shape[1:3]
        feats = m._features(images, train=True)
        if stage == "feats":
            return sum(_sum(f) for f in feats)
        rpn_locs, rpn_scores = m.rpn_head(feats)
        if stage == "rpn_head":
            return _sum(rpn_locs) + _sum(rpn_scores)
        anchors = jnp.asarray(m.anchors)
        at_fn = functools.partial(
            anchor_target, n_sample=cfg.rpn_n_sample,
            pos_iou_thresh=cfg.rpn_pos_iou_thresh,
            neg_iou_thresh=cfg.rpn_neg_iou_thresh, pos_ratio=cfg.rpn_pos_ratio)
        gt_rpn_loc, gt_rpn_label = jax.vmap(
            lambda b_, v: at_fn(anchors, b_, v))(gt_boxes, gt_valid)
        rpn_loc_loss = jnp.mean(jax.vmap(
            lambda p, gg, l: fast_rcnn_loc_loss(p, gg, l, cfg.rpn_sigma))(
                rpn_locs, gt_rpn_loc, gt_rpn_label))
        rpn_cls_loss = jnp.mean(jax.vmap(softmax_cross_entropy_with_ignore)(
            rpn_scores, gt_rpn_label))
        if stage == "rpn_loss":
            return rpn_loc_loss + rpn_cls_loss
        rois, _, roi_valid = m._proposals(
            jax.lax.stop_gradient(rpn_locs),
            jax.lax.stop_gradient(rpn_scores), img_size, train=True)
        pt_fn = functools.partial(
            proposal_target, n_sample=cfg.roi_n_sample,
            pos_ratio=cfg.roi_pos_ratio, pos_iou_thresh=cfg.roi_pos_iou_thresh,
            neg_iou_thresh_high=cfg.roi_neg_iou_thresh_high,
            neg_iou_thresh_low=cfg.roi_neg_iou_thresh_low)
        sample_roi, gt_roi_loc, gt_roi_label, sample_valid = jax.vmap(pt_fn)(
            rois, roi_valid, gt_boxes, gt_valid, gt_labels)
        if stage == "proposals":
            return (rpn_loc_loss + rpn_cls_loss + _sum(sample_roi)
                    + _sum(gt_roi_loc))
        # head_hybrid = train default (windowed fwd, dense matmul VJP);
        # head_window = windowed fwd + autodiff scatter-add backward
        use_window = stage == "head_window"
        roi_cls_locs, roi_scores = m.roi_head(
            feats, sample_roi, img_size, use_window=use_window)
        s = cfg.roi_n_sample
        locs4 = roi_cls_locs.reshape(roi_cls_locs.shape[0], s, -1, 4)
        roi_loc = jnp.take_along_axis(
            locs4, gt_roi_label[..., None, None].astype(jnp.int32), axis=2
        )[:, :, 0, :]
        ce_labels = jnp.where(sample_valid, gt_roi_label, -1)
        roi_loc_loss = jnp.mean(jax.vmap(
            lambda p, gg, l: fast_rcnn_loc_loss(p, gg, l, cfg.roi_sigma))(
                roi_loc, gt_roi_loc, jnp.where(sample_valid, gt_roi_label, 0)))
        roi_cls_loss = jnp.mean(jax.vmap(softmax_cross_entropy_with_ignore)(
            roi_scores, ce_labels))
        return rpn_loc_loss + rpn_cls_loss + roi_loc_loss + roi_cls_loss

    def make_stage(stage):
        def step(p, images_, carry):
            def loss(pp):
                out, _ = model.apply(
                    {"params": pp, "batch_stats": batch_stats},
                    images_ + carry, stage, method=staged,
                    mutable=["batch_stats"])
                return out
            val, grads = jax.value_and_grad(loss)(p)
            probe = sum(_sum(x) for x in jax.tree_util.tree_leaves(grads))
            return val + probe
        return step

    stages = ["feats", "rpn_head", "rpn_loss", "proposals", "head_hybrid",
              "head_window"]
    times = {}
    for st in stages:
        times[st] = scan_time(make_stage(st), params, images, iters=iters,
                              label=f"grad through: {st}")

    prev = 0.0
    print("\n--- deltas ---")
    for st in stages[:5]:
        print(f"{st:20s} +{times[st] - prev:7.2f} ms")
        prev = times[st]
    print(f"{'window - hybrid':20s} "
          f"{times['head_window'] - times['head_hybrid']:+7.2f} ms")

    from two_stage_object_detection_tpu.nets.trainer import (
        create_train_state, train_step_fn)
    _, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                  init_image_size=(64, 64))
    batch_d = {"image": images, "boxes": gt_boxes, "labels": gt_labels,
               "valid": gt_valid}
    rngk = jax.random.PRNGKey(2)

    def full(state_, b, carry):
        s2, losses = train_step_fn(state_, {**b, "image": b["image"] + carry},
                                   rngk)
        probe = sum(_sum(x) for x in jax.tree_util.tree_leaves(s2.params))
        return losses["total"] + probe
    scan_time(full, state, batch_d, iters=iters, label="full train step (opt)")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 16, a[1] if len(a) > 1 else "resnet50",
         int(a[2]) if len(a) > 2 else 600, int(a[3]) if len(a) > 3 else 10)
