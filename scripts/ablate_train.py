#!/usr/bin/env python
"""Find the unexplained backward time in the full train step.

Decomposes the 304 ms/step (batch 16) into component grads measured under
the same scan-amortised methodology:

  t_bb   backbone fwd+bwd
  t_rpn  backbone + RPN head + RPN losses fwd+bwd (constant targets)
  t_roi  t_rpn + RoI pool + dense head + RoI losses (constant rois/targets)
  t_prop proposal generation fwd only (train scale, 600 post-NMS)
  t_tgt  anchor_target + proposal_target fwd only

Expected: full ~= t_roi + t_prop + t_tgt + optimizer(3ms).  Whatever doesn't
add up is XLA scheduling/fusion loss worth chasing.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import functools  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

ITERS = int(os.environ.get("ITERS", 10))


def scan_time(step_fn, *args, label=""):
    @jax.jit
    def loop(*a):
        def body(carry, _):
            return step_fn(*a, carry) * 0.0, None
        carry, _ = lax.scan(body, 0.0, None, length=ITERS)
        return carry

    t0 = time.perf_counter()
    jax.device_get(loop(*args))
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(loop(*args))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label:58s} {dt * 1000:8.2f} ms  (compile {c:.0f}s)", flush=True)
    return dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    from two_stage_object_detection_tpu.config import Config
    from two_stage_object_detection_tpu.models.registry import build_backbone
    from two_stage_object_detection_tpu.nets.rpn import RPNHead
    from two_stage_object_detection_tpu.nets.losses import (
        fast_rcnn_loc_loss, softmax_cross_entropy_with_ignore)
    from two_stage_object_detection_tpu.ops.roi_pool import roi_pool
    from two_stage_object_detection_tpu.ops.anchors import make_anchors
    import flax.linen as nn

    cfg = Config(batch_size=batch, max_gt_boxes=16)
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, 600, 600, 3), jnp.float32)
    n_anchor = cfg.num_anchors
    print(f"devices: {jax.devices()}  batch={batch}  anchors={n_anchor}",
          flush=True)

    extractor, _ = build_backbone(cfg.backbone, dtype)
    rpn_head = RPNHead(n_anchors=cfg.n_anchors_per_cell, dtype=dtype)

    class HeadDense(nn.Module):
        @nn.compact
        def __call__(self, flat):
            locs = nn.Dense((cfg.num_classes + 1) * 4, dtype=dtype)(flat)
            scores = nn.Dense(cfg.num_classes + 1, dtype=dtype)(flat)
            return locs.astype(jnp.float32), scores.astype(jnp.float32)

    ex_vars = jax.jit(extractor.init)(jax.random.PRNGKey(0),
                                      jnp.zeros((1, 64, 64, 3)))
    feats0 = extractor.apply(ex_vars, images[:1], False)
    rpn_vars = rpn_head.init(jax.random.PRNGKey(1), feats0)
    head = HeadDense()
    head_vars = head.init(jax.random.PRNGKey(2),
                          jnp.zeros((1, cfg.backbone_channels)))

    # constant targets / rois
    gt_rpn_label = jnp.asarray(
        rng.randint(-1, 2, (batch, n_anchor)), jnp.int32)
    gt_rpn_loc = jnp.asarray(rng.randn(batch, n_anchor, 4), jnp.float32)
    s = cfg.roi_n_sample
    rois = jnp.asarray(
        np.stack([np.sort(rng.rand(batch, s, 2) * 600, -1)[..., 0],
                  np.sort(rng.rand(batch, s, 2) * 600, -1)[..., 0],
                  np.sort(rng.rand(batch, s, 2) * 600, -1)[..., 1],
                  np.sort(rng.rand(batch, s, 2) * 600, -1)[..., 1]], -1),
        jnp.float32)
    gt_roi_label = jnp.asarray(rng.randint(0, cfg.num_classes + 1, (batch, s)),
                               jnp.int32)
    gt_roi_loc = jnp.asarray(rng.randn(batch, s, 4), jnp.float32)

    def rpn_losses(locs, scores):
        l1 = jnp.mean(jax.vmap(
            lambda p, g, l: fast_rcnn_loc_loss(p, g, l, 1.0))(
                locs, gt_rpn_loc, gt_rpn_label))
        l2 = jnp.mean(jax.vmap(softmax_cross_entropy_with_ignore)(
            scores, gt_rpn_label))
        return l1 + l2

    def roi_losses(locs4, scores):
        roi_loc = jnp.take_along_axis(
            locs4.reshape(batch, s, -1, 4),
            gt_roi_label[..., None, None].astype(jnp.int32), axis=2)[:, :, 0]
        l1 = jnp.mean(jax.vmap(
            lambda p, g, l: fast_rcnn_loc_loss(p, g, l, 1.0))(
                roi_loc, gt_roi_loc, gt_roi_label))
        l2 = jnp.mean(jax.vmap(softmax_cross_entropy_with_ignore)(
            scores, gt_roi_label))
        return l1 + l2

    def pool_flat(feats, mode):
        scalef = jnp.array([38 / 600., 38 / 600., 38 / 600., 38 / 600.],
                           jnp.float32)
        rf = rois * scalef
        if mode == "max":
            pooled = jax.vmap(lambda f, r: roi_pool(f, r, 7, 1.0))(feats, rf)
            return jnp.mean(pooled, axis=(2, 3)).astype(dtype)
        # matmul mean pooling: separable masked mean as two matmuls
        h, w = feats.shape[1:3]
        p = 7
        from two_stage_object_detection_tpu.ops.roi_pool import _bin_edges_pool
        def one(f, r):
            x1, y1, x2, y2 = r[:, 0], r[:, 1], r[:, 2], r[:, 3]
            rr = jnp.round(r)
            xs, xe = _bin_edges_pool(rr[:, 0], rr[:, 2], p)
            ys, ye = _bin_edges_pool(rr[:, 1], rr[:, 3], p)
            xs, xe = jnp.clip(xs, 0, w), jnp.clip(xe, 0, w)
            ys, ye = jnp.clip(ys, 0, h), jnp.clip(ye, 0, h)
            cols = jnp.arange(w, dtype=jnp.float32)
            rows = jnp.arange(h, dtype=jnp.float32)
            cm = ((cols[None, None] >= xs[:, :, None]) &
                  (cols[None, None] < xe[:, :, None])).astype(dtype)  # [R,P,W]
            rm = ((rows[None, None] >= ys[:, :, None]) &
                  (rows[None, None] < ye[:, :, None])).astype(dtype)  # [R,P,H]
            cnt_c = jnp.maximum(cm.sum(-1), 1).astype(jnp.float32)
            cnt_r = jnp.maximum(rm.sum(-1), 1).astype(jnp.float32)
            # stage1: [R*P, W] @ [W, H*C]
            f2 = f.transpose(1, 0, 2).reshape(w, -1).astype(dtype)
            s1 = (cm.reshape(-1, w) @ f2).reshape(s, p, h, -1)  # [R,Pw,H,C]
            # stage2: per (R,Pw): [P,H] @ [H,C] -> einsum
            s2 = jnp.einsum("rph,rqhc->rpqc", rm, s1)            # [R,Ph,Pw,C]
            s2 = s2 / (cnt_r[:, :, None, None] * cnt_c[:, None, :, None]).astype(dtype)
            return jnp.mean(s2, axis=(1, 2))                     # [R,C]
        return jax.vmap(one)(feats, rf).astype(dtype)

    # ---- t_bb ----
    def t_bb(v, imgs, carry):
        def loss(p):
            f = extractor.apply({"params": p,
                                 "batch_stats": v["batch_stats"]},
                                imgs + carry, False)
            return jnp.sum(f.astype(jnp.float32))
        g = jax.grad(loss)(v["params"])
        return sum(jnp.sum(x).astype(jnp.float32)
                   for x in jax.tree_util.tree_leaves(g))
    scan_time(t_bb, ex_vars, images, label="backbone fwd+bwd")

    # ---- t_rpn ----
    def t_rpn(vs, imgs, carry):
        ev, rv = vs
        def loss(ps):
            pe, pr = ps
            f = extractor.apply({"params": pe,
                                 "batch_stats": ev["batch_stats"]},
                                imgs + carry, False)
            locs, scores = rpn_head.apply({"params": pr}, f)
            return rpn_losses(locs, scores)
        g = jax.grad(loss)((ev["params"], rv["params"]))
        return sum(jnp.sum(x).astype(jnp.float32)
                   for x in jax.tree_util.tree_leaves(g))
    scan_time(t_rpn, (ex_vars, rpn_vars), images,
              label="backbone+RPN head+RPN losses fwd+bwd")

    # ---- t_roi (max pool) ----
    def make_t_roi(mode):
        def t_roi(vs, imgs, carry):
            ev, rv, hv = vs
            def loss(ps):
                pe, pr, ph = ps
                f = extractor.apply({"params": pe,
                                     "batch_stats": ev["batch_stats"]},
                                    imgs + carry, False)
                locs, scores = rpn_head.apply({"params": pr}, f)
                flat = pool_flat(f, mode)
                hl, hs = head.apply({"params": ph}, flat)
                return rpn_losses(locs, scores) + roi_losses(hl, hs)
            g = jax.grad(loss)((ev["params"], rv["params"], hv["params"]))
            return sum(jnp.sum(x).astype(jnp.float32)
                       for x in jax.tree_util.tree_leaves(g))
        return t_roi
    scan_time(make_t_roi("max"), (ex_vars, rpn_vars, head_vars), images,
              label="above + RoI max-pool+head+losses fwd+bwd")
    scan_time(make_t_roi("mean"), (ex_vars, rpn_vars, head_vars), images,
              label="above + RoI matmul-MEAN-pool+head+losses fwd+bwd")

    # ---- t_prop: proposals fwd only, train scale ----
    from two_stage_object_detection_tpu.ops.pallas_proposals import (
        fused_proposals)
    anchors = jnp.asarray(make_anchors(cfg))
    locs_c = jnp.asarray(rng.randn(batch, n_anchor, 4) * 0.1, jnp.float32)
    fg_c = jnp.asarray(rng.rand(batch, n_anchor), jnp.float32)

    def t_prop(l, f, carry):
        fn = functools.partial(fused_proposals, anchors=anchors,
                               img_size=(600, 600), nms_iou=cfg.rpn_nms_iou,
                               n_post_nms=cfg.n_train_post_nms,
                               min_size=cfg.proposal_min_size)
        out = jax.vmap(fn)(l + carry, f)
        return jnp.sum(out[0]).astype(jnp.float32)
    scan_time(t_prop, locs_c, fg_c, label="proposals fwd (train, 600 post)")

    # ---- t_tgt ----
    from two_stage_object_detection_tpu.nets.targets import (
        anchor_target, proposal_target)
    gt_boxes = jnp.tile(jnp.array([[50., 50., 300., 300.]]), (batch, 16, 1))
    gt_labels = jnp.zeros((batch, 16), jnp.int32)
    gt_valid = jnp.tile(jnp.asarray([True, True] + [False] * 14), (batch, 1))
    rois600 = jnp.asarray(rng.rand(batch, cfg.n_train_post_nms, 4) * 600,
                          jnp.float32)
    rvalid = jnp.ones((batch, cfg.n_train_post_nms), bool)

    def t_tgt(gb, r6, carry):
        at = functools.partial(anchor_target, n_sample=cfg.rpn_n_sample,
                               pos_iou_thresh=cfg.rpn_pos_iou_thresh,
                               neg_iou_thresh=cfg.rpn_neg_iou_thresh,
                               pos_ratio=cfg.rpn_pos_ratio)
        l1, l2 = jax.vmap(lambda b_, v: at(anchors, b_ + carry, v))(gb, gt_valid)
        pt = functools.partial(proposal_target, n_sample=cfg.roi_n_sample,
                               pos_ratio=cfg.roi_pos_ratio,
                               pos_iou_thresh=cfg.roi_pos_iou_thresh,
                               neg_iou_thresh_high=cfg.roi_neg_iou_thresh_high,
                               neg_iou_thresh_low=cfg.roi_neg_iou_thresh_low)
        sr, grl, grlab, sv = jax.vmap(pt)(r6, rvalid, gb, gt_valid, gt_labels)
        return (jnp.sum(l1) + jnp.sum(sr)).astype(jnp.float32)
    scan_time(t_tgt, gt_boxes, rois600, label="targets fwd (anchor+proposal)")


if __name__ == "__main__":
    main()
