#!/usr/bin/env python
"""Micro-profile of anchor_target + RPN losses at FPN anchor scale.

Isolates the +30 ms/step the FPN train profile attributes to the RPN
target/loss stage (scripts/profile_fpn_train.py): target assignment alone,
losses alone (with grad to the RPN outputs), and the cumsum-based
first-k ranking vs a log-depth associative_scan.

Usage: python scripts/profile_anchor_target.py [n_anchors] [batch]
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

from two_stage_object_detection_tpu.nets.losses import (
    fast_rcnn_loc_loss, softmax_cross_entropy_with_ignore)
from two_stage_object_detection_tpu.nets.targets import anchor_target


def scan_time(step_fn, *args, iters=20, label=""):
    @jax.jit
    def loop(*a):
        def body(carry, _):
            out = step_fn(*a, carry)
            return out * 0.0, None
        carry, _ = lax.scan(body, 0.0, None, length=iters)
        return carry

    t0 = time.perf_counter()
    jax.device_get(loop(*args))
    ct = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(loop(*args))
    dt = (time.perf_counter() - t0) / iters * 1000.0
    print(f"{label:46s} {dt:8.2f} ms  (compile {ct:.0f}s)", flush=True)
    return dt


def main(n_anchors=90090, batch=16, g=16):
    rng = np.random.RandomState(0)
    anchors = jnp.asarray(rng.rand(n_anchors, 4) * 500, jnp.float32)
    anchors = anchors.at[:, 2:].add(anchors[:, :2])
    gt_boxes = jnp.tile(jnp.array([[50.0, 50.0, 300.0, 300.0]]), (batch, g, 1))
    gt_valid = jnp.tile(jnp.array([True, True] + [False] * (g - 2)), (batch, 1))
    rpn_locs = jnp.asarray(rng.randn(batch, n_anchors, 4), jnp.float32)
    rpn_scores = jnp.asarray(rng.randn(batch, n_anchors, 2), jnp.float32)
    print(f"devices: {jax.devices()}  A={n_anchors} B={batch}", flush=True)

    at = functools.partial(anchor_target, n_sample=256)

    def targets_only(b, v, carry):
        loc, lab = jax.vmap(lambda b_, v_: at(anchors, b_ + carry, v_))(b, v)
        return jnp.sum(loc) + jnp.sum(lab.astype(jnp.float32))
    scan_time(targets_only, gt_boxes, gt_valid, label="anchor_target (vmapped, no grad)")

    loc_t, lab_t = jax.jit(jax.vmap(lambda b_, v_: at(anchors, b_, v_)))(
        gt_boxes, gt_valid)

    def losses_grad(locs, scores, carry):
        def loss(l, s):
            ll = jnp.mean(jax.vmap(
                lambda p, gg, la: fast_rcnn_loc_loss(p, gg, la, 3.0))(
                    l + carry, loc_t, lab_t))
            cl = jnp.mean(jax.vmap(softmax_cross_entropy_with_ignore)(
                s, lab_t))
            return ll + cl
        val, grads = jax.value_and_grad(loss, argnums=(0, 1))(locs, scores)
        return val + jnp.sum(grads[0]) + jnp.sum(grads[1])
    scan_time(losses_grad, rpn_locs, rpn_scores, label="rpn losses fwd+grad (fixed targets)")

    # ---- the ranking primitive in isolation ----
    mask = jnp.asarray(rng.rand(batch, n_anchors) < 0.01)

    def rank_cumsum(m, carry):
        r = jnp.cumsum(m + (carry > 1e9), axis=-1) - 1
        return jnp.sum((m & (r < 128)).astype(jnp.float32))
    scan_time(rank_cumsum, mask, label="rank: jnp.cumsum")

    def rank_ascan(m, carry):
        r = lax.associative_scan(
            jnp.add, (m + (carry > 1e9)).astype(jnp.int32), axis=-1) - 1
        return jnp.sum((m & (r < 128)).astype(jnp.float32))
    scan_time(rank_ascan, mask, label="rank: lax.associative_scan")

    # ---- losses with the cotangent flowing through the FPN head's
    # reshape+concat from conv-layout tensors (the composed-train shape) ----
    if n_anchors == 90090:
        level_hw = [(150, 150), (75, 75), (38, 38), (19, 19), (10, 10)]
        conv_locs = [jnp.asarray(rng.randn(batch, h, w, 12), jnp.float32)
                     for h, w in level_hw]
        conv_scores = [jnp.asarray(rng.randn(batch, h, w, 6), jnp.float32)
                       for h, w in level_hw]
        lv_sizes = [h * w * 3 for h, w in level_hw]

        def losses_via_concat(cl, cs, carry):
            def loss(cl_, cs_):
                locs = jnp.concatenate(
                    [c.reshape(batch, -1, 4) for c in cl_], axis=1) + carry
                scores = jnp.concatenate(
                    [c.reshape(batch, -1, 2) for c in cs_], axis=1)
                ll = jnp.mean(jax.vmap(
                    lambda p, gg, la: fast_rcnn_loc_loss(p, gg, la, 3.0))(
                        locs, loc_t, lab_t))
                ce = jnp.mean(jax.vmap(softmax_cross_entropy_with_ignore)(
                    scores, lab_t))
                return ll + ce
            val, grads = jax.value_and_grad(loss, argnums=(0, 1))(cl, cs)
            return val + sum(jnp.sum(g) for g in grads[0] + grads[1])
        scan_time(losses_via_concat, conv_locs, conv_scores,
                  label="losses+grad THROUGH reshape/concat")

        def losses_per_level(cl, cs, carry):
            def loss(cl_, cs_):
                num_l = den_l = num_c = den_c = 0.0
                off = 0
                for li, (c_loc, c_sc) in enumerate(zip(cl_, cs_)):
                    a_l = lv_sizes[li]
                    lab = lax.dynamic_slice_in_dim(lab_t, off, a_l, 1)
                    tgt = lax.dynamic_slice_in_dim(loc_t, off, a_l, 1)
                    off += a_l
                    p_loc = c_loc.reshape(batch, a_l, 4) + carry
                    pos = (lab > 0).astype(jnp.float32)[..., None]
                    diff = jnp.abs(tgt - p_loc)
                    sl1 = jnp.where(diff < 1.0 / 9.0, 4.5 * diff ** 2,
                                    diff - 0.5 / 9.0)
                    num_l += jnp.sum(sl1 * pos)
                    den_l += jnp.sum(pos) * 4
                    logits = c_sc.reshape(batch, a_l, 2)
                    valid = lab != -1
                    lp = logits - jnp.max(logits, -1, keepdims=True)
                    lp = lp - jnp.log(jnp.sum(jnp.exp(lp), -1, keepdims=True))
                    nll = jnp.where(lab == 1, -lp[..., 1], -lp[..., 0])
                    num_c += jnp.sum(nll * valid)
                    den_c += jnp.sum(valid)
                return (num_l / jnp.maximum(den_l, 1.0)
                        + num_c / jnp.maximum(den_c, 1.0))
            val, grads = jax.value_and_grad(loss, argnums=(0, 1))(cl, cs)
            return val + sum(jnp.sum(g) for g in grads[0] + grads[1])
        scan_time(losses_per_level, conv_locs, conv_scores,
                  label="losses+grad per-level (no concat)")

    # full iou+argmax block without the subsample ranking
    def assign_only(b, v, carry):
        from two_stage_object_detection_tpu.ops.geometry import bbox_iou, bbox2loc

        def one(b_, v_):
            iou = bbox_iou(anchors, b_ + carry)
            iou = jnp.where(v_[None, :], iou, -1.0)
            am = jnp.argmax(iou, axis=1)
            mx = jnp.max(iou, axis=1)
            loc = bbox2loc(anchors, b_[am])
            return jnp.sum(loc) + jnp.sum(mx)
        return jnp.sum(jax.vmap(one)(b, v))
    scan_time(assign_only, gt_boxes, gt_valid, label="iou+argmax+bbox2loc [A,G] layout")

    # transposed layout: anchors in the 128-lane minor dim, G in sublanes
    def assign_only_t(b, v, carry):
        from two_stage_object_detection_tpu.ops.geometry import bbox_iou, bbox2loc

        def one(b_, v_):
            iou = bbox_iou(b_ + carry, anchors)             # [G, A]
            iou = jnp.where(v_[:, None], iou, -1.0)
            am = jnp.argmax(iou, axis=0)                    # [A]
            mx = jnp.max(iou, axis=0)
            loc = bbox2loc(anchors, b_[am])
            return jnp.sum(loc) + jnp.sum(mx)
        return jnp.sum(jax.vmap(one)(b, v))
    scan_time(assign_only_t, gt_boxes, gt_valid, label="iou+argmax+bbox2loc [G,A] layout")

    # [G, A] iou + one-hot matmul instead of the row gather
    def assign_only_t_mm(b, v, carry):
        from two_stage_object_detection_tpu.ops.geometry import bbox_iou, bbox2loc

        def one(b_, v_):
            iou = bbox_iou(b_ + carry, anchors)             # [G, A]
            iou = jnp.where(v_[:, None], iou, -1.0)
            mx = jnp.max(iou, axis=0)
            onehot = (iou == mx[None, :]).astype(jnp.float32)
            onehot = onehot / jnp.maximum(onehot.sum(0), 1.0)
            picked = onehot.T @ b_                          # [A, 4]
            loc = bbox2loc(anchors, picked)
            return jnp.sum(loc) + jnp.sum(mx)
        return jnp.sum(jax.vmap(one)(b, v))
    scan_time(assign_only_t_mm, gt_boxes, gt_valid,
              label="iou [G,A] + one-hot-matmul gather")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 90090, int(a[1]) if len(a) > 1 else 16)
