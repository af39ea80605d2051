"""Pallas TPU kernel: fused proposal generation.

Fuses the whole RPN proposal hot path — box decode, clamp-to-image,
min-size filtering, and greedy NMS — into one VMEM-resident kernel
(BASELINE.md north-star: "the proposal hot path ... fused into Pallas
kernels with static padded shapes").

Key design point: **no sort**.  Greedy NMS picks the highest-scoring
still-alive box each step; with scores in VMEM that is an ``argmax`` over a
masked score vector, so the score-sort (and the reference's top-12000
pre-NMS truncation, ``nets/rpn.py:57-61``) disappears — each of the
``n_post`` steps is a handful of vector passes over all ~13k anchors held
entirely in VMEM (13k anchors x 9 rows of f32 ~ 0.5 MB).

Data layout: coordinates live in *rows* (``[4, N]`` transposed boxes) so
every step is a ``[1, N]`` lane-aligned vector op; the selected box's
coordinates are extracted with a one-hot reduction instead of a dynamic
lane gather.

Semantics match :func:`...nets.rpn.create_proposals` + the jnp NMS
(strict-greater IoU suppression), minus pre-NMS truncation (which only
reorders ties beyond the 12000th candidate).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fused_kernel(locs_ref, scores_ref, anchors_ref,
                  boxes_out_ref, scores_out_ref, valid_out_ref,
                  *, n_post: int, iou_threshold: float, min_size: float,
                  img_h: float, img_w: float):
    n = locs_ref.shape[1]

    ax1 = anchors_ref[0:1, :]
    ay1 = anchors_ref[1:2, :]
    ax2 = anchors_ref[2:3, :]
    ay2 = anchors_ref[3:4, :]
    aw = ax2 - ax1
    ah = ay2 - ay1
    acx = ax1 + 0.5 * aw
    acy = ay1 + 0.5 * ah

    dx = locs_ref[0:1, :]
    dy = locs_ref[1:2, :]
    dw = locs_ref[2:3, :]
    dh = locs_ref[3:4, :]

    cx = dx * aw + acx
    cy = dy * ah + acy
    w = jnp.exp(dw) * aw
    h = jnp.exp(dh) * ah

    x1 = jnp.clip(cx - 0.5 * w, 0.0, img_w)
    y1 = jnp.clip(cy - 0.5 * h, 0.0, img_h)
    x2 = jnp.clip(cx + 0.5 * w, 0.0, img_w)
    y2 = jnp.clip(cy + 0.5 * h, 0.0, img_h)

    bw = x2 - x1
    bh = y2 - y1
    area = bw * bh
    ok = (bw >= min_size) & (bh >= min_size)
    s = jnp.where(ok, scores_ref[0:1, :], NEG)

    lane = lax.broadcasted_iota(jnp.int32, (1, n), 1)
    k_pad = boxes_out_ref.shape[1]
    out_lane = lax.broadcasted_iota(jnp.int32, (1, k_pad), 1)

    def body(k, carry):
        # output rows are accumulated in the carry with one-hot selects
        # (Mosaic cannot store scalars to VMEM) and written once at the end
        s_alive, ox1, oy1, ox2, oy2, osc, oval = carry
        i = jnp.argmax(s_alive)                       # flat index in [1, N]
        one_hot = (lane == i.astype(jnp.int32)).astype(jnp.float32)
        sc = jnp.sum(s_alive * one_hot)
        valid = sc > NEG / 2

        bx1 = jnp.sum(x1 * one_hot)
        by1 = jnp.sum(y1 * one_hot)
        bx2 = jnp.sum(x2 * one_hot)
        by2 = jnp.sum(y2 * one_hot)
        barea = jnp.sum(area * one_hot)

        ix1 = jnp.maximum(x1, bx1)
        iy1 = jnp.maximum(y1, by1)
        ix2 = jnp.minimum(x2, bx2)
        iy2 = jnp.minimum(y2, by2)
        inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
        iou = inter / (area + barea - inter + 1e-8)

        suppress = (iou > iou_threshold) | (one_hot > 0.0)
        s_alive = jnp.where(suppress, NEG, s_alive)

        vf = valid.astype(jnp.float32)
        sel = out_lane == k
        ox1 = jnp.where(sel, bx1 * vf, ox1)
        oy1 = jnp.where(sel, by1 * vf, oy1)
        ox2 = jnp.where(sel, bx2 * vf, ox2)
        oy2 = jnp.where(sel, by2 * vf, oy2)
        osc = jnp.where(sel, sc * vf, osc)
        oval = jnp.where(sel, valid.astype(jnp.int32), oval)
        return s_alive, ox1, oy1, ox2, oy2, osc, oval

    zf = jnp.zeros((1, k_pad), jnp.float32)
    zi = jnp.zeros((1, k_pad), jnp.int32)
    _, ox1, oy1, ox2, oy2, osc, oval = lax.fori_loop(
        0, n_post, body, (s, zf, zf, zf, zf, zf, zi))
    boxes_out_ref[0:1, :] = ox1
    boxes_out_ref[1:2, :] = oy1
    boxes_out_ref[2:3, :] = ox2
    boxes_out_ref[3:4, :] = oy2
    scores_out_ref[0:1, :] = osc
    valid_out_ref[0:1, :] = oval


def _greedy_nms_rows(s, x1, y1, x2, y2,
                     boxes_out_ref, scores_out_ref, valid_out_ref,
                     *, n_post: int, iou_threshold: float):
    """Shared greedy-NMS loop over ``[B, N]`` coordinate rows.

    Each of the ``n_post`` steps argmaxes the still-alive scores per image
    (sublane), extracts the winner with a one-hot reduction, suppresses by
    IoU, and accumulates the outputs in the carry (Mosaic cannot store
    scalars to VMEM) — written once at the end.
    """
    b, n = s.shape
    area = (x2 - x1) * (y2 - y1)
    lane = lax.broadcasted_iota(jnp.int32, (b, n), 1)
    k_pad = scores_out_ref.shape[1]
    out_lane = lax.broadcasted_iota(jnp.int32, (b, k_pad), 1)

    def body(k, carry):
        s_alive, ox1, oy1, ox2, oy2, osc, oval = carry
        i = jnp.argmax(s_alive, axis=1, keepdims=True)       # [B, 1]
        one_hot = (lane == i).astype(jnp.float32)            # [B, N]
        sc = jnp.sum(s_alive * one_hot, axis=1, keepdims=True)
        valid = sc > NEG / 2                                 # [B, 1]

        bx1 = jnp.sum(x1 * one_hot, axis=1, keepdims=True)   # [B, 1]
        by1 = jnp.sum(y1 * one_hot, axis=1, keepdims=True)
        bx2 = jnp.sum(x2 * one_hot, axis=1, keepdims=True)
        by2 = jnp.sum(y2 * one_hot, axis=1, keepdims=True)
        barea = jnp.sum(area * one_hot, axis=1, keepdims=True)

        ix1 = jnp.maximum(x1, bx1)
        iy1 = jnp.maximum(y1, by1)
        ix2 = jnp.minimum(x2, bx2)
        iy2 = jnp.minimum(y2, by2)
        inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
        iou = inter / (area + barea - inter + 1e-8)

        suppress = (iou > iou_threshold) | (one_hot > 0.0)
        s_alive = jnp.where(suppress, NEG, s_alive)

        vf = valid.astype(jnp.float32)
        sel = out_lane == k
        ox1 = jnp.where(sel, bx1 * vf, ox1)
        oy1 = jnp.where(sel, by1 * vf, oy1)
        ox2 = jnp.where(sel, bx2 * vf, ox2)
        oy2 = jnp.where(sel, by2 * vf, oy2)
        osc = jnp.where(sel, sc * vf, osc)
        oval = jnp.where(sel, valid.astype(jnp.int32), oval)
        return s_alive, ox1, oy1, ox2, oy2, osc, oval

    zf = jnp.zeros((b, k_pad), jnp.float32)
    zi = jnp.zeros((b, k_pad), jnp.int32)
    _, ox1, oy1, ox2, oy2, osc, oval = lax.fori_loop(
        0, n_post, body, (s, zf, zf, zf, zf, zf, zi))
    boxes_out_ref[0] = ox1
    boxes_out_ref[1] = oy1
    boxes_out_ref[2] = ox2
    boxes_out_ref[3] = oy2
    scores_out_ref[:] = osc
    valid_out_ref[:] = oval


def _batched_kernel(locs_ref, scores_ref, anchors_ref,
                    boxes_out_ref, scores_out_ref, valid_out_ref,
                    *, n_post: int, iou_threshold: float, min_size: float,
                    img_h: float, img_w: float):
    """Whole-batch variant of :func:`_fused_kernel`.

    All per-anchor rows are ``[B, N]`` (images on sublanes), so each of the
    ``n_post`` greedy-NMS steps does full-width vector work for the whole
    batch instead of one image — 16 images cost one image's step count.
    """
    ax1 = anchors_ref[0:1, :]
    ay1 = anchors_ref[1:2, :]
    ax2 = anchors_ref[2:3, :]
    ay2 = anchors_ref[3:4, :]
    aw = ax2 - ax1
    ah = ay2 - ay1
    acx = ax1 + 0.5 * aw
    acy = ay1 + 0.5 * ah

    cx = locs_ref[0] * aw + acx                       # [B, N]
    cy = locs_ref[1] * ah + acy
    w = jnp.exp(locs_ref[2]) * aw
    h = jnp.exp(locs_ref[3]) * ah

    x1 = jnp.clip(cx - 0.5 * w, 0.0, img_w)
    y1 = jnp.clip(cy - 0.5 * h, 0.0, img_h)
    x2 = jnp.clip(cx + 0.5 * w, 0.0, img_w)
    y2 = jnp.clip(cy + 0.5 * h, 0.0, img_h)

    bw = x2 - x1
    bh = y2 - y1
    ok = (bw >= min_size) & (bh >= min_size)
    s = jnp.where(ok, scores_ref[:], NEG)

    _greedy_nms_rows(s, x1, y1, x2, y2,
                     boxes_out_ref, scores_out_ref, valid_out_ref,
                     n_post=n_post, iou_threshold=iou_threshold)


def _batched_nms_kernel(boxes_ref, scores_ref,
                        boxes_out_ref, scores_out_ref, valid_out_ref,
                        *, n_post: int, iou_threshold: float):
    """NMS-only variant: boxes already decoded/clamped/filtered outside.

    Used by the pre-NMS-truncated path (reference ``nets/rpn.py:57-61``):
    decode + clamp + min-size masking are elementwise work XLA handles well
    over the FULL anchor table, the exact ``top_k`` cuts ~90k FPN anchors to
    ``n_pre_nms``, and only the sequential greedy loop — the part XLA cannot
    express without a sort per step — runs in VMEM at the truncated width.
    """
    _greedy_nms_rows(scores_ref[:], boxes_ref[0], boxes_ref[1],
                     boxes_ref[2], boxes_ref[3],
                     boxes_out_ref, scores_out_ref, valid_out_ref,
                     n_post=n_post, iou_threshold=iou_threshold)


# VMEM holds ~12 [B, N] f32 rows of the anchor grid (~0.65 MB per image at
# 13k anchors); 16 images stay well inside the ~16 MB budget.  For bigger
# anchor tables (FPN's P2-P6 pyramid is ~90k anchors -> ~2.9 MB/image,
# measured 41.4 MB scoped-vmem OOM at batch 16) the chunk shrinks so each
# kernel invocation stays under the scoped-VMEM budget.
_MAX_KERNEL_BATCH = 16
_VMEM_BUDGET_BYTES = 12 << 20     # leave headroom under the 16 MB/core limit
_BYTES_PER_ANCHOR = 12 * 4        # ~12 live [B, N] f32 rows in the kernel


def _kernel_chunk(n_pad: int) -> int:
    per_image = n_pad * _BYTES_PER_ANCHOR
    return max(1, min(_MAX_KERNEL_BATCH, _VMEM_BUDGET_BYTES // per_image))


@functools.partial(jax.jit, static_argnames=(
    "img_size", "nms_iou", "n_post_nms", "min_size", "n_pre_nms",
    "interpret"))
def fused_proposals_batched(rpn_locs: jnp.ndarray, rpn_fg_scores: jnp.ndarray,
                            anchors: jnp.ndarray, img_size, *, nms_iou: float,
                            n_post_nms: int, min_size: float,
                            n_pre_nms=None, interpret: bool = False):
    """Whole-batch fused decode+clamp+filter+NMS.

    Args:
      rpn_locs: ``[B, N, 4]``.  rpn_fg_scores: ``[B, N]``.
      anchors: ``[N, 4]``.  img_size: static ``(H, W)``.
      n_pre_nms: optional exact pre-NMS truncation (reference
        ``nets/rpn.py:57-61``).  Engaged only when it cuts the anchor count
        >= 6x: the greedy loop is latency-bound at moderate widths, so the
        exact ``top_k`` must buy a large width reduction to pay for itself
        (measured on v5e: 13k -> 3k LOST 9 ms/batch16; 90k -> 3k won 24 ms,
        90k -> 12k won 48 ms).  Below the threshold the full-set greedy
        NMS — a strict superset of the truncated reference semantics — is
        both faster and exact.

    Returns:
      ``(rois [B, n_post, 4], scores [B, n_post], valid [B, n_post])``.

    One kernel invocation per <=16-image chunk; each of the ``n_post``
    sequential greedy steps processes the whole chunk on the VPU sublanes
    (measured: batch 16 at train scale drops ~13 ms -> ~2 ms vs the
    per-image vmapped kernel).  With ``n_pre_nms`` the decode/clamp/filter
    prologue runs in XLA over the full table and only the truncated set
    enters VMEM — at FPN scale (~90k anchors) this turns a 2-image-chunk
    90k-wide loop into a 16-image 3k-wide one.
    """
    bsz, n, _ = rpn_locs.shape
    if n_pre_nms is not None and 6 * n_pre_nms <= n:
        return _truncated_proposals_batched(
            rpn_locs, rpn_fg_scores, anchors, img_size, nms_iou=nms_iou,
            n_post_nms=n_post_nms, min_size=min_size, n_pre_nms=n_pre_nms,
            interpret=interpret)
    chunk = _kernel_chunk(_round_up(n, 128))
    if bsz > chunk:
        splits = [
            fused_proposals_batched(
                rpn_locs[i:i + chunk],
                rpn_fg_scores[i:i + chunk], anchors, img_size,
                nms_iou=nms_iou, n_post_nms=n_post_nms, min_size=min_size,
                interpret=interpret)
            for i in range(0, bsz, chunk)]
        return tuple(jnp.concatenate(parts, axis=0) for parts in zip(*splits))

    n_pad = _round_up(n, 128)
    pad = n_pad - n

    locs_t = jnp.pad(rpn_locs, ((0, 0), (0, pad), (0, 0))).transpose(2, 0, 1)
    anchors_t = jnp.pad(anchors.astype(jnp.float32),
                        ((0, pad), (0, 0)), constant_values=1.0).T
    scores_p = jnp.pad(rpn_fg_scores, ((0, 0), (0, pad)),
                       constant_values=NEG)

    kernel = functools.partial(
        _batched_kernel, n_post=n_post_nms, iou_threshold=nms_iou,
        min_size=min_size, img_h=float(img_size[0]), img_w=float(img_size[1]))

    k_pad = _round_up(n_post_nms, 128)
    boxes_t, scores_o, valid_o = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((4, bsz, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((bsz, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((bsz, k_pad), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 3,
        interpret=interpret,
    )(locs_t.astype(jnp.float32), scores_p.astype(jnp.float32), anchors_t)

    rois = boxes_t[:, :, :n_post_nms].transpose(1, 2, 0)
    return (rois, scores_o[:, :n_post_nms],
            valid_o[:, :n_post_nms].astype(bool))


def _truncated_proposals_batched(rpn_locs, rpn_fg_scores, anchors, img_size,
                                 *, nms_iou: float, n_post_nms: int,
                                 min_size: float, n_pre_nms: int,
                                 interpret: bool):
    """Decode in XLA, exact top-``n_pre_nms``, NMS-only kernel.

    Bitwise-matches :func:`...nets.rpn.create_proposals` (same decode, same
    masked-score ``top_k``, same strict-greater greedy suppression) while
    keeping the sequential loop in VMEM.
    """
    from two_stage_object_detection_tpu.ops.geometry import (
        clip_boxes, loc2bbox)

    bsz = rpn_locs.shape[0]
    roi = jax.vmap(lambda l: clip_boxes(loc2bbox(anchors, l), img_size))(
        rpn_locs.astype(jnp.float32))                      # [B, N, 4]
    wh = roi[..., 2:4] - roi[..., 0:2]
    ok = (wh[..., 0] >= min_size) & (wh[..., 1] >= min_size)
    masked = jnp.where(ok, rpn_fg_scores.astype(jnp.float32), NEG)
    top_scores, top_idx = jax.lax.top_k(masked, n_pre_nms)  # [B, K]
    top_boxes = jnp.take_along_axis(roi, top_idx[..., None], axis=1)

    k_in = _round_up(n_pre_nms, 128)
    chunk = _kernel_chunk(k_in)
    if bsz > chunk:
        splits = [
            _truncated_nms_call(top_boxes[i:i + chunk],
                                top_scores[i:i + chunk], nms_iou=nms_iou,
                                n_post_nms=n_post_nms, interpret=interpret)
            for i in range(0, bsz, chunk)]
        return tuple(jnp.concatenate(parts, axis=0) for parts in zip(*splits))
    return _truncated_nms_call(top_boxes, top_scores, nms_iou=nms_iou,
                               n_post_nms=n_post_nms, interpret=interpret)


def _truncated_nms_call(boxes, scores, *, nms_iou: float, n_post_nms: int,
                        interpret: bool):
    """One NMS-only kernel invocation over ``boxes [B, K, 4]``."""
    bsz, k, _ = boxes.shape
    k_in = _round_up(k, 128)
    pad = k_in - k
    boxes_t = jnp.pad(boxes, ((0, 0), (0, pad), (0, 0))).transpose(2, 0, 1)
    scores_p = jnp.pad(scores, ((0, 0), (0, pad)), constant_values=NEG)

    kernel = functools.partial(_batched_nms_kernel, n_post=n_post_nms,
                               iou_threshold=nms_iou)
    k_pad = _round_up(n_post_nms, 128)
    boxes_o, scores_o, valid_o = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((4, bsz, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((bsz, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((bsz, k_pad), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 3,
        interpret=interpret,
    )(boxes_t, scores_p)

    rois = boxes_o[:, :, :n_post_nms].transpose(1, 2, 0)
    return (rois, scores_o[:, :n_post_nms],
            valid_o[:, :n_post_nms].astype(bool))


@functools.partial(jax.jit, static_argnames=(
    "img_size", "nms_iou", "n_post_nms", "min_size", "interpret"))
def fused_proposals(rpn_locs: jnp.ndarray, rpn_fg_scores: jnp.ndarray,
                    anchors: jnp.ndarray, img_size, *, nms_iou: float,
                    n_post_nms: int, min_size: float,
                    interpret: bool = False):
    """Fused decode+clamp+filter+NMS for one image.

    Args:
      rpn_locs: ``[N, 4]`` deltas.  rpn_fg_scores: ``[N]``.
      anchors: ``[N, 4]`` xyxy.  img_size: static ``(H, W)``.

    Returns:
      ``(rois [n_post, 4], scores [n_post], valid [n_post])`` — same contract
      as :func:`...nets.rpn.create_proposals`.
    """
    n = rpn_locs.shape[0]
    n_pad = _round_up(n, 128)
    pad = n_pad - n

    locs_t = jnp.pad(rpn_locs, ((0, pad), (0, 0))).T          # [4, Np]
    anchors_t = jnp.pad(anchors.astype(jnp.float32),
                        ((0, pad), (0, 0)), constant_values=1.0).T
    scores_p = jnp.pad(rpn_fg_scores, (0, pad),
                       constant_values=NEG)[None, :]          # [1, Np]

    kernel = functools.partial(
        _fused_kernel, n_post=n_post_nms, iou_threshold=nms_iou,
        min_size=min_size, img_h=float(img_size[0]), img_w=float(img_size[1]))

    k_pad = _round_up(n_post_nms, 128)
    boxes_t, scores_o, valid_o = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((4, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, k_pad), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 3,
        interpret=interpret,
    )(locs_t.astype(jnp.float32), scores_p.astype(jnp.float32), anchors_t)

    rois = boxes_t[:, :n_post_nms].T
    return (rois, scores_o[0, :n_post_nms],
            valid_o[0, :n_post_nms].astype(bool))
