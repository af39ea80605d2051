"""Box geometry primitives (pure jnp, vmappable, jit-safe).

Functional equivalents of the reference's ``utils/loc_bbox_iou.py:4-97``
(``bbox_iou``, ``loc2bbox``, ``bbox2loc``, ``xywh2xyxy``) re-designed for XLA:
no data-dependent shapes, broadcast-friendly, and usable under ``vmap`` over a
batch axis.  All boxes are ``(x1, y1, x2, y2)`` in pixel coordinates.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-8


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of ``[..., 4]`` xyxy boxes -> ``[...]``."""
    wh = boxes[..., 2:4] - boxes[..., 0:2]
    return wh[..., 0] * wh[..., 1]


def bbox_iou(bbox_a: jnp.ndarray, bbox_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU matrix.

    Args:
      bbox_a: ``[n_a, 4]`` xyxy boxes.
      bbox_b: ``[n_b, 4]`` xyxy boxes.

    Returns:
      ``[n_a, n_b]`` IoU with the reference's ``1e-8`` denominator epsilon
      (reference ``utils/loc_bbox_iou.py:18-27``).
    """
    tl = jnp.maximum(bbox_a[..., :, None, :2], bbox_b[..., None, :, :2])
    br = jnp.minimum(bbox_a[..., :, None, 2:4], bbox_b[..., None, :, 2:4])
    wh = jnp.maximum(br - tl, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = box_area(bbox_a)
    area_b = box_area(bbox_b)
    union = area_a[..., :, None] + area_b[..., None, :] - inter
    return inter / (union + EPS)


def loc2bbox(src_bbox: jnp.ndarray, loc: jnp.ndarray) -> jnp.ndarray:
    """Decode ``(dx, dy, dw, dh)`` deltas onto source boxes.

    Matches reference ``utils/loc_bbox_iou.py:29-61`` including the strided
    per-class layout: ``loc`` may be ``[..., N, 4]`` or ``[..., N, 4*C]``
    where each group of 4 along the last axis is one class's deltas.

    Args:
      src_bbox: ``[..., N, 4]`` xyxy source boxes.
      loc: ``[..., N, 4*C]`` deltas.

    Returns:
      ``[..., N, 4*C]`` decoded xyxy boxes.
    """
    src_w = src_bbox[..., 2:3] - src_bbox[..., 0:1]
    src_h = src_bbox[..., 3:4] - src_bbox[..., 1:2]
    src_cx = src_bbox[..., 0:1] + 0.5 * src_w
    src_cy = src_bbox[..., 1:2] + 0.5 * src_h

    shape = loc.shape
    loc4 = loc.reshape(shape[:-1] + (-1, 4))  # [..., N, C, 4]
    dx, dy, dw, dh = loc4[..., 0], loc4[..., 1], loc4[..., 2], loc4[..., 3]

    cx = dx * src_w + src_cx
    cy = dy * src_h + src_cy
    w = jnp.exp(dw) * src_w
    h = jnp.exp(dh) * src_h

    out = jnp.stack(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )  # [..., N, C, 4]
    return out.reshape(shape)


def bbox2loc(src_bbox: jnp.ndarray, dst_bbox: jnp.ndarray) -> jnp.ndarray:
    """Encode target offsets from ``src_bbox`` to ``dst_bbox``.

    Matches reference ``utils/loc_bbox_iou.py:63-89`` (eps-clamped width/height).
    Both inputs ``[..., N, 4]`` xyxy; returns ``[..., N, 4]`` ``(dx,dy,dw,dh)``.
    """
    w = src_bbox[..., 2] - src_bbox[..., 0]
    h = src_bbox[..., 3] - src_bbox[..., 1]
    cx = src_bbox[..., 0] + 0.5 * w
    cy = src_bbox[..., 1] + 0.5 * h

    bw = dst_bbox[..., 2] - dst_bbox[..., 0]
    bh = dst_bbox[..., 3] - dst_bbox[..., 1]
    bcx = dst_bbox[..., 0] + 0.5 * bw
    bcy = dst_bbox[..., 1] + 0.5 * bh

    eps = jnp.finfo(src_bbox.dtype).eps
    w = jnp.maximum(w, eps)
    h = jnp.maximum(h, eps)

    dx = (bcx - cx) / w
    dy = (bcy - cy) / h
    # guard the log against non-positive padded boxes (padded GT rows are zeros)
    dw = jnp.log(jnp.maximum(bw, eps) / w)
    dh = jnp.log(jnp.maximum(bh, eps) / h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def clip_boxes(boxes: jnp.ndarray, img_size) -> jnp.ndarray:
    """Clamp xyxy boxes into ``(H, W)`` image bounds.

    Uniform ``(H, W)`` contract (fixing the reference's mixed ``img_size``
    axis conventions, ``nets/rpn.py:47-48`` vs ``nets/classify.py:33-36``).
    """
    h, w = img_size
    x = jnp.clip(boxes[..., 0::2], 0.0, float(w))
    y = jnp.clip(boxes[..., 1::2], 0.0, float(h))
    out = jnp.empty_like(boxes)
    out = out.at[..., 0::2].set(x)
    out = out.at[..., 1::2].set(y)
    return out


def xywh2xyxy(box):
    """``(x, y, w, h) -> (x1, y1, x2, y2)``.

    Accepts a python list (reference ``utils/loc_bbox_iou.py:91-97`` mutates a
    list in place) or an array ``[..., 4]``.
    """
    if isinstance(box, list):
        return [box[0], box[1], box[0] + box[2], box[1] + box[3]]
    box = jnp.asarray(box)
    return jnp.concatenate(
        [box[..., :2], box[..., :2] + box[..., 2:4]], axis=-1
    )
