"""Region Proposal Network head + static-shape proposal generation.

TPU-native equivalent of reference ``nets/rpn.py:17-143``: the two 1x1 convs
become a flax module on the NHWC feature map, and the per-image Python loop
over ``ProposalCreator`` (``nets/rpn.py:129-137``) becomes a ``vmap``-ed pure
function with fixed-size padded outputs (600 train / 300 test proposals plus
a validity mask instead of the reference's duplicated-index padding).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from two_stage_object_detection_tpu.ops.geometry import clip_boxes, loc2bbox
from two_stage_object_detection_tpu.ops.nms import NEG_INF, nms_padded


class RPNHead(nn.Module):
    """1x1 loc/score convs (reference ``nets/rpn.py:86-89,107-118``).

    Input ``[B, H, W, C]`` feature map; outputs
    ``rpn_locs [B, H*W*A, 4]`` and ``rpn_scores [B, H*W*A, 2]`` in the same
    anchor order as :func:`...ops.anchors.enumerate_shifted_anchor`
    (row-major grid, anchors innermost).
    """

    n_anchors: int = 9
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray):
        b, h, w, _ = feats.shape
        # a shared 3x3 conv is standard Faster R-CNN; the reference goes
        # straight to 1x1 heads (nets/rpn.py:86-89) — keep that contract
        locs = nn.Conv(self.n_anchors * 4, (1, 1), dtype=self.dtype,
                       name="loc")(feats)
        scores = nn.Conv(self.n_anchors * 2, (1, 1), dtype=self.dtype,
                         name="score")(feats)
        locs = locs.reshape(b, h * w * self.n_anchors, 4)
        scores = scores.reshape(b, h * w * self.n_anchors, 2)
        return locs.astype(jnp.float32), scores.astype(jnp.float32)


def create_proposals(rpn_locs: jnp.ndarray, rpn_fg_scores: jnp.ndarray,
                     anchors: jnp.ndarray, img_size, *, nms_iou: float,
                     n_pre_nms: int, n_post_nms: int, min_size: float,
                     scale: float = 1.0):
    """Per-image proposal generation (reference ``ProposalCreator.__call__``,
    ``nets/rpn.py:40-69``), fully vectorised and shape-static.

    Args:
      rpn_locs: ``[N, 4]`` predicted deltas for one image.
      rpn_fg_scores: ``[N]`` foreground scores.
      anchors: ``[N, 4]`` anchors.
      img_size: ``(H, W)``.
      n_pre_nms / n_post_nms: top-k before NMS / padded output size.
      min_size: minimum box side (scaled by ``scale``) — too-small boxes are
        masked out by score instead of filtered (static shapes).

    Returns:
      ``(rois [n_post, 4], roi_scores [n_post], roi_valid [n_post])``.

    Batch use: ``jax.vmap(lambda l, s: create_proposals(l, s, anchors, ...))``.
    """
    roi = loc2bbox(anchors, rpn_locs)
    roi = clip_boxes(roi, img_size)

    ms = min_size * scale
    wh = roi[:, 2:4] - roi[:, 0:2]
    big_enough = (wh[:, 0] >= ms) & (wh[:, 1] >= ms)
    scores = jnp.where(big_enough, rpn_fg_scores, NEG_INF)

    n_pre = min(n_pre_nms, roi.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, n_pre)
    top_boxes = roi[top_idx]
    valid = top_scores > NEG_INF / 2

    return nms_padded(top_boxes, top_scores, nms_iou, n_post_nms, valid=valid)
