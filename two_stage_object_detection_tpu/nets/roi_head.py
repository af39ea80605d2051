"""RoI classification / regression head.

Equivalent of reference ``HarNetRoIHead`` (``nets/classify.py:8-56``):
RoI pooling on the shared feature map, global average pool, and two dense
heads.  Differences by design:

* rois arrive per-image ``[B, R, 4]`` and the pooling is ``vmap``-ed — no
  flattened ``(batch_idx, box)`` bookkeeping or hard-coded 128 rois/image
  (fixes SURVEY quirk #4);
* image->feature coordinate mapping uses a uniform ``(H, W)`` contract
  (fixes quirk #2, the ``img_size[0]=channels`` y-scaling bug);
* pooling mode is selectable: exact RoIPool-max parity or bilinear RoIAlign.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from two_stage_object_detection_tpu.ops.roi_pool import (
    roi_align_mm, roi_pool, roi_pool_mean, roi_pool_structured)


class RoIHead(nn.Module):
    """``(feats [B,H,W,C], rois [B,R,4] in image coords) ->
    (roi_cls_locs [B,R,n_class*4], roi_scores [B,R,n_class])``."""

    n_class: int                      # includes background
    roi_size: int = 7
    pool_mode: str = "pool"           # "pool" (reference parity) | "align" | "mean"
    use_pallas: bool = False          # pallas RoI-pool forward kernel
    roi_bwd: str = "xla"              # "xla" | "structured" | "pallas" (see Config)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray, rois: jnp.ndarray, img_size):
        _, fh, fw, _ = feats.shape
        img_h, img_w = img_size
        scale = jnp.array([fw / img_w, fh / img_h, fw / img_w, fh / img_h],
                          jnp.float32)
        rois_feat = rois.astype(jnp.float32) * scale

        # pool in the feature dtype (bf16 by default): the masked-max is
        # bandwidth-bound and max is order-exact in any float format
        if self.pool_mode == "align":
            # matmul-form RoIAlign: fwd and bwd on the MXU (same einsum
            # shape as "mean"; the gather form is 10x slower on TPU)
            pooled = jax.vmap(
                lambda f, r: roi_align_mm(f, r, self.roi_size, 1.0))(feats, rois_feat)
        elif self.pool_mode == "mean":
            # MXU matmul pooling — fastest train path, NOT RoIPool-max parity
            pooled = jax.vmap(
                lambda f, r: roi_pool_mean(f, r, self.roi_size, 1.0))(feats, rois_feat)
        elif self.use_pallas:
            from two_stage_object_detection_tpu.ops.pallas_roi import (
                roi_pool_pallas)
            pooled = jax.vmap(
                lambda f, r: roi_pool_pallas(f, r, self.roi_size, 1.0))(feats, rois_feat)
        elif self.roi_bwd == "pallas":
            # XLA-fused forward + Pallas backward: slower end to end but
            # bounded VMEM where XLA's transposed reduce can materialise the
            # [R,P,H,W,C] broadcast (39 GB seen)
            from two_stage_object_detection_tpu.ops.pallas_roi_bwd import (
                roi_pool_fast)
            pooled = roi_pool_fast(feats, rois_feat, self.roi_size, 1.0,
                                   jax.default_backend() == "cpu")
        elif self.roi_bwd == "structured":
            # identical values + tie semantics, hand-structured VJP that XLA
            # reduce-fuses (32 vs 49 ms at train scale; ops/roi_pool.py)
            pooled = jax.vmap(
                lambda f, r: roi_pool_structured(f, r, self.roi_size, 1.0))(
                    feats, rois_feat)
        else:
            pooled = jax.vmap(
                lambda f, r: roi_pool(f, r, self.roi_size, 1.0))(feats, rois_feat)
        # [B, R, P, P, C]

        # global average pool == reference HarNetClassifier
        # (models/hardnet.py:203-212)
        flat = jnp.mean(pooled, axis=(2, 3)).astype(self.dtype)   # [B, R, C]
        roi_cls_locs = nn.Dense(self.n_class * 4, dtype=self.dtype,
                                name="cls_loc")(flat)
        roi_scores = nn.Dense(self.n_class, dtype=self.dtype,
                              name="score")(flat)
        return roi_cls_locs.astype(jnp.float32), roi_scores.astype(jnp.float32)
