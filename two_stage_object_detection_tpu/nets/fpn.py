"""Feature Pyramid Network neck + FPN-specific RPN / RoI heads.

A capability the reference does not have (its single live graph runs one
stride-16 map through one RPN, ``nets/rpn.py:72-143``): the standard FPN
extension of Faster R-CNN (Lin et al., CVPR 2017), built TPU-first —

* every level's feature map is a **static shape** derived from
  ``cfg.input_size`` by ceil-halving, so the whole pyramid is one traced
  graph (no dynamic level counts);
* the top-down 2x upsample is ``jnp.repeat`` + crop (pure data movement XLA
  fuses into the add), not a gather-based generic resize;
* the RPN head is **shared across levels** (one parameter set applied to
  P2..P6), matching the paper and keeping the parameter tree independent of
  the number of levels;
* multi-level RoI pooling keeps static shapes by pooling every roi from
  every level with the MXU matmul-form RoIAlign (``ops/roi_pool.py:
  roi_align_mm``) and blending with a one-hot level-assignment mask — a
  4x-redundant compute trade that avoids dynamic partitioning entirely
  (the per-level pooled tensors are tiny next to the backbone).

Used when ``Config.fpn=True`` (see ``nets/detector.py``).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from two_stage_object_detection_tpu.ops.roi_pool import (
    multilevel_roi_align, multilevel_roi_align_hybrid_batched, roi_align_mm)

Dtype = Any


def _upsample2x_to(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Nearest 2x upsample of ``[B, h', w', C]`` cropped to ``(h, w)``.

    Pyramid sizes come from ceil-halving (75 -> 38), so the doubled map can
    be one row/column larger than the target; cropping matches the SAME-pad
    convolution geometry that produced the finer level.
    """
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return x[:, :h, :w, :]


class FPNNeck(nn.Module):
    """Lateral 1x1 + top-down pathway + 3x3 smoothing -> uniform channels.

    Input ``(C2, C3, C4, C5)`` at strides 4/8/16/32; output
    ``(P2, P3, P4, P5, P6)`` all with ``channels`` features, P6 a stride-2
    max pool of P5 (RPN-only level, per the FPN paper).
    """

    channels: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, taps: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        laterals = [
            nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                    name=f"lateral{i}")(c)
            for i, c in enumerate(taps)
        ]
        # top-down: coarsest first
        outs = [laterals[-1]]
        for lat in laterals[-2::-1]:
            up = _upsample2x_to(outs[0], lat.shape[1], lat.shape[2])
            outs.insert(0, lat + up)
        ps = [
            nn.Conv(self.channels, (3, 3), padding=[(1, 1)] * 2,
                    dtype=self.dtype, name=f"smooth{i}")(o)
            for i, o in enumerate(outs)
        ]
        p6 = nn.max_pool(ps[-1], (1, 1), strides=(2, 2))
        return (*ps, p6)


class FPNRPNHead(nn.Module):
    """Shared RPN head applied to every pyramid level.

    3x3 conv + ReLU + 1x1 loc/score heads (the FPN paper's head; the
    reference's bare 1x1 heads, ``nets/rpn.py:86-89``, stay the contract for
    the non-FPN path).  Returns ``rpn_locs [B, N, 4]`` / ``rpn_scores
    [B, N, 2]`` concatenated over levels in pyramid order — the same order
    as :func:`...ops.anchors.make_fpn_anchors`.
    """

    n_anchors: int = 3
    channels: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pyramid: Sequence[jnp.ndarray]):
        conv = nn.Conv(self.channels, (3, 3), padding=[(1, 1)] * 2,
                       dtype=self.dtype, name="conv")
        loc = nn.Conv(self.n_anchors * 4, (1, 1), dtype=self.dtype, name="loc")
        score = nn.Conv(self.n_anchors * 2, (1, 1), dtype=self.dtype,
                        name="score")
        locs, scores = [], []
        for p in pyramid:                       # same modules => shared params
            b, h, w, _ = p.shape
            t = nn.relu(conv(p))
            locs.append(loc(t).reshape(b, h * w * self.n_anchors, 4))
            scores.append(score(t).reshape(b, h * w * self.n_anchors, 2))
        return (jnp.concatenate(locs, axis=1).astype(jnp.float32),
                jnp.concatenate(scores, axis=1).astype(jnp.float32))


def fpn_level_assign(rois: jnp.ndarray, min_level: int, max_level: int,
                     canonical_level: int = 4,
                     canonical_size: float = 224.0) -> jnp.ndarray:
    """Per-roi pooling level: ``k = floor(k0 + log2(sqrt(area)/s0))``.

    The FPN paper's assignment (eq. 1): a canonical-size roi pools from the
    canonical level, each halving of scale drops one level.  Clipped to the
    available pooling range.  ``rois [R, 4]`` xyxy -> ``[R]`` int32 levels.
    """
    w = jnp.maximum(rois[:, 2] - rois[:, 0], 1e-6)
    h = jnp.maximum(rois[:, 3] - rois[:, 1], 1e-6)
    k = jnp.floor(canonical_level + jnp.log2(jnp.sqrt(w * h) / canonical_size))
    return jnp.clip(k, min_level, max_level).astype(jnp.int32)


def span_aware_levels(rois: jnp.ndarray, levels: jnp.ndarray, scales,
                      fit_cells: float) -> jnp.ndarray:
    """Bump rois whose span overflows the pooling window to a coarser level.

    The eq.-1 assignment bounds a roi's SQRT-AREA at its level to 7-28
    cells, but the long side is ``sqrt(area) * sqrt(aspect)`` — boxes near
    the top of their level's size band overflow a 32-cell window at aspect
    > ~1.2 (measured on the real fixture: 37% of test-time proposals,
    scripts/ablate_real_fixture.py round 5).  Windowed pooling would
    edge-clamp those rois (crop the pooled region); pooling one level
    coarser instead keeps the FULL roi in view at halved resolution — the
    same trade eq. 1 itself makes, applied to the long side.

    Args:
      rois: ``[R, 4]`` xyxy image coords.
      levels: ``[R]`` eq.-1 levels, already offset to index ``scales``.
      scales: per-RoI-level image->feature ``(sy, sx)`` pairs or scalars.
      fit_cells: max span (in cells at the pooled level) the window covers
        exactly (``window - 2``).

    Returns adjusted ``[R]`` int32 levels (>= input, <= last level).  A roi
    that overflows even the coarsest level keeps it (residual edge-clamp —
    impossible for images <= ``fit_cells * stride_max`` px).
    """
    sc = jnp.asarray(scales, jnp.float32)
    if sc.ndim == 1:
        sc = jnp.stack([sc, sc], axis=-1)                  # [L, 2] (sy, sx)
    n_levels = sc.shape[0]
    w = rois[:, 2] - rois[:, 0]
    h = rois[:, 3] - rois[:, 1]
    span = jnp.maximum(h[:, None] * sc[None, :, 0],
                       w[:, None] * sc[None, :, 1])        # [R, L]
    lvl_idx = jnp.arange(n_levels)[None, :]
    ok = (span <= fit_cells) & (lvl_idx >= levels[:, None])
    first_fit = jnp.min(jnp.where(ok, lvl_idx, n_levels), axis=-1)
    return jnp.where(first_fit < n_levels, first_fit,
                     n_levels - 1).astype(jnp.int32)


class FPNRoIHead(nn.Module):
    """Multi-level RoIAlign + 2-FC head (FPN-standard box head).

    ``(pyramid (P_min..), rois [B, R, 4] image coords, img_size) ->
    (roi_cls_locs [B, R, n_class*4], roi_scores [B, R, n_class])``.

    Pools every roi from every RoI level (P2..P5) with the matmul RoIAlign
    and blends by the one-hot level assignment — static shapes, MXU-only.
    The flatten -> fc1 -> fc2 head replaces the non-FPN path's global
    average pool (reference ``HarNetClassifier``): with 256-channel pooled
    features the spatial layout carries the signal, and a 12544x1024 dense
    is exactly what the MXU wants.
    """

    n_class: int
    roi_size: int = 7
    min_level: int = 2
    n_pool_levels: int = 4            # P2..P5 pool; P6 is RPN-only
    canonical_level: int = 4
    canonical_size: float = 224.0
    fc_dim: int = 1024
    window: int = 32                  # 0 = dense 4-level pooling
    pallas: str = "auto"              # windowed-align kernel: auto|on|off
    span_aware: bool = True           # bump window-overflowing rois coarser
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pyramid: Sequence[jnp.ndarray], rois: jnp.ndarray,
                 img_size, use_window: bool = True):
        img_h, img_w = img_size
        max_level = self.min_level + self.n_pool_levels - 1
        levels = jax.vmap(lambda r: fpn_level_assign(
            r, self.min_level, max_level, self.canonical_level,
            self.canonical_size))(rois)                       # [B, R]

        if self.window:
            # windowed single-level pooling: each roi reads one static
            # [window, window, C] slice of its assigned level — measured
            # 26.7 vs 46.6 ms at fpn_infer scale vs the dense blend
            # (scripts/ablate_fpn_roihead.py).  The no-grad predict
            # path (use_window=True) differentiates nothing; the train path
            # uses the hybrid form — same windowed forward, but the DENSE
            # matmul backward (the windowed autodiff backward is a
            # scatter-add measured 19 ms/step slower at train scale).
            scales = tuple(
                (pyramid[li].shape[1] / img_h, pyramid[li].shape[2] / img_w)
                for li in range(self.n_pool_levels))  # same as dense fw/img_w
            if self.span_aware:
                # keep every roi FULLY inside its window: overflowing rois
                # (37% of real test-time proposals at eq.-1 levels) pool one
                # level coarser instead of edge-clamping — applied in train
                # AND predict so the head sees consistent features
                levels = self.min_level + jax.vmap(
                    lambda r_i, l_i: span_aware_levels(
                        r_i, l_i - self.min_level, scales,
                        float(self.window - 2)))(rois, levels)
            c_feat = pyramid[0].shape[-1]
            # Pallas window-DMA kernel (ops/pallas_windowed_align.py):
            # measured 29.8 -> 12.1 ms at fpn-infer scale (v5e, b16 R300
            # C256).  Serves predict directly and the hybrid TRAIN forward
            # (forward-only is fine under the custom_vjp).  C must fill
            # the 128-lane tile; CPU backends run the XLA form (backend
            # gate matches detector._use_pallas — the axon plugin reports
            # its own platform name for the TPU).
            kernel_ok = (c_feat % 128 == 0 and self.pallas != "off"
                         and (self.pallas == "on"
                              or jax.default_backend() != "cpu"))
            if use_window:
                if kernel_ok:
                    from two_stage_object_detection_tpu.ops. \
                        pallas_windowed_align import windowed_roi_align_batched
                    pooled = windowed_roi_align_batched(
                        tuple(pyramid[:self.n_pool_levels]), rois,
                        levels - self.min_level, scales, self.roi_size, 2,
                        self.window, False,
                        # pallas="on" under a CPU backend: interpreted (tests)
                        interpret=jax.default_backend() == "cpu")
                else:
                    pooled = jax.vmap(
                        lambda pyr_i, rois_i, lv_i: multilevel_roi_align(
                            pyr_i, rois_i, lv_i - self.min_level, scales,
                            self.roi_size, 2, self.window, False)
                    )(tuple(pyramid[:self.n_pool_levels]), rois, levels)
            else:
                # train path: hybrid (windowed forward — the Pallas kernel
                # when eligible, forward-only is fine under a custom_vjp —
                # with the dense matmul backward)
                pooled = multilevel_roi_align_hybrid_batched(
                    tuple(pyramid[:self.n_pool_levels]), rois,
                    levels - self.min_level, scales, self.roi_size, 2,
                    self.window, False, kernel_ok)
        else:
            onehot = jax.nn.one_hot(
                levels - self.min_level, self.n_pool_levels,
                dtype=jnp.float32)                            # [B, R, L]
            pooled = None
            for li in range(self.n_pool_levels):
                feats = pyramid[li]
                _, fh, fw, _ = feats.shape
                scale = jnp.array([fw / img_w, fh / img_h] * 2, jnp.float32)
                p = jax.vmap(lambda f, r: roi_align_mm(
                    f, r, self.roi_size, 1.0))(feats, rois * scale)
                w = onehot[:, :, li][..., None, None, None].astype(p.dtype)
                pooled = p * w if pooled is None else pooled + p * w

        flat = pooled.reshape(*pooled.shape[:2], -1).astype(self.dtype)
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc1")(flat))
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc2")(x))
        roi_cls_locs = nn.Dense(self.n_class * 4, dtype=self.dtype,
                                name="cls_loc")(x)
        roi_scores = nn.Dense(self.n_class, dtype=self.dtype, name="score")(x)
        return roi_cls_locs.astype(jnp.float32), roi_scores.astype(jnp.float32)
