"""FasterRCNN: the end-to-end detector module.

Replaces the reference's ``FasterRCNNTrainer`` (``nets/frcnn_training.py:179-345``,
the only live model graph there) *and* the broken inference-only ``FasterRCNN``
(``nets/frcnn.py:6-59``, uncallable — SURVEY quirk #1) with one flax module
exposing:

* ``__call__``      — full graph on dummy rois (parameter initialisation);
* ``train_forward`` — losses + trainer-parity predictions, whole batch in one
  traced graph (the reference's per-image Python loops at
  ``frcnn_training.py:263,299`` become ``vmap``; the reference's batch-1
  featurisation bug, quirk #3, is fixed — every image in the batch is used);
* ``predict``       — a *true* inference path (no GT inputs): backbone ->
  RPN -> top-300 proposals -> head -> per-class decode + score threshold +
  per-class NMS, what ``nets/frcnn.py:30-40`` intended but could not run.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from two_stage_object_detection_tpu.config import Config
from two_stage_object_detection_tpu.models.registry import build_backbone
from two_stage_object_detection_tpu.nets.losses import (
    fast_rcnn_loc_loss, softmax_cross_entropy_with_ignore)
from two_stage_object_detection_tpu.nets.roi_head import RoIHead
from two_stage_object_detection_tpu.nets.rpn import RPNHead, create_proposals
from two_stage_object_detection_tpu.nets.targets import (
    anchor_target, proposal_target)
from two_stage_object_detection_tpu.ops.anchors import (
    make_anchors, make_fpn_anchors)
from two_stage_object_detection_tpu.ops.geometry import clip_boxes, loc2bbox
from two_stage_object_detection_tpu.ops.nms import nms


class FasterRCNN(nn.Module):
    """Two-stage detector over a stride-16 backbone."""

    cfg: Config

    def setup(self):
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.extractor, self.feat_channels = build_backbone(
            cfg.backbone, dtype, remat=cfg.remat_backbone, pyramid=cfg.fpn)
        if cfg.fpn:
            from two_stage_object_detection_tpu.nets.fpn import (
                FPNNeck, FPNRPNHead, FPNRoIHead)
            self.neck = FPNNeck(channels=cfg.fpn_channels, dtype=dtype)
            self.rpn_head = FPNRPNHead(n_anchors=len(cfg.anchor_ratios),
                                       channels=cfg.fpn_channels, dtype=dtype)
            self.roi_head = FPNRoIHead(
                n_class=cfg.num_classes + 1, roi_size=cfg.roi_size,
                min_level=cfg.fpn_min_level,
                n_pool_levels=cfg.fpn_max_level - cfg.fpn_min_level,
                canonical_level=cfg.fpn_canonical_level,
                canonical_size=cfg.fpn_canonical_size,
                fc_dim=cfg.fpn_fc_dim, window=cfg.fpn_roi_window,
                pallas=cfg.pallas, span_aware=cfg.fpn_span_aware,
                dtype=dtype)
            self.anchors = make_fpn_anchors(cfg)
        else:
            self.rpn_head = RPNHead(n_anchors=cfg.n_anchors_per_cell,
                                    dtype=dtype)
            self.roi_head = RoIHead(n_class=cfg.num_classes + 1,
                                    roi_size=cfg.roi_size,
                                    pool_mode=cfg.roi_pool_mode,
                                    use_pallas=cfg.pallas_roi,
                                    roi_bwd=cfg.roi_bwd, dtype=dtype)
            self.anchors = make_anchors(cfg)    # numpy compile-time constant

    def _features(self, images: jnp.ndarray, train: bool):
        """Backbone (+ FPN neck): the RPN/RoI-head input — a single
        stride-16 map, or the (P2..P6) pyramid when ``cfg.fpn``."""
        taps = self.extractor(images, train)
        return self.neck(taps) if self.cfg.fpn else taps

    # ------------------------------------------------------------------ init
    def __call__(self, images: jnp.ndarray, train: bool = False):
        """Parameter-initialising forward (dummy rois through the head)."""
        feats = self._features(images, train)
        rpn_locs, rpn_scores = self.rpn_head(feats)
        b = images.shape[0]
        rois = jnp.tile(jnp.array([[8.0, 8.0, 64.0, 64.0]], jnp.float32),
                        (b, self.cfg.roi_n_sample, 1))
        roi_cls_locs, roi_scores = self.roi_head(
            feats, rois, images.shape[1:3])
        return rpn_locs, rpn_scores, roi_cls_locs, roi_scores

    def _use_pallas(self) -> bool:
        if self.cfg.pallas == "on":
            return True
        if self.cfg.pallas == "off":
            return False
        return jax.default_backend() != "cpu"

    # ----------------------------------------------------------------- parts
    def _check_anchor_contract(self, n_locs: int):
        """The anchor table is baked from ``cfg.feat_size`` (a compile-time
        constant); feeding an image whose backbone output disagrees would
        otherwise fail with an opaque shape error deep in ``loc2bbox``."""
        n_anchors = self.anchors.shape[0]
        assert n_locs == n_anchors, (
            f"image size mismatch: the RPN produced {n_locs} anchor slots but "
            f"the anchor table built from cfg.input_size={self.cfg.input_size} "
            f"(feat_size={self.cfg.feat_size}) has {n_anchors}; pass images of "
            f"cfg.input_size or construct the model with a matching Config")

    def _proposals(self, rpn_locs, rpn_scores, img_size, train: bool,
                   scale: float = 1.0):
        cfg = self.cfg
        self._check_anchor_contract(rpn_locs.shape[1])
        fg = jax.nn.softmax(rpn_scores, axis=-1)[..., 1]
        anchors = jnp.asarray(self.anchors)
        n_post = cfg.n_train_post_nms if train else cfg.n_test_post_nms
        if self._use_pallas():
            from two_stage_object_detection_tpu.ops.pallas_proposals import (
                fused_proposals_batched)
            return fused_proposals_batched(
                rpn_locs, fg, anchors, tuple(img_size),
                nms_iou=cfg.rpn_nms_iou, n_post_nms=n_post,
                min_size=cfg.proposal_min_size * scale,
                n_pre_nms=cfg.n_train_pre_nms if train else cfg.n_test_pre_nms,
                # pallas="on" with a CPU backend runs the kernel interpreted
                interpret=jax.default_backend() == "cpu")
        fn = functools.partial(
            create_proposals,
            anchors=anchors, img_size=img_size, nms_iou=cfg.rpn_nms_iou,
            n_pre_nms=cfg.n_train_pre_nms if train else cfg.n_test_pre_nms,
            n_post_nms=n_post, min_size=cfg.proposal_min_size, scale=scale)
        return jax.vmap(fn)(rpn_locs, fg)

    # ----------------------------------------------------------------- train
    def train_forward(self, images: jnp.ndarray, gt_boxes: jnp.ndarray,
                      gt_labels: jnp.ndarray, gt_valid: jnp.ndarray,
                      scale: float = 1.0, train: bool = True) -> Dict[str, Any]:
        """Losses + predictions for one (padded) batch.

        Args:
          images: ``[B, H, W, 3]`` float32 in [0, 1].
          gt_boxes: ``[B, G, 4]`` xyxy, zero-padded; ``gt_valid``: ``[B, G]``.
          gt_labels: ``[B, G]`` int32, 0-based foreground classes.
          train: True for training (batch-stat BN, 12000/600 proposals);
            False for evaluation through the same graph (running-average BN,
            3000/300 proposals, no state mutation).

        Returns a dict with the reference trainer's output surface
        (``frcnn_training.py:334-342``): the four component losses + total,
        per-sample predicted boxes/classes/scores, and the (shifted) GT.
        """
        cfg = self.cfg
        img_size = images.shape[1:3]
        # freeze_bn keeps running statistics fixed while still training
        # weights (reference FasterRCNN.freeze_bn, nets/frcnn.py:56-59)
        feats = self._features(images, train=train and not cfg.freeze_bn)
        rpn_locs, rpn_scores = self.rpn_head(feats)
        # proposals are non-differentiable samples (and the Pallas kernel has
        # no AD rule): cut the gradient at its inputs — RPN weights learn
        # through the explicit RPN losses below, as in standard Faster R-CNN
        rois, _, roi_valid = self._proposals(
            jax.lax.stop_gradient(rpn_locs),
            jax.lax.stop_gradient(rpn_scores),
            img_size, train=train, scale=scale)

        # ---- RPN targets + losses (vmapped over the batch) ----
        anchors = jnp.asarray(self.anchors)
        if self.has_rng("sampling"):
            b = images.shape[0]
            at_keys = jax.random.split(self.make_rng("sampling"), b)
            pt_keys = jax.random.split(self.make_rng("sampling"), b)
        else:
            at_keys = pt_keys = None

        at_fn = functools.partial(
            anchor_target, n_sample=cfg.rpn_n_sample,
            pos_iou_thresh=cfg.rpn_pos_iou_thresh,
            neg_iou_thresh=cfg.rpn_neg_iou_thresh, pos_ratio=cfg.rpn_pos_ratio)
        if at_keys is None:
            gt_rpn_loc, gt_rpn_label = jax.vmap(
                lambda b_, v: at_fn(anchors, b_, v))(gt_boxes, gt_valid)
        else:
            gt_rpn_loc, gt_rpn_label = jax.vmap(
                lambda b_, v, k: at_fn(anchors, b_, v, key=k))(
                    gt_boxes, gt_valid, at_keys)

        rpn_loc_loss = jnp.mean(jax.vmap(
            lambda p, g, l: fast_rcnn_loc_loss(p, g, l, cfg.rpn_sigma))(
                rpn_locs, gt_rpn_loc, gt_rpn_label))
        rpn_cls_loss = jnp.mean(jax.vmap(softmax_cross_entropy_with_ignore)(
            rpn_scores, gt_rpn_label))

        # ---- RoI targets ----
        pt_fn = functools.partial(
            proposal_target, n_sample=cfg.roi_n_sample,
            pos_ratio=cfg.roi_pos_ratio, pos_iou_thresh=cfg.roi_pos_iou_thresh,
            neg_iou_thresh_high=cfg.roi_neg_iou_thresh_high,
            neg_iou_thresh_low=cfg.roi_neg_iou_thresh_low,
            loc_std=cfg.loc_normalize_std if cfg.loc_normalize else None)
        if pt_keys is None:
            sample_roi, gt_roi_loc, gt_roi_label, sample_valid = jax.vmap(pt_fn)(
                rois, roi_valid, gt_boxes, gt_valid, gt_labels)
        else:
            sample_roi, gt_roi_loc, gt_roi_label, sample_valid = jax.vmap(
                lambda r, rv, b_, v, l, k: pt_fn(r, rv, b_, v, l, key=k))(
                    rois, roi_valid, gt_boxes, gt_valid, gt_labels, pt_keys)

        # ---- head ----
        if cfg.fpn:
            # use_window=False routes to the HYBRID path (roi_pool.py:
            # multilevel_roi_align_hybrid): windowed atlas forward, dense
            # MXU-matmul VJP via custom_vjp — the windowed autodiff backward
            # is a scatter-add measured 19 ms/step slower at R=128.
            # Config.fpn_roi_window=0 is the exact-dense escape hatch.
            roi_cls_locs, roi_scores = self.roi_head(
                feats, sample_roi, img_size, use_window=False)
        else:
            roi_cls_locs, roi_scores = self.roi_head(
                feats, sample_roi, img_size)
        s = cfg.roi_n_sample
        locs4 = roi_cls_locs.reshape(roi_cls_locs.shape[0], s, -1, 4)
        # gather the GT class's regression (frcnn_training.py:311-318)
        roi_loc = jnp.take_along_axis(
            locs4, gt_roi_label[..., None, None].astype(jnp.int32), axis=2
        )[:, :, 0, :]                                       # [B, S, 4]

        # ignore invalid (padding) samples in the CE
        ce_labels = jnp.where(sample_valid, gt_roi_label, -1)
        roi_loc_loss = jnp.mean(jax.vmap(
            lambda p, g, l: fast_rcnn_loc_loss(p, g, l, cfg.roi_sigma))(
                roi_loc, gt_roi_loc, jnp.where(sample_valid, gt_roi_label, 0)))
        roi_cls_loss = jnp.mean(jax.vmap(softmax_cross_entropy_with_ignore)(
            roi_scores, ce_labels))

        total = rpn_loc_loss + rpn_cls_loss + roi_loc_loss + roi_cls_loss

        # trainer-parity predictions (un-normalize before decode when the
        # head was trained against normalized targets)
        dec_loc = roi_loc
        if cfg.loc_normalize:
            dec_loc = dec_loc * jnp.asarray(cfg.loc_normalize_std, dec_loc.dtype)
        boxes_pred = loc2bbox(sample_roi, dec_loc)          # [B, S, 4]
        probs = jax.nn.softmax(roi_scores, axis=-1)
        classes_score_pred = jnp.max(probs, axis=-1)
        classes_pred = jnp.argmax(probs, axis=-1)

        return {
            "losses": {
                "rpn_loc": rpn_loc_loss,
                "rpn_cls": rpn_cls_loss,
                "roi_loc": roi_loc_loss,
                "roi_cls": roi_cls_loss,
                "total": total,
            },
            "boxes_pred": boxes_pred,
            "classes_pred": classes_pred,
            "classes_score_pred": classes_score_pred,
            "pred_valid": sample_valid,
            "gt_boxes": gt_boxes,
            "gt_labels": gt_labels + 1,                     # bg=0 contract
            "gt_valid": gt_valid,
        }

    # --------------------------------------------------------------- predict
    def predict(self, images: jnp.ndarray, scale: float = 1.0):
        """True inference: ``[B,H,W,3] -> (boxes, scores, labels, valid)``.

        Per-class decode of the head's regression, score thresholding, and
        per-class NMS, with all shapes static: ``[B, max_detections, ...]``.
        """
        cfg = self.cfg
        img_size = images.shape[1:3]
        feats = self._features(images, train=False)
        rpn_locs, rpn_scores = self.rpn_head(feats)
        rois, _, roi_valid = self._proposals(rpn_locs, rpn_scores, img_size,
                                             train=False, scale=scale)
        roi_cls_locs, roi_scores = self.roi_head(feats, rois, img_size)

        n_class = cfg.num_classes + 1
        r = rois.shape[1]
        if cfg.loc_normalize:
            # per-class strided layout [R, C*4]: tile the stds across classes
            std = jnp.tile(jnp.asarray(cfg.loc_normalize_std,
                                       roi_cls_locs.dtype), n_class)
            roi_cls_locs = roi_cls_locs * std
        probs = jax.nn.softmax(roi_scores, axis=-1)         # [B, R, C]
        n_cand = min(4 * cfg.max_detections, r * (n_class - 1))

        def per_image(rois_i, valid_i, locs_i, probs_i):
            # decode all classes at once via the strided-layout loc2bbox,
            # then class-aware NMS in ONE pass: take the top-k scoring
            # (box, class) candidates and offset each box by its class so
            # different classes can never suppress each other
            boxes = loc2bbox(rois_i, locs_i)                # [R, C*4]
            boxes = clip_boxes(boxes, img_size)
            boxes = boxes.reshape(r, n_class, 4)[:, 1:, :]  # drop background
            fg = probs_i[:, 1:]                             # [R, C-1]

            ok = valid_i[:, None] & (fg >= cfg.score_thresh)
            flat_scores = jnp.where(ok, fg, -1.0).reshape(-1)
            cand_scores, cand = jax.lax.top_k(flat_scores, n_cand)
            cand_boxes = boxes.reshape(-1, 4)[cand]
            cand_labels = cand % (n_class - 1) + 1          # 1-based classes
            cand_valid = cand_scores > 0

            span = float(max(img_size)) + 2.0
            offset = cand_labels.astype(jnp.float32) * span
            idx, keep = nms(cand_boxes + offset[:, None], cand_scores,
                            cfg.predict_nms_iou, cfg.max_detections,
                            valid=cand_valid)
            kf = keep.astype(jnp.float32)
            return (cand_boxes[idx] * kf[:, None], cand_scores[idx] * kf,
                    cand_labels[idx] * keep, keep)

        return jax.vmap(per_image)(rois, roi_valid, roi_cls_locs, probs)
