"""Evaluation loop: device forward + host-side metric aggregation.

Equivalent of reference ``FasterRCNNTrainer.eval_fn``
(``nets/frcnn_training.py:347-370``): iterate the eval loader through the
training graph (losses + per-sample predictions), apply per-class NMS to the
predictions, and accumulate mAP — with the metric math corrected
(:mod:`.metrics`).  A second mode evaluates the *true* inference path
(``predict``) instead, which the reference cannot do (its inference requires
GT inputs, ``multi_inference.py:78``).
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional, Sequence

import jax
import numpy as np

from two_stage_object_detection_tpu.config import Config
from two_stage_object_detection_tpu.eval.metrics import compute_map
from two_stage_object_detection_tpu.nets.trainer import (
    TrainState, eval_step, predict_step)
from two_stage_object_detection_tpu.parallel.multiprocess import fetch_global


def _per_class_nms_host(boxes, scores, labels, num_classes, iou_threshold):
    """Per-class greedy NMS on host numpy (small arrays post-forward).

    Vectorised: boxes are class-offset (cross-class IoU becomes exactly 0,
    the same trick the device predict path uses, ``nets/detector.py``), the
    full IoU matrix is computed once, and greedy suppression walks the
    score order masking whole rows — identical keeps to the per-class
    pop-loop formulation but ~40x less Python.  128 images x 128 rois of
    trainer-graph eval spent ~1.1 s here per sweep before this."""
    n = len(boxes)
    if n == 0:
        return np.zeros((0,), np.int64)
    # class offset: bands are sized from the ACTUAL coordinate range, not a
    # fixed 1e4 — train-graph eval boxes come from loc2bbox without
    # clip_boxes, so an early-training divergent decode (w*exp(dw)) can
    # exceed any fixed band and leak cross-class IoU (the device predict
    # path applies the same trick only after clip_boxes, so it can use a
    # fixed span)
    bb = boxes.astype(np.float64)
    lo = float(bb.min())
    span = max(1e4, float(bb.max()) - lo + 1.0)
    b = (bb - lo) + labels[:, None].astype(np.float64) * span
    order = np.argsort(-scores, kind="stable")
    b = b[order]
    tl = np.maximum(b[:, None, :2], b[None, :, :2])
    br = np.minimum(b[:, None, 2:], b[None, :, 2:])
    wh = np.clip(br - tl, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    iou = inter / (area[:, None] + area[None, :] - inter + 1e-8)
    # background (label 0) never participates: the per-class loop started
    # at class 1 (call sites pre-filter, but keep the contract here too)
    alive = labels[order] >= 1
    keep = []
    for i in range(n):
        if alive[i]:
            keep.append(order[i])
            alive &= iou[i] <= iou_threshold
    return np.asarray(sorted(keep), np.int64)


def _append_sample(preds, gts, boxes, scores, labels, valid,
                   gt_boxes, gt_labels, gt_valid, cfg: Config,
                   use_predict: bool, nms_iou_threshold: float):
    """Host post-processing for ONE image: validity filter, (train-graph
    mode) background drop + per-class NMS, GT unpadding."""
    v = np.asarray(valid)
    b = np.asarray(boxes)[v]
    s = np.asarray(scores)[v]
    l = np.asarray(labels)[v]
    if not use_predict:
        # drop background argmaxes, then per-class NMS
        # (reference frcnn_training.py:450-456)
        fg = l > 0
        b, s, l = b[fg], s[fg], l[fg]
        if len(b):
            keep = _per_class_nms_host(b, s, l, cfg.num_classes,
                                       nms_iou_threshold)
            b, s, l = b[keep], s[keep], l[keep]
    preds.append((b, s, l))
    gv = np.asarray(gt_valid)
    gts.append((np.asarray(gt_boxes)[gv], np.asarray(gt_labels)[gv] + 1))


def collect_predictions(state: TrainState, loader: Iterable, cfg: Config,
                        nms_iou_threshold: float = 0.7,
                        use_predict: bool = False,
                        max_batches: Optional[int] = None):
    """One device pass over the loader -> ``(preds, gts, avg_loss)``.

    Predictions do not depend on the mAP IoU threshold, so a threshold sweep
    only needs this once (the reference re-runs the full forward per
    threshold, ``train/train.py:97-103`` — 10x the device cost for identical
    predictions).

    ``use_predict=False`` mirrors the reference (train-graph forward with GT
    inputs, per-class NMS on the sampled-roi predictions); ``True`` evaluates
    the true inference path.

    An HBM-resident ``DeviceDatasetCache`` loader takes the fused path:
    the whole eval forward runs as ONE dispatch
    (``nets.trainer.eval_scan_resident``) and predictions cross the wire
    once, instead of a ~60 ms dispatch+sync per batch on a tunneled
    runtime.
    """
    preds, gts = [], []
    loss_total, n_batches = 0.0, 0

    from two_stage_object_detection_tpu.data.device_cache import (
        DeviceDatasetCache)
    if (isinstance(loader, DeviceDatasetCache)
            and loader.data_sharding is None and max_batches is None):
        import jax.numpy as jnp

        from two_stage_object_detection_tpu.nets.trainer import (
            eval_scan_resident)
        idx = loader.all_indices()
        outs = jax.device_get(eval_scan_resident(
            state, loader.data, jnp.asarray(idx), use_predict=use_predict))
        nb, bsz = idx.shape
        for bi in range(nb):
            for i in range(bsz):
                _append_sample(
                    preds, gts, outs["boxes_pred"][bi][i],
                    outs["classes_score_pred"][bi][i],
                    outs["classes_pred"][bi][i], outs["pred_valid"][bi][i],
                    outs["gt_boxes"][bi][i], outs["gt_labels"][bi][i],
                    outs["gt_valid"][bi][i], cfg, use_predict,
                    nms_iou_threshold)
        avg_loss = (float(np.mean(outs["loss_total"]))
                    if not use_predict else 0.0)
        return preds, gts, avg_loss
    for bi, batch in enumerate(loader):
        if max_batches is not None and bi >= max_batches:
            break
        # fetch_global (= device_get single-process): on a multi-controller
        # run the predictions are sharded over other processes' chips, so
        # they are all-gathered — every process scores the SAME full eval
        # set and the best-checkpoint decision stays bitwise identical
        if use_predict:
            boxes, scores, labels, valid = fetch_global(
                predict_step(state, batch["image"]))
            out_losses = None
        else:
            out = eval_step(state, batch, jax.random.PRNGKey(bi))
            out = fetch_global(out)
            loss_total += float(out["losses"]["total"])
            boxes = out["boxes_pred"]
            scores = out["classes_score_pred"]
            labels = out["classes_pred"]
            valid = out["pred_valid"]
        n_batches += 1

        gt_boxes, gt_labels, gt_valid = fetch_global(
            (batch["boxes"], batch["labels"], batch["valid"]))

        for i in range(boxes.shape[0]):
            _append_sample(preds, gts, boxes[i], scores[i], labels[i],
                           valid[i], gt_boxes[i], gt_labels[i], gt_valid[i],
                           cfg, use_predict, nms_iou_threshold)

    avg_loss = loss_total / max(n_batches, 1)
    return preds, gts, avg_loss


def evaluate(state: TrainState, loader: Iterable, cfg: Config,
             map_iou_threshold: float = 0.5, nms_iou_threshold: float = 0.7,
             use_predict: bool = False, max_batches: Optional[int] = None):
    """Run one eval pass -> ``(avg_loss, mAP, metrics_dict)``.

    Equivalent of reference ``eval_fn`` (``nets/frcnn_training.py:347-370``).
    """
    preds, gts, avg_loss = collect_predictions(
        state, loader, cfg, nms_iou_threshold=nms_iou_threshold,
        use_predict=use_predict, max_batches=max_batches)
    metrics = compute_map(preds, gts, cfg.num_classes,
                          iou_threshold=map_iou_threshold)
    return avg_loss, metrics["mAP"], metrics


def evaluate_sweep(state: TrainState, loader_fn, cfg: Config,
                   thresholds: Sequence[float] = tuple(np.arange(0.5, 1.0, 0.05)),
                   coco_summary: bool = False, **kw) -> Dict[str, float]:
    """mAP@{.5, .95, .5:.95} sweep (reference ``train/train.py:97-117``).

    Forward-once: the device pass runs a single time and the matching is
    repeated per IoU threshold on host (the reference re-forwards the whole
    eval set per threshold — 10 device passes for the same predictions).

    ``loader_fn``: zero-arg callable returning a fresh eval iterator.
    ``coco_summary``: additionally attach the COCO-style axes (area-binned
    AP, AR@maxDets — :func:`..metrics.compute_coco_summary`) under
    ``"coco"``, computed from the same cached predictions.
    """
    preds, gts, eval_loss = collect_predictions(state, loader_fn(), cfg, **kw)
    from two_stage_object_detection_tpu.eval.metrics import compute_map_sweep
    maps = compute_map_sweep(preds, gts, cfg.num_classes, thresholds)
    total, m50, m95 = 0.0, 0.0, 0.0
    for t, m in maps.items():
        total += m
        if abs(t - 0.5) < 1e-6:
            m50 = m
        if abs(t - 0.95) < 1e-6:
            m95 = m
    n = len(maps)
    out = {"mAP50": m50, "mAP95": m95, "mAP50_95": total / n,
           "eval_loss": eval_loss}
    if coco_summary:
        from two_stage_object_detection_tpu.eval.metrics import (
            compute_coco_summary)
        out["coco"] = compute_coco_summary(preds, gts, cfg.num_classes)
    return out
