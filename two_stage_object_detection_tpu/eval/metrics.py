"""Detection metrics: PR curves, AP, mAP (host-side numpy).

Correct re-implementation of the reference's evaluation intent.  The
reference's mAP path is broken as shipped (``frcnn_training.py:543`` loops
``range(1, n+1, -1)`` — never iterates; line 554 calls ``compute_ap`` with
two args against a one-arg signature; matching double-counts because a GT box
may match any number of predictions).  Here:

* :func:`filter_pr` / :func:`compute_ap` keep the reference utility API
  (``utils/utils.py:18-39``): precision-at-recall-level table, right-to-left
  monotonisation, rectangle integration;
* :func:`compute_map` does standard greedy matching — predictions sorted by
  score, each GT matched at most once — with per-class AP and mean over
  classes that have ground truth.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(br - tl, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / (area_a[:, None] + area_b[None, :] - inter + 1e-8)


def filter_pr(x: np.ndarray, n_gt: int) -> np.ndarray:
    """Best precision at each recall level ``n_gt/n_gt .. 0/n_gt``.

    ``x``: ``[n, 2]`` rows of ``(precision, recall)``.  Returns
    ``[n_gt+1, 2]`` of ``(precision, recall)`` (reference
    ``utils/utils.py:18-23``).
    """
    if x.size == 0:
        return np.zeros((n_gt + 1, 2), np.float32)
    recalls = np.arange(n_gt, -1, -1, dtype=np.float32) / n_gt
    precisions = []
    for r in recalls:
        sel = x[:, 1] >= r - 1e-6
        precisions.append(float(x[sel, 0].max()) if sel.any() else 0.0)
    return np.stack([np.asarray(precisions, np.float32), recalls], axis=1)


def compute_ap(pr: np.ndarray) -> float:
    """Rectangle-integrate a PR table ordered by *descending* recall.

    Interpolated precision at recall ``r`` is ``max`` over points with
    recall >= ``r`` — rows 0..i for row i — i.e. a prefix max.  (The
    reference's ``compute_ap`` instead propagates the max from the *low*
    recall end, ``utils/utils.py:30-33``, which assigns the easy low-recall
    precision to recall levels the detector never reached and inflates AP —
    one of the metric defects fixed here.)  Each recall segment
    ``[r[i+1], r[i]]`` contributes its high-recall-end precision.
    """
    if len(pr) == 0:
        return 0.0
    prec = np.maximum.accumulate(pr[:, 0].astype(np.float64))
    rec = pr[:, 1]
    ap = 0.0
    for i in range(len(prec) - 1):
        ap += (rec[i] - rec[i + 1]) * prec[i]
    return float(ap)


def _ap_from_matches(scores: np.ndarray, is_tp: np.ndarray, n_gt: int) -> float:
    """AP from per-prediction (score, tp) pairs via the PR-table utilities."""
    if n_gt == 0:
        return 0.0
    order = np.argsort(-scores, kind="stable")
    tp = np.cumsum(is_tp[order])
    fp = np.cumsum(~is_tp[order])
    precision = tp / np.maximum(tp + fp, 1)
    recall = tp / n_gt
    pr = np.stack([precision, recall], axis=1).astype(np.float32)
    return compute_ap(filter_pr(pr, n_gt))


def compute_map(
    predictions: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray]],
    ground_truths: Sequence[Tuple[np.ndarray, np.ndarray]],
    num_classes: int,
    iou_threshold: float = 0.5,
) -> Dict:
    """mAP over foreground classes (labels 1..num_classes).

    Args:
      predictions: per image ``(boxes [n,4], scores [n], labels [n])``.
      ground_truths: per image ``(boxes [m,4], labels [m])`` — labels 1-based
        to match the trainer's background=0 contract.
      iou_threshold: match threshold.

    Returns:
      ``{"mAP", "class_metrics": {cls: {AP, Precision, Recall, TP, FP, FN}}}``
      (the reference's per-class result surface, ``frcnn_training.py:391-405``).
    """
    class_metrics = {}
    aps: List[float] = []
    for c in range(1, num_classes + 1):
        all_scores, all_tp = [], []
        n_gt_total = 0
        for (p_boxes, p_scores, p_labels), (g_boxes, g_labels) in zip(
                predictions, ground_truths):
            pm = p_labels == c
            gm = g_labels == c
            pb, ps = p_boxes[pm], p_scores[pm]
            gb = g_boxes[gm]
            n_gt_total += len(gb)
            if len(pb) == 0:
                continue
            order = np.argsort(-ps, kind="stable")
            iou = _iou_matrix(pb[order], gb)
            matched = np.zeros(len(gb), bool)
            tp_flags = np.zeros(len(pb), bool)
            for k in range(len(pb)):
                if len(gb) == 0:
                    break
                j = int(np.argmax(np.where(matched, -1.0, iou[k])))
                if iou[k, j] > iou_threshold and not matched[j]:
                    matched[j] = True
                    tp_flags[k] = True
            all_scores.append(ps[order])
            all_tp.append(tp_flags)

        scores = np.concatenate(all_scores) if all_scores else np.zeros(0)
        tps = np.concatenate(all_tp) if all_tp else np.zeros(0, bool)
        tp = int(tps.sum())
        fp = int((~tps).sum())
        fn = n_gt_total - tp
        ap = _ap_from_matches(scores, tps, n_gt_total)
        class_metrics[c] = {
            "AP": ap,
            "Precision": tp / (tp + fp) if tp + fp else 0.0,
            "Recall": tp / (tp + fn) if tp + fn else 0.0,
            "TP": tp, "FP": fp, "FN": fn, "n_gt": n_gt_total,
        }
        if n_gt_total > 0:
            # classes absent from the GT are excluded from the mean (the
            # reference appends 0 for them, frcnn_training.py:517-523 — a
            # defect that drags mAP toward 0 on sparse batches)
            aps.append(ap)

    return {"mAP": float(np.mean(aps)) if aps else 0.0,
            "class_metrics": class_metrics}
