"""Training-target assignment, fully vectorised with static shapes.

Equivalents of the reference's ``AnchorTargetCreator``
(``nets/frcnn_training.py:19-103``) and ``ProposalTargetCreator``
(``nets/frcnn_training.py:105-177``) with the per-image Python loops replaced
by masked array ops.  GT boxes arrive padded to a fixed ``max_gt`` with a
validity mask.

Sampling: the reference "subsamples" by truncating the first k indices
(``frcnn_training.py:89,98,150,158`` — SURVEY quirk #6), and its negative
RPN subsampling never fires (the ``len(tuple)`` bug at line 97).  Here
sampling is correct: optional ``jax.random`` permutation when an rng key is
given, deterministic first-k otherwise (matching the reference's truncation
behaviour but with the right counts).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from two_stage_object_detection_tpu.ops.geometry import bbox_iou, bbox2loc

BIG = jnp.int32(1 << 30)


def _take_first_k(mask: jnp.ndarray, k: jnp.ndarray | int,
                  key: Optional[jax.Array]) -> jnp.ndarray:
    """Keep at most ``k`` True entries of ``mask``.

    First-k in index order when ``key`` is None, uniformly at random
    otherwise.  ``k`` may be traced.
    """
    if key is not None:
        # random priorities among selected entries
        prio = jax.random.uniform(key, mask.shape)
        prio = jnp.where(mask, prio, 2.0)
        order = jnp.argsort(prio)
        rank = jnp.zeros_like(order).at[order].set(jnp.arange(mask.shape[0]))
    else:
        rank = jnp.cumsum(mask) - 1
    return mask & (rank < k)


def anchor_target(anchors: jnp.ndarray, gt_boxes: jnp.ndarray,
                  gt_valid: jnp.ndarray, *, n_sample: int = 256,
                  pos_iou_thresh: float = 0.7, neg_iou_thresh: float = 0.3,
                  pos_ratio: float = 0.5,
                  key: Optional[jax.Array] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RPN label/regression-target assignment for one image.

    Args:
      anchors: ``[A, 4]``.
      gt_boxes: ``[G, 4]`` padded GT boxes.
      gt_valid: ``[G]`` bool mask of real GT rows.

    Returns:
      ``(loc [A, 4], label [A])`` where label is 1 pos / 0 neg / -1 ignore
      (reference ``AnchorTargetCreator.__call__``/``_create_label``,
      ``frcnn_training.py:29-101``).
    """
    a = anchors.shape[0]
    any_gt = jnp.any(gt_valid)

    iou = bbox_iou(anchors, gt_boxes)                       # [A, G]
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    argmax_ious = jnp.argmax(iou, axis=1)                   # best gt per anchor
    max_ious = jnp.max(iou, axis=1)

    label = jnp.full((a,), -1, jnp.int32)
    label = jnp.where(max_ious < neg_iou_thresh, 0, label)
    label = jnp.where(max_ious >= pos_iou_thresh, 1, label)

    # every valid gt forces its best anchor positive and re-assigns that
    # anchor to it (reference frcnn_training.py:59-62,79-82; later gts win)
    gt_argmax = jnp.argmax(jnp.where(gt_valid[None, :], iou, -jnp.inf), axis=0)  # [G]
    safe_rows = jnp.where(gt_valid, gt_argmax, a)           # scatter-drop invalid
    label = label.at[safe_rows].set(1, mode="drop")
    argmax_ious = argmax_ious.at[safe_rows].set(
        jnp.arange(gt_boxes.shape[0]), mode="drop")

    # subsample: cap positives at pos_ratio * n_sample, fill with negatives
    n_pos_cap = int(pos_ratio * n_sample)
    kp, kn = (None, None) if key is None else jax.random.split(key)
    pos = label == 1
    pos_keep = _take_first_k(pos, n_pos_cap, kp)
    label = jnp.where(pos & ~pos_keep, -1, label)
    n_pos = jnp.minimum(jnp.sum(pos), n_pos_cap)

    neg = label == 0
    neg_keep = _take_first_k(neg, n_sample - n_pos, kn)
    label = jnp.where(neg & ~neg_keep, -1, label)

    # one-hot matmul instead of the row gather gt_boxes[argmax_ious]: at FPN
    # scale (90k anchors x batch 16) the gather measures 7.5 ms/step on v5e
    # while the [A, G] compare + [A, G] @ [G, 4] matmul is ~free
    # (scripts/profile_anchor_target.py); semantics identical — the one-hot
    # is built from the final argmax_ious, forced-positive reassignments
    # included
    onehot = (jnp.arange(gt_boxes.shape[0])[None, :]
              == argmax_ious[:, None]).astype(gt_boxes.dtype)   # [A, G]
    # precision=HIGHEST: at default precision the TPU MXU runs this in bf16,
    # rounding gt coords (~hundreds of px) by 1-2 px BEFORE bbox2loc, whose
    # center-diff/log terms amplify that into noisy regression targets.  The
    # [A,G]@[G,4] contraction is tiny, so fp32 costs nothing.
    loc = bbox2loc(anchors, jnp.einsum("ag,gc->ac", onehot, gt_boxes,
                                       precision=jax.lax.Precision.HIGHEST))
    # no valid gt: all-ignore labels, zero loc (reference returns zeros loc,
    # frcnn_training.py:40-41)
    loc = jnp.where(any_gt, loc, 0.0)
    label = jnp.where(any_gt, label, -1)
    return loc, label


def proposal_target(rois: jnp.ndarray, roi_valid: jnp.ndarray,
                    gt_boxes: jnp.ndarray, gt_valid: jnp.ndarray,
                    gt_labels: jnp.ndarray, *, n_sample: int = 128,
                    pos_ratio: float = 0.5, pos_iou_thresh: float = 0.5,
                    neg_iou_thresh_high: float = 0.5,
                    neg_iou_thresh_low: float = 0.0,
                    loc_std: Optional[Tuple[float, float, float, float]] = None,
                    key: Optional[jax.Array] = None):
    """RoI-head sample selection + targets for one image.

    Args:
      rois: ``[R, 4]`` proposals (padded).
      roi_valid: ``[R]`` proposal validity.
      gt_boxes: ``[G, 4]`` padded GT boxes; ``gt_valid``: ``[G]``.
      gt_labels: ``[G]`` class indices (0-based foreground classes).
      loc_std: optional per-coordinate stds; when given, regression targets
        are divided by them (the normalization the reference declares but
        comments out, ``frcnn_training.py:170`` — opt-in via
        ``Config.loc_normalize``).

    Returns:
      ``(sample_roi [S, 4], gt_roi_loc [S, 4], gt_roi_label [S],
      sample_valid [S])`` with ``S = n_sample``; labels are shifted +1 so
      background = 0 (reference ``ProposalTargetCreator.__call__``,
      ``frcnn_training.py:122-177``), and invalid slots carry label 0 with
      ``sample_valid`` False.
    """
    # GT boxes join the candidate pool (reference frcnn_training.py:131)
    pool = jnp.concatenate([rois, gt_boxes], axis=0)            # [R+G, 4]
    pool_valid = jnp.concatenate([roi_valid, gt_valid], axis=0)

    iou = bbox_iou(pool, gt_boxes)                              # [R+G, G]
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    gt_assignment = jnp.argmax(iou, axis=1)
    max_iou = jnp.max(iou, axis=1)
    max_iou = jnp.where(pool_valid, max_iou, -1.0)
    roi_label = gt_labels[gt_assignment] + 1                    # bg = 0

    pos = max_iou >= pos_iou_thresh
    neg = (max_iou < neg_iou_thresh_high) & (max_iou >= neg_iou_thresh_low) & pool_valid

    n_pos_cap = int(n_sample * pos_ratio)
    kp, kn = (None, None) if key is None else jax.random.split(key)
    pos_keep = _take_first_k(pos, n_pos_cap, kp)
    n_pos = jnp.sum(pos_keep)
    neg_keep = _take_first_k(neg, n_sample - n_pos, kn)

    # compact: positives first (index order), then negatives — mirrors the
    # reference's concat of pos/neg index tuples (frcnn_training.py:162)
    n_pool = pool.shape[0]
    sort_key = jnp.where(pos_keep, jnp.arange(n_pool),
                         jnp.where(neg_keep, n_pool + jnp.arange(n_pool), BIG))
    order = jnp.argsort(sort_key)
    sel = order[:n_sample]

    sample_roi = pool[sel]
    sample_valid = (pos_keep | neg_keep)[sel]
    gt_roi_loc = bbox2loc(sample_roi, gt_boxes[gt_assignment[sel]])
    if loc_std is not None:
        gt_roi_loc = gt_roi_loc / jnp.asarray(loc_std, gt_roi_loc.dtype)
    # negatives (and padding) -> background label 0 (frcnn_training.py:175)
    gt_roi_label = jnp.where(pos_keep[sel], roi_label[sel], 0)
    gt_roi_label = jnp.where(sample_valid, gt_roi_label, 0)
    sample_roi = sample_roi * sample_valid[:, None].astype(sample_roi.dtype)
    gt_roi_loc = gt_roi_loc * sample_valid[:, None].astype(gt_roi_loc.dtype)
    return sample_roi, gt_roi_loc, gt_roi_label, sample_valid
