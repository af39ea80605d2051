import pytest
import jax
import jax.numpy as jnp
import numpy as np

from two_stage_object_detection_tpu.nets.targets import (
    anchor_target, proposal_target)
from two_stage_object_detection_tpu.ops.geometry import bbox2loc


def _pad(arr, n, dim=4):
    out = np.zeros((n, dim), np.float32) if dim else np.zeros((n,), np.float32)
    out[: len(arr)] = arr
    return out


def test_anchor_target_basic():
    # 4 anchors, 1 gt coinciding with anchor 0
    anchors = jnp.array([
        [0.0, 0.0, 10.0, 10.0],      # IoU 1 with gt -> positive
        [0.0, 0.0, 9.0, 9.0],        # IoU .81 -> positive (>= .7)
        [5.0, 5.0, 15.0, 15.0],      # IoU ~.19 -> negative (< .3)
        [100.0, 100.0, 110.0, 110.0],  # IoU 0 -> negative
    ])
    gt = jnp.array([[0.0, 0.0, 10.0, 10.0], [0.0, 0.0, 0.0, 0.0]])
    gt_valid = jnp.array([True, False])
    loc, label = anchor_target(anchors, gt, gt_valid)
    np.testing.assert_array_equal(np.asarray(label), [1, 1, 0, 0])
    # positive anchors regress to the gt
    want = np.asarray(bbox2loc(anchors[:2], gt[jnp.array([0, 0])]))
    np.testing.assert_allclose(np.asarray(loc)[:2], want, rtol=1e-5)


def test_anchor_target_forces_best_anchor():
    # no anchor reaches pos_iou_thresh, but each gt's best anchor is positive
    anchors = jnp.array([[0.0, 0.0, 20.0, 20.0], [50.0, 50.0, 70.0, 70.0]])
    gt = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    gt_valid = jnp.array([True])
    _, label = anchor_target(anchors, gt, gt_valid)
    assert int(label[0]) == 1      # best anchor forced positive
    assert int(label[1]) == 0      # IoU 0 -> negative


def test_anchor_target_no_gt():
    anchors = jnp.array([[0.0, 0.0, 10.0, 10.0]] * 4)
    gt = jnp.zeros((2, 4))
    gt_valid = jnp.array([False, False])
    loc, label = anchor_target(anchors, gt, gt_valid)
    assert (np.asarray(label) == -1).all()
    np.testing.assert_allclose(np.asarray(loc), 0.0)


def test_anchor_target_subsampling_counts(rng):
    # many coincident anchors -> positives capped at pos_ratio * n_sample
    base = np.array([0.0, 0.0, 10.0, 10.0], np.float32)
    anchors = jnp.array(np.tile(base, (300, 1)) + rng.rand(300, 4).astype(np.float32) * 0.1)
    gt = jnp.array([base])
    gt_valid = jnp.array([True])
    _, label = anchor_target(anchors, gt, gt_valid, n_sample=64, pos_ratio=0.5)
    lab = np.asarray(label)
    assert (lab == 1).sum() == 32
    assert (lab == 0).sum() <= 32
    assert (lab != -1).sum() <= 64


def test_anchor_target_random_sampling_key():
    base = np.array([0.0, 0.0, 10.0, 10.0], np.float32)
    anchors = jnp.array(np.tile(base, (100, 1)))
    gt = jnp.array([base])
    gt_valid = jnp.array([True])
    _, l1 = anchor_target(anchors, gt, gt_valid, n_sample=8, pos_ratio=0.5,
                          key=jax.random.PRNGKey(0))
    _, l2 = anchor_target(anchors, gt, gt_valid, n_sample=8, pos_ratio=0.5,
                          key=jax.random.PRNGKey(1))
    # same counts, (very likely) different selections
    assert (np.asarray(l1) == 1).sum() == (np.asarray(l2) == 1).sum() == 4
    assert not np.array_equal(np.asarray(l1), np.asarray(l2))


def test_proposal_target_labels_and_sampling():
    gt = jnp.array([[0.0, 0.0, 10.0, 10.0], [20.0, 20.0, 40.0, 40.0]])
    gt_valid = jnp.array([True, True])
    gt_labels = jnp.array([3, 7])
    rois = jnp.array([
        [0.0, 0.0, 9.0, 9.0],        # high IoU with gt0 -> label 4
        [21.0, 21.0, 40.0, 40.0],    # high IoU with gt1 -> label 8
        [60.0, 60.0, 80.0, 80.0],    # background
        [0.0, 0.0, 0.0, 0.0],        # padding
    ])
    roi_valid = jnp.array([True, True, True, False])
    s_roi, s_loc, s_label, s_valid = proposal_target(
        rois, roi_valid, gt, gt_valid, gt_labels, n_sample=8, pos_ratio=0.5)
    lab = np.asarray(s_label)
    # positives first: rois 0,1 plus the two gt boxes appended to the pool
    assert set(lab[np.asarray(s_valid)]) <= {0, 4, 8}
    assert (lab == 4).sum() >= 1 and (lab == 8).sum() >= 1
    # background slot has label 0
    n_valid = int(np.asarray(s_valid).sum())
    assert n_valid >= 5  # 4 positives (2 rois + 2 gt) + 1 negative
    # positive roi regression targets point at the assigned gt
    pos_mask = lab > 0
    want0 = np.asarray(bbox2loc(s_roi[0:1], gt[0:1]))
    np.testing.assert_allclose(np.asarray(s_loc)[0:1], want0, rtol=1e-4)


def test_proposal_target_adds_gt_to_pool():
    """Even with useless rois, the GT boxes themselves become samples."""
    gt = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    gt_valid = jnp.array([True])
    gt_labels = jnp.array([2])
    rois = jnp.array([[50.0, 50.0, 60.0, 60.0]])
    roi_valid = jnp.array([True])
    s_roi, _, s_label, s_valid = proposal_target(
        rois, roi_valid, gt, gt_valid, gt_labels, n_sample=4)
    lab = np.asarray(s_label)
    assert (lab == 3).sum() == 1  # the gt box, label shifted +1
    # it is the first (positive-first ordering)
    np.testing.assert_allclose(np.asarray(s_roi)[0], [0, 0, 10, 10])


def test_proposal_target_loc_std_normalization():
    """loc_std divides the regression targets; multiplying back and decoding
    recovers the assigned GT box exactly (the train/predict consistency the
    Config.loc_normalize flag relies on)."""
    from two_stage_object_detection_tpu.ops.geometry import loc2bbox
    std = (0.1, 0.1, 0.2, 0.2)
    gt = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    gt_valid = jnp.array([True])
    gt_labels = jnp.array([2])
    rois = jnp.array([[1.0, 2.0, 12.0, 9.0]])
    roi_valid = jnp.array([True])
    s_roi, loc_plain, lab, valid = proposal_target(
        rois, roi_valid, gt, gt_valid, gt_labels, n_sample=4)
    _, loc_norm, _, _ = proposal_target(
        rois, roi_valid, gt, gt_valid, gt_labels, n_sample=4, loc_std=std)
    np.testing.assert_allclose(
        np.asarray(loc_norm), np.asarray(loc_plain) / np.array(std),
        rtol=1e-5)
    # un-normalized decode of positive samples returns the gt box
    pos = np.asarray(lab) > 0
    dec = loc2bbox(s_roi, loc_norm * jnp.asarray(std))
    np.testing.assert_allclose(np.asarray(dec)[pos],
                               np.tile([0, 0, 10, 10], (pos.sum(), 1)),
                               atol=1e-4)


@pytest.mark.slow
def test_proposal_target_vmap():
    gt = jnp.zeros((2, 3, 4)).at[:, 0].set(jnp.array([0.0, 0.0, 10.0, 10.0]))
    gt_valid = jnp.zeros((2, 3), bool).at[:, 0].set(True)
    gt_labels = jnp.zeros((2, 3), jnp.int32)
    rois = jnp.tile(jnp.array([[[0.0, 0.0, 9.0, 9.0]]]), (2, 5, 1))
    roi_valid = jnp.ones((2, 5), bool)
    out = jax.vmap(lambda r, rv, b, v, l: proposal_target(
        r, rv, b, v, l, n_sample=4))(rois, roi_valid, gt, gt_valid, gt_labels)
    assert out[0].shape == (2, 4, 4)
    assert out[2].shape == (2, 4)
