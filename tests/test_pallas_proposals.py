"""Fused Pallas proposal kernel vs the jnp reference path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from two_stage_object_detection_tpu.nets.rpn import create_proposals
from two_stage_object_detection_tpu.ops.anchors import (
    enumerate_shifted_anchor, generate_basic_anchor)
from two_stage_object_detection_tpu.ops.pallas_proposals import (
    fused_proposals, fused_proposals_batched)


def _anchors(h=4, w=4):
    base = generate_basic_anchor(base_size=2, ratios=(0.5, 1.0, 2.0),
                                 anchor_scales=(4.0, 8.0))
    return jnp.array(enumerate_shifted_anchor(base, 16, h, w))


def test_fused_matches_reference(rng):
    anchors = _anchors()
    n = anchors.shape[0]
    locs = jnp.array(rng.randn(n, 4).astype(np.float32) * 0.1)
    scores = jnp.array(rng.rand(n).astype(np.float32))

    ref = create_proposals(locs, scores, anchors, (64, 64), nms_iou=0.7,
                           n_pre_nms=n, n_post_nms=16, min_size=2.0)
    got = fused_proposals(locs, scores, anchors, (64, 64), nms_iou=0.7,
                          n_post_nms=16, min_size=2.0, interpret=True)

    ref_boxes, ref_scores, ref_valid = map(np.asarray, ref)
    got_boxes, got_scores, got_valid = map(np.asarray, got)
    np.testing.assert_array_equal(got_valid, ref_valid)
    np.testing.assert_allclose(got_scores[got_valid], ref_scores[ref_valid],
                               rtol=1e-5)
    np.testing.assert_allclose(got_boxes[got_valid], ref_boxes[ref_valid],
                               rtol=1e-4, atol=1e-3)


def test_fused_min_size_filters_everything(rng):
    anchors = _anchors()
    n = anchors.shape[0]
    locs = jnp.zeros((n, 4)).at[:, 2:].set(-6.0)   # shrink all boxes
    scores = jnp.array(rng.rand(n).astype(np.float32))
    _, _, valid = fused_proposals(locs, scores, anchors, (64, 64),
                                  nms_iou=0.7, n_post_nms=16, min_size=16.0,
                                  interpret=True)
    assert not np.asarray(valid).any()


def test_fused_output_is_score_sorted(rng):
    anchors = _anchors(6, 6)
    n = anchors.shape[0]
    locs = jnp.array(rng.randn(n, 4).astype(np.float32) * 0.05)
    scores = jnp.array(rng.rand(n).astype(np.float32))
    _, out_scores, valid = fused_proposals(locs, scores, anchors, (96, 96),
                                           nms_iou=0.5, n_post_nms=32,
                                           min_size=1.0, interpret=True)
    s = np.asarray(out_scores)[np.asarray(valid)]
    assert (s[:-1] >= s[1:]).all()


def test_batched_matches_per_image(rng):
    """The whole-batch kernel must equal the per-image kernel exactly."""
    anchors = _anchors(5, 5)
    n = anchors.shape[0]
    b = 3
    locs = jnp.array(rng.randn(b, n, 4).astype(np.float32) * 0.1)
    scores = jnp.array(rng.rand(b, n).astype(np.float32))

    rois_b, scores_b, valid_b = fused_proposals_batched(
        locs, scores, anchors, (80, 80), nms_iou=0.7, n_post_nms=16,
        min_size=2.0, interpret=True)
    assert rois_b.shape == (b, 16, 4)
    for i in range(b):
        r, s, v = fused_proposals(locs[i], scores[i], anchors, (80, 80),
                                  nms_iou=0.7, n_post_nms=16, min_size=2.0,
                                  interpret=True)
        np.testing.assert_array_equal(np.asarray(valid_b[i]), np.asarray(v))
        np.testing.assert_allclose(np.asarray(rois_b[i]), np.asarray(r),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(scores_b[i]), np.asarray(s),
                                   rtol=1e-6)


def test_batched_chunking(rng):
    """Batches beyond the 16-image VMEM chunk are split and reassembled."""
    import two_stage_object_detection_tpu.ops.pallas_proposals as pp
    anchors = _anchors()
    n = anchors.shape[0]
    b = 5
    locs = jnp.array(rng.randn(b, n, 4).astype(np.float32) * 0.1)
    scores = jnp.array(rng.rand(b, n).astype(np.float32))
    full = fused_proposals_batched(locs, scores, anchors, (64, 64),
                                   nms_iou=0.7, n_post_nms=8, min_size=2.0,
                                   interpret=True)
    orig = pp._MAX_KERNEL_BATCH
    try:
        pp._MAX_KERNEL_BATCH = 2
        # bypass the jit cache (it doesn't key on the chunk limit)
        chunked = fused_proposals_batched.__wrapped__(
            locs, scores, anchors, (64, 64), nms_iou=0.7, n_post_nms=8,
            min_size=2.0, interpret=True)
    finally:
        pp._MAX_KERNEL_BATCH = orig
    for a, c in zip(full, chunked):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-6)


def test_truncated_matches_reference(rng):
    """n_pre_nms path (decode in XLA + exact top-k + NMS-only kernel) must
    equal create_proposals with the same truncation, per image."""
    anchors = _anchors(8, 8)                   # 384 anchors
    n = anchors.shape[0]
    b = 3
    n_pre = 64                                 # 6*n_pre <= n -> path engaged
    locs = jnp.array(rng.randn(b, n, 4).astype(np.float32) * 0.1)
    scores = jnp.array(rng.rand(b, n).astype(np.float32))

    rois_b, scores_b, valid_b = fused_proposals_batched(
        locs, scores, anchors, (128, 128), nms_iou=0.7, n_post_nms=16,
        min_size=2.0, n_pre_nms=n_pre, interpret=True)
    for i in range(b):
        r, s, v = create_proposals(locs[i], scores[i], anchors, (128, 128),
                                   nms_iou=0.7, n_pre_nms=n_pre,
                                   n_post_nms=16, min_size=2.0)
        np.testing.assert_array_equal(np.asarray(valid_b[i]), np.asarray(v))
        np.testing.assert_allclose(np.asarray(rois_b[i])[np.asarray(v)],
                                   np.asarray(r)[np.asarray(v)], rtol=1e-5,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(scores_b[i])[np.asarray(v)],
                                   np.asarray(s)[np.asarray(v)], rtol=1e-6)


def test_truncated_disengages_when_cut_is_small(rng):
    """A cut below the 6x engage threshold keeps the fused full-set kernel
    (superset semantics, no top_k) — results equal the untruncated call."""
    anchors = _anchors()
    n = anchors.shape[0]
    locs = jnp.array(rng.randn(2, n, 4).astype(np.float32) * 0.1)
    scores = jnp.array(rng.rand(2, n).astype(np.float32))
    full = fused_proposals_batched(locs, scores, anchors, (64, 64),
                                   nms_iou=0.7, n_post_nms=8, min_size=2.0,
                                   interpret=True)
    guarded = fused_proposals_batched(locs, scores, anchors, (64, 64),
                                      nms_iou=0.7, n_post_nms=8, min_size=2.0,
                                      n_pre_nms=n - 1, interpret=True)
    for a, g in zip(full, guarded):
        np.testing.assert_allclose(np.asarray(a), np.asarray(g), rtol=1e-6)


def test_truncated_chunking(rng):
    """Truncated path splits batches over the VMEM chunk and reassembles."""
    import two_stage_object_detection_tpu.ops.pallas_proposals as pp
    anchors = _anchors(8, 8)
    n = anchors.shape[0]
    b = 5
    locs = jnp.array(rng.randn(b, n, 4).astype(np.float32) * 0.1)
    scores = jnp.array(rng.rand(b, n).astype(np.float32))
    kw = dict(nms_iou=0.7, n_post_nms=8, min_size=2.0, n_pre_nms=64,
              interpret=True)
    full = fused_proposals_batched(locs, scores, anchors, (128, 128), **kw)
    orig = pp._MAX_KERNEL_BATCH
    try:
        pp._MAX_KERNEL_BATCH = 2
        chunked = fused_proposals_batched.__wrapped__(
            locs, scores, anchors, (128, 128), **kw)
    finally:
        pp._MAX_KERNEL_BATCH = orig
    for a, c in zip(full, chunked):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-6)


def test_fused_vmap(rng):
    anchors = _anchors()
    n = anchors.shape[0]
    locs = jnp.array(rng.randn(2, n, 4).astype(np.float32) * 0.1)
    scores = jnp.array(rng.rand(2, n).astype(np.float32))
    fn = lambda l, s: fused_proposals(l, s, anchors, (64, 64), nms_iou=0.7,
                                      n_post_nms=8, min_size=2.0,
                                      interpret=True)
    rois_b, scores_b, valid_b = jax.vmap(fn)(locs, scores)
    assert rois_b.shape == (2, 8, 4)
    for i in range(2):
        r, s, v = fn(locs[i], scores[i])
        np.testing.assert_allclose(np.asarray(rois_b[i]), np.asarray(r),
                                   rtol=1e-5)
