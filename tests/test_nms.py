import jax.numpy as jnp
import numpy as np
import pytest

from two_stage_object_detection_tpu.ops.nms import (
    nms, nms_keep_mask_sorted, nms_padded)


def naive_nms(boxes, scores, thresh):
    """Greedy O(n^2) reference NMS (torch semantics: suppress IoU > thresh)."""
    order = np.argsort(-scores, kind="stable").tolist()
    keep = []
    while order:
        i = order.pop(0)
        keep.append(i)
        order = [j for j in order if _iou(boxes[i], boxes[j]) <= thresh]
    return keep


def _iou(a, b):
    tl = np.maximum(a[:2], b[:2])
    br = np.minimum(a[2:], b[2:])
    wh = np.maximum(br - tl, 0)
    inter = wh[0] * wh[1]
    ar_a = (a[2] - a[0]) * (a[3] - a[1])
    ar_b = (b[2] - b[0]) * (b[3] - b[1])
    return inter / (ar_a + ar_b - inter + 1e-8)


def random_boxes(rng, n, size=100.0):
    b = rng.rand(n, 4).astype(np.float32) * size
    b[:, 2:] = b[:, :2] + rng.rand(n, 2).astype(np.float32) * size / 2 + 1.0
    return b


@pytest.mark.parametrize("n,thresh", [(10, 0.5), (50, 0.7), (200, 0.3), (300, 0.7)])
def test_nms_matches_naive(rng, n, thresh):
    boxes = random_boxes(rng, n)
    scores = rng.rand(n).astype(np.float32)
    idx, valid = nms(jnp.array(boxes), jnp.array(scores), thresh, n)
    got = sorted(np.asarray(idx)[np.asarray(valid)].tolist())
    want = sorted(naive_nms(boxes, scores, thresh))
    assert got == want


def test_nms_crosses_tile_boundaries(rng):
    """Clusters larger than one tile must still suppress across tiles."""
    base = random_boxes(rng, 4, size=50.0)
    # 150 near-duplicates of each of 4 boxes -> 600 boxes spanning tiles of 128
    boxes = np.concatenate([base[i] + rng.randn(150, 4).astype(np.float32) * 0.5
                            for i in range(4)], axis=0)
    scores = rng.rand(len(boxes)).astype(np.float32)
    idx, valid = nms(jnp.array(boxes), jnp.array(scores), 0.7, len(boxes))
    got = sorted(np.asarray(idx)[np.asarray(valid)].tolist())
    want = sorted(naive_nms(boxes, scores, 0.7))
    assert got == want


def test_nms_respects_validity_mask(rng):
    boxes = random_boxes(rng, 20)
    scores = rng.rand(20).astype(np.float32)
    valid = np.zeros(20, bool)
    valid[:10] = True
    idx, keep_valid = nms(jnp.array(boxes), jnp.array(scores), 0.5, 20,
                          valid=jnp.array(valid))
    kept = np.asarray(idx)[np.asarray(keep_valid)]
    assert (kept < 10).all()
    want = sorted(naive_nms(boxes[:10], scores[:10], 0.5))
    assert sorted(kept.tolist()) == want


def test_nms_padded_contract(rng):
    boxes = random_boxes(rng, 40)
    scores = rng.rand(40).astype(np.float32)
    out_boxes, out_scores, valid = nms_padded(jnp.array(boxes), jnp.array(scores), 0.99, 8)
    # iou 0.99 keeps nearly everything -> all 8 slots valid, score-descending
    assert np.asarray(valid).all()
    s = np.asarray(out_scores)
    assert (s[:-1] >= s[1:]).all()
    # low output budget truncates to top-k kept
    out_boxes2, _, valid2 = nms_padded(jnp.array(boxes), jnp.array(scores), 0.5, 64)
    n_kept = int(np.asarray(valid2).sum())
    assert n_kept == len(naive_nms(boxes, scores, 0.5))
    # padding rows are zero
    np.testing.assert_allclose(np.asarray(out_boxes2)[n_kept:], 0.0)


def test_tiled_keep_mask_matches_naive(rng):
    """The tiled full-mask variant agrees with greedy NMS too."""
    boxes = random_boxes(rng, 384)
    scores = rng.rand(384).astype(np.float32)
    order = np.argsort(-scores, kind="stable")
    mask = np.asarray(nms_keep_mask_sorted(jnp.array(boxes[order]), 0.5,
                                           tile_size=128))
    got = sorted(order[mask].tolist())
    want = sorted(naive_nms(boxes, scores, 0.5))
    assert got == want


def test_nms_output_is_score_sorted(rng):
    boxes = random_boxes(rng, 100)
    scores = rng.rand(100).astype(np.float32)
    idx, valid = nms(jnp.array(boxes), jnp.array(scores), 0.6, 100)
    kept_scores = scores[np.asarray(idx)[np.asarray(valid)]]
    assert (kept_scores[:-1] >= kept_scores[1:]).all()
