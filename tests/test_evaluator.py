import pytest
import jax
import numpy as np

from two_stage_object_detection_tpu.eval.evaluator import (
    _per_class_nms_host, evaluate, evaluate_sweep)
from tests.test_detector import tiny_batch, tiny_config
from two_stage_object_detection_tpu.nets.trainer import create_train_state


def test_per_class_nms_host_keeps_classes_separate():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 10, 10], [0, 0, 10, 10]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    labels = np.array([1, 1, 2])
    keep = _per_class_nms_host(boxes, scores, labels, num_classes=2,
                               iou_threshold=0.5)
    # the duplicate class-1 box is suppressed; class-2 overlap survives
    assert sorted(keep.tolist()) == [0, 2]


def _per_class_nms_reference(boxes, scores, labels, num_classes,
                             iou_threshold):
    """The original per-class pop-loop formulation, kept as the oracle for
    the vectorised implementation."""
    keep_idx = []
    for c in range(1, num_classes + 1):
        idx = np.nonzero(labels == c)[0]
        if len(idx) == 0:
            continue
        b, s = boxes[idx], scores[idx]
        order = np.argsort(-s, kind="stable").tolist()
        while order:
            i = order.pop(0)
            keep_idx.append(idx[i])
            if not order:
                break
            rest = np.array(order)
            tl = np.maximum(b[i, :2], b[rest, :2])
            br = np.minimum(b[i, 2:], b[rest, 2:])
            wh = np.clip(br - tl, 0, None)
            inter = wh[:, 0] * wh[:, 1]
            area_i = (b[i, 2] - b[i, 0]) * (b[i, 3] - b[i, 1])
            area_r = (b[rest, 2] - b[rest, 0]) * (b[rest, 3] - b[rest, 1])
            iou = inter / (area_i + area_r - inter + 1e-8)
            order = [o for o, v in zip(order, iou) if v <= iou_threshold]
    return np.asarray(sorted(keep_idx), np.int64)


def test_per_class_nms_vectorised_matches_reference():
    """Property: the class-offset vectorised NMS keeps exactly what the
    per-class pop-loop keeps, over random crowded scenes and thresholds."""
    rng = np.random.RandomState(0)
    for trial in range(40):
        n = rng.randint(1, 120)
        num_classes = rng.randint(1, 5)
        xy = rng.rand(n, 2) * 500
        wh = rng.rand(n, 2) * 120 + 1
        boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
        scores = rng.rand(n).astype(np.float32)
        labels = rng.randint(0, num_classes + 1, n)
        thr = rng.choice([0.3, 0.5, 0.7])
        got = _per_class_nms_host(boxes, scores, labels, num_classes, thr)
        want = _per_class_nms_reference(boxes, scores, labels, num_classes,
                                        thr)
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


def test_compute_map_sweep_matches_per_threshold():
    """compute_map_sweep (IoU hoisted out of the threshold loop) returns
    exactly compute_map's mAP at every threshold, on random scenes."""
    from two_stage_object_detection_tpu.eval.metrics import (
        compute_map, compute_map_sweep)
    rng = np.random.RandomState(2)
    preds, gts = [], []
    for _ in range(12):
        n, m = rng.randint(0, 20), rng.randint(0, 6)
        mk = lambda k: np.concatenate(
            [rng.rand(k, 2) * 200, rng.rand(k, 2) * 200 + 200], -1
        ).astype(np.float32)
        preds.append((mk(n), rng.rand(n).astype(np.float32),
                      rng.randint(1, 4, n)))
        gts.append((mk(m), rng.randint(1, 4, m)))
    thresholds = np.arange(0.5, 1.0, 0.05)
    sweep = compute_map_sweep(preds, gts, 3, thresholds)
    for t in thresholds:
        want = compute_map(preds, gts, 3, iou_threshold=float(t))["mAP"]
        assert sweep[float(t)] == want, t


def test_evaluate_smoke():
    cfg = tiny_config()
    _, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                  init_image_size=(32, 32))
    rng = np.random.RandomState(0)
    batches = [tiny_batch(cfg, rng) for _ in range(2)]
    loss, m, metrics = evaluate(state, iter(batches), cfg,
                                map_iou_threshold=0.5)
    assert np.isfinite(loss)
    assert 0.0 <= m <= 1.0
    assert len(metrics["class_metrics"]) == cfg.num_classes
    # true-inference mode also runs
    _, m2, _ = evaluate(state, iter(batches[:1]), cfg,
                        map_iou_threshold=0.5, use_predict=True)
    assert 0.0 <= m2 <= 1.0


@pytest.mark.slow
def test_sweep_forward_once_matches_per_threshold_eval():
    """The forward-once sweep must equal independent evaluate() calls."""
    cfg = tiny_config()
    _, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                  init_image_size=(32, 32))
    rng = np.random.RandomState(0)
    batches = [tiny_batch(cfg, rng) for _ in range(2)]
    sweep = evaluate_sweep(state, lambda: iter(batches), cfg,
                           thresholds=(0.5, 0.75))
    loss50, m50, _ = evaluate(state, iter(batches), cfg, map_iou_threshold=0.5)
    _, m75, _ = evaluate(state, iter(batches), cfg, map_iou_threshold=0.75)
    assert sweep["mAP50"] == m50
    assert abs(sweep["mAP50_95"] - (m50 + m75) / 2) < 1e-9
    assert abs(sweep["eval_loss"] - loss50) < 1e-9


def test_per_class_nms_unclipped_huge_coordinates():
    """Train-graph eval boxes are NOT clipped: a divergent loc2bbox decode
    can exceed any fixed class-offset band.  The band is sized from the
    actual coordinate range, so keeps still match the per-class oracle."""
    rng = np.random.RandomState(1)
    for trial in range(20):
        n = rng.randint(2, 40)
        xy = rng.rand(n, 2) * 500 - 100          # negative coords too
        wh = rng.rand(n, 2) * 120 + 1
        boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
        # a few divergent decodes: boxes spanning far past 1e4
        k = rng.randint(1, 4)
        rows = rng.choice(n, k, replace=False)
        boxes[rows, 2:] = boxes[rows, :2] + rng.rand(k, 2) * 5e4 + 1e4
        scores = rng.rand(n).astype(np.float32)
        labels = rng.randint(1, 4, n)
        got = _per_class_nms_host(boxes, scores, labels, 3, 0.5)
        want = _per_class_nms_reference(boxes, scores, labels, 3, 0.5)
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")
