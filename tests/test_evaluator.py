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
