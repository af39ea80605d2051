"""ResNet-backbone detector end-to-end (BASELINE config #1 coverage)."""

import jax
import numpy as np
import pytest

from tests.test_detector import tiny_batch, tiny_config
from two_stage_object_detection_tpu.nets.trainer import (
    create_train_state, predict_step, train_step)


@pytest.mark.slow
def test_resnet50_detector_train_and_predict(rng):
    cfg = tiny_config(backbone="resnet50")
    _, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                  init_image_size=(32, 32))
    batch = tiny_batch(cfg, rng)
    state, losses = train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(losses["total"]))
    boxes, scores, labels, valid = predict_step(state, batch["image"])
    assert boxes.shape == (cfg.batch_size, cfg.max_detections, 4)


def test_resnet34_detector_forward(rng):
    cfg = tiny_config(backbone="resnet34")
    _, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                  init_image_size=(32, 32))
    images = jax.numpy.asarray(rng.rand(1, *cfg.input_size, 3), "float32")
    boxes, scores, labels, valid = predict_step(state, images)
    assert boxes.shape == (1, cfg.max_detections, 4)
