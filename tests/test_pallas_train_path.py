"""Regression: training differentiates cleanly with the Pallas proposal
kernel in the graph (gradients are cut at the proposal inputs — the kernel
has no AD rule)."""

import pytest
import jax
import numpy as np

from tests.test_detector import tiny_batch, tiny_config
from two_stage_object_detection_tpu.nets.trainer import (
    create_train_state, train_step)

pytestmark = pytest.mark.slow


def test_train_step_with_pallas_proposals(rng):
    cfg = tiny_config(pallas="on")          # interpret-mode kernel on CPU
    _, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                  init_image_size=(32, 32))
    batch = tiny_batch(cfg, rng)
    state, losses = train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(losses["total"]))


def test_predict_with_pallas_matches_jnp(rng):
    cfg_p = tiny_config(pallas="on")
    cfg_j = tiny_config(pallas="off")
    _, state = create_train_state(cfg_p, jax.random.PRNGKey(0),
                                  init_image_size=(32, 32))
    from two_stage_object_detection_tpu.nets.detector import FasterRCNN
    images = jax.numpy.asarray(rng.rand(1, *cfg_p.input_size, 3), "float32")
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out_p = FasterRCNN(cfg_p).apply(variables, images, method="predict")
    out_j = FasterRCNN(cfg_j).apply(variables, images, method="predict")
    vp, vj = np.asarray(out_p[3]), np.asarray(out_j[3])
    np_, nj = int(vp.sum()), int(vj.sum())
    # with random weights proposal scores are full of near-ties, so the two
    # paths (pallas skips pre-NMS truncation) legitimately pick slightly
    # different detections — require similar counts and score distributions;
    # exact kernel parity is asserted in test_pallas_proposals on controlled
    # inputs
    assert abs(np_ - nj) <= 3, (np_, nj)
    n = min(np_, nj)
    sp = np.sort(np.asarray(out_p[1])[0, :np_])[-n:]
    sj = np.sort(np.asarray(out_j[1])[0, :nj])[-n:]
    np.testing.assert_allclose(sp, sj, rtol=0.05, atol=0.01)
