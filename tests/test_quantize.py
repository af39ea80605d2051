"""Int8 post-training quantization (quantize.py).

Checks, all on the CPU backend (conftest): calibration records exactly
the eligible (dense) convs; the quantized conv matches the float conv
within symmetric-int8 error; the wrapped predict jits and keeps the
output contract; the serving Predictor accepts int8_scales.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from tests.test_detector import tiny_config
from two_stage_object_detection_tpu.nets.detector import FasterRCNN
from two_stage_object_detection_tpu.nets.trainer import create_train_state
from two_stage_object_detection_tpu.quantize import (
    calibrate, filter_scales, quantized)
from two_stage_object_detection_tpu.serving import Predictor


class SmallNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(16, (3, 3), use_bias=False, name="c1")(x)
        x = nn.relu(x)
        x = nn.Conv(16, (3, 3), feature_group_count=16, name="dw")(x)
        x = nn.Conv(8, (1, 1), use_bias=True, strides=(2, 2), name="c2")(x)
        return x


@pytest.fixture(scope="module")
def small():
    net = SmallNet()
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 4))
    variables = net.init(jax.random.PRNGKey(0), x)
    return net, variables, x


def test_calibrate_records_dense_convs_only(small):
    net, variables, x = small
    scales = calibrate(net, variables, [x])
    assert set(scales) == {"c1", "c2"}          # dw excluded
    assert scales["c1"] == pytest.approx(float(jnp.max(jnp.abs(x))))
    assert all(v > 0 for v in scales.values())


def test_quantized_matches_float_within_int8_error(small):
    net, variables, x = small
    scales = calibrate(net, variables, [x])
    want = net.apply(variables, x)
    got = jax.jit(quantized(net.apply, scales))(variables, x)
    assert got.shape == want.shape and got.dtype == want.dtype
    # symmetric per-channel int8: ~1% of dynamic range through 2 layers
    err = np.abs(np.asarray(got) - np.asarray(want))
    scale = float(np.max(np.abs(np.asarray(want)))) + 1e-9
    assert float(err.max()) / scale < 0.05
    # and it genuinely differs from f32 (the int8 path actually ran)
    assert float(err.max()) > 0


def test_quantized_bias_and_stride_handled(small):
    net, variables, x = small
    scales = calibrate(net, variables, [x])
    got = quantized(net.apply, scales)(variables, x)
    assert got.shape == (2, 8, 8, 8)            # c2 stride 2 applied


def test_filter_scales_prefix():
    scales = {"extractor/c1": 1.0, "rpn_head/loc": 2.0}
    assert filter_scales(scales) == {"extractor/c1": 1.0}


@pytest.fixture(scope="module")
def detector():
    cfg = tiny_config()
    model = FasterRCNN(cfg)
    _, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                  init_image_size=(64, 64))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    images = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    return cfg, model, state, variables, images


@pytest.mark.slow
def test_detector_predict_quantized_contract(detector):
    cfg, model, state, variables, images = detector
    scales = calibrate(model, variables, [images], method="predict")
    assert any(k.startswith("extractor") for k in scales)
    assert not any("dwconv" in k for k in scales)

    fn = lambda v, x: model.apply(v, x, method="predict")
    boxes, scores, labels, valid = jax.jit(quantized(fn, scales))(
        variables, images)
    b, d = 2, cfg.max_detections
    assert boxes.shape == (b, d, 4) and labels.shape == (b, d)
    assert bool(jnp.all(jnp.isfinite(boxes)))
    # backbone-only scope also traces and runs
    backbone_only = filter_scales(scales, "extractor")
    jax.jit(quantized(fn, backbone_only))(variables, images)


@pytest.mark.slow
def test_predictor_accepts_int8_scales(detector):
    cfg, model, state, variables, images = detector
    scales = calibrate(model, variables, [images], method="predict")
    pred = Predictor(cfg, state.params, state.batch_stats,
                     batch_sizes=(2,), int8_scales=scales)
    out = pred(np.asarray(images))
    assert out["boxes"].shape == (2, cfg.max_detections, 4)
