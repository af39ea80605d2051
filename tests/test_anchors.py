import numpy as np

from two_stage_object_detection_tpu.config import Config
from two_stage_object_detection_tpu.ops.anchors import (
    enumerate_shifted_anchor, generate_basic_anchor, make_anchors)


def _golden_base():
    """Hand-computed golden table for base_size=8, ratios (.5,1,2), scales (8,16,32).

    h = 8*s*sqrt(r), w = 8*s*sqrt(1/r); xyxy centred at origin
    (matches reference utils/basic_anchors.py:11-23).
    """
    out = []
    for r in (0.5, 1.0, 2.0):
        for s in (8, 16, 32):
            h = 8 * s * np.sqrt(r)
            w = 8 * s * np.sqrt(1.0 / r)
            out.append([-w / 2, -h / 2, w / 2, h / 2])
    return np.array(out, np.float32)


def test_base_anchor_golden():
    base = generate_basic_anchor()
    assert base.shape == (9, 4)
    np.testing.assert_allclose(base, _golden_base(), rtol=1e-5)
    # ratio-1 anchors are square with side 64/128/256
    np.testing.assert_allclose(base[3], [-32, -32, 32, 32], rtol=1e-5)
    np.testing.assert_allclose(base[4], [-64, -64, 64, 64], rtol=1e-5)
    np.testing.assert_allclose(base[5], [-128, -128, 128, 128], rtol=1e-5)


def test_shifted_anchor_ordering():
    base = generate_basic_anchor()
    anchors = enumerate_shifted_anchor(base, 16, 3, 2)
    assert anchors.shape == (3 * 2 * 9, 4)
    # first 9 anchors are the base at (0, 0)
    np.testing.assert_allclose(anchors[:9], base)
    # next 9 anchors shifted by x=16 (x inner), then y=16 at index 2*9
    np.testing.assert_allclose(anchors[9:18], base + np.array([16, 0, 16, 0], np.float32))
    np.testing.assert_allclose(anchors[18:27], base + np.array([0, 16, 0, 16], np.float32))


def test_config_anchor_count():
    cfg = Config()
    assert cfg.feat_size == (38, 38)
    anchors = make_anchors(cfg)
    assert anchors.shape == (38 * 38 * 9, 4)
    assert cfg.num_anchors == anchors.shape[0]
    # centres cover the stride-16 grid
    cx = (anchors[:, 0] + anchors[:, 2]) / 2
    assert cx.min() == 0.0 and cx.max() == 37 * 16
