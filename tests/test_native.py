"""Native C++ preprocessing library tests (skipped when it cannot build)."""

import numpy as np
import pytest
from PIL import Image

from two_stage_object_detection_tpu.data import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _save(tmp_path, img, fmt):
    p = str(tmp_path / f"img.{fmt.lower()}")
    Image.fromarray(img).save(p, fmt)
    return p


def test_decode_png_and_jpeg(tmp_path, rng):
    # smooth gradient (JPEG is lossy on noise)
    yy, xx = np.mgrid[0:37, 0:53]
    img = np.stack([yy * 6, xx * 4, (yy + xx) * 3], -1).astype(np.uint8)
    for fmt in ("PNG", "JPEG"):
        p = _save(tmp_path, img, fmt)
        out = native.decode(p)
        assert out is not None and out.shape == (37, 53, 3)
        if fmt == "PNG":
            np.testing.assert_array_equal(out, img)   # png is lossless
        else:
            assert np.abs(out.astype(int) - img.astype(int)).mean() < 10


def test_decode_resize_matches_pil(tmp_path, rng):
    img = (rng.rand(157, 283, 3) * 255).astype(np.uint8)
    p = _save(tmp_path, img, "PNG")
    arr, oh, ow = native.decode_resize(p, (64, 96))
    assert (oh, ow) == (157, 283)
    ref = np.asarray(Image.open(p).resize((96, 64), Image.BILINEAR),
                     np.float32) / 255.0
    # PIL quantises filter weights to 8 bits; stay within that
    assert np.abs(arr - ref).max() < 0.02


def test_resize_f32_identity_and_range(rng):
    img = rng.rand(33, 47, 3).astype(np.float32)
    same = native.resize_f32(img, (33, 47))
    np.testing.assert_allclose(same, img, atol=1e-6)
    down = native.resize_f32(img, (13, 17))
    assert down.shape == (13, 17, 3)
    assert down.min() >= 0 and down.max() <= 1 + 1e-6


def test_resize_f32_constant_preserved():
    img = np.full((40, 40, 3), 0.37, np.float32)
    out = native.resize_f32(img, (17, 23))
    np.testing.assert_allclose(out, 0.37, rtol=1e-5)


def test_scaled_jpeg_decode_resize(tmp_path):
    """Large JPEG sources decode DCT-scaled toward the target: the result
    must match the full-res decode+resize closely and report ORIGINAL dims
    (box rescale depends on them)."""
    yy, xx = np.mgrid[0:1800, 0:1500]
    img = np.stack([yy / 1800 * 255, xx / 1500 * 255,
                    (yy + xx) / 3300 * 255], -1).astype(np.uint8)
    p = str(tmp_path / "big.jpg")
    Image.fromarray(img).save(p, "JPEG", quality=95)
    arr, oh, ow = native.decode_resize(p, (300, 300))
    assert (oh, ow) == (1800, 1500)
    assert arr.shape == (300, 300, 3)
    ref = np.asarray(Image.open(p).resize((300, 300), Image.BILINEAR),
                     np.float32) / 255.0
    # DCT-domain lowpass vs triangle filter differ slightly in passband
    assert np.abs(arr - ref).mean() < 0.01
    assert np.abs(arr - ref).max() < 0.08


def test_native_yuv420_pack_matches_numpy():
    """The C++ yuv420 pack agrees with the numpy pack to the +-1 LSB of
    float summation-order rounding (serving's wire is deterministic given
    the packed planes, so pack agreement bounds end-to-end divergence)."""
    if not native.available() or native.rgb_to_yuv420(
            np.zeros((1, 2, 2, 3), np.uint8)) is None:
        pytest.skip("native library (or symbol) unavailable")
    from two_stage_object_detection_tpu.serving import _YUV_FWD
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (2, 16, 20, 3)).astype(np.uint8)
    nat = native.rgb_to_yuv420(img)
    n, h, w, _ = img.shape
    yuv = img.astype(np.float32) @ _YUV_FWD.T
    ref = np.empty((n, h + h // 2, w), np.uint8)
    ref[:, :h, :] = np.clip(np.rint(yuv[..., 0]), 0, 255).astype(np.uint8)
    uv = yuv[:, :, :, 1:].reshape(n, h // 2, 2, w // 2, 2, 2).mean((2, 4))
    uv = np.clip(np.rint(uv + 128.0), 0, 255).astype(np.uint8)
    ref[:, h:, : w // 2] = uv[..., 0]
    ref[:, h:, w // 2:] = uv[..., 1]
    assert np.abs(nat.astype(np.int16) - ref.astype(np.int16)).max() <= 1
