import jax
import jax.numpy as jnp
import numpy as np

from two_stage_object_detection_tpu.ops.geometry import (
    bbox_iou, bbox2loc, loc2bbox, clip_boxes, xywh2xyxy, box_area)


def test_iou_known_values():
    a = jnp.array([[100.0, 100.0, 200.0, 200.0]])
    b = jnp.array([[150.0, 150.0, 250.0, 250.0]])
    # inter = 50*50, union = 2*10000 - 2500
    np.testing.assert_allclose(bbox_iou(a, b), [[2500.0 / 17500.0]], rtol=1e-5)


def test_iou_properties(rng):
    a = rng.rand(17, 4).astype(np.float32) * 100
    b = rng.rand(9, 4).astype(np.float32) * 100
    a[:, 2:] += a[:, :2]
    b[:, 2:] += b[:, :2]
    iou = np.asarray(bbox_iou(jnp.array(a), jnp.array(b)))
    assert iou.shape == (17, 9)
    assert (iou >= 0).all() and (iou <= 1 + 1e-6).all()
    # symmetry
    iou_t = np.asarray(bbox_iou(jnp.array(b), jnp.array(a)))
    np.testing.assert_allclose(iou, iou_t.T, rtol=1e-5)
    # self-IoU is 1
    self_iou = np.asarray(bbox_iou(jnp.array(a), jnp.array(a)))
    np.testing.assert_allclose(np.diag(self_iou), 1.0, rtol=1e-4)


def test_encode_decode_roundtrip(rng):
    src = rng.rand(50, 4).astype(np.float32) * 100
    src[:, 2:] += src[:, :2] + 1.0
    dst = rng.rand(50, 4).astype(np.float32) * 100
    dst[:, 2:] += dst[:, :2] + 1.0
    loc = bbox2loc(jnp.array(src), jnp.array(dst))
    rec = loc2bbox(jnp.array(src), loc)
    np.testing.assert_allclose(np.asarray(rec), dst, rtol=1e-4, atol=1e-3)


def test_loc2bbox_per_class_layout(rng):
    """[N, 4*C] strided layout decodes each class block independently."""
    src = rng.rand(10, 4).astype(np.float32) * 100
    src[:, 2:] += src[:, :2] + 1.0
    loc = rng.randn(10, 12).astype(np.float32) * 0.1
    full = np.asarray(loc2bbox(jnp.array(src), jnp.array(loc)))
    for c in range(3):
        single = np.asarray(loc2bbox(jnp.array(src), jnp.array(loc[:, 4 * c:4 * c + 4])))
        np.testing.assert_allclose(full[:, 4 * c:4 * c + 4], single, rtol=1e-5)


def test_vmap_and_jit_consistency(rng):
    src = rng.rand(4, 20, 4).astype(np.float32) * 50
    src[..., 2:] += src[..., :2] + 1.0
    loc = rng.randn(4, 20, 4).astype(np.float32) * 0.2
    batched = np.asarray(jax.jit(loc2bbox)(jnp.array(src), jnp.array(loc)))
    per_image = np.stack([np.asarray(loc2bbox(jnp.array(src[i]), jnp.array(loc[i])))
                          for i in range(4)])
    np.testing.assert_allclose(batched, per_image, rtol=1e-5)


def test_clip_boxes():
    boxes = jnp.array([[-10.0, -5.0, 700.0, 650.0], [10.0, 20.0, 30.0, 40.0]])
    clipped = np.asarray(clip_boxes(boxes, (600, 600)))
    np.testing.assert_allclose(clipped, [[0, 0, 600, 600], [10, 20, 30, 40]])


def test_xywh2xyxy():
    assert xywh2xyxy([10, 20, 5, 6]) == [10, 20, 15, 26]
    arr = np.asarray(xywh2xyxy(jnp.array([[10.0, 20.0, 5.0, 6.0]])))
    np.testing.assert_allclose(arr, [[10, 20, 15, 26]])


def test_box_area():
    np.testing.assert_allclose(
        np.asarray(box_area(jnp.array([[0.0, 0.0, 2.0, 3.0]]))), [6.0])
