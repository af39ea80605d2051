"""Device-side augmentation: shapes, box math, host-chain consistency."""

import jax
import jax.numpy as jnp
import numpy as np  # noqa: F401

from two_stage_object_detection_tpu.data.device_transforms import (
    _hflip, _photometric, augment_batch)


def test_hflip_box_math():
    img = jnp.asarray(np.arange(2 * 4 * 3, dtype=np.float32).reshape(2, 4, 3))
    boxes = jnp.asarray(np.array([[0.0, 0.0, 1.0, 2.0]], np.float32))
    # find keys for both outcomes
    flipped = unflipped = None
    for i in range(20):
        out_img, out_boxes = _hflip(img, boxes, jax.random.PRNGKey(i))
        if np.allclose(np.asarray(out_img), np.asarray(img)):
            unflipped = np.asarray(out_boxes)
        else:
            flipped = np.asarray(out_boxes)
            np.testing.assert_allclose(np.asarray(out_img),
                                       np.asarray(img)[:, ::-1])
        if flipped is not None and unflipped is not None:
            break
    np.testing.assert_allclose(unflipped, [[0, 0, 1, 2]])
    # width 4: x1' = 4 - x2 = 3, x2' = 4 - x1 = 4
    np.testing.assert_allclose(flipped, [[3, 0, 4, 2]])


def test_photometric_stays_in_range(rng):
    img = jnp.asarray(rng.rand(16, 16, 3), jnp.float32)
    for i in range(5):
        out = _photometric(img, jax.random.PRNGKey(i))
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
        assert out.shape == img.shape


def test_augment_batch_contract(rng):
    img = jnp.asarray(rng.rand(3, 32, 32, 3), jnp.float32)
    boxes = jnp.asarray(rng.rand(3, 5, 4).astype(np.float32) * 16)
    boxes = jnp.concatenate([boxes[..., :2], boxes[..., :2] + 4], axis=-1)
    out_img, out_boxes = augment_batch(img, boxes, jax.random.PRNGKey(0))
    assert out_img.shape == img.shape and out_boxes.shape == boxes.shape
    b = np.asarray(out_boxes)
    assert (b[..., 2] >= b[..., 0]).all() and (b[..., 3] >= b[..., 1]).all()
    # different per-image keys -> images actually change
    assert not np.allclose(np.asarray(out_img), np.asarray(img))


def test_scale_jitter_identity_branch(rng):
    """The s=1.0 branch must be a pixel no-op (pure geometry cancel)."""
    from two_stage_object_detection_tpu.data.device_transforms import (
        SCALES, _scale_jitter)
    img = jnp.asarray(rng.rand(24, 24, 3), jnp.float32)
    hit = False
    for i in range(30):
        key = jax.random.PRNGKey(i)
        idx = int(jax.random.randint(key, (), 0, len(SCALES)))
        if abs(SCALES[idx] - 1.0) < 1e-6:
            out = _scale_jitter(img, key)
            np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                                       atol=1e-6)
            hit = True
            break
    assert hit


def test_scale_jitter_matrix_matches_two_pass_resize(rng):
    """The precomputed M_s = R(m->n) @ R(n->m) matrix form must reproduce
    the explicit resize(n->m)->resize(m->n) composition for every scale
    (linearity of antialiased linear resize)."""
    from two_stage_object_detection_tpu.data.device_transforms import (
        SCALES, _jitter_matrices)
    h = w = 30
    img = jnp.asarray(rng.rand(h, w, 3), jnp.float32)
    mh = _jitter_matrices(h, SCALES)
    for si, s in enumerate(SCALES):
        m = max(int(h * s), 8)
        if m == h:
            ref = img
        else:
            mid = jax.image.resize(img, (m, max(int(w * s), 8), 3),
                                   "linear", antialias=True)
            ref = jax.image.resize(mid, (h, w, 3), "linear", antialias=True)
        got = jnp.einsum("ij,jwc->iwc", mh[si], img)
        got = jnp.einsum("kw,hwc->hkc", mh[si], got)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, err_msg=f"scale {s}")


def test_decode_only_dataset(tmp_path, rng):
    from two_stage_object_detection_tpu.data.coco import load_coco
    from two_stage_object_detection_tpu.data.pipeline import DetectionDataset
    from two_stage_object_detection_tpu.data.synthetic import (
        generate_synthetic_coco)

    root = str(tmp_path)
    generate_synthetic_coco(root, split="train2017", num_images=2,
                            num_classes=2, image_size=(40, 56), seed=0)
    idx = load_coco(root + "/annotations/instances_train2017.json",
                    root + "/train2017", ratio=1.0)
    ds = DetectionDataset(idx, input_size=(32, 32), max_gt=4, train=True,
                          decode_only=True)
    s = ds[0]
    assert s["image"].shape == (32, 32, 3)
    assert s["image"].dtype == np.float32
    assert 0.0 <= s["image"].min() and s["image"].max() <= 1.0
    assert s["boxes"].shape == (4, 4) and s["valid"].any()
    # boxes scaled into the 32x32 canvas
    assert s["boxes"][s["valid"]].max() <= 32.0


import numpy as np  # noqa: E402  (used above before import in file order)
