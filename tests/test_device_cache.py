"""HBM-resident dataset cache (data/device_cache.py).

The reference streams every epoch through 12 decode workers and a PCIe
copy per batch (dataset/dataloader.py:33-48,63-74); the cache pins the
decoded shard on device and gathers batches at HBM bandwidth.  These tests
pin the contract: pixel-exact vs the streaming decode path, full per-epoch
coverage with fresh shuffles, multi-host shard disjointness, the residency
gate, and a train step fed straight from the cache.
"""

import numpy as np
import pytest

from two_stage_object_detection_tpu.data.coco import load_coco
from two_stage_object_detection_tpu.data.device_cache import DeviceDatasetCache
from two_stage_object_detection_tpu.data.pipeline import DetectionDataset


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    from two_stage_object_detection_tpu.data.synthetic import (
        generate_synthetic_coco)
    root = tmp_path_factory.mktemp("coco_hbm")
    ann, img_dir = generate_synthetic_coco(
        str(root), split="train2017", num_images=7, num_classes=3,
        image_size=(48, 48), seed=11)
    return ann, img_dir


def _dataset(synth, **kw):
    ann, img_dir = synth
    index = load_coco(ann, img_dir)
    kw.setdefault("decode_only", True)
    kw.setdefault("uint8_images", True)
    return DetectionDataset(index, input_size=(32, 32), max_gt=5,
                            train=True, **kw)


def test_requires_decode_only(synth):
    ds = _dataset(synth, decode_only=False)
    with pytest.raises(ValueError, match="decode_only"):
        DeviceDatasetCache(ds, batch_size=2)


def test_residency_gate(synth):
    ds = _dataset(synth)
    with pytest.raises(MemoryError, match="resident"):
        DeviceDatasetCache(ds, batch_size=2, max_bytes=1000)


def test_batches_match_streaming_decode(synth):
    """Cached batches are pixel/box/label-exact vs dataset.get()."""
    ds = _dataset(synth)
    cache = DeviceDatasetCache(ds, batch_size=2, shuffle=False, seed=3)
    got = {}
    for b, batch in enumerate(cache):
        arrs = {k: np.asarray(v) for k, v in batch.items()}
        assert arrs["image"].dtype == np.uint8
        assert arrs["image"].shape == (2, 32, 32, 3)
        for j in range(2):
            got[2 * b + j] = {k: v[j] for k, v in arrs.items()}
    for i in range(len(cache) * 2):
        ref = ds.get(i, 0)
        for k in ref:
            np.testing.assert_array_equal(got[i][k], ref[k], err_msg=k)


def test_epoch_coverage_and_fresh_shuffle(synth):
    ds = _dataset(synth)
    cache = DeviceDatasetCache(ds, batch_size=3, shuffle=True, seed=0)
    # identify samples by their (deterministic) first pixel row
    sig = {i: bytes(np.asarray(ds.get(i, 0)["image"][0, :, 0])) for i in
           range(len(ds))}
    inv = {v: k for k, v in sig.items()}
    assert len(inv) == len(ds), "fixture images must be distinguishable"

    def epoch_ids():
        ids = []
        for batch in cache:
            for img in np.asarray(batch["image"]):
                ids.append(inv[bytes(img[0, :, 0])])
        return ids

    e0, e1 = epoch_ids(), epoch_ids()
    # 7 images / batch 3 -> 2 full batches of distinct samples per epoch
    assert len(set(e0)) == len(e0) == 6
    assert e0 != e1, "shuffle must differ across epochs"
    assert cache.epoch == 2


def test_multihost_shards_disjoint(synth):
    ds = _dataset(synth)
    shards = [DeviceDatasetCache(ds, batch_size=1, shuffle=False,
                                 shard_count=2, shard_index=i)
              for i in range(2)]
    assert shards[0].n + shards[1].n == len(ds)
    a = np.asarray(shards[0]._data["boxes"])
    b = np.asarray(shards[1]._data["boxes"])
    # strided shard contract: host i holds records i::2
    np.testing.assert_array_equal(a[1], np.asarray(ds.get(2, 0)["boxes"]))
    np.testing.assert_array_equal(b[1], np.asarray(ds.get(3, 0)["boxes"]))
    with pytest.raises(ValueError):
        DeviceDatasetCache(ds, batch_size=1, shard_count=2, shard_index=2)


def test_resident_macro_step_matches_stacked(synth):
    """train_macro_step_resident (gather inside the scan) == train_macro_step
    on the pre-gathered superbatch: same params, same losses."""
    import jax
    import jax.numpy as jnp

    from two_stage_object_detection_tpu.config import Config
    from two_stage_object_detection_tpu.nets.trainer import (
        create_train_state, train_macro_step, train_macro_step_resident)

    cfg = Config(input_size=(32, 32), num_classes=3, batch_size=2,
                 max_gt_boxes=5, n_train_pre_nms=32, n_train_post_nms=8,
                 n_test_pre_nms=16, n_test_post_nms=4, roi_n_sample=4,
                 rpn_n_sample=8, grad_accum_steps=2, fused_accum=True,
                 compute_dtype="float32")
    ds = _dataset(synth)
    cache = DeviceDatasetCache(ds, batch_size=2, seed=5)
    idx = jnp.asarray(cache.epoch_indices()[:2])          # [K=2, B=2]
    rng = jax.random.PRNGKey(7)

    _, s1 = create_train_state(cfg, jax.random.PRNGKey(0),
                               init_image_size=(32, 32))
    _, s2 = create_train_state(cfg, jax.random.PRNGKey(0),
                               init_image_size=(32, 32))
    s1, t1 = train_macro_step_resident(s1, cache.data, idx, rng,
                                       device_augment=True)
    sb = {k: jnp.take(v, idx.reshape(-1), axis=0).reshape(
              2, 2, *v.shape[1:]) for k, v in cache.data.items()}
    s2, t2 = train_macro_step(s2, sb, rng, device_augment=True)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-6),
        s1.params, s2.params)


def test_cache_batches_reshard_under_mesh(synth):
    """With a mesh device_put, gathered batches land sharded over 'data'
    and a train step through the mesh stays finite (the cache itself lives
    on one device; per-batch resharding is the multi-device contract)."""
    import jax

    from two_stage_object_detection_tpu.config import Config
    from two_stage_object_detection_tpu.nets.trainer import (
        create_train_state, train_step)
    from two_stage_object_detection_tpu.parallel.mesh import (
        make_mesh, replicate, shard_batch)

    mesh = make_mesh(n_data=4, n_model=1)
    ds = _dataset(synth)
    cache = DeviceDatasetCache(ds, batch_size=4,
                               device_put=lambda b: shard_batch(b, mesh))
    cfg = Config(input_size=(32, 32), num_classes=3, batch_size=4,
                 max_gt_boxes=5, n_train_pre_nms=32, n_train_post_nms=8,
                 n_test_pre_nms=16, n_test_post_nms=4, roi_n_sample=4,
                 rpn_n_sample=8, grad_accum_steps=1, compute_dtype="float32")
    _, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                  init_image_size=(32, 32))
    state = replicate(state, mesh)
    with mesh:
        batch = next(iter(cache))
        shard_axes = {d.data.shape[0]
                      for d in batch["image"].addressable_shards}
        assert shard_axes == {1}, "batch must be split over the data axis"
        state, losses = train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(losses["total"]))


def test_resident_macro_under_mesh_matches_single_device(synth):
    """Dataset sharded over the data axis + batch-sharding constraint: the
    resident macro step produces the same params/losses as the unsharded
    single-device run (in-scan gathers lower to collectives, math intact)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from two_stage_object_detection_tpu.config import Config
    from two_stage_object_detection_tpu.nets.trainer import (
        create_train_state, train_macro_step_resident)
    from two_stage_object_detection_tpu.parallel.mesh import (
        make_mesh, replicate)

    # freeze_bn: with live BN the cross-image batch statistics reduce
    # across the sharded axis and SPMD reassociation (~1e-7) is amplified
    # by the discrete NMS/argmax into different target draws — the same
    # reasoning as test_sharding.py's full-train comparison
    cfg = Config(input_size=(32, 32), num_classes=3, batch_size=4,
                 max_gt_boxes=5, n_train_pre_nms=32, n_train_post_nms=8,
                 n_test_pre_nms=16, n_test_post_nms=4, roi_n_sample=4,
                 rpn_n_sample=8, grad_accum_steps=2, fused_accum=True,
                 compute_dtype="float32", freeze_bn=True)
    mesh = make_mesh(n_data=4, n_model=1)
    ds = _dataset(synth)
    plain = DeviceDatasetCache(ds, batch_size=4, seed=5)
    sharded = DeviceDatasetCache(
        ds, batch_size=4, seed=5,
        data_sharding=NamedSharding(mesh, P("data")))
    # 7 images pad to 8 over 4 devices; padding rows are never selected
    assert sharded.data["image"].shape[0] == 8
    assert plain.data["image"].shape[0] == 7
    idx = jnp.asarray(plain.epoch_indices()[:2])
    rng = jax.random.PRNGKey(9)

    _, s1 = create_train_state(cfg, jax.random.PRNGKey(0),
                               init_image_size=(32, 32))
    _, s2 = create_train_state(cfg, jax.random.PRNGKey(0),
                               init_image_size=(32, 32))
    s2 = replicate(s2, mesh)
    s1, t1 = train_macro_step_resident(s1, plain.data, idx, rng,
                                       device_augment=True)
    s2, t2 = train_macro_step_resident(
        s2, sharded.data, idx, rng, device_augment=True,
        batch_sharding=NamedSharding(mesh, P("data")))
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2),
                               rtol=1e-5, atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-4, atol=1e-5),
        s1.params, jax.device_get(s2.params))


@pytest.mark.parametrize("use_predict", [False, True])
def test_fused_resident_eval_matches_per_batch(synth, use_predict):
    """collect_predictions over a DeviceDatasetCache (one-dispatch
    eval_scan_resident) == the legacy per-batch loop on the same batches."""
    import jax

    from two_stage_object_detection_tpu.config import Config
    from two_stage_object_detection_tpu.eval.evaluator import (
        collect_predictions)
    from two_stage_object_detection_tpu.nets.trainer import create_train_state

    cfg = Config(input_size=(32, 32), num_classes=3, batch_size=2,
                 max_gt_boxes=5, n_train_pre_nms=32, n_train_post_nms=8,
                 n_test_pre_nms=16, n_test_post_nms=4, roi_n_sample=4,
                 rpn_n_sample=8, max_detections=8, compute_dtype="float32")
    ds = _dataset(synth)
    cache = DeviceDatasetCache(ds, batch_size=2, shuffle=False)
    _, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                  init_image_size=(32, 32))
    p1, g1, l1 = collect_predictions(state, cache, cfg,
                                     use_predict=use_predict)
    batches = list(cache)       # legacy path: a plain list of batches
    p2, g2, l2 = collect_predictions(state, batches, cfg,
                                     use_predict=use_predict)
    assert len(p1) == len(p2) == cache.n - cache.n % 2
    np.testing.assert_allclose(l1, l2, rtol=1e-6)
    for (b1, s1, c1), (b2, s2, c2) in zip(p1, p2):
        np.testing.assert_allclose(b1, b2, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(c1, c2)
    for (b1, c1), (b2, c2) in zip(g1, g2):
        np.testing.assert_array_equal(b1, b2)
        np.testing.assert_array_equal(c1, c2)


def test_train_step_from_cache(synth):
    """One device-augmented train step straight off the cache: finite loss."""
    import jax

    from two_stage_object_detection_tpu.config import Config
    from two_stage_object_detection_tpu.nets.trainer import (
        create_train_state, train_step)

    cfg = Config(input_size=(32, 32), num_classes=3, batch_size=2,
                 max_gt_boxes=5, n_train_pre_nms=32, n_train_post_nms=8,
                 n_test_pre_nms=16, n_test_post_nms=4, roi_n_sample=4,
                 rpn_n_sample=8, grad_accum_steps=1,
                 compute_dtype="float32", device_augment=True,
                 transfer_uint8=True, cache_device=True)
    ds = _dataset(synth)
    cache = DeviceDatasetCache(ds, batch_size=2, seed=1)
    _, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                  init_image_size=(32, 32))
    batch = next(iter(cache))
    state, losses = train_step(state, batch, jax.random.PRNGKey(1),
                               device_augment=True)
    assert np.isfinite(float(losses["total"]))


def test_empty_shard_raises_clear_error(synth):
    """A shard with zero images must fail with a descriptive ValueError,
    not an IndexError deep in the stacking code (and must not be the
    MemoryError type that triggers the silent streaming fallback)."""
    ds = _dataset(synth)
    with pytest.raises(ValueError, match="empty"):
        DeviceDatasetCache(ds, batch_size=1, shard_count=len(ds) + 1,
                           shard_index=len(ds))
