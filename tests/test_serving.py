"""Serving surface: AOT bucketed Predictor, mesh serving, StableHLO export."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_detector import tiny_config
from two_stage_object_detection_tpu.nets.trainer import (
    create_train_state, predict_step)
from two_stage_object_detection_tpu.serving import (
    Predictor, export_stablehlo, load_exported)


@pytest.fixture(scope="module")
def served():
    cfg = tiny_config()
    _, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                  init_image_size=(32, 32))
    return cfg, state


def _images(rng, n, cfg):
    h, w = cfg.input_size
    return rng.rand(n, h, w, 3).astype(np.float32)


def test_predictor_matches_predict_step(served, rng):
    cfg, state = served
    pred = Predictor(cfg, state.params, state.batch_stats, batch_sizes=(2,))
    imgs = _images(rng, 2, cfg)
    out = pred(imgs)
    want = jax.device_get(predict_step(state, jnp.asarray(imgs)))
    for got, ref in zip((out[k] for k in ("boxes", "scores", "labels",
                                          "valid")), want):
        np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_predictor_pads_and_chunks(served, rng):
    cfg, state = served
    pred = Predictor(cfg, state.params, state.batch_stats, batch_sizes=(1, 4))
    # n=3 -> one padded 4-bucket; n=6 -> 4 + padded-to-4; n=1 -> 1-bucket
    for n in (3, 6, 1):
        imgs = _images(rng, n, cfg)
        out = pred(imgs)
        assert out["boxes"].shape == (n, cfg.max_detections, 4)
        want = jax.device_get(predict_step(state, jnp.asarray(imgs)))
        np.testing.assert_allclose(out["boxes"], np.asarray(want[0]),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(out["valid"], np.asarray(want[3]))


def test_predictor_plan_largest_first(served):
    """Awkward request sizes chunk by cheapest bucket combination: 9 images
    with buckets (1, 8, 16) run as 8+1, not one padded 16 (round-2 verdict);
    7 images still prefer one padded 8 over seven b=1 dispatches."""
    cfg, state = served
    pred = Predictor(cfg, state.params, state.batch_stats, batch_sizes=(1, 2))
    # emulate the (1, 8, 16) bucket set without compiling it: the plan only
    # reads batch_sizes
    pred.batch_sizes = (1, 8, 16)
    assert sorted(pred._plan(9)) == [1, 8]
    assert pred._plan(7) == (8,)
    assert pred._plan(16) == (16,)
    assert sorted(pred._plan(17)) == [1, 16]
    assert sorted(pred._plan(32)) == [16, 16]
    assert pred._plan(1) == (1,)


def test_predictor_measured_cost_routing(served, rng):
    """calibrate=True: the plan routes by measured per-bucket latency —
    when b=2 measures faster than b=1 (real on v5e hardnet39s), a 1-image
    request pads into the 2-bucket; results stay correct through padding."""
    cfg, state = served
    pred = Predictor(cfg, state.params, state.batch_stats,
                     batch_sizes=(1, 2), calibrate=True)
    assert set(pred._bucket_ms) == {1, 2}
    assert all(v > 0 for v in pred._bucket_ms.values())
    # pin the measured table both ways (hardware-independent assertions);
    # the plan memo is per-instance (a class-level lru_cache would pin
    # retired Predictors — params + AOT executables — for process life)
    pred._plan_memo.clear()
    pred._bucket_ms = {1: 11.8, 2: 7.8}
    assert pred._plan(1) == (2,)
    assert sorted(pred._plan(3)) == [2, 2]
    pred._plan_memo.clear()
    pred._bucket_ms = {1: 3.0, 2: 7.8}
    assert pred._plan(1) == (1,)
    # correctness through the padded route
    pred._plan_memo.clear()
    pred._bucket_ms = {1: 11.8, 2: 7.8}
    imgs = rng.rand(1, *cfg.input_size, 3).astype(np.float32)
    out = pred(imgs)
    from two_stage_object_detection_tpu.nets.trainer import predict_step
    want = jax.device_get(predict_step(state, jnp.asarray(imgs)))
    np.testing.assert_allclose(out["boxes"], np.asarray(want[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(out["valid"], np.asarray(want[3]))


@pytest.mark.slow
def test_predictor_chunked_9_matches(served, rng):
    """End-to-end: a 9-image request over (1, 4) buckets returns the same
    results as predict_step, exercising the multi-bucket plan."""
    cfg, state = served
    pred = Predictor(cfg, state.params, state.batch_stats, batch_sizes=(1, 4))
    imgs = _images(rng, 9, cfg)
    runs = []
    orig = pred._run_bucket
    pred._run_bucket = lambda b, im: runs.append(b) or orig(b, im)
    out = pred(imgs)
    assert sorted(runs) == [1, 4, 4]        # 9 -> 4+4+1, not 4+4+pad-4
    assert out["boxes"].shape == (9, cfg.max_detections, 4)
    want = jax.device_get(predict_step(state, jnp.asarray(imgs)))
    np.testing.assert_allclose(out["boxes"], np.asarray(want[0]),
                               rtol=1e-5, atol=1e-5)


def test_predictor_rejects_wrong_shape(served, rng):
    cfg, state = served
    pred = Predictor(cfg, state.params, state.batch_stats, batch_sizes=(1,))
    with pytest.raises(ValueError, match="static"):
        pred(rng.rand(1, 32, 32, 3).astype(np.float32))


@pytest.mark.slow
def test_mesh_predictor_matches_single_device(served, rng):
    from two_stage_object_detection_tpu.parallel.mesh import make_mesh
    cfg, state = served
    mesh = make_mesh(n_data=8, n_model=1)
    sharded = Predictor(cfg, state.params, state.batch_stats,
                        batch_sizes=(8,), mesh=mesh)
    plain = Predictor(cfg, state.params, state.batch_stats, batch_sizes=(8,))
    imgs = _images(rng, 8, cfg)
    a, b = sharded(imgs), plain(imgs)
    np.testing.assert_allclose(a["boxes"], b["boxes"], rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(a["valid"], b["valid"])


def test_export_roundtrip(served, rng, tmp_path):
    cfg, state = served
    path = os.path.join(tmp_path, "frcnn.stablehlo")
    nbytes = export_stablehlo(cfg, state.params, state.batch_stats, path,
                              batch_size=2)
    assert nbytes == os.path.getsize(path) > 0
    fn = load_exported(path)
    imgs = _images(rng, 2, cfg)
    got = fn(jnp.asarray(imgs))
    want = jax.device_get(predict_step(state, jnp.asarray(imgs)))
    for g, wnt in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(wnt),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_predictor_from_checkpoint(served, rng, tmp_path):
    from two_stage_object_detection_tpu.utils import checkpoint as ckpt
    cfg, state = served
    path = str(tmp_path / "weights")
    os.makedirs(path, exist_ok=True)
    ckpt.save_checkpoint(path, state, name=ckpt.BEST)
    pred = Predictor.from_checkpoint(path, cfg, batch_sizes=(2,))
    imgs = _images(rng, 2, cfg)
    out = pred(imgs)
    want = jax.device_get(predict_step(state, jnp.asarray(imgs)))
    np.testing.assert_allclose(out["boxes"], np.asarray(want[0]),
                               rtol=1e-5, atol=1e-5)
    with pytest.raises(FileNotFoundError):
        Predictor.from_checkpoint(str(tmp_path / "nope"), cfg)


# ----------------------------------------------------------- DynamicBatcher
def test_dynamic_batcher_matches_direct(served, rng):
    """Results routed through the batcher equal the direct predictor call."""
    from two_stage_object_detection_tpu.serving import DynamicBatcher
    cfg, state = served
    pred = Predictor(cfg, state.params, state.batch_stats, batch_sizes=(1, 4))
    imgs = _images(rng, 3, cfg)
    want = pred(imgs)
    with DynamicBatcher(pred, max_wait_ms=20.0) as dyn:
        futs = [dyn.submit(imgs[i]) for i in range(3)]
        outs = [f.result(timeout=60) for f in futs]
    for i, out in enumerate(outs):
        assert out["boxes"].shape == (1, cfg.max_detections, 4)
        for k in ("boxes", "scores", "labels", "valid"):
            np.testing.assert_allclose(out[k], want[k][i:i + 1],
                                       rtol=1e-5, atol=1e-5)


def test_dynamic_batcher_concurrent_threads(served, rng):
    """Many submitters on threads: every future resolves, shapes correct,
    and per-request results match a solo run (collation is order-safe)."""
    import threading
    from two_stage_object_detection_tpu.serving import DynamicBatcher
    cfg, state = served
    pred = Predictor(cfg, state.params, state.batch_stats, batch_sizes=(1, 4))
    reqs = [_images(rng, n, cfg) for n in (1, 2, 1, 3, 1, 2)]
    want = [pred(r) for r in reqs]
    results = [None] * len(reqs)
    with DynamicBatcher(pred, max_wait_ms=10.0) as dyn:
        def go(i):
            results[i] = dyn.submit(reqs[i]).result(timeout=60)
        ts = [threading.Thread(target=go, args=(i,)) for i in range(len(reqs))]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
    for got, ref, req in zip(results, want, reqs):
        assert got["boxes"].shape == (req.shape[0], cfg.max_detections, 4)
        np.testing.assert_allclose(got["boxes"], ref["boxes"],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(got["valid"], ref["valid"])


def test_dynamic_batcher_close_flushes_pending(served, rng):
    """close() completes queued work rather than dropping it."""
    from two_stage_object_detection_tpu.serving import DynamicBatcher
    cfg, state = served
    pred = Predictor(cfg, state.params, state.batch_stats, batch_sizes=(4,))
    dyn = DynamicBatcher(pred, max_wait_ms=10_000.0)   # never flush by time
    fut = dyn.submit(_images(rng, 2, cfg))
    dyn.close()
    out = fut.result(timeout=0)        # resolved by the closing flush
    assert out["boxes"].shape == (2, cfg.max_detections, 4)
    with pytest.raises(RuntimeError):
        dyn.submit(_images(rng, 1, cfg))


def test_dynamic_batcher_rejects_wrong_shape(served, rng):
    from two_stage_object_detection_tpu.serving import DynamicBatcher
    cfg, state = served
    pred = Predictor(cfg, state.params, state.batch_stats, batch_sizes=(1,))
    with DynamicBatcher(pred) as dyn:
        with pytest.raises(ValueError):
            dyn.submit(np.zeros((1, 8, 8, 3), np.float32))


# ------------------------------------------------------------- uint8 wire
def test_predictor_u8_wire_matches_f32(served, rng):
    """wire='u8' results equal the f32 predictor fed images/255."""
    from two_stage_object_detection_tpu.serving import Predictor as P
    cfg, state = served
    u8 = rng.randint(0, 256, (2, *cfg.input_size, 3)).astype(np.uint8)
    pred_f = P(cfg, state.params, state.batch_stats, batch_sizes=(2,))
    pred_u = P(cfg, state.params, state.batch_stats, batch_sizes=(2,),
               wire="u8")
    want = pred_f(u8.astype(np.float32) / 255.0)
    got = pred_u(u8)
    for k in ("boxes", "scores", "labels", "valid"):
        np.testing.assert_allclose(got[k], want[k], rtol=1e-5, atol=1e-5)


def test_predictor_u8_wire_rejects_float(served, rng):
    from two_stage_object_detection_tpu.serving import Predictor as P
    cfg, state = served
    pred = P(cfg, state.params, state.batch_stats, batch_sizes=(1,),
             wire="u8")
    with pytest.raises(ValueError):
        pred(_images(rng, 1, cfg))
    with pytest.raises(ValueError):
        P(cfg, state.params, state.batch_stats, wire="u16")


def test_predictor_u8_dynamic_batcher(served, rng):
    """u8 wire composes with the DynamicBatcher."""
    from two_stage_object_detection_tpu.serving import (DynamicBatcher,
                                                        Predictor as P)
    cfg, state = served
    pred = P(cfg, state.params, state.batch_stats, batch_sizes=(1, 4),
             wire="u8")
    u8 = rng.randint(0, 256, (3, *cfg.input_size, 3)).astype(np.uint8)
    want = pred(u8)
    with DynamicBatcher(pred, max_wait_ms=20.0) as dyn:
        outs = [f.result(timeout=60)
                for f in [dyn.submit(u8[i]) for i in range(3)]]
    for i, out in enumerate(outs):
        np.testing.assert_allclose(out["boxes"], want["boxes"][i:i + 1],
                                   rtol=1e-5, atol=1e-5)


def test_dynamic_batcher_survives_cancelled_future(served, rng):
    """A client-cancelled future must not kill the worker thread
    (set_result on a cancelled future raises InvalidStateError): later
    requests still complete (round-3 review finding)."""
    from two_stage_object_detection_tpu.serving import DynamicBatcher
    cfg, state = served
    pred = Predictor(cfg, state.params, state.batch_stats, batch_sizes=(4,))
    with DynamicBatcher(pred, max_wait_ms=200.0) as dyn:
        doomed = dyn.submit(_images(rng, 1, cfg))
        assert doomed.cancel()
        live = dyn.submit(_images(rng, 2, cfg))
        out = live.result(timeout=60)
        assert out["boxes"].shape == (2, cfg.max_detections, 4)
    assert doomed.cancelled()


def test_dynamic_batcher_rejects_wrong_dtype(served, rng):
    """Per-request dtype validation: one bad submit must not poison the
    collated flush for everyone else."""
    from two_stage_object_detection_tpu.serving import (DynamicBatcher,
                                                        Predictor as P)
    cfg, state = served
    pred_f = P(cfg, state.params, state.batch_stats, batch_sizes=(1,))
    pred_u = P(cfg, state.params, state.batch_stats, batch_sizes=(1,),
               wire="u8")
    u8 = rng.randint(0, 256, (1, *cfg.input_size, 3)).astype(np.uint8)
    with DynamicBatcher(pred_f) as dyn:
        with pytest.raises(ValueError):
            dyn.submit(u8)
    with DynamicBatcher(pred_u) as dyn:
        with pytest.raises(ValueError):
            dyn.submit(_images(rng, 1, cfg))
    # direct f32 Predictor also refuses uint8 (255x-scaled pixels)
    with pytest.raises(ValueError):
        pred_f(u8)


# ------------------------------------------------------------ yuv420 wire
def test_yuv420_pack_unpack_reference_roundtrip(served, rng):
    """Host pack -> device unpack equals the numpy reference unpack, and
    the reconstruction is lossless (to u8 rounding) on images whose chroma
    is constant per 2x2 block — i.e. on anything a 4:2:0 JPEG produced."""
    from two_stage_object_detection_tpu.serving import (
        _yuv420_unpack, rgb_to_yuv420, yuv420_to_rgb_reference)
    cfg, _ = served
    h, w = cfg.input_size
    u8 = rng.randint(0, 256, (2, h, w, 3)).astype(np.uint8)
    packed = rgb_to_yuv420(u8)
    assert packed.shape == (2, h + h // 2, w) and packed.dtype == np.uint8
    ref = yuv420_to_rgb_reference(packed, h, w)
    dev = np.asarray(jax.jit(
        lambda p: _yuv420_unpack(p, h, w))(jnp.asarray(packed)))
    np.testing.assert_allclose(dev, ref, rtol=0, atol=1e-6)

    # 4:2:0-subsampled content: upscale a half-res image 2x (every 2x2
    # block constant, so the box-averaged chroma is exact) and check the
    # wire is transparent up to the +-2/255 of two u8 roundings
    small = rng.randint(0, 256, (1, h // 2, w // 2, 3)).astype(np.uint8)
    blocky = np.repeat(np.repeat(small, 2, axis=1), 2, axis=2)
    rec = yuv420_to_rgb_reference(rgb_to_yuv420(blocky), h, w)
    assert np.abs(rec * 255.0 - blocky.astype(np.float32)).max() <= 2.0


def test_predictor_yuv420_wire_matches_f32_on_reconstruction(served, rng):
    """wire='yuv420' results equal the f32 predictor fed the reference
    reconstruction of the same packed planes (the wire is deterministic:
    whatever chroma subsampling discards, both paths see identical
    pixels)."""
    from two_stage_object_detection_tpu.serving import (
        Predictor as P, rgb_to_yuv420, yuv420_to_rgb_reference)
    cfg, state = served
    h, w = cfg.input_size
    u8 = rng.randint(0, 256, (2, h, w, 3)).astype(np.uint8)
    packed = rgb_to_yuv420(u8)
    pred_f = P(cfg, state.params, state.batch_stats, batch_sizes=(2,))
    pred_y = P(cfg, state.params, state.batch_stats, batch_sizes=(2,),
               wire="yuv420")
    want = pred_f(yuv420_to_rgb_reference(packed, h, w))
    got_rgb = pred_y(u8)            # RGB request, packed internally
    got_packed = pred_y(packed)     # pre-packed planes pass through
    for k in ("boxes", "scores", "labels", "valid"):
        np.testing.assert_allclose(got_rgb[k], want[k], rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(got_rgb[k], got_packed[k])


def test_predictor_yuv420_pads_chunks_and_batcher(served, rng):
    """yuv420 chunking pads with black (128-chroma) planes and composes
    with the DynamicBatcher (submit packs in the client thread; flushes
    concatenate packed planes)."""
    from two_stage_object_detection_tpu.serving import (DynamicBatcher,
                                                        Predictor as P)
    cfg, state = served
    pred = P(cfg, state.params, state.batch_stats, batch_sizes=(1, 4),
             wire="yuv420")
    u8 = rng.randint(0, 256, (3, *cfg.input_size, 3)).astype(np.uint8)
    want = pred(u8)                 # n=3 -> one padded 4-bucket
    assert want["boxes"].shape == (3, cfg.max_detections, 4)
    with DynamicBatcher(pred, max_wait_ms=20.0) as dyn:
        outs = [f.result(timeout=60)
                for f in [dyn.submit(u8[i]) for i in range(3)]]
    for i, out in enumerate(outs):
        np.testing.assert_allclose(out["boxes"], want["boxes"][i:i + 1],
                                   rtol=1e-4, atol=1e-4)


def test_predictor_yuv420_rejects_bad_requests(served, rng):
    from two_stage_object_detection_tpu.serving import Predictor as P
    cfg, state = served
    pred = P(cfg, state.params, state.batch_stats, batch_sizes=(1,),
             wire="yuv420")
    with pytest.raises(ValueError):
        pred(_images(rng, 1, cfg))          # float RGB
    with pytest.raises(ValueError):
        pred(np.zeros((1, 7, 7), np.uint8))  # wrong packed shape


@pytest.mark.slow
def test_predictor_fpn_matches_predict_step(rng):
    """The serving surface works unchanged for the FPN variant."""
    cfg = tiny_config(backbone="resnet34", fpn=True, fpn_channels=32,
                      fpn_fc_dim=64)
    _, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                  init_image_size=(32, 32))
    pred = Predictor(cfg, state.params, state.batch_stats, batch_sizes=(2,))
    imgs = _images(rng, 2, cfg)
    out = pred(imgs)
    want = jax.device_get(predict_step(state, jnp.asarray(imgs)))
    for got, ref in zip((out[k] for k in ("boxes", "scores", "labels",
                                          "valid")), want):
        np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-5, atol=1e-5)
