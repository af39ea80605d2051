"""Serving load test: DynamicBatcher vs per-request dispatch.

Drives the Predictor with many concurrent single-image requests (the
production traffic shape the reference cannot serve at all — its
``multi_inference.py`` is a GT-requiring training-graph script) and
measures what cross-request dynamic batching buys:

* **direct**: each client thread calls ``Predictor(img)`` itself (the
  calls serialize on the device; each pays its own dispatch + padding).
* **dynamic**: clients submit to one :class:`DynamicBatcher`
  (``serving.py``), which collates concurrent requests into shared
  padded-bucket dispatches.

Prints p50/p95/p99 latency and aggregate throughput for both, and with
``BENCH_RECORD=1`` merges a ``serve_dynamic`` row into BENCH_DETAILS.json.

Usage:  python scripts/serve_load.py [n_requests] [n_clients]
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_load(pred, n_requests, n_clients, submit):
    """Each of ``n_clients`` threads fires its share of single-image
    requests back-to-back; returns per-request latencies + wall time."""
    lat = [None] * n_requests
    idx = iter(range(n_requests))
    lock = threading.Lock()

    def client(imgs):
        while True:
            with lock:
                i = next(idx, None)
            if i is None:
                return
            t0 = time.perf_counter()
            submit(imgs[i % len(imgs)])
            lat[i] = time.perf_counter() - t0

    rng = np.random.RandomState(0)
    h, w = pred.cfg.input_size
    if pred.wire in ("u8", "yuv420"):
        imgs = rng.randint(0, 256, (8, 1, h, w, 3), dtype=np.uint8)
    else:
        imgs = rng.rand(8, 1, h, w, 3).astype(np.float32)
    threads = [threading.Thread(target=client, args=(imgs,))
               for _ in range(n_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    return np.array(lat), wall


def stats(name, lat, wall, n):
    ms = np.percentile(lat * 1e3, [50, 95, 99])
    print(f"{name:8s}: p50 {ms[0]:7.1f} ms  p95 {ms[1]:7.1f}  "
          f"p99 {ms[2]:7.1f}  |  {n / wall:7.1f} req/s")
    return {"p50_ms": round(ms[0], 1), "p95_ms": round(ms[1], 1),
            "p99_ms": round(ms[2], 1), "req_per_sec": round(n / wall, 1)}


def main():
    n_requests = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_clients = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import jax
    from two_stage_object_detection_tpu.config import Config
    from two_stage_object_detection_tpu.nets.trainer import create_train_state
    from two_stage_object_detection_tpu.serving import (DynamicBatcher,
                                                        Predictor)

    cfg = Config(backbone=os.environ.get("BENCH_BACKBONE", "hardnet39s"),
                 roi_pool_mode=os.environ.get("BENCH_ROI", "align"))
    wire = os.environ.get("BENCH_WIRE", "f32")
    _, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                  init_image_size=(64, 64))
    print(f"compiling buckets ({cfg.backbone}/{cfg.roi_pool_mode}, "
          f"wire={wire})...", flush=True)
    pred = Predictor(cfg, state.params, state.batch_stats,
                     batch_sizes=(1, 8, 16, 32), calibrate=True, wire=wire)
    print("bucket ms:", {k: round(v, 1) for k, v in pred._bucket_ms.items()},
          flush=True)

    # warm both paths once
    run_load(pred, 16, 4, lambda im: pred(im))
    out = {"n_requests": n_requests, "n_clients": n_clients,
           "backbone": cfg.backbone, "wire": wire,
           # calibrated per-bucket request roundtrip (upload+run+download):
           # the stable wire-cost evidence — loaded req/s also rides the
           # shared tunnel's minute-to-minute weather
           "bucket_roundtrip_ms": {
               k: round(v, 1) for k, v in pred._bucket_ms.items()}}

    lat, wall = run_load(pred, n_requests, n_clients, lambda im: pred(im))
    out["direct"] = stats("direct", lat, wall, n_requests)

    for wait_ms in (2.0, 5.0):
        with DynamicBatcher(pred, max_wait_ms=wait_ms) as dyn:
            run_load(pred, 16, 4, lambda im: dyn.submit(im).result())  # warm
            lat, wall = run_load(pred, n_requests, n_clients,
                                 lambda im: dyn.submit(im).result())
        out[f"dynamic_{wait_ms:g}ms"] = stats(
            f"dyn {wait_ms:g}ms", lat, wall, n_requests)

    if os.environ.get("BENCH_RECORD") == "1":
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_DETAILS.json")
        detail = json.load(open(path)) if os.path.exists(path) else {}
        detail["serve_dynamic" + ("" if wire == "f32" else f"_{wire}")] = out
        with open(path, "w") as f:
            json.dump(detail, f, indent=2)
        print("recorded -> BENCH_DETAILS.json serve_dynamic")


if __name__ == "__main__":
    main()
