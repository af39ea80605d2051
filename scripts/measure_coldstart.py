#!/usr/bin/env python
"""Measure cold vs warm process start with the persistent compile cache.

The compile-cache module's whole justification (utils/compile_cache.py) is
that a restarted process — server redeploy, preemption resume, cron re-run
— skips XLA compilation entirely.  This script measures it: two child
processes against the SAME fresh cache directory run the default-config
jitted predict (hardnet39, 600x600) to first result; the first pays the real
compile, the second loads the program from disk.  Writes the ``coldstart``
row into BENCH_DETAILS.json.

Usage: python scripts/measure_coldstart.py [batch]   (default 16)
"""

import json
import os
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(cache_dir: str, batch: int) -> None:
    t_start = time.perf_counter()
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ROOT)
    from two_stage_object_detection_tpu.config import Config
    from two_stage_object_detection_tpu.nets.detector import FasterRCNN
    from two_stage_object_detection_tpu.utils import compile_cache

    compile_cache.enable(cache_dir)
    cfg = Config()
    model = FasterRCNN(cfg)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    images = jnp.zeros((batch, *cfg.input_size, 3), jnp.float32)
    fn = jax.jit(lambda v, im: model.apply(v, im, method="predict"))
    t0 = time.perf_counter()
    jax.block_until_ready(fn(variables, images))
    print(json.dumps({
        "to_first_predict_s": round(time.perf_counter() - t0, 2),
        "process_total_s": round(time.perf_counter() - t_start, 2),
    }))


def main(batch: int = 16) -> None:
    cache_dir = tempfile.mkdtemp(prefix="coldstart_cache_")
    runs = {}
    for phase in ("cold", "warm"):
        t0 = time.perf_counter()
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", cache_dir,
             str(batch)],
            capture_output=True, text=True, cwd=ROOT, timeout=3600)
        wall = time.perf_counter() - t0
        if out.returncode != 0:
            sys.stderr.write(out.stderr)
            raise SystemExit(f"{phase} child failed rc={out.returncode}")
        row = json.loads(out.stdout.strip().splitlines()[-1])
        row["wall_s"] = round(wall, 2)
        runs[phase] = row
        print(f"{phase}: {row}", flush=True)

    detail = {
        "what": "process start to first jitted predict (hardnet39 default "
                "config, 600x600), cold vs warm persistent compile cache",
        "batch": batch,
        "cold": runs["cold"],
        "warm": runs["warm"],
        "compile_saved_s": round(runs["cold"]["to_first_predict_s"]
                                 - runs["warm"]["to_first_predict_s"], 2),
    }
    path = os.path.join(ROOT, "BENCH_DETAILS.json")
    details = json.load(open(path)) if os.path.exists(path) else {}
    details["coldstart"] = detail
    with open(path, "w") as f:
        json.dump(details, f, indent=1)
    print(json.dumps({"coldstart": detail}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], int(sys.argv[3]))
    else:
        main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
