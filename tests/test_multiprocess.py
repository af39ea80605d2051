"""Multi-process (multi-host) SPMD integration: 2 controllers, 4 devices.

The reference is single-process single-GPU (SURVEY §2: no torch.distributed
anywhere); this pins the rebuild's multi-controller story end to end — two
OS processes with 2 virtual CPU devices each join one gloo coordination
service and run the full ``train()`` driver on a shared synthetic dataset:

* the global (data=4) mesh spans both processes (``parallel/mesh.py:
  auto_mesh`` multi-process branch, process-balanced device selection),
* each process's ``Loader`` decodes a disjoint half of every epoch and
  contributes it via ``make_array_from_process_local_data``
  (``shard_batch(local=True)``),
* XLA's gradient psum rides the cross-process collective backend — final
  params must agree bitwise across processes,
* eval batches are replicated input / all-gathered predictions, so both
  processes compute identical mAP and make the same best-ckpt decision,
* Orbax checkpoint saves are issued by both processes and coordinated.

Marked slow: spawns subprocesses that each compile the train step.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_train_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_train_driver(tmp_path):
    from two_stage_object_detection_tpu.data.synthetic import (
        generate_synthetic_coco)
    generate_synthetic_coco(str(tmp_path / "data"), split="train2017",
                            num_images=8, num_classes=3, image_size=(64, 64))
    generate_synthetic_coco(str(tmp_path / "data"), split="val2017",
                            num_images=4, num_classes=3, image_size=(64, 64))

    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("XLA_", "JAX_"))}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), "2", str(port), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1200)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"

    results = {}
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out[-2000:]
        r = json.loads(lines[-1][len("RESULT "):])
        results[r["pid"]] = r
    assert set(results) == {0, 1}

    r0, r1 = results[0], results[1]
    # gradient psum keeps both controllers' params in lockstep
    assert r0["params_checksum"] == r1["params_checksum"], (r0, r1)
    # all-gathered eval -> identical metrics and best-ckpt decisions
    assert r0["min_eval_loss"] == r1["min_eval_loss"]
    import math
    assert math.isfinite(r0["min_eval_loss"])
    assert r0["step"] == r1["step"] > 0
    # coordinated Orbax saves landed both checkpoints + the sidecar
    for name in ("FasterRCNNTrainer_best", "FasterRCNNTrainer_last",
                 "train_meta.json"):
        assert name in r0["ckpts"], r0["ckpts"]
