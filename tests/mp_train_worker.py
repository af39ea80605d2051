"""Worker for the 2-process SPMD integration test (test_multiprocess.py).

Each process forces a 2-virtual-device CPU backend, joins the gloo
coordination service, and runs the FULL ``train()`` driver over the shared
synthetic dataset — global mesh (data=4), per-process disjoint Loader
shards, cross-process gradient psum, all-gathered eval, coordinated Orbax
checkpoints.  Prints one JSON line of results for the parent to compare
across processes.

Usage: mp_train_worker.py <process_id> <num_processes> <port> <workdir>
"""

import json
import os
import sys

pid, nproc, port, workdir = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from two_stage_object_detection_tpu.parallel.multiprocess import (  # noqa: E402
    fetch_global, init_distributed)

assert init_distributed(coordinator_address=f"localhost:{port}",
                        num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 2 * nproc, jax.device_count()

import numpy as np  # noqa: E402

from two_stage_object_detection_tpu.config import Config  # noqa: E402
from two_stage_object_detection_tpu.train import train  # noqa: E402

os.chdir(workdir)
cfg = Config(
    input_size=(64, 64), num_classes=3, batch_size=4, max_gt_boxes=4,
    n_train_pre_nms=128, n_train_post_nms=32, n_test_pre_nms=64,
    n_test_post_nms=16, roi_n_sample=8, rpn_n_sample=32, max_detections=8,
    grad_accum_steps=1, compute_dtype="float32", num_epochs=2,
    train_ratio=1.0, eval_ratio=1.0, num_workers=2,
)
state = train(visualization=False, cfg=cfg, data_root="data",
              weights_dir="weights", eval_period=1, seed=7, mesh="auto")

# every process must hold the SAME final params (the gradient psum is the
# only thing keeping them in lockstep) and the same sidecar metrics
params = fetch_global(state.params)
leaves = jax.tree_util.tree_leaves(params)
checksum = float(sum(np.float64(np.sum(np.abs(l))) for l in leaves))
with open(os.path.join("weights", "train_meta.json")) as f:
    meta = json.load(f)
print("RESULT " + json.dumps({
    "pid": pid,
    "params_checksum": checksum,
    "min_eval_loss": meta["min_eval_loss"],
    "step": int(state.step),
    "ckpts": sorted(p for p in os.listdir("weights")),
}), flush=True)
