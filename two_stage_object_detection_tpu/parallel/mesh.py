"""Device mesh construction and batch sharding.

The reference is single-process single-GPU (``configs/config.json:6``,
SURVEY §2 "parallelism strategies: none").  Here training scales over a
``jax.sharding.Mesh`` with a ``data`` axis (batch parallelism; the mean
gradient's ``psum`` is inserted by XLA because the whole train step is one
jitted program) and an optional ``model`` axis for tensor-parallel parameter
sharding (see :mod:`.sharding`).  Collectives ride ICI — there is no
host-side communication code at all.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (n_data, n_model, len(devices))
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def shard_batch(batch, mesh: Mesh, local: bool = True):
    """Place a pytree of batch arrays with the leading axis split over ``data``.

    Single-process: plain ``device_put``.  Multi-process, the two data
    conventions the drivers use (see :mod:`.multiprocess`):

    * ``local=True`` (default) — each process passes only ITS batch (the
      disjoint shard its ``Loader`` decoded); the global batch is the
      process-order concatenation, ``process_count`` x larger.
    * ``local=False`` — every process passes the SAME full batch (the
      unsharded eval loader); each uploads just its addressable slice.
    """
    from two_stage_object_detection_tpu.parallel.multiprocess import (
        put_global, put_local)
    sharding = NamedSharding(mesh, P("data"))
    put = put_local if local else put_global
    return jax.tree_util.tree_map(lambda x: put(x, sharding), batch)


def shard_batch_spatial(batch, mesh: Mesh, local: bool = True):
    """Data + spatial partitioning: batch over ``data``, image **height**
    over ``model``.

    ``local`` follows :func:`shard_batch`'s multi-process convention (each
    process passes its disjoint batch shard vs. the same full batch); the
    ``model`` axis must lie within a process, which :func:`make_mesh`'s
    process-major device order guarantees when the per-process device
    count is a multiple of ``n_model``.

    XLA's SPMD partitioner inserts the halo exchanges that the backbone's
    3x3 convolutions need at the shard boundaries — spatial parallelism
    without any hand-written communication.  Only the 4-D image tensor is
    spatially split; per-image labels stay batch-sharded.
    """
    from two_stage_object_detection_tpu.parallel.multiprocess import (
        put_global, put_local)
    img_sh = NamedSharding(mesh, P("data", "model"))
    other_sh = NamedSharding(mesh, P("data"))
    put = put_local if local else put_global
    return {
        k: put(v, img_sh if getattr(v, "ndim", 0) == 4 else other_sh)
        for k, v in batch.items()
    }


def replicate(tree, mesh: Mesh):
    """Replicate a pytree over every device of the mesh.

    Multi-process safe: every process holds the full host value (same-seed
    init / restored checkpoint), so replication is a :func:`put_global`.
    """
    from two_stage_object_detection_tpu.parallel.multiprocess import put_global
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: put_global(x, sharding), tree)


def auto_mesh(batch_size: int, n_model: int = 1,
              devices=None) -> Optional[Mesh]:
    """Default training mesh: data-parallel over as many devices as the batch
    divides into (times an optional tensor-parallel ``model`` factor).

    Returns ``None`` on a single device (plain ``jax.device_put`` placement
    is then the right thing — no mesh overhead).
    """
    devices = devices if devices is not None else jax.devices()
    if len(devices) <= 1 and n_model == 1:
        return None
    nproc = jax.process_count()
    if nproc > 1:
        # multi-controller: batch_size is PER PROCESS (each process's
        # Loader shard), so the data axis is (per-process factor) x nproc
        # with each process's batch rows staying on its own chips
        # (put_local's layout).  Prefer a factor whose GLOBAL data axis
        # also divides one plain batch — the unsharded eval loader splits
        # a single batch_size batch over the whole axis; fall back to a
        # train-only divisor when batch_size % nproc != 0.
        cap_local = max(len(devices) // nproc // n_model, 1)
        ok_eval = [d for d in range(1, cap_local + 1)
                   if batch_size % (d * nproc) == 0]
        d_local = max(ok_eval) if ok_eval else max(
            d for d in range(1, cap_local + 1) if batch_size % d == 0)
        n_data = d_local * nproc
        # balanced selection: the first d_local*n_model devices OF EACH
        # process, in process order — devices[:n] would truncate unevenly
        # (all of process 0's chips, none of the last's)
        per_proc: dict = {}
        for dev in devices:
            per_proc.setdefault(dev.process_index, []).append(dev)
        devices = [d for p in sorted(per_proc)
                   for d in per_proc[p][: d_local * n_model]]
    else:
        cap = max(len(devices) // n_model, 1)
        n_data = max(d for d in range(1, cap + 1) if batch_size % d == 0)
    if n_data * n_model <= 1:
        return None
    return make_mesh(n_data=n_data, n_model=n_model, devices=devices)


def auto_mesh_spatial(batch_size: int, devices=None) -> Optional[Mesh]:
    """Mesh for data+spatial parallelism (small-batch / large-image work):
    ``data`` = the largest divisor of ``batch_size`` that fits the device
    count, ``model`` = every remaining device, used to shard image *height*
    (:func:`shard_batch_spatial`).  A batch-1 request on 8 chips gets a
    (1, 8) mesh — one image's rows spread over all chips, halo exchanges
    inserted by XLA's SPMD partitioner."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n <= 1:
        return None
    # largest divisor of batch_size that ALSO divides the device count:
    # greedily maximising data alone can strand chips AND kill the spatial
    # axis (batch 6 on 8 chips -> (6,1): 2 idle, no height sharding;
    # this picks (2,4): all 8 chips, spatial stays active)
    n_data = max(d for d in range(1, n + 1)
                 if batch_size % d == 0 and n % d == 0)
    n_model = n // n_data
    return make_mesh(n_data=n_data, n_model=n_model, devices=devices)


def place_train_state(state, mesh: Mesh, infer_param_sharding=None):
    """Place a TrainState on ``mesh``: params via the tensor-parallel rules
    (full replication when the ``model`` axis is 1), everything else
    replicated.  XLA inserts the gradient ``psum`` because the whole train
    step is one jitted program over sharded inputs."""
    from two_stage_object_detection_tpu.parallel.multiprocess import put_global
    if infer_param_sharding is None:
        from two_stage_object_detection_tpu.parallel.sharding import (
            infer_param_sharding)
    param_sh = infer_param_sharding(state.params, mesh)
    # put_global: every process holds the full host value (same-seed init
    # or restored checkpoint), so multi-process placement needs no comm
    params = jax.tree_util.tree_map(put_global, state.params, param_sh)
    return state.replace(
        params=params,
        batch_stats=replicate(state.batch_stats, mesh),
        opt_state=replicate(state.opt_state, mesh),
    )
