"""Training driver.

Equivalent of reference ``train/train.py:38-180`` with the same surface:
epoch loop with tqdm, gradient accumulation, periodic eval sweep over IoU
thresholds 0.5:0.05:0.95 -> mAP@{.5,.95,.5:.95}, best/last checkpoints, and
the EMA-smoothed loss plots — but the whole optimisation step is one jitted
XLA program and the input pipeline feeds fixed-shape device batches.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from two_stage_object_detection_tpu.config import Config, load_config
from two_stage_object_detection_tpu.data.coco import load_coco
from two_stage_object_detection_tpu.data.pipeline import DetectionDataset, Loader
from two_stage_object_detection_tpu.eval.evaluator import evaluate_sweep
from two_stage_object_detection_tpu.nets.trainer import (
    create_train_state, train_macro_step, train_macro_step_resident,
    train_step)
from two_stage_object_detection_tpu.parallel.mesh import (
    auto_mesh, auto_mesh_spatial, place_train_state, replicate, shard_batch,
    shard_batch_spatial)
from two_stage_object_detection_tpu.utils import checkpoint as ckpt
from two_stage_object_detection_tpu.utils.draw import plot_training_metrics
from two_stage_object_detection_tpu.utils.preemption import PreemptionGuard
from two_stage_object_detection_tpu.utils.utils import set_seed, update_ema

logging.basicConfig(level=logging.INFO)
log = logging.getLogger(__name__)


def build_loaders(cfg: Config, data_root: str = "data", device_put=None,
                  mesh=None, spatial: bool = False, eval_device_put=None):
    """COCO loaders following the reference's path layout
    (``dataset/data_organise.py:13-15``: ``data/annotations/instances_{split}2017.json``).

    ``device_put``: placement callable for produced batches (defaults to
    single-device ``jax.device_put``; ``train`` passes a mesh-sharding one
    on multi-device backends).  ``eval_device_put`` overrides placement for
    the eval loader — multi-process runs need it because eval batches are
    the SAME full batch on every process (``shard_batch(local=False)``)
    while train batches are disjoint per-process shards."""
    train_idx = load_coco(
        os.path.join(data_root, "annotations", "instances_train2017.json"),
        os.path.join(data_root, "train2017"), ratio=cfg.train_ratio)
    eval_idx = load_coco(
        os.path.join(data_root, "annotations", "instances_val2017.json"),
        os.path.join(data_root, "val2017"), ratio=cfg.eval_ratio)
    train_ds = DetectionDataset(train_idx, cfg.input_size, cfg.max_gt_boxes,
                                train=cfg.augment,
                                decode_only=cfg.device_augment,
                                cache=cfg.cache_decoded,
                                cache_max_bytes=cfg.cache_max_bytes,
                                uint8_images=cfg.transfer_uint8)
    eval_ds = DetectionDataset(eval_idx, cfg.input_size, cfg.max_gt_boxes,
                               train=False, decode_only=cfg.device_augment,
                               cache=cfg.cache_decoded,
                               cache_max_bytes=cfg.cache_max_bytes,
                               uint8_images=cfg.transfer_uint8)
    # device_put in the producer thread overlaps host->device transfer of
    # batch k+1 with step k (the reference's pinned-memory double buffering)
    # on a multi-host slice each process feeds a disjoint shard of every
    # TRAIN epoch (same seeded global order everywhere, no coordination
    # traffic).  The EVAL loader is deliberately NOT sharded: every process
    # iterates the full eval set so mAP/eval_loss — and the best-checkpoint
    # decision keyed on them — are bitwise identical across processes
    # (divergent per-shard metrics would race the _best checkpoint).
    mk = lambda ds, sh, shards, put=None: Loader(
        ds, cfg.batch_size, shuffle=sh,
        num_workers=cfg.num_workers,
        prefetch=cfg.prefetch_factor,
        device_put=put or device_put or jax.device_put,
        worker_mode=cfg.worker_mode,
        persistent_workers=cfg.persistent_workers,
        shard_count=jax.process_count() if shards else 1,
        shard_index=jax.process_index() if shards else 0)
    if cfg.cache_device and jax.process_count() > 1:
        # Multi-host residency is not supported: each process would pin a
        # different local shard while a global NamedSharding expects every
        # process to contribute slices of the SAME global array, and the
        # per-process epoch index draws would diverge under SPMD.  The
        # streaming Loader has well-defined per-process shard semantics.
        log.warning("cache_device=True is single-controller only "
                    "(process_count=%d) — falling back to streaming Loader",
                    jax.process_count())
    elif cfg.cache_device:
        # HBM-resident datasets: decode once, gather batches on device —
        # host + wire leave the steady-state loop (data/device_cache.py)
        if not cfg.device_augment:
            raise ValueError("cache_device=True requires device_augment=True "
                             "(the cache is epoch-invariant; augmentation "
                             "must run on device)")
        from two_stage_object_detection_tpu.data.device_cache import (
            DeviceDatasetCache)
        # on a (non-spatial) mesh, pin the dataset sharded over the data
        # axis — each chip's HBM holds its slice; the resident macro step's
        # in-scan gathers become XLA collectives
        data_sharding = None
        if mesh is not None and not spatial:
            from jax.sharding import NamedSharding, PartitionSpec
            data_sharding = NamedSharding(mesh, PartitionSpec("data"))
        # gathered batches already live on the right devices: without a
        # mesh they sit on the default device (pass NO per-batch placement,
        # so train() takes the one-dispatch resident path); with a mesh the
        # pinned leaves are sharded over 'data' and device_put reshard
        # applies only on the streaming-iteration fallback
        mk_cached = lambda ds, sh: DeviceDatasetCache(
            ds, cfg.batch_size, shuffle=sh, seed=0,
            max_bytes=cfg.cache_device_max_bytes,
            num_workers=cfg.num_workers,
            device_put=None if mesh is None else device_put,
            data_sharding=data_sharding)
        try:
            return mk_cached(train_ds, True), mk_cached(eval_ds, False), eval_idx
        except MemoryError as e:
            log.warning("cache_device: %s — falling back to streaming Loader",
                        e)
    return (mk(train_ds, True, True),
            mk(eval_ds, False, False, put=eval_device_put), eval_idx)


def train(visualization: bool = True, cfg: Optional[Config] = None,
          data_root: str = "data", weights_dir: str = "weights",
          pre_train: bool = False, resume: bool = False,
          eval_period: int = 10, seed: int = 42, mesh="auto",
          spatial: bool = False, guard: Optional[PreemptionGuard] = None):
    """Run the full training loop (reference ``train()`` signature kept).

    ``mesh``: ``"auto"`` builds a data-parallel mesh over every available
    device (SURVEY §2 "TPU-native equivalents to build": batch parallelism
    via jax.sharding; the mean-gradient psum is inserted by XLA).  Pass
    ``None`` to force single-device, or an explicit ``jax.sharding.Mesh``.

    ``spatial``: shard image *height* over the mesh's ``model`` axis in
    addition to batch over ``data`` (small-batch / large-image work: a
    batch smaller than the device count still uses every chip; XLA inserts
    the conv halo exchanges).  With ``mesh="auto"`` the mesh is then built
    by :func:`auto_mesh_spatial`; params/optimizer are replicated.

    ``resume``: restore the FULL train state (params, batch stats,
    optimiser moments, step counter) from the ``_last`` checkpoint and
    continue from the next epoch — crash/preemption recovery.  The
    reference *saves* optimizer+scheduler state in ``_last.pth``
    (``train/train.py:136-143``) but has no code path that reloads it;
    ``pre_train`` keeps its reference semantics (best-ckpt weights only,
    fresh optimiser, ``train/train.py:60-72``).

    ``guard``: a :class:`~.utils.preemption.PreemptionGuard` (one is
    created if omitted).  SIGTERM — the cloud spot/preemptible notice —
    stops the loop at the next step boundary, saves the full ``_last``
    checkpoint, and returns; ``train(resume=True)`` then continues.  A
    mid-epoch preemption resumes exactly where it stopped: the epoch's
    deterministic batch order is replayed and the first ``step %
    steps_per_epoch`` batches are skipped (never re-applied), the loader
    epoch counter is restored, and step RNGs derive from ``fold_in(seed,
    epoch, step)`` so the resumed run's shuffle/augmentation stream equals
    an uninterrupted run's.
    """
    # env-driven multi-controller bring-up (JAX_COORDINATOR_ADDRESS etc.);
    # no-op on a single-process run or when already initialised.  Must
    # precede any other jax use so the backend sees the global topology.
    from two_stage_object_detection_tpu.parallel.multiprocess import (
        init_distributed)
    init_distributed()
    cfg = cfg or load_config()
    from two_stage_object_detection_tpu.utils.compile_cache import maybe_enable
    maybe_enable(cfg.compilation_cache)
    set_seed(seed)
    rng = jax.random.PRNGKey(seed)

    if spatial and jax.process_count() > 1:
        # spatial sharding is single-controller: the model axis carries
        # image rows, and auto_mesh_spatial has no process-balanced
        # layout (put_local would scatter one process's rows across
        # hosts).  Data parallelism composes with multi-process instead.
        log.warning("spatial=True is single-controller only "
                    "(process_count=%d) — using data parallelism",
                    jax.process_count())
        spatial = False
    if mesh == "auto":
        mesh = (auto_mesh_spatial(cfg.batch_size) if spatial
                else auto_mesh(cfg.batch_size))
    spatial = spatial and mesh is not None and mesh.shape.get("model", 1) > 1
    eval_put = None
    if mesh is not None:
        put = lambda batch: (shard_batch_spatial(batch, mesh) if spatial
                             else shard_batch(batch, mesh))
        # eval batches are the SAME full batch on every process (the eval
        # loader is unsharded so metrics/best-ckpt decisions agree), so
        # multi-process placement slices rather than concatenates
        eval_put = lambda batch: (
            shard_batch_spatial(batch, mesh, local=False) if spatial
            else shard_batch(batch, mesh, local=False))
        log.info("training on %d devices (%d processes), mesh=%s%s",
                 mesh.devices.size, jax.process_count(), dict(mesh.shape),
                 " (spatial: image height over 'model')" if spatial else "")
    else:
        put = jax.device_put

    train_loader, eval_loader, _ = build_loaders(cfg, data_root,
                                                 device_put=put, mesh=mesh,
                                                 spatial=spatial,
                                                 eval_device_put=eval_put)
    steps_per_epoch = max(len(train_loader), 1)

    rng, init_rng = jax.random.split(rng)
    model, state = create_train_state(cfg, init_rng,
                                      steps_per_epoch=steps_per_epoch)
    # spatial mode replicates params (the model axis carries image rows,
    # not parameter shards); plain mesh mode uses the tensor-parallel rules
    place = (lambda s: replicate(s, mesh)) if spatial else \
        (lambda s: place_train_state(s, mesh))
    if mesh is not None:
        state = place(state)
    os.makedirs(weights_dir, exist_ok=True)

    start_epoch = 0
    skip_steps = 0   # applied micro-steps of the resumed (partial) epoch
    min_eval_loss = float("inf")   # global best (the reference resets this
    # every eval round, train/train.py:95,120 — quirk #9, fixed)
    meta_path = os.path.join(weights_dir, "train_meta.json")
    if resume:
        restored = ckpt.restore_checkpoint(weights_dir, state, name=ckpt.LAST,
                                           params_only=False)
        if restored is not None:
            state = restored
            if mesh is not None:   # restored leaves are host arrays
                state = place(state)
            # TrainState.step counts micro-steps; continue inside the
            # epoch that was interrupted, skipping the batches already
            # applied (the per-epoch order is deterministic, so replaying
            # the order and dropping the first `skip_steps` reproduces an
            # uninterrupted run instead of double-applying them)
            start_epoch = min(int(state.step) // steps_per_epoch,
                              cfg.num_epochs)
            if start_epoch < cfg.num_epochs:
                skip_steps = int(state.step) % steps_per_epoch
            # restore the global-best eval loss so the first post-resume
            # eval doesn't unconditionally overwrite the _best checkpoint
            if os.path.exists(meta_path):
                with open(meta_path) as f:
                    min_eval_loss = float(
                        json.load(f).get("min_eval_loss", float("inf")))
            log.info("✅ Resumed full train state at step %d (epoch %d, "
                     "best eval loss %.4f)",
                     int(state.step), start_epoch, min_eval_loss)
    elif pre_train:
        restored = ckpt.restore_checkpoint(weights_dir, state, name=ckpt.BEST,
                                           params_only=True)
        if restored is not None:
            state = restored
            if mesh is not None:   # restored leaves are host arrays
                state = place(state)
            log.info("✅ Successfully loaded pretrained model")

    try:
        from tqdm import tqdm
    except ImportError:  # pragma: no cover
        tqdm = lambda it, **kw: it

    train_loss, eval_loss = [], []
    mAP50_list, mAP50_95_list, mAP95_list = [], [], []

    def _eval_and_checkpoint():
        nonlocal min_eval_loss
        # pass the loader object (not a raw iterator): an HBM-resident
        # eval cache then takes the fused one-dispatch path
        sweep = evaluate_sweep(state, lambda: eval_loader, cfg)
        mAP50_list.append(sweep["mAP50"])
        mAP95_list.append(sweep["mAP95"])
        mAP50_95_list.append(sweep["mAP50_95"])
        eval_loss.append(sweep["eval_loss"])
        if sweep["eval_loss"] < min_eval_loss:
            min_eval_loss = sweep["eval_loss"]
            ckpt.save_checkpoint(weights_dir, state, name=ckpt.BEST)
            log.info("✅ Best model saved to %s", weights_dir)
        log.info("eval: mAP_50%%: %.4f, mAP_50%%_95%%: %.4f, mAP_95%%: %.4f",
                 sweep["mAP50"], sweep["mAP50_95"], sweep["mAP95"])
        # periodic full-state save so ``resume=True`` can recover a
        # crashed/preempted run (the reference writes _last only at
        # the very end, train/train.py:136-143); the sidecar carries
        # the global-best eval loss across the restart.  wait=False:
        # the disk write overlaps the next epoch's steps (crash-resume
        # saves need no read-after-write; the final save below waits)
        ckpt.save_checkpoint(weights_dir, state, name=ckpt.LAST, wait=False)
        # the sidecar is identical on every process (eval is unsharded and
        # deterministic) — process 0 writes to avoid interleaved writers
        if jax.process_index() == 0:
            with open(meta_path, "w") as f:
                json.dump({"min_eval_loss": min_eval_loss}, f)

    from two_stage_object_detection_tpu.data.device_cache import (
        DeviceDatasetCache)

    guard = guard or PreemptionGuard()
    preempted = False
    # deterministic per-epoch/per-step rng: step rngs derive from
    # fold_in(base, epoch, step-in-epoch) rather than a sequential split
    # chain, so a resumed run draws the SAME augmentation stream as an
    # uninterrupted one (a split chain has no random access — a resume
    # would restart it at its epoch-0 position)
    if hasattr(train_loader, "epoch"):
        train_loader.epoch = start_epoch   # restore the shuffle-order clock
    with guard:
        for epoch in range(start_epoch, cfg.num_epochs):
            # losses stay device-side during the epoch: a per-step float()
            # would force a blocking device->host roundtrip (~30 ms on a
            # remote runtime, docs/DESIGN.md) inside the hot loop.  The
            # scalars are fetched in one batch at epoch end for the plots.
            pending = []
            erng = jax.random.fold_in(rng, epoch)
            step_rng_at = lambda s: jax.random.fold_in(erng, s)
            skip = skip_steps if epoch == start_epoch else 0
            aug = cfg.device_augment and cfg.augment
            fused_k = (cfg.grad_accum_steps
                       if cfg.fused_accum and cfg.grad_accum_steps > 1 else 0)
            resident = (fused_k and isinstance(train_loader, DeviceDatasetCache)
                        and (train_loader.device_put is None
                             or train_loader.data_sharding is not None))
            if resident:
                # HBM-resident fast path: the scan gathers each micro-batch
                # from the pinned dataset, so one accumulation cycle = one
                # dispatch carrying only a [K,B] index array.  On a mesh the
                # dataset is sharded over 'data' and the gathered batches are
                # constrained to the usual batch-over-data layout.
                bsh = None
                if train_loader.data_sharding is not None:
                    from jax.sharding import NamedSharding, PartitionSpec
                    bsh = NamedSharding(mesh, PartitionSpec("data"))

                def _eager(sel, s):
                    batch = {k: jnp.take(v, jnp.asarray(sel), axis=0)
                             for k, v in train_loader.data.items()}
                    if bsh is not None:
                        batch = {k: jax.device_put(v, bsh)
                                 for k, v in batch.items()}
                    st, losses = train_step(state, batch, step_rng_at(s),
                                            device_augment=aug)
                    return st, losses["total"]

                idx = train_loader.epoch_indices()
                whole = len(idx) - len(idx) % fused_k
                # a resume whose skip lands mid-cycle (possible when the
                # interrupted run used a different accumulation layout)
                # realigns to the next cycle boundary with eager steps
                realign = min(whole, skip + (-skip) % fused_k)
                for s in range(min(skip, whole), realign):
                    state, tot = _eager(idx[s], s)
                    pending.append(tot)
                for c in tqdm(range(realign, whole, fused_k),
                              desc=f"Epoch {epoch + 1}/{cfg.num_epochs}",
                              colour="green"):
                    if guard.should_stop():
                        preempted = True
                        break
                    state, totals = train_macro_step_resident(
                        state, train_loader.data, jnp.asarray(idx[c:c + fused_k]),
                        step_rng_at(c), device_augment=aug, batch_sharding=bsh)
                    pending.append(totals)
                if not preempted:
                    # leftover partial cycle: eager
                    for s in range(max(whole, skip), len(idx)):
                        state, tot = _eager(idx[s], s)
                        pending.append(tot)
                train_loss.extend(float(v) for arr in jax.device_get(pending)
                                  for v in np.atleast_1d(arr))
                if preempted:
                    break
                if epoch % eval_period == 0:
                    _eval_and_checkpoint()
                continue
            loop = tqdm(train_loader, total=steps_per_epoch,
                        desc=f"Epoch {epoch + 1}/{cfg.num_epochs}", colour="green")
            buf = []
            for i, batch in enumerate(loop):
                if i < skip:    # already applied before the preemption
                    continue
                if guard.should_stop():
                    preempted = True
                    break
                if fused_k:
                    # fused accumulation: stack K device batches and run the
                    # whole cycle as one lax.scan dispatch (trainer.py:
                    # train_macro_step) — K-1 fewer host roundtrips per update
                    buf.append(batch)
                    if len(buf) == fused_k:
                        sb = jax.tree_util.tree_map(
                            lambda *xs: jnp.stack(xs), *buf)
                        buf = []
                        state, totals = train_macro_step(
                            state, sb, step_rng_at(i + 1 - fused_k),
                            device_augment=aug)
                        pending.append(totals)
                    continue
                state, losses = train_step(state, batch, step_rng_at(i),
                                           device_augment=aug)
                pending.append(losses["total"])
            if not preempted:
                for j, batch in enumerate(buf):  # leftover partial cycle: eager
                    state, losses = train_step(
                        state, batch, step_rng_at(steps_per_epoch + j),
                        device_augment=aug)
                    pending.append(losses["total"])
            train_loss.extend(float(v) for arr in jax.device_get(pending)
                              for v in np.atleast_1d(arr))
            if preempted:
                break

            if epoch % eval_period == 0:
                _eval_and_checkpoint()

        ckpt.save_checkpoint(weights_dir, state, name=ckpt.LAST)
        if preempted:
            log.warning("⚠️ Preempted at step %d — full state saved to %s; "
                        "train(resume=True) continues this run",
                        int(state.step), weights_dir)
        else:
            log.info("✅ Last model saved to %s", weights_dir)

    if visualization and train_loss:
        ema_alpha = 0.01
        ema_train = []
        for i, v in enumerate(train_loss):
            ema_train.append(v if i == 0 else update_ema(v, ema_alpha, ema_train[-1]))
        ema_eval = []
        for i, v in enumerate(eval_loss):
            ema_eval.append(v if i == 0 else update_ema(v, ema_alpha, ema_eval[-1]))
        plot_training_metrics(
            epoch_num=cfg.num_epochs, step_num=list(range(len(train_loss))),
            train_loss=train_loss, ema_train_loss=ema_train,
            eval_loss=eval_loss, ema_eval_loss=ema_eval,
            mAP50_list=mAP50_list, mAP50_95_list=mAP50_95_list,
            mAP95_list=mAP95_list)

    return state


if __name__ == "__main__":
    train()
