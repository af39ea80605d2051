"""Standalone evaluation driver: score a checkpoint on the val set.

The reference can only evaluate *inside* a training run (``eval_fn`` is
called from the epoch loop, ``train/train.py:94-117``; there is no way to
score an existing checkpoint without constructing the optimizer and
entering ``train()``).  This driver loads a saved checkpoint and runs the
full mAP@[.5:.95] sweep on the validation annotations — through either the
reference's trainer-graph protocol or the true inference path — without
touching the training loop.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax

from two_stage_object_detection_tpu.config import Config, load_config
from two_stage_object_detection_tpu.data.coco import load_coco
from two_stage_object_detection_tpu.data.pipeline import (
    DetectionDataset, Loader)
from two_stage_object_detection_tpu.eval.evaluator import evaluate_sweep
from two_stage_object_detection_tpu.nets.trainer import create_train_state
from two_stage_object_detection_tpu.utils import checkpoint as ckpt
from two_stage_object_detection_tpu.utils.compile_cache import maybe_enable

logging.basicConfig(level=logging.INFO)
log = logging.getLogger(__name__)


def build_eval_loader(cfg: Config, data_root: str = "data"):
    """Validation loader (COCO layout, reference
    ``dataset/data_organise.py:13-15``).  With ``cfg.cache_device`` the
    set is pinned in HBM and the sweep's forward runs as one fused
    dispatch (``nets.trainer.eval_scan_resident``)."""
    eval_idx = load_coco(
        os.path.join(data_root, "annotations", "instances_val2017.json"),
        os.path.join(data_root, "val2017"), ratio=cfg.eval_ratio)
    # eval applies no augmentation, so decode_only changes nothing about
    # the pixels — but the device cache requires it as its invariant
    ds = DetectionDataset(eval_idx, cfg.input_size, cfg.max_gt_boxes,
                          train=False, decode_only=cfg.cache_device,
                          cache=cfg.cache_decoded,
                          cache_max_bytes=cfg.cache_max_bytes,
                          uint8_images=cfg.transfer_uint8)
    if cfg.cache_device and jax.process_count() == 1:
        from two_stage_object_detection_tpu.data.device_cache import (
            DeviceDatasetCache)
        try:
            return DeviceDatasetCache(
                ds, cfg.batch_size, shuffle=False,
                max_bytes=cfg.cache_device_max_bytes,
                num_workers=cfg.num_workers), eval_idx
        except MemoryError as e:
            log.warning("cache_device: %s — falling back to streaming "
                        "Loader", e)
    return Loader(ds, cfg.batch_size, shuffle=False,
                  num_workers=cfg.num_workers, prefetch=cfg.prefetch_factor,
                  worker_mode=cfg.worker_mode,
                  persistent_workers=cfg.persistent_workers), eval_idx


def evaluate_checkpoint(weights_dir: str = "weights",
                        cfg: Optional[Config] = None,
                        data_root: str = "data", name: Optional[str] = None,
                        use_predict: bool = False,
                        coco_summary: bool = False, seed: int = 0) -> dict:
    """Score ``FasterRCNNTrainer_{best,last}`` weights on the val set.

    Returns the :func:`~.eval.evaluator.evaluate_sweep` dict —
    ``mAP50`` / ``mAP95`` / ``mAP50_95`` / ``eval_loss`` (plus ``coco``
    when ``coco_summary=True``).

    ``use_predict=False`` scores through the trainer graph (the
    reference's eval protocol, ``nets/frcnn_training.py:347-370``);
    ``True`` scores the true inference path (score threshold + per-class
    NMS — what deployment actually serves).
    """
    cfg = cfg or load_config()
    maybe_enable(cfg.compilation_cache)
    loader, _ = build_eval_loader(cfg, data_root)
    _, state = create_train_state(cfg, jax.random.PRNGKey(seed))
    restored = ckpt.restore_checkpoint(weights_dir, state,
                                       name=name or ckpt.BEST,
                                       params_only=True)
    if restored is None:
        raise FileNotFoundError(
            f"no checkpoint {name or ckpt.BEST!r} under {weights_dir!r}")
    state = restored
    sweep = evaluate_sweep(state, lambda: loader, cfg,
                           use_predict=use_predict,
                           coco_summary=coco_summary)
    log.info("eval[%s]: mAP@0.5 %.4f  mAP@[.5:.95] %.4f  mAP@0.95 %.4f  "
             "loss %.4f", "predict" if use_predict else "train-graph",
             sweep["mAP50"], sweep["mAP50_95"], sweep["mAP95"],
             sweep["eval_loss"])
    if hasattr(loader, "close"):
        loader.close()
    return sweep


if __name__ == "__main__":
    evaluate_checkpoint()
