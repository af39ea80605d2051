"""Single-source configuration.

The reference scatters configuration over a flat ``configs/config.json`` read
independently at import time by five modules (reference ``configs/config.json:1-11``,
``nets/rpn.py:11-15``, ``dataset/dataloader.py:12-21``, ...) plus hard-coded
constants in drivers.  Here everything lives in one frozen dataclass that is
loaded once and passed explicitly; the public JSON file format (same keys) is
still accepted by :func:`load_config`.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Sequence, Tuple

# Public JSON keys kept compatible with the reference configs/config.json.
_JSON_KEYS = (
    "num_epochs",
    "lr",
    "train_ratio",
    "eval_ratio",
    "device",
    "num_workers",
    "prefetch_factor",
    "persistent_workers",
    "batch_size",
)


@dataclasses.dataclass(frozen=True)
class Config:
    """All framework hyper-parameters (training recipe + network contract)."""

    # ---- public config.json surface (reference configs/config.json) ----
    num_epochs: int = 2
    lr: float = 1e-3
    train_ratio: float = 0.0001
    eval_ratio: float = 0.001
    device: str = "tpu"
    num_workers: int = 12
    prefetch_factor: int = 8
    persistent_workers: bool = True
    batch_size: int = 16

    # ---- network contract (reference train/train.py:18-21, nets/rpn.py:21-26) ----
    num_classes: int = 80          # foreground classes; background adds +1
    input_size: Tuple[int, int] = (600, 600)        # (H, W)
    feat_stride: int = 16
    anchor_base_size: int = 8
    anchor_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    anchor_scales: Sequence[float] = (8.0, 16.0, 32.0)

    # proposal generation (reference nets/rpn.py:21-26)
    rpn_nms_iou: float = 0.7
    n_train_pre_nms: int = 12000
    n_train_post_nms: int = 600
    n_test_pre_nms: int = 3000
    n_test_post_nms: int = 300
    proposal_min_size: float = 16.0

    # target assignment (reference nets/frcnn_training.py:23,114)
    rpn_n_sample: int = 256
    rpn_pos_iou_thresh: float = 0.7
    rpn_neg_iou_thresh: float = 0.3
    rpn_pos_ratio: float = 0.5
    roi_n_sample: int = 128
    roi_pos_ratio: float = 0.5
    roi_pos_iou_thresh: float = 0.5
    roi_neg_iou_thresh_high: float = 0.5
    roi_neg_iou_thresh_low: float = 0.0
    # loc-target normalization: the reference *accepts* these stds but the
    # normalization itself is commented out (nets/frcnn_training.py:170), so
    # the shipped behaviour is OFF.  loc_normalize=True enables the standard
    # Faster R-CNN scheme: RoI regression targets divided by the stds during
    # training, predictions multiplied back before decode (train and predict
    # stay consistent automatically — both read this flag).
    loc_normalize: bool = False
    loc_normalize_std: Tuple[float, float, float, float] = (0.1, 0.1, 0.2, 0.2)

    # head (reference nets/classify.py:17, nets/frcnn_training.py:213-217)
    roi_size: int = 7
    # "pool": reference RoIPool-max parity; "align": bilinear RoIAlign
    # (quality option); "mean": adaptive-bin averaging on the MXU (fastest
    # train path; train and eval must use the same mode)
    roi_pool_mode: str = "pool"

    # inference (true predict path; reference lacks one — nets/frcnn.py is
    # dead). predict_nms_iou matches the reference's final inference NMS
    # (IoU 0.1, multi_inference.py:84); raise it (e.g. 0.3-0.5) for less
    # aggressive suppression on crowded scenes.
    score_thresh: float = 0.05
    predict_nms_iou: float = 0.1
    max_detections: int = 100
    # hardnet{39,68,85}[s]|resnet{34,50,101}|resnext50 — the "s" suffix is
    # the TPU-native strided HarDNet (true stride-2 downs; ~3.3x cheaper
    # fwd+bwd than the reference's all-150x150 layout, same output contract)
    backbone: str = "hardnet39"
    backbone_channels: int = 512   # informational only (profiling scripts); model shapes are inferred

    # ---- FPN variant (beyond-reference capability; nets/fpn.py) ----
    # fpn=True runs the standard Feature-Pyramid-Network extension of
    # Faster R-CNN: multi-scale backbone taps (C2..C5) -> FPN neck ->
    # shared RPN head over P2..P6 with one anchor octave per level ->
    # multi-level RoIAlign + 2-FC box head.  Requires a backbone with a
    # real pyramid: resnet* or the strided hardnet*s variants (the
    # reference hardnet layout holds every block at one spatial size).
    # anchor_ratios still set the aspect ratios; anchor_scales is ignored
    # (per-level octaves replace the 3-scale single-map table).
    fpn: bool = False
    fpn_channels: int = 256           # neck/pyramid feature width
    fpn_anchor_scale: float = 8.0     # anchor side = scale * 2**level px
    fpn_min_level: int = 2            # P2 (stride 4)
    fpn_max_level: int = 6            # P6 (stride 64, RPN-only)
    fpn_canonical_level: int = 4      # RoI level assignment anchor point
    fpn_canonical_size: float = 224.0
    fpn_fc_dim: int = 1024            # box-head MLP width
    # multi-level RoIAlign mode: each roi pools a [window, window] slice of
    # its assigned level (1.7x the dense 4-level blend at fpn_infer scale;
    # a Pallas DMA+matmul kernel serves the predict path on TPU).  0 = dense.
    fpn_roi_window: int = 32
    # span-aware level assignment: rois whose long side overflows the
    # window at their eq.-1 level (37% of real test-time proposals,
    # ABLATE_REAL.json) pool one level coarser instead of edge-clamping,
    # so windowed pooling is exact for every roi on images <= window *
    # stride_max px.  Off reproduces the plain eq.-1 assignment.
    fpn_span_aware: bool = True

    # losses (reference nets/frcnn_training.py:198-199, train/train.py:86-92)
    rpn_sigma: float = 1.0
    roi_sigma: float = 1.0
    grad_accum_steps: int = 32
    weight_decay: float = 1e-4
    cosine_t_max: int = 5
    # freeze BatchNorm statistics during training (capability parity with the
    # reference's FasterRCNN.freeze_bn, nets/frcnn.py:56-59)
    freeze_bn: bool = False

    # data pipeline
    max_gt_boxes: int = 100        # static padding of per-image GT boxes
    # loader worker pool: "thread" (C++ decode releases the GIL) or
    # "process" (reference DataLoader-worker parity, dataset/dataloader.py:63-74)
    worker_mode: str = "thread"
    # run the training augmentation chain on device (host does only the C++
    # decode+resize) — lifts the host input ceiling ~4x on few-core hosts
    device_augment: bool = False
    # keep decoded images in RAM as u8 so epochs after the first skip JPEG
    # decode (the dominant host cost on few-core hosts); insertion stops at
    # cache_max_bytes — see data/pipeline.py:DetectionDataset
    cache_decoded: bool = False
    cache_max_bytes: int = 4 << 30
    # pin the whole (per-host shard of the) training set in HBM as u8 and
    # build batches with an on-device gather — the host and the wire leave
    # the steady-state loop entirely (data/device_cache.py).  Requires
    # device_augment; falls back to the streaming Loader with a warning if
    # the shard exceeds cache_device_max_bytes
    cache_device: bool = False
    cache_device_max_bytes: int = 8 << 30
    # ship pixels host->device as u8 and convert to f32 on device — 4x less
    # host->device traffic (69 -> 17 MB at batch 16, 600x600), <=1/510
    # per-pixel quantisation; the decisive factor on transfer-limited hosts
    transfer_uint8: bool = False
    # run each grad_accum_steps accumulation cycle as ONE lax.scan dispatch
    # (nets/trainer.py:train_macro_step) — amortises per-step host dispatch
    # overhead on remote/attached hosts
    fused_accum: bool = False
    # disable the training augmentation chain entirely (overfit/parity
    # experiments; the reference's train transform is hard-wired,
    # dataset/transform.py:4-12)
    augment: bool = True

    # TPU execution
    compute_dtype: str = "bfloat16"   # conv/matmul compute dtype; params stay f32
    mesh_data_axis: str = "data"
    mesh_model_axis: str = "model"
    # Pallas kernels on the hot path: "auto" uses them on TPU backends and
    # falls back to the jnp reference implementations on CPU
    pallas: str = "auto"              # "auto" | "on" | "off"  (proposal kernel)
    # RoI pooling kernel choice: XLA fuses the masked-max formulation well
    # (measured 2.0ms vs 5.0ms for the Pallas kernel, 128 rois @ 38x38x512),
    # so the Pallas variant is opt-in
    pallas_roi: bool = False
    # RoI max-pool backward: "xla" autodiff (default), "structured"
    # (hand-written VJP, same values/tie semantics), or "pallas"
    # (roi_pool_fast — bounded VMEM where XLA's transposed reduce can
    # materialise a [R,P,H,W,C] broadcast; use if training OOMs).
    # Round 2's structured VJP beat autodiff (274 vs 296 ms/step) only
    # because it gave tied maxima the FULL cotangent; with the round-3
    # tie-count normalization (correct semantics) it measures 316 vs
    # autodiff's 295.8, so autodiff is the default again
    roi_bwd: str = "xla"
    # rematerialise HarDBlocks in the backward pass (jax.checkpoint): trades
    # one extra block forward for the dense-concat activation memory —
    # required for train batches >16 at 600x600 on a single v5e
    remat_backbone: bool = False
    # persistent XLA compilation cache directory ("" = off): repeat runs of
    # an identical recipe — model-server restarts, preemption resumes —
    # load their compiled programs from disk instead of paying the 18-40 s
    # cold XLA compile (utils/compile_cache.py; the drivers honor this)
    compilation_cache: str = ""

    @property
    def n_anchors_per_cell(self) -> int:
        return len(self.anchor_ratios) * len(self.anchor_scales)

    @property
    def feat_size(self) -> Tuple[int, int]:
        """Feature-map (H, W): stride-16 conv chain on a 600x600 input -> 38x38.

        (ceil division per stride-2 conv with k=3 p=1: 600->300->150->75->38;
        the reference's comments claim 37x37 but the real torch shapes are 38x38.)
        """
        h, w = self.input_size
        for _ in range(4):
            h = (h + 1) // 2
            w = (w + 1) // 2
        return (h, w)

    @property
    def num_anchors(self) -> int:
        fh, fw = self.feat_size
        return fh * fw * self.n_anchors_per_cell

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def load_config(path: str | None = None, **overrides) -> Config:
    """Load a :class:`Config`, optionally merging a reference-format JSON file."""
    kw = {}
    if path is None:
        default = os.path.join(os.path.dirname(os.path.dirname(__file__)), "configs", "config.json")
        path = default if os.path.exists(default) else None
    if path is not None:
        with open(path, "r") as f:
            raw = json.load(f)
        for k in _JSON_KEYS:
            if k in raw:
                kw[k] = raw[k]
        # allow extended keys in the JSON too
        for k, v in raw.items():
            if k not in _JSON_KEYS and k in {f.name for f in dataclasses.fields(Config)}:
                kw[k] = v
    kw.update(overrides)
    return Config(**kw)
