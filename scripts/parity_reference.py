#!/usr/bin/env python
"""mAP-parity experiment: corrected torch reference vs this framework.

The north star is ">=5x images/sec *at matched VOC-style mAP*"
(BASELINE.json).  This script provides the quality half:

1. runs the *corrected* torch reference (the code at ``/root/reference`` has
   defects that make it uncallable/incoherent as shipped — SURVEY §3 quirks:
   batch-1-only featurisation, broken AP math, dead inference class), driven
   at batch 1 with a correct AP implementation, on a synthetic COCO set;
2. trains this framework with the same recipe on the same data;
3. converts the torch weights with :mod:`utils.torch_import` and evaluates
   them through THIS framework's eval path — the same-weights parity check;
4. prints a side-by-side mAP@0.5 table (and writes PARITY.json).

The reference is imported *in place* from ``/root/reference`` via a /tmp
shim tree (symlinks + a CPU ``config.json`` + a pure-torch stand-in for the
missing ``torchvision.ops``) — no reference code is copied anywhere.

Usage: ``python scripts/parity_reference.py [steps] [size]`` (defaults
300, 128).  CPU-heavy: the torch side runs single-threaded eager.
"""

import json
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REFERENCE = "/root/reference"
SHIM = "/tmp/refshim"

def _argv_int(i: int, default: int) -> int:
    """Positional int arg, tolerant of foreign argv (e.g. pytest importing
    this module for its shim/model builders)."""
    try:
        return int(sys.argv[i])
    except (IndexError, ValueError):
        return default


STEPS = _argv_int(1, 300)
SIZE = _argv_int(2, 128)
SEED = 0
NUM_IMAGES = 8
NUM_CLASSES = 3
LR = 1e-3
# proposals kept after NMS, both frameworks (see the latent-crash correction
# in run_torch_reference; must be >= 128 + a few so the reference's 128-roi
# sampler can fill, and <= the post-filter candidate pool so its arange pad
# stays in bounds)
POST_NMS = 200
# Anchor sizes matched to the dataset, passed through BOTH frameworks' own
# constructor parameters (reference FasterRCNNTrainer(anchor_scales=...),
# frcnn_training.py:193; our Config.anchor_scales): the default [8,16,32]
# at base 8 means 64-256 px anchors — sized for 600x600 COCO, hopeless for
# 16-64 px objects on these 128x128 fixtures (only the one forced-positive
# anchor per GT ever matches, so RPN regression barely trains on either side).
ANCHOR_SCALES = (2, 4, 8)


# --------------------------------------------------------------------- shim
def build_shim():
    """Symlink the reference's module files into /tmp with a CPU config.

    The reference resolves ``configs/config.json`` relative to each module's
    ``__file__`` (e.g. ``nets/rpn.py:11``), so symlinked modules read OUR
    config — letting us set ``device: cpu`` without touching the read-only
    checkout.
    """
    import shutil
    if os.path.isdir(SHIM):
        shutil.rmtree(SHIM)
    for pkg in ("nets", "utils", "models"):
        os.makedirs(os.path.join(SHIM, pkg))
        # packages in the reference have no __init__.py except empty ones;
        # create empty ones so imports work without cwd tricks
        open(os.path.join(SHIM, pkg, "__init__.py"), "w").close()
        src = os.path.join(REFERENCE, pkg)
        for f in os.listdir(src):
            if f.endswith(".py") and f != "__init__.py":
                os.symlink(os.path.join(src, f), os.path.join(SHIM, pkg, f))
    os.makedirs(os.path.join(SHIM, "configs"))
    with open(os.path.join(SHIM, "configs", "config.json"), "w") as f:
        json.dump({"num_epochs": 1, "lr": LR, "train_ratio": 1.0,
                   "eval_ratio": 1.0, "device": "cpu", "num_workers": 0,
                   "prefetch_factor": 2, "persistent_workers": False,
                   "batch_size": 1}, f)


def install_torchvision_stub():
    """Pure-torch ``torchvision.ops`` (nms + RoIPool): torchvision is not
    installed in this container; these match its documented semantics."""
    import torch

    def nms(boxes, scores, iou_threshold):
        order = torch.argsort(scores, descending=True)
        keep = []
        while order.numel() > 0:
            i = order[0]
            keep.append(i.item())
            if order.numel() == 1:
                break
            rest = order[1:]
            tl = torch.maximum(boxes[i, :2], boxes[rest, :2])
            br = torch.minimum(boxes[i, 2:], boxes[rest, 2:])
            wh = (br - tl).clamp(min=0)
            inter = wh[:, 0] * wh[:, 1]
            area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            area_r = (boxes[rest, 2] - boxes[rest, 0]) * \
                (boxes[rest, 3] - boxes[rest, 1])
            iou = inter / (area_i + area_r - inter + 1e-8)
            order = rest[iou <= iou_threshold]
        return torch.as_tensor(keep, dtype=torch.long)

    class RoIPool(torch.nn.Module):
        def __init__(self, output_size, spatial_scale):
            super().__init__()
            self.p = output_size if isinstance(output_size, int) \
                else output_size[0]
            self.scale = spatial_scale

        def forward(self, feats, rois):
            # rois: [K, 5] (batch_idx, x1, y1, x2, y2)
            import torch
            import torch.nn.functional as F
            n, c, h, w = feats.shape
            p = self.p
            out = torch.zeros(rois.shape[0], c, p, p)
            r = torch.round(rois[:, 1:] * self.scale).long()
            for k in range(rois.shape[0]):
                b = int(rois[k, 0])
                x1, y1, x2, y2 = r[k].tolist()
                sx, sy = max(x2 - x1, 1), max(y2 - y1, 1)
                # Fast path: a fully in-bounds window pooled with floor/ceil
                # bin edges is exactly adaptive max pooling on the crop
                # (verified bit-identical vs the per-bin loop below).
                if 0 <= y1 and y1 + sy <= h and 0 <= x1 and x1 + sx <= w:
                    out[k] = F.adaptive_max_pool2d(
                        feats[b:b + 1, :, y1:y1 + sy, x1:x1 + sx], p)[0]
                    continue
                for py in range(p):
                    ys = min(max(py * sy // p + y1, 0), h)
                    ye = min(max(-((py + 1) * sy // -p) + y1, 0), h)
                    for px in range(p):
                        xs = min(max(px * sx // p + x1, 0), w)
                        xe = min(max(-((px + 1) * sx // -p) + x1, 0), w)
                        if ye > ys and xe > xs:
                            out[k, :, py, px] = \
                                feats[b, :, ys:ye, xs:xe].amax((-2, -1))
            return out

    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    ops.nms = nms
    ops.RoIPool = RoIPool
    tv.ops = ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops


# ------------------------------------------------------------------ dataset
def make_dataset():
    from two_stage_object_detection_tpu.data.synthetic import (
        generate_synthetic_coco)
    root = f"/tmp/parity_data_{SIZE}"
    generate_synthetic_coco(root, split="train2017", num_images=NUM_IMAGES,
                            num_classes=NUM_CLASSES, image_size=(SIZE, SIZE),
                            seed=SEED)
    generate_synthetic_coco(root, split="val2017", num_images=4,
                            num_classes=NUM_CLASSES, image_size=(SIZE, SIZE),
                            seed=SEED + 1)
    return root


def load_samples(root, split="train2017"):
    """(image f32 [H,W,3], boxes [N,4] xyxy, labels [N] 0-based) per image."""
    import numpy as np
    from PIL import Image
    with open(os.path.join(root, "annotations",
                           f"instances_{split}.json")) as f:
        coco = json.load(f)
    anns = {}
    for a in coco["annotations"]:
        anns.setdefault(a["image_id"], []).append(a)
    out = []
    for im in coco["images"]:
        img = np.asarray(Image.open(
            os.path.join(root, split, im["file_name"])).convert("RGB"),
            np.float32) / 255.0
        boxes, labels = [], []
        for a in anns.get(im["id"], []):
            x, y, w, h = a["bbox"]
            boxes.append([x, y, x + w, y + h])
            labels.append(a["category_id"] - 1)
        out.append((img, np.asarray(boxes, np.float32),
                    np.asarray(labels, np.int64)))
    return out


# -------------------------------------------------------------- torch side
def build_torch_model(num_classes=None, anchor_scales=None, post_nms=None,
                      size=None):
    """Reference FasterRCNNTrainer with the two driver-level corrections."""
    sys.path.insert(0, SHIM)
    from nets.frcnn_training import FasterRCNNTrainer

    num_classes = NUM_CLASSES if num_classes is None else num_classes
    anchor_scales = ANCHOR_SCALES if anchor_scales is None else anchor_scales
    post_nms = POST_NMS if post_nms is None else post_nms
    size = SIZE if size is None else size
    model = FasterRCNNTrainer(mode="train", num_classes=num_classes,
                              anchor_scales=list(anchor_scales))

    # CORRECTION (latent reference crash): ProposalCreator pads NMS survivors
    # with ``arange(n_post - len(keep))`` *row indices* (rpn.py:65-69); when
    # the candidate pool after the min-size filter is smaller than that pad
    # count (always true for small images: 128x128 -> 576 anchors), the
    # ``roi[keep]`` gather indexes out of bounds.  Run both frameworks with
    # POST_NMS proposals so the pad indices stay in range (and the reference's
    # hard-coded 128-roi head, classify.py:38, can still fill its samples).
    pl = model.rpn.proposal_layer
    pl.n_train_post_nms = post_nms
    pl.n_test_post_nms = post_nms

    # CORRECTION (SURVEY quirk #2): the trainer passes img_size=(3,H,W) into
    # the head, whose y-scaling reads img_size[0] -> y coords divided by 3.
    # Force the uniform (H, W) contract without touching the reference code.
    orig_head_fwd = model.head.forward

    def fixed_head(x, rois, roi_indices, img_size):
        return orig_head_fwd(x, rois, roi_indices, (size, size))
    model.head.forward = fixed_head
    return model


def collect_torch_preds(model, samples):
    import torch
    model.eval()
    preds = []
    with torch.inference_mode():
        for img, boxes, labels in samples:
            x = torch.from_numpy(img).permute(2, 0, 1)[None]
            b = torch.from_numpy(boxes)[None]
            l = torch.from_numpy(labels)[None]
            out = model(x, b, l)
            pb = out[1][0].numpy()                      # [128, 4]
            pl = out[2][0].numpy()                      # [128] (bg=0 offset)
            ps = out[3][0].numpy()
            preds.append((pb, ps, pl))
    model.train()
    return preds


def collect_torch_preds_argmax(model, samples):
    """Reference-graph predictions with ONE change: the per-roi regression
    is selected by the *predicted argmax class* instead of the GT-assigned
    label (``frcnn_training.py:311-318`` decodes the GT class, so near-object
    rois labelled background emit high-scoring stray boxes).

    This is the round-2 verdict's plateau control: if the same exported
    weights score ~1.0 under argmax decode while the stock graph plateaus
    at ~0.6-0.7, the gap is pinned on the reference's prediction protocol,
    not the weight transfer.
    """
    import torch
    sys.path.insert(0, SHIM)
    from utils.loc_bbox_iou import loc2bbox   # the reference's own decode

    stash = {}
    orig = model.head.forward

    def stashing(x, rois, roi_indices, img_size):
        out = orig(x, rois, roi_indices, img_size)
        stash["rois"], stash["out"] = rois, out
        return out

    model.head.forward = stashing
    model.eval()
    preds = []
    with torch.inference_mode():
        for img, boxes, labels in samples:
            x = torch.from_numpy(img).permute(2, 0, 1)[None]
            b = torch.from_numpy(boxes)[None]
            l = torch.from_numpy(labels)[None]
            model(x, b, l)
            rois = stash["rois"][0]                       # [128, 4]
            cls_locs, scores = stash["out"]
            n_sample = cls_locs.size(1)
            cls_loc = cls_locs[0].view(n_sample, -1, 4)
            cls_score, cls_idx = torch.max(scores[0], dim=1)
            roi_loc = cls_loc[torch.arange(n_sample), cls_idx]
            pb = loc2bbox(rois, roi_loc).numpy()
            preds.append((pb, cls_score.numpy(), cls_idx.numpy()))
    model.head.forward = orig
    model.train()
    return preds


def run_torch_reference(samples, gts, steps):
    """Train the corrected reference driver (batch 1) and return
    (trainer, per-image predictions, seconds/step)."""
    import torch
    torch.manual_seed(SEED)
    model = build_torch_model()
    if os.environ.get("PARITY_RESUME") and os.path.exists("/tmp/parity_torch.pth"):
        # continue a previous run's weights (optimizer moments restart —
        # a small perturbation, noted in the PARITY.json steps count)
        model.load_state_dict(torch.load(
            "/tmp/parity_torch.pth", map_location="cpu")["model_state_dict"])
        print("  (resumed /tmp/parity_torch.pth)", flush=True)

    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=LR, weight_decay=1e-4)
    # the reference recipe steps CosineAnnealingLR once per epoch
    # (train/train.py:55-58,133).  Its T_max=5 assumes real-dataset epochs;
    # with 8-image epochs that cycles the LR every 80 steps and stalls BOTH
    # frameworks (measured) — so both sides here decay over the whole run
    # (T_max = total epochs; run_jax sets cosine_t_max identically).
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=max(steps // len(samples), 1))
    # PARITY_CONST_LR=1: hold the LR constant instead (the recipe under
    # which the torch side first escapes all-background — BASELINE.md
    # "Quality parity" §2; recorded in PARITY.json "lr_schedule")
    const_lr = bool(os.environ.get("PARITY_CONST_LR"))

    eval_every = int(os.environ.get("PARITY_EVAL_EVERY", 250))
    t_train = 0.0
    for step in range(steps):
        img, boxes, labels = samples[step % len(samples)]
        x = torch.from_numpy(img).permute(2, 0, 1)[None]
        b = torch.from_numpy(boxes)[None]
        l = torch.from_numpy(labels)[None]
        t0 = time.time()
        losses = model(x, b, l)[0]
        total = losses[-1]
        opt.zero_grad()
        total.backward()
        opt.step()
        if (step + 1) % len(samples) == 0 and not const_lr:
            sched.step()                      # epoch boundary
        t_train += time.time() - t0
        if step % 50 == 0:
            print(f"  torch step {step}: loss {float(total):.4f}", flush=True)
        if (step + 1) % eval_every == 0:
            m = eval_map(collect_torch_preds(model, samples), gts, NUM_CLASSES)
            torch.save({"model_state_dict": model.state_dict()},
                       "/tmp/parity_torch.pth")
            print(f"  torch step {step + 1}: train-set mAP@0.5 = {m:.4f} "
                  f"(ckpt saved)", flush=True)
    sec = t_train / steps

    return model, collect_torch_preds(model, samples), sec


# ---------------------------------------------------------------- jax side
def run_jax(root, steps):
    import jax
    # PARITY_JAX_PLATFORM=tpu runs this framework's side on the real chip
    # (the torch side has no TPU path, so CPU-vs-TPU is recipe-fair: same
    # data, same steps, same hyperparameters — only the clock differs).
    if os.environ.get("PARITY_JAX_PLATFORM", "cpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np
    from two_stage_object_detection_tpu.config import Config
    from two_stage_object_detection_tpu.train import train

    cfg = Config(input_size=(SIZE, SIZE), num_classes=NUM_CLASSES,
                 batch_size=1, max_gt_boxes=8, grad_accum_steps=1,
                 num_epochs=max(steps // NUM_IMAGES, 1), lr=LR,
                 cosine_t_max=max(steps // NUM_IMAGES, 1),
                 train_ratio=1.0, eval_ratio=1.0, num_workers=2,
                 compute_dtype="float32",
                 # the torch driver above feeds raw (un-augmented) samples;
                 # disable our augmentation chain so the recipes match
                 augment=False,
                 anchor_scales=ANCHOR_SCALES,
                 n_train_pre_nms=min(12000, (SIZE // 16 + 2) ** 2 * 9),
                 n_train_post_nms=POST_NMS, n_test_post_nms=POST_NMS,
                 score_thresh=0.05)
    t0 = time.time()
    state = train(visualization=False, cfg=cfg, data_root=root,
                  weights_dir="/tmp/parity_weights", eval_period=10 ** 9,
                  seed=SEED, mesh=None)
    sec = (time.time() - t0) / max(steps, 1)
    return cfg, state, sec


def eval_map(preds, gts, num_classes, prob_thresh=0.0, nms_iou=0.7):
    """Shared metric: this framework's corrected mAP@0.5 for both sides.

    Drops background argmaxes then per-class NMS — exactly what the
    reference's ``calculate_metrics`` does (``frcnn_training.py:450-456``)
    and what our ``collect_predictions`` does, so both frameworks' raw
    trainer-graph predictions get identical post-processing."""
    from two_stage_object_detection_tpu.eval.evaluator import (
        _per_class_nms_host)
    from two_stage_object_detection_tpu.eval.metrics import compute_map
    cooked = []
    for b, s, l in preds:
        keep = (l > 0) & (s > prob_thresh)
        b, s, l = b[keep], s[keep], l[keep]
        if len(b) and nms_iou is not None:
            k = _per_class_nms_host(b, s, l, num_classes, nms_iou)
            b, s, l = b[k], s[k], l[k]
        cooked.append((b, s, l))
    return compute_map(cooked, gts, num_classes, iou_threshold=0.5)["mAP"]


def main():
    import numpy as np
    build_shim()
    install_torchvision_stub()
    root = make_dataset()
    samples = load_samples(root)
    gts = [(b, l + 1) for _, b, l in samples]   # bg=0 label convention

    import torch
    ckpt_path = "/tmp/parity_torch.pth"
    if os.environ.get("PARITY_SKIP_TORCH"):
        # reuse the checkpoint from a previous torch run (resume knob)
        print(f"== torch reference: loading {ckpt_path} ==", flush=True)
        tmodel = build_torch_model()
        tmodel.load_state_dict(
            torch.load(ckpt_path, map_location="cpu")["model_state_dict"])
        tpreds, tsec = collect_torch_preds(tmodel, samples), float("nan")
    else:
        print(f"== torch reference (corrected driver), {STEPS} steps, "
              f"{SIZE}x{SIZE} ==", flush=True)
        tmodel, tpreds, tsec = run_torch_reference(samples, gts, STEPS)
        torch.save({"model_state_dict": tmodel.state_dict()}, ckpt_path)
    t_map = eval_map(tpreds, gts, NUM_CLASSES)
    print(f"torch reference: mAP@0.5 = {t_map:.4f}  ({tsec:.2f} s/step)",
          flush=True)

    print(f"== this framework, same recipe ==", flush=True)
    cfg, state, jsec = run_jax(root, STEPS)

    import jax
    from two_stage_object_detection_tpu.eval.evaluator import (
        collect_predictions)
    from two_stage_object_detection_tpu.eval.metrics import compute_map
    from two_stage_object_detection_tpu.data.pipeline import (
        DetectionDataset, Loader)
    from two_stage_object_detection_tpu.data.coco import load_coco

    idx = load_coco(os.path.join(root, "annotations", "instances_train2017.json"),
                    os.path.join(root, "train2017"), ratio=1.0)
    ds = DetectionDataset(idx, cfg.input_size, cfg.max_gt_boxes, train=False)
    loader = Loader(ds, cfg.batch_size, shuffle=False, num_workers=2,
                    device_put=jax.device_put)
    preds, gts_j, _ = collect_predictions(state, iter(loader), cfg)
    j_map = compute_map(preds, gts_j, NUM_CLASSES, iou_threshold=0.5)["mAP"]
    print(f"this framework (trainer-parity eval): mAP@0.5 = {j_map:.4f}  "
          f"({jsec:.2f} s/step)", flush=True)

    # same-weights parity A: torch-trained weights through OUR eval path
    from two_stage_object_detection_tpu.utils.torch_import import (
        export_state_dict, load_torch_checkpoint)
    state_imp = load_torch_checkpoint(ckpt_path, state, arch=39)
    preds_imp, _, _ = collect_predictions(state_imp, iter(loader), cfg)
    imp_map = compute_map(preds_imp, gts_j, NUM_CLASSES,
                          iou_threshold=0.5)["mAP"]
    print(f"torch weights imported -> our eval: mAP@0.5 = {imp_map:.4f}",
          flush=True)

    # same-weights parity B (reverse): OUR trained weights through the
    # corrected REFERENCE graph's eval — the strong direction, since this
    # framework trains to useful quality in tractable time and the torch
    # side then only has to run eval
    sd = export_state_dict(jax.device_get(state.params),
                           jax.device_get(state.batch_stats), arch=39)
    rmodel = build_torch_model()
    res = rmodel.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False)
    assert not res.unexpected_keys, res.unexpected_keys
    rev_map = eval_map(collect_torch_preds(rmodel, samples), gts, NUM_CLASSES)
    print(f"our weights exported -> torch reference eval: mAP@0.5 = "
          f"{rev_map:.4f}  (ours on same split: {j_map:.4f})", flush=True)

    result = {"size": SIZE, "steps": STEPS, "seed": SEED,
              "num_images": NUM_IMAGES, "lr": LR,
              "lr_schedule": ("constant" if os.environ.get("PARITY_CONST_LR")
                              else "cosine_per_epoch"),
              "anchor_scales": list(ANCHOR_SCALES), "post_nms": POST_NMS,
              "recipe": (f"python scripts/parity_reference.py {STEPS} {SIZE}"
                         + (" (PARITY_CONST_LR=1)"
                            if os.environ.get("PARITY_CONST_LR") else "")),
              "torch_reference_map50": round(float(t_map), 4),
              "torch_sec_per_step": round(tsec, 3),
              "this_framework_map50": round(float(j_map), 4),
              "jax_sec_per_step": round(jsec, 3),
              "imported_weights_map50": round(float(imp_map), 4),
              "our_weights_in_torch_map50": round(float(rev_map), 4)}
    with open(os.path.join(REPO, "PARITY.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
