#!/usr/bin/env python
"""Prove the ImageNet-transfer capability: imported backbone vs random init.

``utils/torch_import.load_resnet_backbone`` exists so users can initialise
the resnet* backbones from torch checkpoints (torchvision ImageNet weights
in production).  No weights are downloadable in this container, so this is
the available proxy experiment (round-4 verdict missing #2):

1. PRETRAIN (torch, CPU): the *reference's own* torch ResNet-34
   (``/root/reference/models/resnet.py`` — loaded at runtime, not copied)
   is trained as a classifier on augmented object crops from the committed
   real-image fixture (4 classes).
2. IMPORT: its state dict crosses into the flax detector through
   ``load_resnet_backbone`` — the exact path an ImageNet checkpoint takes.
3. FINE-TUNE (jax, device): single-scale resnet34 Faster R-CNN trains on
   the real fixture from (a) random init and (b) the imported backbone,
   with true-inference mAP@0.5 evaluated on a fixed cadence.

The capability claim holds if the imported init reaches the target mAP in
fewer steps / dominates the early curve.  Writes ABLATE_TRANSFER.json.

Usage: python scripts/ablate_pretrain_transfer.py [det_steps] [eval_every]
(defaults 300, 25)
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
sys.path.insert(0, ROOT)

ANN = os.path.join(ROOT, "tests/data/real_coco/annotations",
                   "instances_train2017.json")
IMG_DIR = os.path.join(ROOT, "tests/data/real_coco/train2017")
CROP = 128
N_CLASSES = 4


# --------------------------------------------------------------- pretrain
def _object_crops():
    """(crop [CROP,CROP,3] f32, label) pairs from the fixture annotations."""
    from PIL import Image

    data = json.load(open(ANN))
    images = {im["id"]: im for im in data["images"]}
    cat_ids = sorted({a["category_id"] for a in data["annotations"]})
    cat_to_idx = {c: i for i, c in enumerate(cat_ids)}
    out = []
    for a in data["annotations"]:
        im = images[a["image_id"]]
        pil = Image.open(os.path.join(IMG_DIR, im["file_name"])).convert("RGB")
        x, y, w, h = a["bbox"]
        crop = pil.crop((x, y, x + w, y + h)).resize((CROP, CROP),
                                                     Image.BILINEAR)
        out.append((np.asarray(crop, np.float32) / 255.0,
                    cat_to_idx[a["category_id"]]))
    return out


def _augment(img, rng):
    if rng.rand() < 0.5:
        img = img[:, ::-1]
    # random scale-crop 80-100% + brightness/contrast jitter
    s = rng.uniform(0.8, 1.0)
    n = int(CROP * s)
    y0 = rng.randint(0, CROP - n + 1)
    x0 = rng.randint(0, CROP - n + 1)
    img = img[y0:y0 + n, x0:x0 + n]
    idx = np.clip((np.arange(CROP) * n / CROP), 0, n - 1).astype(np.int32)
    img = img[idx][:, idx]
    img = np.clip(img * rng.uniform(0.7, 1.3) + rng.uniform(-0.1, 0.1), 0, 1)
    return img


def pretrain_torch(epochs=16, batch=12, seed=0):
    """Train the reference torch ResNet-34 on fixture crops; return its
    state dict + final train accuracy."""
    import importlib

    import torch

    sys.path.insert(0, REFERENCE)
    try:
        resnet34 = importlib.import_module("models.resnet").resnet34
    finally:
        sys.path.remove(REFERENCE)

    torch.manual_seed(seed)
    model = resnet34(num_classes=N_CLASSES, include_top=True)
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3, weight_decay=1e-4)
    crops = _object_crops()
    rng = np.random.RandomState(seed)
    model.train()
    acc = 0.0
    samples_per_epoch = 8 * len(crops)
    for ep in range(epochs):
        order = rng.permutation(samples_per_epoch)
        correct = total = 0
        for i0 in range(0, samples_per_epoch, batch):
            xs, ys = [], []
            for j in order[i0:i0 + batch]:
                img, lab = crops[j % len(crops)]
                xs.append(_augment(img, rng))
                ys.append(lab)
            x = torch.from_numpy(
                np.transpose(np.stack(xs), (0, 3, 1, 2))).float()
            y = torch.tensor(ys)
            opt.zero_grad()
            logits = model(x)
            loss = torch.nn.functional.cross_entropy(logits, y)
            loss.backward()
            opt.step()
            correct += int((logits.argmax(1) == y).sum())
            total += len(ys)
        acc = correct / total
        print(f"  pretrain epoch {ep}: loss={float(loss):.4f} "
              f"acc={acc:.3f}", flush=True)
    model.eval()
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}, acc


# --------------------------------------------------------------- fine-tune
def finetune(name, cfg, steps, eval_every, torch_sd=None,
             freeze_backbone=False):
    """``freeze_backbone=True`` is the discriminating probe: detection on
    3 heavily-augmented images converges from scratch in <100 steps, so
    full fine-tuning shows no init advantage (ceiling effect — measured,
    see ABLATE_TRANSFER.json ``random_init``/``imported_init``).  Freezing
    the backbone forces the heads to rely on feature QUALITY: pretrained
    features must beat frozen-random features or the import is worthless."""
    import jax
    import optax

    from two_stage_object_detection_tpu.data.coco import load_coco
    from two_stage_object_detection_tpu.data.pipeline import (
        DetectionDataset, Loader)
    from two_stage_object_detection_tpu.eval.evaluator import evaluate
    from two_stage_object_detection_tpu.nets.trainer import (
        TrainState, create_train_state, make_optimizer, train_step)
    from two_stage_object_detection_tpu.utils.torch_import import (
        load_resnet_backbone)

    print(f"=== {name} ===", flush=True)
    index = load_coco(ANN, IMG_DIR)
    train_ds = DetectionDataset(index, cfg.input_size, cfg.max_gt_boxes,
                                train=True)
    loader = Loader(train_ds, cfg.batch_size, shuffle=True, num_workers=2)
    val_ds = DetectionDataset(index, cfg.input_size, cfg.max_gt_boxes,
                              train=False)
    val_batches = [{k: jax.device_put(v) for k, v in b.items()}
                   for b in Loader(val_ds, cfg.batch_size, shuffle=False,
                                   num_workers=2)]

    _, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                  init_image_size=(64, 64))
    if torch_sd is not None:
        state = load_resnet_backbone(torch_sd, state, block="basic",
                                     blocks_num=(3, 4, 6))
    if freeze_backbone:
        def label_fn(params):
            return {k: jax.tree_util.tree_map(
                lambda _: "frozen" if k == "extractor" else "train", v)
                for k, v in params.items()}
        tx = optax.multi_transform(
            {"train": make_optimizer(cfg, 1), "frozen": optax.set_to_zero()},
            label_fn)
        state = TrainState.create(
            apply_fn=state.apply_fn, params=state.params,
            batch_stats=state.batch_stats, tx=tx)

    curve = []
    t0 = time.time()
    step = 0
    while step < steps:
        for batch in loader:
            if step >= steps:
                break
            batch = {k: jax.device_put(v) for k, v in batch.items()}
            state, losses = train_step(state, batch, jax.random.PRNGKey(step))
            step += 1
            if step % eval_every == 0 or step == steps:
                _, m, _ = evaluate(state, val_batches, cfg,
                                   map_iou_threshold=0.5, use_predict=True)
                curve.append({"step": step, "map50": round(float(m), 4)})
                print(f"  step {step:4d} loss={float(losses['total']):.4f} "
                      f"mAP@0.5={float(m):.4f}", flush=True)
    out = {"curve": curve, "train_seconds": round(time.time() - t0, 1)}
    for target in (0.5, 0.8):
        hit = next((c["step"] for c in curve if c["map50"] >= target), None)
        out[f"steps_to_map{int(target * 100)}"] = hit
    return out


def main(det_steps=300, eval_every=25):
    from two_stage_object_detection_tpu.config import Config
    from two_stage_object_detection_tpu.utils import compile_cache

    compile_cache.enable(os.environ.get("JAX_CACHE_DIR",
                                        "/tmp/jax_comp_cache"))
    t0 = time.time()
    torch_sd, acc = pretrain_torch()
    pre_s = time.time() - t0
    print(f"pretrain done: acc={acc:.3f} ({pre_s:.0f}s)", flush=True)

    cfg = Config(
        input_size=(600, 600), num_classes=N_CLASSES, batch_size=3,
        max_gt_boxes=8, backbone="resnet34", roi_pool_mode="align",
        n_train_pre_nms=3000, n_train_post_nms=256, n_test_pre_nms=1000,
        n_test_post_nms=128, roi_n_sample=64, grad_accum_steps=1, lr=1e-3,
        score_thresh=0.3, predict_nms_iou=0.3, max_detections=16,
        cosine_t_max=det_steps, augment=True,
    )
    out_path = os.path.join(ROOT, "ABLATE_TRANSFER.json")
    results = {"task": {
        "pretrain": "reference torch resnet34 classifier on "
                    "fixture object crops (proxy for ImageNet)",
        "pretrain_acc": round(acc, 3),
        "pretrain_seconds": round(pre_s, 1),
        "detection": "single-scale resnet34 on tests/data/real_coco",
        "det_steps": det_steps, "eval_every": eval_every}}
    if os.path.exists(out_path):
        results.update(json.load(open(out_path)))
    variants = {
        "random_init": dict(),
        "imported_init": dict(torch_sd=torch_sd),
        "random_frozen": dict(freeze_backbone=True),
        "imported_frozen": dict(torch_sd=torch_sd, freeze_backbone=True),
    }
    for name, kw in variants.items():
        if name in results:
            print(f"=== {name}: already recorded, skipping ===", flush=True)
            continue
        results[name] = finetune(name, cfg, det_steps, eval_every, **kw)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 300,
         int(sys.argv[2]) if len(sys.argv) > 2 else 25)
