"""Torch checkpoint import: reference ``.pth`` -> flax params/batch_stats.

The reference's checkpoint contract is
``weights/FasterRCNNTrainer_{best,last}.pth`` holding
``{'model_state_dict': ..., 'optimizer_state_dict': ..., 'scheduler_state_dict': ...}``
(``train/train.py:122-143``; loaded with ``['model_state_dict']`` at
``train/train.py:60-72`` and ``multi_inference.py:50-60``).  This module maps
that state dict onto this framework's flax parameter tree so

* users can migrate reference-trained weights, and
* same-weights eval parity against the torch reference is checkable.

Layout conversions (torch -> flax):
  Conv2d weight  [O, I/g, kh, kw] -> kernel [kh, kw, I/g, O]
  Linear weight  [O, I]           -> kernel [I, O]
  BatchNorm weight/bias           -> norm scale/bias (params)
  BatchNorm running_mean/var      -> norm mean/var   (batch_stats)

Module-name mapping: the torch backbone is an ``nn.ModuleList`` ``base``
(``models/hardnet.py:158-196``) whose indices depend on arch/depth_wise
(parameter-free MaxPool/ReLU/Dropout entries still consume indices); flax
modules are named (stem0..2, block{i}, transition{i}, down{i}, tail0..2).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from two_stage_object_detection_tpu.models.hardnet import _ARCH


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv2d weight [O, I/g, kh, kw] -> flax kernel [kh, kw, I/g, O]."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _dense_kernel(w: np.ndarray) -> np.ndarray:
    """torch Linear weight [O, I] -> flax Dense kernel [I, O]."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (1, 0)))


def _extractor_layout(arch: int, depth_wise: bool = True):
    """(flax_name, kind, torch ``base`` index) for every parameterised layer.

    kind: "convlayer" (conv+norm), "dwconvlayer" (dwconv+norm),
    "block" (HarDBlock of CombConv/Conv layers), "conv2d" (bare Conv2d).
    """
    first_ch, ch_list, grmul, gr, n_layers, down_samp = _ARCH[arch]
    entries = []
    idx = 0
    entries.append(("stem0", "convlayer", idx)); idx += 1
    entries.append(("stem1", "convlayer", idx)); idx += 1
    if depth_wise:
        entries.append(("stem2", "dwconvlayer", idx))
    idx += 1                                   # DWConv or MaxPool slot
    for i in range(len(n_layers)):
        entries.append((f"block{i}", "block", idx)); idx += 1
        if i == len(n_layers) - 1 and arch == 85:
            idx += 1                           # Dropout slot
        entries.append((f"transition{i}", "convlayer", idx)); idx += 1
        if down_samp[i] == 1:
            if depth_wise:
                entries.append((f"down{i}", "dwconvlayer", idx))
            idx += 1                           # DWConv or MaxPool slot
    entries.append(("tail0", "conv2d", idx)); idx += 1
    idx += 1                                   # ReLU slot
    entries.append(("tail1", "conv2d", idx)); idx += 1
    entries.append(("tail2", "conv2d", idx)); idx += 1
    return entries, n_layers


def _take(sd: Dict[str, np.ndarray], key: str) -> np.ndarray:
    if key not in sd:
        raise KeyError(f"torch state dict is missing '{key}' "
                       f"(have {len(sd)} keys; wrong arch/depth_wise?)")
    v = sd[key]
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                      np.float32)


def _convlayer(sd, prefix):
    params = {"conv": {"kernel": _conv_kernel(_take(sd, f"{prefix}.conv.weight"))},
              "norm": {"scale": _take(sd, f"{prefix}.norm.weight"),
                       "bias": _take(sd, f"{prefix}.norm.bias")}}
    stats = {"norm": {"mean": _take(sd, f"{prefix}.norm.running_mean"),
                      "var": _take(sd, f"{prefix}.norm.running_var")}}
    return params, stats


def _dwconvlayer(sd, prefix):
    params = {"dwconv": {"kernel": _conv_kernel(_take(sd, f"{prefix}.dwconv.weight"))},
              "norm": {"scale": _take(sd, f"{prefix}.norm.weight"),
                       "bias": _take(sd, f"{prefix}.norm.bias")}}
    stats = {"norm": {"mean": _take(sd, f"{prefix}.norm.running_mean"),
                      "var": _take(sd, f"{prefix}.norm.running_var")}}
    return params, stats


def convert_extractor(sd: Dict[str, np.ndarray], arch: int = 39,
                      depth_wise: bool = True, prefix: str = "base"
                      ) -> Tuple[dict, dict]:
    """Convert the HarDNet backbone -> (params, batch_stats) subtrees."""
    entries, n_layers = _extractor_layout(arch, depth_wise)
    params: dict = {}
    stats: dict = {}
    block_i = 0
    for name, kind, idx in entries:
        p = f"{prefix}.{idx}"
        if kind == "convlayer":
            params[name], stats[name] = _convlayer(sd, p)
        elif kind == "dwconvlayer":
            params[name], stats[name] = _dwconvlayer(sd, p)
        elif kind == "conv2d":
            params[name] = {"kernel": _conv_kernel(_take(sd, f"{p}.weight")),
                            "bias": _take(sd, f"{p}.bias")}
        elif kind == "block":
            bp: dict = {}
            bs: dict = {}
            for t in range(n_layers[block_i]):
                lp = f"{p}.layers.{t}"
                if depth_wise:   # CombConvLayer: layer1 (ConvLayer) + layer2 (DWConv)
                    p1, s1 = _convlayer(sd, f"{lp}.layer1")
                    p2, s2 = _dwconvlayer(sd, f"{lp}.layer2")
                    bp[f"layer{t}"] = {"layer1": p1, "layer2": p2}
                    bs[f"layer{t}"] = {"layer1": s1, "layer2": s2}
                else:
                    bp[f"layer{t}"], bs[f"layer{t}"] = _convlayer(sd, lp)
            params[name], stats[name] = bp, bs
            block_i += 1
    return params, stats


def convert_state_dict(sd: Dict[str, np.ndarray], arch: int = 39,
                       depth_wise: bool = True) -> Tuple[dict, dict]:
    """Full trainer state dict -> (params, batch_stats) plain nested dicts
    matching this framework's ``FasterRCNN`` variable tree.

    Accepts either trainer-level keys (``feat_extra.base...``, ``rpn...``,
    ``head...`` — reference ``nets/frcnn_training.py:203-217``) or a bare
    backbone dict (``base...``).
    """
    if any(k.startswith("feat_extra.") for k in sd):
        ex_params, ex_stats = convert_extractor(sd, arch, depth_wise,
                                                prefix="feat_extra.base")
    else:
        ex_params, ex_stats = convert_extractor(sd, arch, depth_wise)
    params = {"extractor": ex_params}
    stats = {"extractor": ex_stats}
    if "rpn.loc.weight" in sd:
        params["rpn_head"] = {
            "loc": {"kernel": _conv_kernel(_take(sd, "rpn.loc.weight")),
                    "bias": _take(sd, "rpn.loc.bias")},
            "score": {"kernel": _conv_kernel(_take(sd, "rpn.score.weight")),
                      "bias": _take(sd, "rpn.score.bias")},
        }
    if "head.cls_loc.weight" in sd:
        params["roi_head"] = {
            "cls_loc": {"kernel": _dense_kernel(_take(sd, "head.cls_loc.weight")),
                        "bias": _take(sd, "head.cls_loc.bias")},
            "score": {"kernel": _dense_kernel(_take(sd, "head.score.weight")),
                      "bias": _take(sd, "head.score.bias")},
        }
    return params, stats


def _merge_check(target, new, path=""):
    """Recursively overlay ``new`` onto ``target`` with shape checks."""
    out = dict(target)
    for k, v in new.items():
        if k not in target:
            raise KeyError(f"unexpected key {path}/{k} (flax tree has "
                           f"{sorted(target)})")
        if isinstance(v, dict):
            out[k] = _merge_check(target[k], v, f"{path}/{k}")
        else:
            want = np.shape(target[k])
            if tuple(v.shape) != tuple(want):
                raise ValueError(f"shape mismatch at {path}/{k}: torch "
                                 f"{v.shape} vs flax {want}")
            out[k] = v.astype(np.asarray(target[k]).dtype)
    return out


# ------------------------------------------------------------------ export
def _conv_weight(k: np.ndarray) -> np.ndarray:
    """flax kernel [kh, kw, I/g, O] -> torch Conv2d weight [O, I/g, kh, kw]."""
    return np.ascontiguousarray(np.transpose(np.asarray(k), (3, 2, 0, 1)))


def _dense_weight(k: np.ndarray) -> np.ndarray:
    """flax Dense kernel [I, O] -> torch Linear weight [O, I]."""
    return np.ascontiguousarray(np.transpose(np.asarray(k), (1, 0)))


def _np(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def _export_convlayer(out, prefix, p, s):
    out[f"{prefix}.conv.weight"] = _conv_weight(p["conv"]["kernel"])
    out[f"{prefix}.norm.weight"] = _np(p["norm"]["scale"])
    out[f"{prefix}.norm.bias"] = _np(p["norm"]["bias"])
    out[f"{prefix}.norm.running_mean"] = _np(s["norm"]["mean"])
    out[f"{prefix}.norm.running_var"] = _np(s["norm"]["var"])


def _export_dwconvlayer(out, prefix, p, s):
    out[f"{prefix}.dwconv.weight"] = _conv_weight(p["dwconv"]["kernel"])
    out[f"{prefix}.norm.weight"] = _np(p["norm"]["scale"])
    out[f"{prefix}.norm.bias"] = _np(p["norm"]["bias"])
    out[f"{prefix}.norm.running_mean"] = _np(s["norm"]["mean"])
    out[f"{prefix}.norm.running_var"] = _np(s["norm"]["var"])


def export_state_dict(params, batch_stats, arch: int = 39,
                      depth_wise: bool = True) -> Dict[str, np.ndarray]:
    """This framework's ``FasterRCNN`` variables -> reference state dict.

    Inverse of :func:`convert_state_dict` (flax -> torch layout transposes,
    same ``base`` ModuleList index walk), producing the trainer-level key
    naming (``feat_extra.base...``, ``rpn...``, ``head...``) the reference's
    ``load_state_dict`` expects (``nets/frcnn_training.py:203-217``).  BN
    ``num_batches_tracked`` counters are not emitted (load with
    ``strict=False``; they do not affect eval).  Values are numpy float32 —
    wrap with ``torch.from_numpy`` at the call site.
    """
    ex_p = params["extractor"]
    ex_s = batch_stats["extractor"]
    entries, n_layers = _extractor_layout(arch, depth_wise)
    out: Dict[str, np.ndarray] = {}
    block_i = 0
    for name, kind, idx in entries:
        t = f"feat_extra.base.{idx}"
        if kind == "convlayer":
            _export_convlayer(out, t, ex_p[name], ex_s[name])
        elif kind == "dwconvlayer":
            _export_dwconvlayer(out, t, ex_p[name], ex_s[name])
        elif kind == "conv2d":
            out[f"{t}.weight"] = _conv_weight(ex_p[name]["kernel"])
            out[f"{t}.bias"] = _np(ex_p[name]["bias"])
        elif kind == "block":
            for li in range(n_layers[block_i]):
                lp = f"{t}.layers.{li}"
                bp = ex_p[name][f"layer{li}"]
                bs = ex_s[name][f"layer{li}"]
                if depth_wise:
                    _export_convlayer(out, f"{lp}.layer1",
                                      bp["layer1"], bs["layer1"])
                    _export_dwconvlayer(out, f"{lp}.layer2",
                                        bp["layer2"], bs["layer2"])
                else:
                    _export_convlayer(out, lp, bp, bs)
            block_i += 1
    if "rpn_head" in params:
        rp = params["rpn_head"]
        out["rpn.loc.weight"] = _conv_weight(rp["loc"]["kernel"])
        out["rpn.loc.bias"] = _np(rp["loc"]["bias"])
        out["rpn.score.weight"] = _conv_weight(rp["score"]["kernel"])
        out["rpn.score.bias"] = _np(rp["score"]["bias"])
    if "roi_head" in params:
        rh = params["roi_head"]
        out["head.cls_loc.weight"] = _dense_weight(rh["cls_loc"]["kernel"])
        out["head.cls_loc.bias"] = _np(rh["cls_loc"]["bias"])
        out["head.score.weight"] = _dense_weight(rh["score"]["kernel"])
        out["head.score.bias"] = _np(rh["score"]["bias"])
    return out


# ------------------------------------------------------- resnet backbones
def _bn_from(sd, prefix):
    return ({"scale": _take(sd, f"{prefix}.weight"),
             "bias": _take(sd, f"{prefix}.bias")},
            {"mean": _take(sd, f"{prefix}.running_mean"),
             "var": _take(sd, f"{prefix}.running_var")})


def _prelu_alpha(sd, prefix):
    """PReLU slope: reference resnets carry one (``models/resnet.py:11,54``);
    torchvision ImageNet checkpoints use plain ReLU, which is exactly
    PReLU with slope 0 — import as alpha=0.0 (still trainable after)."""
    key = f"{prefix}.weight"
    if key in sd:
        return np.asarray(sd.pop(key), np.float32).reshape(())
    return np.zeros((), np.float32)


def convert_resnet_state_dict(sd: Dict[str, np.ndarray],
                              block: str = "bottleneck",
                              blocks_num=(3, 4, 6),
                              ) -> Tuple[dict, dict]:
    """torch ResNet/ResNeXt state dict -> flax extractor (params, stats).

    Accepts both the reference's ``models/resnet.py`` checkpoints (which
    carry per-block PReLU slopes) and **torchvision ImageNet checkpoints**
    (same key layout minus the PReLU weights — standard ``conv1/bn1/
    layer{L}.{B}.{conv,bn,downsample}`` naming), enabling pretrained
    transfer-learning initialisation of the resnet* backbones.  Classifier
    keys (``fc.*``) and stages beyond ``blocks_num`` (e.g. ``layer4`` for
    the stride-16 trunk) are ignored.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: dict = {"conv1": {"kernel": _conv_kernel(_take(sd, "conv1.weight"))}}
    stats: dict = {}
    params["bn1"], stats["bn1"] = _bn_from(sd, "bn1")
    params["relu"] = {"alpha": _prelu_alpha(sd, "relu")}

    n_convs = 2 if block == "basic" else 3
    for li, n in enumerate(blocks_num):
        for bi in range(n):
            tp = f"layer{li + 1}.{bi}"
            fname = f"layer{li + 1}_{bi}"
            bp: dict = {}
            bs: dict = {}
            for ci in range(1, n_convs + 1):
                bp[f"conv{ci}"] = {
                    "kernel": _conv_kernel(_take(sd, f"{tp}.conv{ci}.weight"))}
                bp[f"bn{ci}"], bs[f"bn{ci}"] = _bn_from(sd, f"{tp}.bn{ci}")
            if f"{tp}.downsample.0.weight" in sd:
                bp["ds_conv"] = {
                    "kernel": _conv_kernel(_take(sd, f"{tp}.downsample.0.weight"))}
                bp["ds_norm"], bs["ds_norm"] = _bn_from(sd, f"{tp}.downsample.1")
            bp["relu"] = {"alpha": _prelu_alpha(sd, f"{tp}.relu")}
            params[fname] = bp
            stats[fname] = bs
    return params, stats


def load_resnet_backbone(path_or_sd, state, block: str = "bottleneck",
                         blocks_num=(3, 4, 6)):
    """Initialise a TrainState's resnet* extractor from a torch checkpoint.

    ``path_or_sd``: a ``.pth`` path or an in-memory state dict — e.g.
    torchvision's ``resnet50(weights=...).state_dict()`` for ImageNet
    pretraining (a capability the reference lacks: its resnets are dead
    code, ``models/resnet.py:154-172``, and always random-init).  Only the
    backbone subtree is touched; heads keep their current values.
    """
    import jax

    if isinstance(path_or_sd, (str, bytes)):
        import torch
        raw = torch.load(path_or_sd, map_location="cpu", weights_only=True)
        sd = raw.get("model_state_dict", raw) if isinstance(raw, dict) else raw
    else:
        sd = path_or_sd
    sd = {k: np.asarray(v) for k, v in sd.items()}
    ex_params, ex_stats = convert_resnet_state_dict(sd, block=block,
                                                    blocks_num=blocks_num)

    host_params = jax.device_get(jax.tree_util.tree_map(np.asarray,
                                                        dict(state.params)))
    host_stats = jax.device_get(jax.tree_util.tree_map(np.asarray,
                                                       dict(state.batch_stats)))
    new_params = _merge_check(host_params, {"extractor": ex_params})
    new_stats = _merge_check(host_stats, {"extractor": ex_stats})
    return state.replace(params=new_params, batch_stats=new_stats)


def load_torch_checkpoint(path: str, state, arch: int = 39,
                          depth_wise: bool = True):
    """Load a reference ``.pth`` (or raw state dict file) into a TrainState.

    Mirrors the reference's ``pre_train=True`` semantics: weights only,
    optimiser state fresh (``train/train.py:60-72``).
    """
    import jax
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=True)
    sd = raw.get("model_state_dict", raw) if isinstance(raw, dict) else raw
    params, stats = convert_state_dict(sd, arch=arch, depth_wise=depth_wise)

    host_params = jax.device_get(jax.tree_util.tree_map(np.asarray,
                                                        dict(state.params)))
    host_stats = jax.device_get(jax.tree_util.tree_map(np.asarray,
                                                       dict(state.batch_stats)))
    new_params = _merge_check(host_params, params)
    new_stats = _merge_check(host_stats, stats)
    return state.replace(params=new_params, batch_stats=new_stats)
