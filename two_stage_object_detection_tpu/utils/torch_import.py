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
