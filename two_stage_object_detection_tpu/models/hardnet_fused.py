"""Fused-inference HarDNet executor.

Consumes the flax parameter/batch-stats trees of
:class:`...models.hardnet.HarDNetFeatureExtraction` and evaluates the same
network with BatchNorm folded and every HarDBlock layer as ONE Pallas kernel
(:mod:`...ops.pallas_fused_layers`), on the flattened ``[B, H*W, C]``
layout.  The stem and tail (5 strided/grouped convs) stay on lax; the
blocks — where the op count lives — run fused.

Inference only (running-statistics BN).  Numerically equivalent to
``model.apply(..., train=False)`` up to dtype rounding (verified by test).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax

from two_stage_object_detection_tpu.models.hardnet import (
    _ARCH, hard_block_links)
from two_stage_object_detection_tpu.ops.pallas_fused_layers import (
    fused_comb_conv, fused_dw_conv)

EPS = 1e-5


def _fold(params, stats):
    """BN affine from (scale, bias, mean, var): y = x*s + b."""
    s = params["scale"] / jnp.sqrt(stats["var"] + EPS)
    b = params["bias"] - stats["mean"] * s
    return s, b


def _conv_layer_lax(x, p, st, stride, dtype):
    """ConvLayer (conv+BN+ReLU6) via lax, NHWC input."""
    s, b = _fold(p["norm"], st["norm"])
    k = p["conv"]["kernel"].astype(dtype) * s.astype(dtype)
    kh = k.shape[0]
    pad = ((kh // 2, kh // 2),) * 2   # explicit k//2 padding (torch parity;
    # lax "SAME" pads asymmetrically at stride 2)
    y = lax.conv_general_dilated(x.astype(dtype), k, (stride, stride),
                                 pad,
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.minimum(jnp.maximum(y + b.astype(dtype), 0.0), 6.0)


def _dw_layer_lax(x, p, st, stride, dtype):
    """DWConvLayer (depthwise+BN, no act) via lax, NHWC input."""
    s, b = _fold(p["norm"], st["norm"])
    c = x.shape[-1]
    k = p["dwconv"]["kernel"].astype(dtype) * s.astype(dtype)
    y = lax.conv_general_dilated(x.astype(dtype), k, (stride, stride),
                                 ((1, 1), (1, 1)), feature_group_count=c,
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.astype(dtype)


def _pointwise_relu6(x_flat, p, st, dtype):
    """ConvLayer with a 1x1 kernel on the flat layout: one matmul."""
    s, b = _fold(p["norm"], st["norm"])
    w = p["conv"]["kernel"][0, 0].astype(dtype) * s.astype(dtype)
    y = jnp.dot(x_flat.astype(dtype), w,
                preferred_element_type=jnp.float32)
    return jnp.minimum(jnp.maximum(y + b, 0.0), 6.0).astype(dtype)


def fused_hardnet_features(params, batch_stats, images: jnp.ndarray,
                           arch: int = 39, dtype=jnp.bfloat16,
                           interpret: bool = False) -> jnp.ndarray:
    """``[B, H, W, 3] -> [B, H/16, W/16, 512]`` with fused blocks."""
    first_ch, ch_list, grmul, gr, n_layers, down_samp = _ARCH[arch]

    # ---- stem (lax): conv3x3 s2 -> 1x1 conv -> depthwise s2
    x = _conv_layer_lax(images, params["stem0"], batch_stats["stem0"], 2, dtype)
    b, h, w, _ = x.shape
    xf = x.reshape(b, h * w, -1)
    xf = _pointwise_relu6(xf, params["stem1"], batch_stats["stem1"], dtype)
    x = _dw_layer_lax(xf.reshape(b, h, w, -1), params["stem2"],
                      batch_stats["stem2"], 2, dtype)
    b, h, w, ch = x.shape
    xf = x.reshape(b, h * w, ch)

    # ---- HarDBlocks, fully fused on the flat layout
    for i in range(len(n_layers)):
        bp = params[f"block{i}"]
        bs = batch_stats[f"block{i}"]
        out_chs, _, links, _ = hard_block_links(n_layers[i], ch, gr[i], grmul)
        outputs = [xf]
        for t in range(1, n_layers[i] + 1):
            tin = [outputs[j] for j in links[t - 1]]
            inp = jnp.concatenate(tin, axis=-1) if len(tin) > 1 else tin[0]
            lp = bp[f"layer{t - 1}"]
            ls = bs[f"layer{t - 1}"]
            s1, b1 = _fold(lp["layer1"]["norm"], ls["layer1"]["norm"])
            w1 = lp["layer1"]["conv"]["kernel"][0, 0] * s1[None, :]
            s2, b2 = _fold(lp["layer2"]["norm"], ls["layer2"]["norm"])
            wd = lp["layer2"]["dwconv"]["kernel"][:, :, 0, :]
            wd = (wd * s2[None, None, :]).reshape(9, -1)
            outputs.append(fused_comb_conv(
                inp, w1.astype(dtype), b1, wd, b2, h=h, w=w,
                interpret=interpret))
        keep = [o for k, o in enumerate(outputs)
                if k == len(outputs) - 1 or k % 2 == 1]
        xf = jnp.concatenate(keep, axis=-1)
        ch = sum(out_chs[t] for t in range(1, n_layers[i] + 1)
                 if (t - 1) % 2 == 0 or t == n_layers[i])

        xf = _pointwise_relu6(xf, params[f"transition{i}"],
                              batch_stats[f"transition{i}"], dtype)
        ch = ch_list[i]
        if down_samp[i] == 1:
            dp = params[f"down{i}"]
            ds = batch_stats[f"down{i}"]
            s2, b2 = _fold(dp["norm"], ds["norm"])
            wd = dp["dwconv"]["kernel"][:, :, 0, :]
            wd = (wd * s2[None, None, :]).reshape(9, -1)
            xf = fused_dw_conv(xf, wd, b2, h=h, w=w, interpret=interpret)

    # ---- tail (lax): two strided depthwise convs (+bias) and a grouped 1x1
    x = xf.reshape(b, h, w, ch)
    c_last = ch_list[-1]
    k0 = params["tail0"]["kernel"].astype(dtype)
    x = lax.conv_general_dilated(x, k0, (2, 2), ((1, 1), (1, 1)),
                                 feature_group_count=c_last,
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = jnp.maximum(x + params["tail0"]["bias"].astype(dtype), 0.0)
    k1 = params["tail1"]["kernel"].astype(dtype)
    x = lax.conv_general_dilated(x, k1, (2, 2), ((1, 1), (1, 1)),
                                 feature_group_count=c_last,
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x + params["tail1"]["bias"].astype(dtype)
    # grouped 1x1 (groups=512, in/group=2): per-group dot
    k2 = params["tail2"]["kernel"][0, 0].astype(dtype)     # [2, 512]
    bsz, fh, fw, _ = x.shape
    x4 = x.reshape(bsz, fh, fw, 512, 2)
    y = jnp.einsum("bhwgc,cg->bhwg", x4,
                   k2, preferred_element_type=jnp.float32).astype(dtype)
    return y + params["tail2"]["bias"].astype(dtype)
