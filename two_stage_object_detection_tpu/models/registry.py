"""Backbone registry: name -> (feature extractor module, output channels)."""

from __future__ import annotations

import jax.numpy as jnp

from two_stage_object_detection_tpu.models.hardnet import HarDNetFeatureExtraction
from two_stage_object_detection_tpu.models.resnet import ResNetFeatureExtraction


def build_backbone(name: str, dtype=jnp.float32, remat: bool = False,
                   pyramid: bool = False):
    """Build a stride-16 feature extractor by name.

    Supported: hardnet39/68/85 (reference ``models/hardnet.py:126-152``),
    hardnet39s/68s/85s (TPU-native *strided* variants — true stride-2
    downsamples instead of the reference's stride-1 quirk, same blocks and
    output contract, ~3.3x cheaper fwd+bwd; see models/hardnet.py
    ``strided``), resnet34/50/101 and resnext50 (reference
    ``models/resnet.py:154-172``).

    ``remat``: rematerialise HarDBlock activations in the backward pass
    (``jax.checkpoint``) — trades ~1 extra block forward for the block's
    activation memory, unlocking large train batches (batch 32 @ 600x600
    otherwise exceeds v5e HBM).

    ``pyramid``: return a multi-scale backbone for FPN — the module yields
    ``(C2, C3, C4, C5)`` taps at strides 4/8/16/32 and ``out_channels`` is
    the per-tap channel tuple.  Supported for resnet* (a stride-32 ``layer4``
    stage is added) and the strided hardnet*s variants; the reference-layout
    hardnet has no genuine pyramid (stride-1 quirk) and raises.
    """
    name = name.lower()
    if name.startswith("hardnet"):
        spec = name.replace("hardnet", "")
        strided = spec.endswith("s")
        arch = int(spec.rstrip("s"))
        if pyramid and not strided:
            raise ValueError(
                f"backbone {name!r} cannot feed an FPN: the reference layout "
                f"keeps all blocks at one spatial size (stride-1 quirk) — "
                f"use hardnet{arch}s or a resnet backbone")
        mod = HarDNetFeatureExtraction(arch=arch, dtype=dtype, remat=remat,
                                       strided=strided, pyramid=pyramid)
        return mod, mod.out_channels
    table = {
        # resnet10: one basic block per stage — not in the reference table
        # (models/resnet.py:154-172); exists so dryruns/tests can compile a
        # real 4-stage pyramid-capable backbone at minimum graph size
        "resnet10": dict(block="basic", blocks_num=(1, 1, 1, 1)),
        "resnet34": dict(block="basic", blocks_num=(3, 4, 6, 3)),
        "resnet50": dict(block="bottleneck", blocks_num=(3, 4, 6, 3)),
        "resnet101": dict(block="bottleneck", blocks_num=(3, 4, 23, 3)),
        "resnext50": dict(block="bottleneck", blocks_num=(3, 4, 6, 3),
                          groups=32, width_per_group=4),
    }
    if name not in table:
        raise ValueError(f"unknown backbone {name!r}; "
                         f"expected hardnet39/68/85 or {sorted(table)}")
    kw = dict(table[name])
    if not pyramid:
        kw["blocks_num"] = kw["blocks_num"][:3]   # stride-16 trunk (no layer4)
    mod = ResNetFeatureExtraction(dtype=dtype, pyramid=pyramid, **kw)
    return mod, mod.out_channels
