"""ResNet / ResNeXt feature extractors (flax.linen, NHWC).

Equivalents of the reference's ``models/resnet.py:4-172`` (dead code there —
never imported — but wired in here as selectable backbones per SURVEY §2).
Matches the reference's unusual choice of PReLU activations
(``models/resnet.py:11,54,97``).  As feature extractors the networks are cut
at stride 16 (after ``layer3``), giving ``256 * expansion`` channels.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def _bn(train: bool, dtype, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


class PReLU(nn.Module):
    """Single-parameter PReLU (torch ``nn.PReLU()`` default)."""

    init_slope: float = 0.25

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", lambda k: jnp.full((), self.init_slope, jnp.float32))
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


class BasicBlock(nn.Module):
    out_channel: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = PReLU(name="relu")
        identity = x
        if self.downsample:
            identity = nn.Conv(self.out_channel, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False, dtype=self.dtype, name="ds_conv")(x)
            identity = _bn(train, self.dtype, "ds_norm")(identity)
        y = nn.Conv(self.out_channel, (3, 3), strides=(self.stride,) * 2,
                    padding=[(1, 1)] * 2, use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = _bn(train, self.dtype, "bn1")(y)
        y = act(y)
        y = nn.Conv(self.out_channel, (3, 3), padding=[(1, 1)] * 2,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = _bn(train, self.dtype, "bn2")(y)
        return act(y + identity)


class Bottleneck(nn.Module):
    out_channel: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    width_per_group: int = 64
    dtype: Dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = PReLU(name="relu")
        width = int(self.out_channel * (self.width_per_group / 64.0)) * self.groups
        identity = x
        if self.downsample:
            identity = nn.Conv(self.out_channel * self.expansion, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype, name="ds_conv")(x)
            identity = _bn(train, self.dtype, "ds_norm")(identity)
        y = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = _bn(train, self.dtype, "bn1")(y)
        y = act(y)
        y = nn.Conv(width, (3, 3), strides=(self.stride,) * 2, padding=[(1, 1)] * 2,
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = _bn(train, self.dtype, "bn2")(y)
        y = act(y)
        y = nn.Conv(self.out_channel * self.expansion, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = _bn(train, self.dtype, "bn3")(y)
        return act(y + identity)


class ResNetFeatureExtraction(nn.Module):
    """Stride-16 ResNet trunk: conv1 -> maxpool -> layer1..layer3.

    ``pyramid=True`` (FPN backbones) additionally runs ``layer4`` (stride 32)
    and returns the multi-scale taps ``(C2, C3, C4, C5)`` at strides
    4/8/16/32 instead of the single stride-16 map.
    """

    block: str = "bottleneck"            # "basic" | "bottleneck"
    blocks_num: Sequence[int] = (3, 4, 6)  # layer1..layer3 (+layer4) depths
    groups: int = 1
    width_per_group: int = 64
    dtype: Dtype = jnp.float32
    pyramid: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = _bn(train, self.dtype, "bn1")(x)
        x = PReLU(name="relu")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)

        channels = (64, 128, 256, 512)[:len(self.blocks_num)]
        taps = []
        for li, (ch, n) in enumerate(zip(channels, self.blocks_num)):
            stride = 1 if li == 0 else 2
            for bi in range(n):
                s = stride if bi == 0 else 1
                if self.block == "basic":
                    ds = bi == 0 and (s != 1 or li > 0)
                    x = BasicBlock(ch, stride=s, downsample=ds, dtype=self.dtype,
                                   name=f"layer{li + 1}_{bi}")(x, train)
                else:
                    ds = bi == 0
                    x = Bottleneck(ch, stride=s, downsample=ds,
                                   groups=self.groups,
                                   width_per_group=self.width_per_group,
                                   dtype=self.dtype,
                                   name=f"layer{li + 1}_{bi}")(x, train)
            taps.append(x)
        return tuple(taps) if self.pyramid else x

    @property
    def out_channels(self):
        exp = 1 if self.block == "basic" else 4
        if self.pyramid:
            return tuple(c * exp for c in (64, 128, 256, 512)[:len(self.blocks_num)])
        return 256 * exp
