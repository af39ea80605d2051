#!/usr/bin/env python
"""Per-stage backbone timing on the current device (scan-amortised).

Times the HarDNet-39 stem, each HarDBlock+transition, and the tail
separately to locate the compute, using in-jit lax.scan loops so remote
runtime roundtrips do not pollute the numbers.
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")

from two_stage_object_detection_tpu.models.hardnet import (  # noqa: E402
    ConvLayer, DWConvLayer, HarDBlock, _ARCH)

BATCH = 16
N = 20
DT = jnp.bfloat16


def bench(name, mod, shape):
    x = jax.random.uniform(jax.random.PRNGKey(0), shape, jnp.float32)
    v = mod.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def loop(v, x):
        def body(c, _):
            out = mod.apply(v, x + c)
            return jnp.sum(out.astype(jnp.float32)) * 0.0, None
        c, _ = lax.scan(body, 0.0, None, length=N)
        return c

    jax.device_get(loop(v, x))
    t0 = time.perf_counter()
    jax.device_get(loop(v, x))
    dt = (time.perf_counter() - t0) / N * 1000
    print(f"{name:42s} {dt:7.2f} ms", flush=True)
    return dt


def main():
    total = 0.0
    total += bench("stem0 conv3x3 3->24 s2 @600", ConvLayer(24, 3, 2, dtype=DT),
                   (BATCH, 600, 600, 3))
    total += bench("stem1 conv1x1 24->48 @300", ConvLayer(48, 1, 1, dtype=DT),
                   (BATCH, 300, 300, 24))
    total += bench("stem2 dw3x3 s2 48 @300", DWConvLayer(48, 2, dtype=DT),
                   (BATCH, 300, 300, 48))

    first_ch, ch_list, grmul, gr, n_layers, down_samp = _ARCH[39]
    ch = first_ch[1]
    for i in range(len(n_layers)):
        blk = HarDBlock(ch, gr[i], grmul, n_layers[i], dwconv=True, dtype=DT)
        total += bench(f"block{i} gr{gr[i]} n{n_layers[i]} in{ch} @150",
                       blk, (BATCH, 150, 150, ch))
        ch_out = blk.out_channels
        total += bench(f"transition{i} 1x1 {ch_out}->{ch_list[i]} @150",
                       ConvLayer(ch_list[i], 1, dtype=DT),
                       (BATCH, 150, 150, ch_out))
        ch = ch_list[i]
        if down_samp[i]:
            total += bench(f"down{i} dw3x3 s1 {ch} @150",
                           DWConvLayer(ch, 1, dtype=DT), (BATCH, 150, 150, ch))
    print(f"{'TOTAL (sum of stages)':42s} {total:7.2f} ms")


if __name__ == "__main__":
    main()
