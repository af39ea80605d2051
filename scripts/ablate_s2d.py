#!/usr/bin/env python
"""Round-3 train-step experiments: stage attribution, space-to-depth, stride.

Three measurements on the HarDNet-39 backbone (the train-step bottleneck,
181.9 of 274 ms/step — docs/DESIGN.md "Train-step anatomy"):

1. **Stage attribution**: fwd+bwd cost of each backbone stage in isolation
   (stem / block0..3 + transition + "down" / tail) at the real shapes.
   The reference's stride-1 "downsample" quirk (SURVEY quirk: reference
   models/hardnet.py:189-193) keeps EVERY block at 150x150, so the wide
   late blocks (320-1024 ch) may dominate, not the narrow early ones.

2. **Space-to-depth fold** (round-2 verdict next-#1a): fold 2x2 spatial
   into channels so a 150x150xC layer becomes 75x75x4C.  Exact-equivalence
   construction for a CombConv layer (1x1 conv + BN + ReLU6 + dw3x3 + BN):
   the 1x1 conv becomes a 4Cin->4Cout dense with block-diagonal weights
   (same padded MXU matmul, 4x fewer pixels) and the depthwise 3x3 becomes
   a 2x2-kernel grouped conv with 4-channel groups (one group per base
   channel; a 3-tap window spans at most 2 folded pixels).  Timing uses
   random weights — cost is shape-determined.

3. **True strided downsampling**: the same blocks at the spatial sizes a
   stride-2 "down" layer would give (block1@75, block2/3@38) with the two
   tail strides removed — the candidate `hardnet39s` variant that keeps
   the stride-16 512-ch output contract.

Run on the TPU: ``python scripts/ablate_s2d.py [batch]``.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import flax.linen as nn  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

from two_stage_object_detection_tpu.models.hardnet import (  # noqa: E402
    ConvLayer, DWConvLayer, HarDBlock, hard_block_links, relu6)

ITERS = int(os.environ.get("ITERS", 10))
DT = jnp.bfloat16


def bench_fwd_bwd(label, module, x_shape, train=True):
    """Amortised fwd+bwd (all-param grads) seconds for module on x_shape."""
    x = jnp.asarray(np.random.RandomState(0).rand(*x_shape), jnp.float32)
    variables = jax.jit(module.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1,) + x_shape[1:]), train=True)
    params0 = variables["params"]
    stats0 = variables.get("batch_stats", {})

    def loop(params, x):
        def loss(p, inp):
            out = module.apply({"params": p, "batch_stats": stats0}, inp,
                               True, mutable=["batch_stats"])[0]
            return jnp.sum(out.astype(jnp.float32))

        def body(p, _):
            g = jax.grad(loss)(p, x)
            # carry: consume EVERY grad leaf (no DCE), feed params forward
            p2 = jax.tree_util.tree_map(lambda a, b: a + 0.0 * b, p, g)
            return p2, None

        p, _ = lax.scan(body, params, None, length=ITERS)
        return jax.tree_util.tree_leaves(p)[0].ravel()[0]

    jit_loop = jax.jit(loop)
    t0 = time.perf_counter()
    jax.device_get(jit_loop(params0, x))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(jit_loop(params0, x))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label:58s} {dt * 1e3:8.2f} ms  (compile {compile_s:.0f}s)",
          flush=True)
    return dt


# ---------------------------------------------------------------- modules
class Stage(nn.Module):
    """HarDBlock + 1x1 transition + optional stride-1/2 dw 'down' layer."""
    in_ch: int
    gr: int
    n_layers: int
    trans_ch: int
    down: int = 1          # 0: none, 1: stride-1 quirk, 2: true stride-2

    @nn.compact
    def __call__(self, x, train=True):
        x = HarDBlock(self.in_ch, self.gr, 1.6, self.n_layers,
                      dtype=DT, name="block")(x, train)
        x = ConvLayer(self.trans_ch, kernel=1, dtype=DT, name="trans")(x, train)
        if self.down:
            x = DWConvLayer(self.trans_ch, stride=self.down, dtype=DT,
                            name="down")(x, train)
        return x


class Stem(nn.Module):
    @nn.compact
    def __call__(self, x, train=True):
        x = ConvLayer(24, kernel=3, stride=2, dtype=DT, name="s0")(x, train)
        x = ConvLayer(48, kernel=1, dtype=DT, name="s1")(x, train)
        x = DWConvLayer(48, stride=2, dtype=DT, name="s2")(x, train)
        return x


class Tail(nn.Module):
    stride: int = 2

    @nn.compact
    def __call__(self, x, train=True):
        c = x.shape[-1]
        s = self.stride
        x = nn.Conv(c, (3, 3), strides=(s, s), padding=[(1, 1)] * 2,
                    feature_group_count=c, dtype=DT, name="t0")(x)
        x = nn.relu(x)
        x = nn.Conv(c, (3, 3), strides=(s, s), padding=[(1, 1)] * 2,
                    feature_group_count=c, dtype=DT, name="t1")(x)
        x = nn.Conv(512, (1, 1), feature_group_count=512, dtype=DT,
                    name="t2")(x)
        return x


class FoldedCombConv(nn.Module):
    """Space-to-depth image of a CombConvLayer.

    Input/output live in the folded layout ``[H/2, W/2, C*4]`` with channel
    order (base_channel, sub_position).  The 1x1 conv is a dense 4Cin->4Cout
    (block-diagonal in exact arithmetic — same padded matmul cost); the
    depthwise 3x3 is a 2x2-kernel grouped conv, one 4->4 group per base
    channel.
    """
    out_channels: int

    @nn.compact
    def __call__(self, x, train=True):
        co = self.out_channels
        x = nn.Conv(4 * co, (1, 1), use_bias=False, dtype=DT,
                    name="pw")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=DT, name="bn1")(x)
        x = relu6(x)
        x = nn.Conv(4 * co, (2, 2), padding=[(1, 0)] * 2,
                    feature_group_count=co, use_bias=False, dtype=DT,
                    name="dw")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=DT, name="bn2")(x)
        return x


class FoldedHarDBlock(nn.Module):
    """HarDBlock with every layer a FoldedCombConv (folded layout)."""
    in_channels: int
    growth_rate: int
    n_layers: int

    @nn.compact
    def __call__(self, x, train=True):
        out_chs, _, links, _ = hard_block_links(
            self.n_layers, self.in_channels, self.growth_rate, 1.6)
        outputs = [x]
        for t in range(1, self.n_layers + 1):
            tin = [outputs[j] for j in links[t - 1]]
            inp = jnp.concatenate(tin, axis=-1) if len(tin) > 1 else tin[0]
            out = FoldedCombConv(out_chs[t], name=f"l{t}")(inp, train)
            outputs.append(out)
        keep = [o for i, o in enumerate(outputs)
                if i == len(outputs) - 1 or (i % 2 == 1 and i > 0)]
        return jnp.concatenate(keep, axis=-1)


class FoldedStage(nn.Module):
    in_ch: int
    gr: int
    n_layers: int
    trans_ch: int

    @nn.compact
    def __call__(self, x, train=True):
        x = FoldedHarDBlock(self.in_ch, self.gr, self.n_layers,
                            name="block")(x, train)
        x = nn.Conv(4 * self.trans_ch, (1, 1), use_bias=False, dtype=DT,
                    name="trans")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=DT,
                         name="bn")(x)
        x = relu6(x)
        x = nn.Conv(4 * self.trans_ch, (2, 2), padding=[(1, 0)] * 2,
                    feature_group_count=self.trans_ch, use_bias=False,
                    dtype=DT, name="down")(x)
        return x


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    which = sys.argv[2] if len(sys.argv) > 2 else "all"
    print(f"devices: {jax.devices()}  batch={batch}  iters={ITERS}",
          flush=True)
    b = batch

    if which in ("all", "stages"):
        print("\n== 1. stage attribution (reference shapes, all at 150x150) ==")
        bench_fwd_bwd("stem (600x600x3 -> 150x150x48)", Stem(), (b, 600, 600, 3))
        bench_fwd_bwd("block0+t+d (150x150x48, gr16 n4 -> 96)",
                      Stage(48, 16, 4, 96), (b, 150, 150, 48))
        bench_fwd_bwd("block1+t+d (150x150x96, gr20 n16 -> 320)",
                      Stage(96, 20, 16, 320), (b, 150, 150, 96))
        bench_fwd_bwd("block2+t+d (150x150x320, gr64 n8 -> 640)",
                      Stage(320, 64, 8, 640), (b, 150, 150, 320))
        bench_fwd_bwd("block3+t (150x150x640, gr160 n4 -> 1024)",
                      Stage(640, 160, 4, 1024, down=0), (b, 150, 150, 640))
        bench_fwd_bwd("tail (150x150x1024 -> 38x38x512)",
                      Tail(), (b, 150, 150, 1024))

    if which in ("all", "s2d"):
        print("\n== 2. space-to-depth fold (same stages, folded layout) ==")
        bench_fwd_bwd("folded block0+t+d (75x75x192)",
                      FoldedStage(48, 16, 4, 96), (b, 75, 75, 4 * 48))
        bench_fwd_bwd("folded block1+t+d (75x75x384)",
                      FoldedStage(96, 20, 16, 320), (b, 75, 75, 4 * 96))

    if which in ("all", "stride"):
        print("\n== 3. true stride-2 downs (candidate hardnet39s shapes) ==")
        bench_fwd_bwd("block1+t+d2 (75x75x96 -> 38x38x320)",
                      Stage(96, 20, 16, 320, down=2), (b, 75, 75, 96))
        bench_fwd_bwd("block2+t+d2 (38x38x320 -> 19... kept 38: d1)",
                      Stage(320, 64, 8, 640, down=1), (b, 38, 38, 320))
        bench_fwd_bwd("block3+t (38x38x640 -> 1024)",
                      Stage(640, 160, 4, 1024, down=0), (b, 38, 38, 640))
        bench_fwd_bwd("tail s1 (38x38x1024 -> 38x38x512)",
                      Tail(stride=1), (b, 38, 38, 1024))
        bench_fwd_bwd("block0+t+d2 (150x150x48 -> 75x75x96)",
                      Stage(48, 16, 4, 96, down=2), (b, 150, 150, 48))


if __name__ == "__main__":
    main()
