#!/usr/bin/env python
"""Round-3 stem experiments: per-op attribution + input space-to-depth.

After the strided `hardnet39s` fix the stem (600x600x3 -> 150x150x48,
12.3 ms fwd+bwd at batch 16) is ~20% of the strided backbone.  Its first
conv has C_in=3 — the worst lane shape in the network (3 of 128 lanes
carry data) — and runs at the largest spatial size.  The classic TPU fix
is *input* space-to-depth: fold 2x2 pixels into channels so the first
conv runs at 300x300x12 with a 2x2 kernel.  The rewrite is EXACT for the
reference stem0 (conv 3x3 stride 2, pad 1): output pixel (i, j) reads
original rows 2i-1..2i+1 in folded rows i-1..i, so a 2x2-kernel stride-1
conv over the folded image with weights scattered from the original
3x3x3xC kernel (and one zero tap row) reproduces it bit-for-bit in exact
arithmetic.  Weight-level parity with the torch reference is preserved —
the scatter is a deterministic re-layout.

Measurements (batch 16, bf16, fwd+bwd, scan-amortised):
  1. stem op attribution: s0 / s1 / s2 in isolation + whole stem
  2. s2d stem: fold(2x2) -> conv2x2 s1 (12->24) -> 1x1 -> dw s2
  3. s2d numerics: scattered-weight fwd equality vs reference stem0 (f32)

Run on the TPU: ``python scripts/ablate_stem.py [batch]``.
Reference stem: /root/reference/models/hardnet.py:158-165 (stem convs).
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
    ConvLayer, DWConvLayer)

ITERS = int(os.environ.get("ITERS", 10))
DT = jnp.bfloat16


def bench_fwd_bwd(label, module, x_shape):
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


def space_to_depth(x):
    """[B, H, W, C] -> [B, H/2, W/2, 4C]; channel order (dy, dx, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


# ---------------------------------------------------------------- modules
class Stem(nn.Module):
    @nn.compact
    def __call__(self, x, train=True):
        x = ConvLayer(24, kernel=3, stride=2, dtype=DT, name="s0")(x, train)
        x = ConvLayer(48, kernel=1, dtype=DT, name="s1")(x, train)
        x = DWConvLayer(48, stride=2, dtype=DT, name="s2")(x, train)
        return x


class Stem0(nn.Module):
    @nn.compact
    def __call__(self, x, train=True):
        return ConvLayer(24, kernel=3, stride=2, dtype=DT, name="s0")(x, train)


class Stem1(nn.Module):
    @nn.compact
    def __call__(self, x, train=True):
        return ConvLayer(48, kernel=1, dtype=DT, name="s1")(x, train)


class Stem2(nn.Module):
    @nn.compact
    def __call__(self, x, train=True):
        return DWConvLayer(48, stride=2, dtype=DT, name="s2")(x, train)


class S2DStem(nn.Module):
    """Stem with stem0 rewritten over a folded input.

    fold(2x2): 600x600x3 -> 300x300x12, then conv 2x2 stride 1 (12->24)
    with padding (1,0): folded row i-1 supplies original rows 2i-2..2i-1
    (the 2i-2 taps are zero in the scattered weights), folded row i
    supplies 2i..2i+1.  Output 300x300x24 == stem0 output exactly.
    """

    fold_in_graph: bool = True   # include the fold's cost in the measure

    @nn.compact
    def __call__(self, x, train=True):
        if self.fold_in_graph:
            x = space_to_depth(x)
        x = nn.Conv(24, (2, 2), padding=[(1, 0)] * 2, use_bias=False,
                    dtype=DT, name="s0f")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=DT, name="bn0")(x)
        x = jnp.minimum(jnp.maximum(x, 0), 6)
        x = ConvLayer(48, kernel=1, dtype=DT, name="s1")(x, train)
        x = DWConvLayer(48, stride=2, dtype=DT, name="s2")(x, train)
        return x


def scatter_stem0_weights(k3):
    """Scatter the reference [3,3,3,C] stem0 kernel into the folded
    [2,2,12,C] kernel (folded channel order (dy, dx, c))."""
    co = k3.shape[-1]
    k2 = np.zeros((2, 2, 12, co), k3.dtype)
    # output pixel (i,j) = sum over taps (a,b) in 0..2 of
    #   k3[a,b] * orig[2i-1+a, 2j-1+b].  Orig row 2i+d (d in {-1,0,1})
    # lives in folded row i + (d==-1 ? -1 : 0) with sub-row dy = d mod 2;
    # relative to the 2x2 window's first row (i-1) that is fr=(d+2)//2.
    for a in range(3):
        r = a - 1               # row offset d from 2i
        fr = (2 + r) // 2
        dy = (r + 2) % 2
        for bb in range(3):
            cdel = bb - 1
            fc = (2 + cdel) // 2
            dx = (cdel + 2) % 2
            # folded channel index for (dy, dx, c): (dy*2 + dx)*3 + c
            for c in range(3):
                k2[fr, fc, (dy * 2 + dx) * 3 + c, :] += k3[a, bb, c, :]
    return k2


def check_numerics():
    """Scattered-weight fwd equality: s2d stem0 vs reference stem0 (f32)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 600, 600, 3), jnp.float32)
    k3 = rng.randn(3, 3, 3, 24).astype(np.float32)

    ref = lax.conv_general_dilated(
        x, jnp.asarray(k3), window_strides=(2, 2),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    xf = space_to_depth(x)
    k2 = jnp.asarray(scatter_stem0_weights(k3))
    out = lax.conv_general_dilated(
        xf, k2, window_strides=(1, 1), padding=[(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    err = float(jnp.max(jnp.abs(ref - out)))
    rel = err / float(jnp.max(jnp.abs(ref)))
    print(f"s2d stem0 numerics: max abs err {err:.3e}  rel {rel:.3e}  "
          f"shapes ref={ref.shape} s2d={out.shape}", flush=True)
    return rel


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    print(f"devices: {jax.devices()}  batch={batch}  iters={ITERS}",
          flush=True)
    b = batch

    print("\n== 0. numerics (f32, CPU-precision check on device) ==")
    check_numerics()

    print("\n== 1. stem op attribution (fwd+bwd) ==")
    bench_fwd_bwd("stem total (600x600x3 -> 150x150x48)", Stem(),
                  (b, 600, 600, 3))
    bench_fwd_bwd("  s0: conv3x3 s2 3->24 @600", Stem0(), (b, 600, 600, 3))
    bench_fwd_bwd("  s1: conv1x1 24->48 @300", Stem1(), (b, 300, 300, 24))
    bench_fwd_bwd("  s2: dw3x3 s2 48 @300", Stem2(), (b, 300, 300, 48))

    print("\n== 2. space-to-depth stem (fwd+bwd) ==")
    bench_fwd_bwd("s2d stem (fold in graph)", S2DStem(),
                  (b, 600, 600, 3))
    bench_fwd_bwd("s2d stem (pre-folded input)", S2DStem(fold_in_graph=False),
                  (b, 300, 300, 12))


if __name__ == "__main__":
    main()
