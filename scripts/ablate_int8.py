"""Int8 conv viability on v5e: does XLA use the native int8 MXU path?

v5e's MXU peaks at 394 TOPS int8 vs 197 TFLOPS bf16, and int8
activations halve HBM traffic — relevant because the backbone is
memory-bound at lane-padded widths (docs/DESIGN.md).  This script
measures representative conv shapes in bf16 vs int8(+int32 accum) with
the scan-amortised methodology from bench.py, to decide whether a
quantized inference path is worth building.

Run: python scripts/ablate_int8.py
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

ITERS = 50


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def scan_time(step_fn, *args, iters=ITERS):
    @jax.jit
    def loop(*a):
        def body(carry, _):
            out = step_fn(*a, carry)
            return out * 0.0, None
        carry, _ = lax.scan(body, jnp.float32(0.0), None, length=iters)
        return carry

    t0 = time.perf_counter()
    jax.device_get(loop(*args))
    log(f"  compile+first: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    jax.device_get(loop(*args))
    return (time.perf_counter() - t0) / iters


def conv(x, w, stride=1, groups=1, acc=None):
    return lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=acc,
    )


CHAIN = 8  # convs chained per scan iteration, to amortise the ~0.7 ms
#            per-iteration dispatch/scan floor (docs/DESIGN.md traps)


def bench_shape(name, b, h, w, cin, cout, k, stride=1, groups=1):
    """Chain of CHAIN square convs (cout->cout after the first), with a
    carry dependency between links so XLA cannot parallelise them; the
    reported figure is per-conv."""
    assert stride == 1 and cin == cout, "chain needs shape-preserving convs"
    key = jax.random.PRNGKey(0)
    xf = jax.random.normal(key, (b, h, w, cin), jnp.bfloat16)
    wf = jax.random.normal(key, (k, k, cin // groups, cout), jnp.bfloat16)
    xi = jax.random.randint(key, (b, h, w, cin), -127, 128, jnp.int8)
    wi = jax.random.randint(key, (k, k, cin // groups, cout), -16, 16,
                            jnp.int8)

    def bf16_step(x, w, carry):
        y = x + carry.astype(jnp.bfloat16)
        for _ in range(CHAIN):
            y = jnp.clip(conv(y, w, 1, groups), -3, 3)
        return jnp.max(y).astype(jnp.float32)

    # realistic deployment chain: int8 conv -> int32 accum -> f32 scale
    # + clip (requant) -> int8 for the next layer
    def int8_step(x, w, carry):
        y = (x.astype(jnp.int32) + carry.astype(jnp.int32)).astype(jnp.int8)
        for _ in range(CHAIN):
            acc = conv(y, w, 1, groups, acc=jnp.int32)
            y = jnp.clip(jnp.round(acc.astype(jnp.float32) * 0.01),
                         -127, 127).astype(jnp.int8)
        return jnp.max(y).astype(jnp.float32)

    t_bf = scan_time(bf16_step, xf, wf)
    t_i8 = scan_time(int8_step, xi, wi)
    log(f"{name}: per-conv bf16 {t_bf/CHAIN*1e3:.3f} ms | "
        f"int8+requant {t_i8/CHAIN*1e3:.3f} ms ({t_bf/t_i8:.2f}x)")
    return t_bf, t_i8


def main():
    log(f"devices: {jax.devices()}")
    # ResNet-ish dense 3x3 at the stride-16 map (MXU-bound shape)
    bench_shape("res 3x3 512ch 38x38 b16", 16, 38, 38, 512, 512, 3)
    # ResNet stage-3 shape (256ch at 38x38 ~ layer3 of resnet34)
    bench_shape("res 3x3 256ch 38x38 b16", 16, 38, 38, 256, 256, 3)
    # ResNet stage-2 shape (larger spatial, MXU-heavy)
    bench_shape("res 3x3 128ch 75x75 b16", 16, 75, 75, 128, 128, 3)
    # ResNet stage-1 shape (150x150x64 — bandwidth-heavier)
    bench_shape("res 3x3 64ch 150x150 b16", 16, 150, 150, 64, 64, 3)
    # HarDNet-style narrow 1x1 at 150x150 (bandwidth-bound, lane-padded)
    bench_shape("hard 1x1 32ch 150x150 b16", 16, 150, 150, 32, 32, 1)
    # hardnet39s block1 shape at 75x75
    bench_shape("hard 1x1 96ch 75x75 b16", 16, 75, 75, 96, 96, 1)
    # depthwise 3x3 (VPU op — groups=cin)
    bench_shape("dw 3x3 96ch 75x75 b16", 16, 75, 75, 96, 96, 3, 1, 96)


if __name__ == "__main__":
    main()
