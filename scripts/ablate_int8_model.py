"""Backbone-only int8 vs bf16: separates Amdahl from fusion failure.

scripts/ablate_int8.py measured 1.4-2.4x per dense conv, but the
end-to-end quantized predict is a wash (bench.py int8 mode).  If the
quantized backbone ALONE wins ~1.4x, the predict result is Amdahl's law
(RoI head + proposals dominate); if it is also ~1.0x, the requant chain
is not fusing and int8 tensors never reach HBM.

Run: python scripts/ablate_int8_model.py
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")
from two_stage_object_detection_tpu.models.registry import build_backbone
from two_stage_object_detection_tpu.quantize import calibrate, quantized

ITERS = 30


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

    jax.device_get(loop(*args))
    t0 = time.perf_counter()
    jax.device_get(loop(*args))
    return (time.perf_counter() - t0) / iters


def main():
    log(f"devices: {jax.devices()}")
    batch = 16
    for name in ("resnet34", "resnet50", "hardnet39s"):
        model, _ = build_backbone(name, jnp.bfloat16)
        images = jax.random.uniform(jax.random.PRNGKey(1),
                                    (batch, 600, 600, 3), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                        jnp.zeros((1, 64, 64, 3)))
        scales = calibrate(model, variables, [images])
        log(f"{name}: {len(scales)} quantized convs")
        qapply = quantized(model.apply, scales)

        def bf16_step(variables, images, carry):
            return jnp.max(model.apply(variables, images + carry)
                           .astype(jnp.float32))

        def int8_step(variables, images, carry):
            return jnp.max(qapply(variables, images + carry)
                           .astype(jnp.float32))

        t_bf = scan_time(bf16_step, variables, images)
        t_i8 = scan_time(int8_step, variables, images)
        log(f"{name} backbone b{batch}: bf16 {t_bf*1e3:.1f} ms | "
            f"int8 {t_i8*1e3:.1f} ms ({t_bf/t_i8:.2f}x)")


if __name__ == "__main__":
    main()
