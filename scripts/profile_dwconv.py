#!/usr/bin/env python
"""Depthwise-conv backward: feature_group_count conv vs explicit 9-shift form.

XLA's grouped-conv gradients are suspected to lower poorly on TPU (the
HarDNet backbone backward costs 4x its forward).  The shift formulation
  y[b,i,j,c] = sum_{dy,dx} x[b,i+dy,j+dx,c] * k[dy,dx,c]
has an autodiff that is pure dense slice/mul/reduce work.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

ITERS = int(os.environ.get("ITERS", 10))


def bench(label, fn, *args):
    jit_fn = jax.jit(fn)
    t0 = time.perf_counter()
    jax.device_get(jit_fn(*args))
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(jit_fn(*args))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label:58s} {dt * 1000:8.2f} ms  (compile {c:.0f}s)", flush=True)
    return dt


def dw_conv_group(x, k):
    """Grouped-conv depthwise: k [3,3,1,C]."""
    c = x.shape[-1]
    return lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def dw_conv_shift(x, k):
    """Shift-form depthwise: same math, dense ops only."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros_like(x)
    for dy in range(3):
        for dx in range(3):
            out = out + xp[:, dy:dy + h, dx:dx + w, :] * k[dy, dx, 0, :]
    return out


def main():
    batch = 16
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.RandomState(0)

    for (h, w, c) in [(150, 150, 48), (150, 150, 328), (300, 300, 48),
                      (38, 38, 640)]:
        x = jnp.asarray(rng.rand(batch, h, w, c), jnp.bfloat16)
        k = jnp.asarray(rng.rand(3, 3, 1, c), jnp.bfloat16)

        for name, f in [("group", dw_conv_group), ("shift", dw_conv_shift)]:
            def fwd_loop(x, k, f=f):
                def body(cr, _):
                    y = f(x + cr.astype(x.dtype), k)
                    return jnp.sum(y.astype(jnp.float32)) * 0.0, None
                cr, _ = lax.scan(body, 0.0, None, length=ITERS)
                return cr
            bench(f"dw {name} fwd        {h}x{w}x{c}", fwd_loop, x, k)

            def bwd_loop(x, k, f=f):
                def loss(k_, x_):
                    return jnp.sum(f(x_, k_).astype(jnp.float32))

                def body(k_, _):
                    gk, gx = jax.grad(loss, argnums=(0, 1))(k_, x)
                    k2 = k_ - 1e-6 * gk - 1e-9 * jnp.sum(gx).astype(k_.dtype)
                    return k2, None
                k2, _ = lax.scan(body, k, None, length=ITERS)
                return jnp.sum(k2.astype(jnp.float32))
            bench(f"dw {name} fwd+bwd(k,x) {h}x{w}x{c}", bwd_loop, x, k)


if __name__ == "__main__":
    main()
