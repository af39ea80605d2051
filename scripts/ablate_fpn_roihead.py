#!/usr/bin/env python
"""Micro-ablation of the FPN multi-level RoIAlign structure (v5e).

The stage profile (scripts/profile_fpn.py) pins 46 of the FPN predict's
71 ms on the RoI head.  This isolates candidate structures on random data
at exactly the fpn_infer shapes (batch 16, R=300 rois, P2..P5 of 600^2,
C=256, bf16):

  stage1[l] / stage2[l]   the two matmuls of roi_align_mm per level
  shipped                 4x (align weights -> stage1 -> stage2) + blend
  concat2                 4x (weights -> stage1), one-hot applied in the
                          s1 domain, levels CONCATENATED along w -> ONE
                          stage2 einsum (no per-level batched matmuls)

Everything is passed as explicit jit args (captured device constants blow
the remote-compile request size limit: HTTP 413).
"""

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

sys.path.insert(0, ".")

from two_stage_object_detection_tpu.ops.roi_pool import _align_weights

B, R, P, C, S = 16, 300, 7, 256, 2
LEVELS = [(150, 150), (75, 75), (38, 38), (19, 19)]
STRIDES = [4, 8, 16, 32]
DT = jnp.bfloat16


def scan_time(fn, *args, iters=20):
    @jax.jit
    def loop(*a):
        def body(carry, _):
            out = fn(*a, carry)
            return jnp.sum(out.astype(jnp.float32)) * 0.0, None
        carry, _ = lax.scan(body, 0.0, None, length=iters)
        return carry

    jax.device_get(loop(*args))
    t0 = time.perf_counter()
    jax.device_get(loop(*args))
    return (time.perf_counter() - t0) / iters * 1000.0


def make_weights(rois, h, w, stride):
    """[B, R, P, H] / [B, R, P, W] bilinear weights for one level."""
    def per_image(r):
        r4 = r / stride
        roi_w = jnp.maximum(r4[:, 2] - r4[:, 0], 1.0)
        roi_h = jnp.maximum(r4[:, 3] - r4[:, 1], 1.0)
        wy = _align_weights(r4[:, 1], roi_h, P, S, h)
        wx = _align_weights(r4[:, 0], roi_w, P, S, w)
        return wy, wx
    return jax.vmap(per_image)(rois)


def stage1(f, wy_l, c):
    def per_image(fi, wyi):
        h, w = fi.shape[:2]
        s1 = (wyi.reshape(-1, h).astype(DT) @ fi.reshape(h, -1)
              + c.astype(DT))
        return s1.reshape(R, P, w, C)
    return jax.vmap(per_image)(f, wy_l)


def stage2(s1, wx_l, c):
    return jnp.einsum("brqw,brpwc->brpqc", wx_l.astype(DT), s1 + c.astype(DT))


def shipped(feats, rois, onehot, c):
    pooled = None
    for li, ((h, w), st) in enumerate(zip(LEVELS, STRIDES)):
        wy, wx = make_weights(rois, h, w, st)
        s1 = stage1(feats[li], wy, c)
        p = stage2(s1, wx, c)
        wgt = onehot[:, :, li][..., None, None, None].astype(p.dtype)
        pooled = p * wgt if pooled is None else pooled + p * wgt
    return pooled


def concat2(feats, rois, onehot, c):
    s1s, wxs = [], []
    for li, ((h, w), st) in enumerate(zip(LEVELS, STRIDES)):
        wy, wx = make_weights(rois, h, w, st)
        wgt = onehot[:, :, li][..., None, None, None].astype(DT)
        s1s.append(stage1(feats[li], wy, c) * wgt)
        wxs.append(wx.astype(DT) * wgt[..., 0])
    return stage2(jnp.concatenate(s1s, axis=3),
                  jnp.concatenate(wxs, axis=3), c)


def main():
    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.rand(B, h, w, C), DT) for h, w in LEVELS]
    x1 = rng.rand(B, R) * 500
    y1 = rng.rand(B, R) * 500
    bw = rng.rand(B, R) * 90 + 8
    rois = jnp.asarray(np.stack([x1, y1, x1 + bw, y1 + bw], -1), jnp.float32)
    onehot = jax.nn.one_hot(
        jnp.asarray(rng.randint(0, 4, size=(B, R))), 4, dtype=jnp.float32)

    print(f"B={B} R={R} P={P} C={C} levels={LEVELS} dtype={DT.__name__}",
          flush=True)
    t = scan_time(lambda f0, f1, f2, f3, r, oh, c:
                  shipped([f0, f1, f2, f3], r, oh, c),
                  *feats, rois, onehot)
    print(f"  shipped (4x stage2 + blend)  {t:7.2f} ms", flush=True)
    t = scan_time(lambda f0, f1, f2, f3, r, oh, c:
                  concat2([f0, f1, f2, f3], r, oh, c),
                  *feats, rois, onehot)
    print(f"  concat2 (1x stage2)          {t:7.2f} ms", flush=True)

    # parity: identical up to bf16 summation order
    a = shipped(feats, rois, onehot, jnp.float32(0))
    b = concat2(feats, rois, onehot, jnp.float32(0))
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) -
                                b.astype(jnp.float32))))
    print(f"  max |shipped - concat2| = {err:.4f}", flush=True)


def bench_windowed():
    """Windowed multilevel RoIAlign (ops.roi_pool.multilevel_roi_align)."""
    import importlib
    rp = importlib.import_module(
        "two_stage_object_detection_tpu.ops.roi_pool")
    from two_stage_object_detection_tpu.nets.fpn import fpn_level_assign

    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.rand(B, h, w, C), DT) for h, w in LEVELS]
    x1 = rng.rand(B, R) * 500
    y1 = rng.rand(B, R) * 500
    bw = rng.rand(B, R) * 90 + 8
    rois = jnp.asarray(np.stack([x1, y1, x1 + bw, y1 + bw], -1), jnp.float32)

    def run(f0, f1, f2, f3, r, c):
        def per_image(pyr_i, rois_i):
            lv = fpn_level_assign(rois_i, 2, 5) - 2
            return rp.multilevel_roi_align(
                pyr_i, rois_i + c, lv, (0.25, 0.125, 0.0625, 0.03125),
                P, 2, window=32)
        return jax.vmap(per_image)((f0, f1, f2, f3), r)

    t = scan_time(run, *feats, rois)
    print(f"  windowed (atlas+slice)       {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "windowed":
        bench_windowed()
    else:
        main()
