#!/usr/bin/env python
"""Train-step component profile on the real TPU (scan-amortised timings).

Isolates where the ~212 ms/step (batch 16) goes: forward-only, backbone
fwd+bwd, RoI-pool fwd+bwd variants — so the optimisation work targets the
real bottleneck.  Usage: ``python scripts/profile_train.py [batch]``.
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


def scan_time(step_fn, *args, iters=ITERS, label=""):
    @jax.jit
    def loop(*a):
        def body(carry, _):
            out = step_fn(*a, carry)
            return out * 0.0, None
        carry, _ = lax.scan(body, 0.0, None, length=iters)
        return carry

    t0 = time.perf_counter()
    jax.device_get(loop(*args))
    compile_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(loop(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:55s} {dt * 1000:8.2f} ms  (compile {compile_t:.0f}s)",
          flush=True)
    return dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    from two_stage_object_detection_tpu.config import Config
    from two_stage_object_detection_tpu.nets.trainer import (
        create_train_state, train_step_fn)

    print(f"devices: {jax.devices()}  batch={batch}", flush=True)

    def make(cfg):
        _, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                      init_image_size=(64, 64))
        rng = np.random.RandomState(0)
        g = cfg.max_gt_boxes
        batch_d = {
            "image": jnp.asarray(rng.rand(batch, *cfg.input_size, 3), jnp.float32),
            "boxes": jnp.tile(jnp.array([[50.0, 50.0, 300.0, 300.0]]), (batch, g, 1)),
            "labels": jnp.zeros((batch, g), jnp.int32),
            "valid": jnp.tile(jnp.array([True, True] + [False] * (g - 2)),
                              (batch, 1)),
        }
        return state, batch_d

    cfg = Config(batch_size=batch, grad_accum_steps=1, max_gt_boxes=16)
    state, batch_d = make(cfg)
    rngk = jax.random.PRNGKey(2)

    # ---- full step (output depends on the UPDATED state, so the optimizer
    # apply can't be dead-code-eliminated) ----
    def make_full(state0):
        def full(state_, b, carry):
            s2, losses = train_step_fn(
                state_, {**b, "image": b["image"] + carry}, rngk)
            # the probe must touch EVERY updated parameter: touching only one
            # output-layer leaf lets XLA dead-code-eliminate the rest of the
            # backward pass (measured: "full step" collapses to forward-only)
            probe = sum(jnp.sum(x).astype(jnp.float32)
                        for x in jax.tree_util.tree_leaves(s2.params))
            return losses["total"] + probe
        return full
    t_full = scan_time(make_full(state), state, batch_d,
                       label="full train step accum=1 (fwd+bwd+opt)")

    cfg32 = Config(batch_size=batch, grad_accum_steps=32, max_gt_boxes=16)
    state32, _ = make(cfg32)
    scan_time(make_full(state32), state32, batch_d,
              label="full train step accum=32 (MultiSteps)")

    cfg_al = Config(batch_size=batch, grad_accum_steps=1, max_gt_boxes=16,
                    roi_pool_mode="align")
    state_al, _ = make(cfg_al)
    scan_time(make_full(state_al), state_al, batch_d,
              label="full train step accum=1, roi_align")

    # ---- forward only ----
    def fwd_only(state_, b, carry):
        out = state_.apply_fn(
            {"params": state_.params, "batch_stats": state_.batch_stats},
            b["image"] + carry, b["boxes"], b["labels"], b["valid"],
            method="train_forward", mutable=["batch_stats"],
            rngs={"sampling": rngk})
        return out[0]["losses"]["total"]
    t_fwd = scan_time(fwd_only, state, batch_d, label="train forward only")

    # ---- backbone fwd+bwd only ----
    from two_stage_object_detection_tpu.models.registry import build_backbone
    extractor, _ = build_backbone(cfg.backbone, jnp.bfloat16)
    ex_vars = jax.jit(extractor.init)(jax.random.PRNGKey(0),
                                      jnp.zeros((1, 64, 64, 3)))

    def backbone_grad(v, b, carry):
        def loss(p):
            feats = extractor.apply({"params": p,
                                     "batch_stats": v["batch_stats"]},
                                    b["image"] + carry, False)
            return jnp.sum(feats.astype(jnp.float32))
        return jax.grad(loss)(v["params"])["stem0"]["conv"]["kernel"].sum()
    t_bb = scan_time(backbone_grad, ex_vars, batch_d,
                     label="backbone fwd+bwd (sum loss)")

    # ---- RoI pool fwd+bwd variants at train scale (128 rois) ----
    from two_stage_object_detection_tpu.ops.roi_pool import roi_align, roi_pool
    from two_stage_object_detection_tpu.ops.pallas_roi_bwd import roi_pool_fast

    fh, fw, c = cfg.feat_size[0], cfg.feat_size[1], cfg.backbone_channels
    r = cfg.roi_n_sample
    rngs = np.random.RandomState(1)
    feats = jnp.asarray(rngs.rand(batch, fh, fw, c), jnp.float32)
    feats_bf = feats.astype(jnp.bfloat16)
    rois = jnp.asarray(
        np.stack([np.sort(rngs.rand(batch, r, 2) * fw, -1)[..., 0],
                  np.sort(rngs.rand(batch, r, 2) * fh, -1)[..., 0],
                  np.sort(rngs.rand(batch, r, 2) * fw, -1)[..., 1],
                  np.sort(rngs.rand(batch, r, 2) * fh, -1)[..., 1]], -1),
        jnp.float32)

    def pool_grad(f, ro, carry):
        def loss(ff):
            out = jax.vmap(lambda a, b_: roi_pool(a, b_, 7, 1.0))(
                ff + carry.astype(ff.dtype), ro)
            return jnp.sum(out.astype(jnp.float32))
        return jax.grad(loss)(f).astype(jnp.float32).sum()
    scan_time(pool_grad, feats, rois, label="roi_pool fwd+bwd XLA f32 (128 rois)")
    scan_time(pool_grad, feats_bf, rois, label="roi_pool fwd+bwd XLA bf16 (128 rois)")

    def pool_fast_grad(f, ro, carry):
        def loss(ff):
            out = roi_pool_fast(ff + carry.astype(ff.dtype), ro, 7, 1.0, False)
            return jnp.sum(out.astype(jnp.float32))
        return jax.grad(loss)(f).astype(jnp.float32).sum()
    scan_time(pool_fast_grad, feats, rois,
              label="roi_pool fwd + pallas bwd (128 rois)")

    def pool_mean_grad(f, ro, carry):
        def loss(ff):
            out = jax.vmap(lambda a, b_: roi_pool(a, b_, 7, 1.0))(
                ff + carry.astype(ff.dtype), ro)
            return jnp.sum(jnp.mean(out, axis=(2, 3)).astype(jnp.float32))
        return jax.grad(loss)(f).astype(jnp.float32).sum()
    scan_time(pool_mean_grad, feats_bf, rois,
              label="roi_pool+mean fused fwd+bwd bf16")

    def align_grad(f, ro, carry):
        def loss(ff):
            out = jax.vmap(lambda a, b_: roi_align(a, b_, 7, 1.0))(
                ff + carry.astype(ff.dtype), ro)
            return jnp.sum(out.astype(jnp.float32))
        return jax.grad(loss)(f).astype(jnp.float32).sum()
    scan_time(align_grad, feats_bf, rois, label="roi_align fwd+bwd bf16")

    # ---- predict-scale pooling forward (300 rois) ----
    r300 = jnp.tile(rois[:, :1], (1, 300, 1)) + \
        jnp.arange(300, dtype=jnp.float32)[None, :, None] % 7.0
    def pool_fwd(f, ro, carry):
        out = jax.vmap(lambda a, b_: roi_pool(a, b_, 7, 1.0))(
            f + carry.astype(f.dtype), ro)
        return jnp.sum(out.astype(jnp.float32))
    scan_time(pool_fwd, feats_bf, r300, label="roi_pool fwd bf16 (300 rois)")
    def align_fwd(f, ro, carry):
        out = jax.vmap(lambda a, b_: roi_align(a, b_, 7, 1.0))(
            f + carry.astype(f.dtype), ro)
        return jnp.sum(out.astype(jnp.float32))
    scan_time(align_fwd, feats_bf, r300, label="roi_align fwd bf16 (300 rois)")

    # ---- optimizer apply alone (precomputed grads) ----
    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
    def opt_only(state_, g_, carry):
        g2 = jax.tree_util.tree_map(lambda x: x + carry.astype(x.dtype), g_)
        s2 = state_.apply_gradients(grads=g2)
        return jnp.sum(s2.params["rpn_head"]["loc"]["bias"]).astype(jnp.float32)
    scan_time(opt_only, state, grads, label="optimizer apply alone accum=1")
    scan_time(opt_only, state32, grads, label="optimizer apply alone accum=32")

    print(f"\nfull {t_full*1e3:.1f} ms = fwd {t_fwd*1e3:.1f} + bwd/opt "
          f"{(t_full-t_fwd)*1e3:.1f}; backbone fwd+bwd {t_bb*1e3:.1f}",
          flush=True)


if __name__ == "__main__":
    main()
