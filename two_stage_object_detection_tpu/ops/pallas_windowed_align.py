"""Pallas TPU kernel: windowed multi-level RoIAlign (FPN predict hot path).

The XLA form (``ops/roi_pool.py:multilevel_roi_align``) materialises every
roi's ``[win, win, C]`` window with a vmapped ``dynamic_slice`` — at
fpn-infer scale (16 x 300 rois, C=256, win=32) that is a 2.5 GB gather
round-trip through HBM plus two batched einsums over the materialised
windows, measured 30.4 ms of the 55.6 ms FPN predict
(scripts/profile_fpn.py, v5e).  This kernel removes the materialisation:

* each roi's window is DMA'd HBM->VMEM (double-buffered, overlapping the
  previous roi's compute) — the only HBM traffic is the 2.5 GB of window
  reads themselves at full DMA bandwidth;
* the two interpolation contractions collapse into ONE MXU matmul per roi:
  ``out[(p,q), c] = sum_{h,w} (wy[p,h] * wx[q,w]) * window[(h,w), c]`` —
  a ``[P*P, win*win] @ [win*win, C]`` product with K = 1024, the shape the
  MXU wants (the separable einsums' K = 32 stages run at ~5% MXU
  occupancy);
* the ``[win, win, C] -> [win*win, C]`` flatten is free: with win a
  multiple of the 8-row sublane tile, both layouts are bit-identical.

The combined operator ``W_r = vec(wy_r) vec(wx_r)^T`` is built in-kernel
(tiny VPU outer product) from the same window-relative weights the XLA
path uses (``roi_pool._windowed_prologue``), so results match the XLA
windowed path to accumulation order.

Forward-only by design: the FPN *train* path keeps the hybrid custom-VJP
(windowed forward + dense matmul backward); predict differentiates
nothing.  Used automatically by ``nets/fpn.py:FPNRoIHead`` on TPU when
``C % 128 == 0``; any other case falls back to the XLA form.

No reference analogue: the reference's RoI pooling is single-level
``torchvision.ops.RoIPool`` (``nets/classify.py:17,43``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from two_stage_object_detection_tpu.ops.roi_pool import _windowed_prologue

ROI_TILE = 32          # rois per program: bounds VMEM (w_comb block 4 MB +
                       # 2 window buffers 1.3 MB + outputs 0.8 MB) and
                       # amortises grid overhead (measured 12.28/12.02/11.86
                       # ms at tile 8/16/32; 64 exceeds VMEM)


def _kernel(meta_ref, w_ref, atlas_ref, out_ref, scratch, sems, *,
            p: int, win: int, win_x: int, c: int, tile: int):
    """One program pools ``tile`` rois with double-buffered window DMA.

    meta_ref: ``[tile, 3]`` int32 SMEM — (batch, atlas row, atlas col).
    w_ref: ``[tile, p*p, win*win]`` VMEM combined interpolation operator
      (built by the XLA prologue: Mosaic cannot reshape the 4D outer
      product in-kernel).
    atlas_ref: ``[B, H_sum, W_pad, C]`` in HBM/ANY.
    out_ref:  ``[tile, p*p, C]`` VMEM.
    scratch:  ``[2, win, win_x, C]`` VMEM window buffers; sems: 2 DMA
      sems.  ``win_x = win + 8``: x-origins are quantized DOWN to the
      8-sublane tile (Mosaic DMA alignment), so the window is 8 wider.
    """
    dt = out_ref.dtype

    def dma(t, slot):
        b = meta_ref[t, 0]
        y0 = meta_ref[t, 1]
        # meta carries x0 // 8: multiplying back in-kernel lets Mosaic
        # PROVE the W-offset is 8-sublane-tile aligned (a raw SMEM value
        # cannot be proven divisible)
        x0 = meta_ref[t, 2] * 8
        return pltpu.make_async_copy(
            atlas_ref.at[b, pl.ds(y0, win), pl.ds(x0, win_x), :],
            scratch.at[slot], sems.at[slot])

    dma(0, 0).start()
    for t in range(tile):                      # static unroll
        slot = t % 2
        if t + 1 < tile:
            dma(t + 1, (t + 1) % 2).start()
        dma(t, slot).wait()
        window = scratch[slot].reshape(win * win_x, c)   # free: win_x % 8 == 0
        out_ref[t] = jax.lax.dot(
            w_ref[t], window, preferred_element_type=jnp.float32).astype(dt)


def windowed_roi_align_batched(pyramid, rois: jnp.ndarray,
                               levels: jnp.ndarray, scales,
                               output_size: int = 7, sampling_ratio: int = 2,
                               window: int = 32, aligned: bool = False,
                               interpret: bool = False) -> jnp.ndarray:
    """Batched windowed multi-level RoIAlign via the Pallas kernel.

    Args:
      pyramid: per-level ``[B, H_l, W_l, C]`` features (RoI levels).
      rois: ``[B, R, 4]`` xyxy in image coordinates.
      levels: ``[B, R]`` int32 pyramid index per roi (0 = finest).
      scales/output_size/sampling_ratio/window/aligned: as
        :func:`...ops.roi_pool.multilevel_roi_align`.

    Returns ``[B, R, P, P, C]`` pooled features (same numbers as the XLA
    windowed path up to accumulation order).
    """
    p, s, win = output_size, sampling_ratio, window
    win_x = win + 8            # x-origin quantized to the 8-sublane tile
    b, r = rois.shape[0], rois.shape[1]
    c = pyramid[0].shape[-1]
    dt = pyramid[0].dtype
    assert win_x % 8 == 0, "window must be a sublane multiple for the flatten"

    atlas, starts_y, ox, wy, wx = jax.vmap(
        lambda pyr_i, rois_i, lv_i: _windowed_prologue(
            pyr_i, rois_i, lv_i, scales, p, s, win, aligned,
            win_x=win_x, x_quant=8)
    )(tuple(pyramid), rois, levels)
    # flatten (B, R) -> tiles of ROI_TILE; pad R_tot up to a tile multiple
    # with windows at origin 0 / weight rows already computed (results of
    # padded rois are sliced away)
    r_tot = b * r
    tile = min(ROI_TILE, r_tot)
    pad = (-r_tot) % tile
    batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)
    meta = jnp.stack(
        [batch_idx, starts_y.reshape(-1), ox.reshape(-1) // 8], axis=-1)
    # combined operator W[(p,q),(h,w)] = wy[p,h] * wx[q,w]: ONE K=win*win
    # MXU matmul per roi instead of two K=win stages.  Built here (not in
    # the kernel): Mosaic cannot flatten the 4D outer product.
    wy_f = wy.reshape(r_tot, p, win)
    wx_f = wx.reshape(r_tot, p, win_x)
    w_comb = (wy_f[:, :, None, :, None] * wx_f[:, None, :, None, :]
              ).reshape(r_tot, p * p, win * win_x).astype(dt)
    if pad:
        meta = jnp.concatenate([meta, jnp.zeros((pad, 3), jnp.int32)])
        w_comb = jnp.concatenate(
            [w_comb, jnp.zeros((pad, p * p, win * win_x), w_comb.dtype)])
    n_tiles = (r_tot + pad) // tile

    out = pl.pallas_call(
        functools.partial(_kernel, p=p, win=win, win_x=win_x, c=c,
                          tile=tile),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, 3), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, p * p, win * win_x), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((tile, p * p, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((r_tot + pad, p * p, c), dt),
        scratch_shapes=[
            pltpu.VMEM((2, win, win_x, c), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(meta, w_comb, atlas)
    return out[:r_tot].reshape(b, r, p, p, c)
