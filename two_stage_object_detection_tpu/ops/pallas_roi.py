"""Pallas TPU kernel: RoI max pooling.

Replaces the jnp separable masked-max (:func:`...ops.roi_pool.roi_pool`) on
the hot path.  The jnp version broadcasts ``where(mask, feat, -inf)`` to a
``[R, P, H, W, C]`` intermediate before reducing — a huge HBM-traffic
amplification.  Here the feature map sits in VMEM and every roi's bins
reduce in place; nothing but the ``[R, P*P, C]`` result leaves the chip.

The grid tiles the roi axis (``ROI_TILE`` rois per program) so the output
block stays within VMEM next to the resident feature map; rois themselves
live in SMEM because they are read one scalar at a time at dynamic indices.

The kernel also emits the argmax *flat index* per pooled cell, which feeds a
cheap scatter-add backward (``custom_vjp``) so the op trains.

Bin-edge semantics match :func:`...ops.roi_pool._bin_edges_pool`
(torchvision RoIPool with exact integer bin edges).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
# The grid tiles (rois x channels).  Channels are independent in max pooling,
# so splitting them shrinks the feature block, the output blocks, AND the
# kernel's [H, W, C_tile] temporaries — all of which share 16 MB of VMEM.
ROI_TILE = 16
CH_TILE = 128


def _roi_pool_kernel(feat_ref, rois_ref, out_ref, idx_ref, *,
                     pooled: int, spatial_scale: float):
    h, w, c = feat_ref.shape
    p = pooled
    tile = out_ref.shape[0]
    base = pl.program_id(0) * tile

    row_ids = lax.broadcasted_iota(jnp.int32, (h, 1, 1), 0)       # [H, 1, 1]
    col_ids = lax.broadcasted_iota(jnp.int32, (1, w, 1), 1)       # [1, W, 1]

    def one_roi(rl, _):
        r = base + rl
        x1 = jnp.round(rois_ref[0, r] * spatial_scale).astype(jnp.int32)
        y1 = jnp.round(rois_ref[1, r] * spatial_scale).astype(jnp.int32)
        x2 = jnp.round(rois_ref[2, r] * spatial_scale).astype(jnp.int32)
        y2 = jnp.round(rois_ref[3, r] * spatial_scale).astype(jnp.int32)
        sx = jnp.maximum(x2 - x1, 1)
        sy = jnp.maximum(y2 - y1, 1)

        feat = feat_ref[:]                                        # [H, W, C]

        # stage 1: per column-bin, masked max over W (separable max) while
        # tracking each winner's flat spatial index with a min-where trick
        stage1_vals = []
        stage1_pos = []
        for pw in range(p):
            ws = jnp.clip(pw * sx // p + x1, 0, w)
            we = jnp.clip(-((pw + 1) * sx // -p) + x1, 0, w)
            cmask = (col_ids >= ws) & (col_ids < we)              # [1, W, 1]
            masked = jnp.where(cmask, feat, NEG)
            vals = jnp.max(masked, axis=1)                        # [H, C]
            is_max = cmask & (masked >= vals[:, None, :])
            flat = (row_ids * w + col_ids).astype(jnp.float32)    # [H, W, 1]
            pos = jnp.min(jnp.where(is_max, flat, 1e9), axis=1)   # [H, C]
            stage1_vals.append(vals)
            stage1_pos.append(pos)

        # stage 2: per row-bin, masked max over H of the stage-1 columns
        for ph in range(p):
            hs = jnp.clip(ph * sy // p + y1, 0, h)
            he = jnp.clip(-((ph + 1) * sy // -p) + y1, 0, h)
            rmask = (row_ids[:, 0, :] >= hs) & (row_ids[:, 0, :] < he)  # [H, 1]
            for pw in range(p):
                masked = jnp.where(rmask, stage1_vals[pw], NEG)   # [H, C]
                vals = jnp.max(masked, axis=0)                    # [C]
                empty = vals <= NEG / 2
                is_max = rmask & (masked >= vals[None, :])
                pos = jnp.min(jnp.where(is_max, stage1_pos[pw], 1e9),
                              axis=0)                             # [C]
                out_ref[rl, ph * p + pw, :] = jnp.where(empty, 0.0, vals)
                idx_ref[rl, ph * p + pw, :] = jnp.where(
                    empty, -1, pos.astype(jnp.int32))
        return 0

    lax.fori_loop(0, tile, one_roi, 0)


def _roi_pool_fwd_impl(features, rois, output_size, spatial_scale, interpret):
    h, w, c = features.shape
    r = rois.shape[0]
    r_pad = -(-r // ROI_TILE) * ROI_TILE
    c_tile = min(CH_TILE, c)
    c_pad = -(-c // c_tile) * c_tile
    rois_p = jnp.pad(rois.astype(jnp.float32), ((0, r_pad - r), (0, 0)))
    feat = jnp.pad(features.astype(jnp.float32), ((0, 0), (0, 0), (0, c_pad - c)))
    pp = output_size * output_size
    kernel = functools.partial(_roi_pool_kernel, pooled=output_size,
                               spatial_scale=spatial_scale)
    out, idx = pl.pallas_call(
        kernel,
        grid=(r_pad // ROI_TILE, c_pad // c_tile),
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, pp, c_pad), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, pp, c_pad), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((h, w, c_tile), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            # rois are read one scalar at a time at dynamic indices -> SMEM
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((ROI_TILE, pp, c_tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROI_TILE, pp, c_tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(feat, rois_p.T)
    p = output_size
    return (out[:r, :, :c].reshape(r, p, p, c),
            idx[:r, :, :c].reshape(r, p, p, c))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def roi_pool_pallas(features: jnp.ndarray, rois: jnp.ndarray,
                    output_size: int = 7, spatial_scale: float = 1.0,
                    interpret: bool = False) -> jnp.ndarray:
    """Pallas RoI max pool: ``([H,W,C], [R,4]) -> [R, P, P, C]``.

    Drop-in for :func:`...ops.roi_pool.roi_pool` (same semantics), trainable
    via a scatter-add backward to the argmax positions.
    """
    return _roi_pool_fwd_impl(features, rois, output_size, spatial_scale,
                              interpret)[0]


def _fwd(features, rois, output_size, spatial_scale, interpret):
    out, idx = _roi_pool_fwd_impl(features, rois, output_size, spatial_scale,
                                  interpret)
    return out, (idx, features.shape)


def _bwd(output_size, spatial_scale, interpret, res, g):
    idx, fshape = res
    h, w, c = fshape
    # scatter-add pooled grads back to their argmax cells; empty bins (-1)
    # are dropped by scatter mode="drop"
    flat = jnp.where(idx < 0, h * w, idx).reshape(-1)             # [R*P*P*C]
    ch = jnp.broadcast_to(jnp.arange(c), idx.shape).reshape(-1)
    dfeat = jnp.zeros((h * w, c), g.dtype)
    dfeat = dfeat.at[flat, ch].add(g.reshape(-1), mode="drop")
    return dfeat.reshape(h, w, c), None


roi_pool_pallas.defvjp(_fwd, _bwd)
