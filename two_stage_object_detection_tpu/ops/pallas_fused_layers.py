"""Pallas TPU kernels: fused inference layers for the HarDNet trunk.

The backbone spends its time in long chains of small ops — 1x1 conv, BN,
ReLU6, depthwise 3x3, BN — each a separate full-map HBM round trip under
XLA.  At inference, BN is a per-channel affine (running statistics), so a
whole CombConvLayer folds into ONE kernel:

    y = (relu6(x @ W' + b1) *dw* K') + b2

with W' and K' pre-scaled by the BN factors (see
:mod:`...models.hardnet_fused` for the folding).  The kernel works on the
flattened ``[H*W, C]`` layout (exactly NHWC memory order — no transposes):

* the pointwise conv is an MXU matmul over channels;
* the depthwise 3x3 is nine *sublane shifts* of the intermediate
  (``pltpu.roll`` along the flattened spatial axis: ``dx`` = +-1, ``dy`` =
  +-W) with column masks at row edges;
* row tiles carry a one-row halo: the wrapper zero-pads the image by one
  row top and bottom, each grid step DMAs ``(tile+2)`` rows from HBM,
  computes the pointwise stage on the halo too, then *re-zeroes* the
  halo rows that correspond to image-boundary padding (the depthwise conv
  pads its INPUT with zeros — which is the pointwise OUTPUT, not x).

Inference-only (BN folded); training keeps the flax path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _dw_from(y1, wd_ref, b2_ref, h, w, tile_rows, row0, cout):
    """Depthwise 3x3 + folded BN on a halo'd ``[(tile+2)*W, C]`` intermediate.

    ``row0`` is the global image row of the tile's first interior row.
    Returns the interior ``[tile*W, C]`` result.
    """
    n = y1.shape[0]
    pos = lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    col = pos % w
    # zero out halo rows that lie outside the image (zero padding of the
    # depthwise conv input)
    grow = (pos // w) + row0 - 1                      # global row of each line
    inside = (grow >= 0) & (grow < h)
    y1 = jnp.where(inside, y1, 0.0)

    acc = jnp.zeros_like(y1)
    k = 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            # pltpu.roll requires a non-negative shift; -s mod n is the same
            shifted = pltpu.roll(y1, (-(dy * w + dx)) % n, 0)
            if dx == 1:
                shifted = jnp.where(col == w - 1, 0.0, shifted)
            elif dx == -1:
                shifted = jnp.where(col == 0, 0.0, shifted)
            acc = acc + shifted * wd_ref[k:k + 1, :]
            k += 1
    out = acc + b2_ref[0:1, :]
    return out[w:w + tile_rows * w]


def _window(x_cur, x_prev, x_next, w):
    """Assemble the halo'd window from the pipelined neighbour blocks:
    last row of the previous tile + this tile + first row of the next."""
    return jnp.concatenate([x_prev[0, -w:, :], x_cur[0], x_next[0, :w, :]],
                           axis=0)


def _comb_kernel(x_cur, x_prev, x_next, w1_ref, b1_ref, wd_ref, b2_ref,
                 out_ref, *, h: int, w: int, tile_rows: int,
                 cin: int, cout: int):
    t = pl.program_id(1)
    row0 = t * tile_rows
    window = _window(x_cur, x_prev, x_next, w)

    # pointwise conv + folded BN + ReLU6 (on halo rows too); wrong halo
    # content at the clamped edge tiles is re-zeroed inside _dw_from
    y1 = jnp.dot(window, w1_ref[:], preferred_element_type=jnp.float32)
    y1 = jnp.minimum(jnp.maximum(y1 + b1_ref[0:1, :], 0.0), 6.0)

    out = _dw_from(y1, wd_ref, b2_ref, h, w, tile_rows, row0, cout)
    out_ref[0] = out.astype(out_ref.dtype)


def _dw_only_kernel(x_cur, x_prev, x_next, wd_ref, b2_ref, out_ref, *,
                    h: int, w: int, tile_rows: int, cout: int):
    t = pl.program_id(1)
    row0 = t * tile_rows
    y1 = _window(x_cur, x_prev, x_next, w).astype(jnp.float32)
    out = _dw_from(y1, wd_ref, b2_ref, h, w, tile_rows, row0, cout)
    out_ref[0] = out[:, :cout].astype(out_ref.dtype)


def _pick_tile_rows(h: int, w: int, cin_p: int, cout_p: int) -> int:
    """Rows per tile: ``tile*w`` must be 8-divisible (Mosaic block rule) and
    the kernel's VMEM footprint (DMA scratch + f32 depthwise temporaries +
    double-buffered output blocks) must fit the 16 MB budget.  The grid
    ceil-divides ``h`` and the wrapper slices off the padded tail."""
    budget = 10 * 1024 * 1024
    aligned = [t for t in (16, 12, 8, 4, 2, 1) if (t * w) % 8 == 0]
    if not aligned:
        aligned = [8]            # t*w 8-divisible for any w
    for t in aligned:
        win = (t + 2) * w
        # 3 double-buffered input blocks + ~3 f32 window temporaries
        # + 2 output buffers
        need = (6 * t * w * cin_p * 2 + 3 * win * cout_p * 4
                + 2 * t * w * cout_p * 2)
        if need <= budget:
            return min(t, max(h, 1))
    return min(aligned[-1], max(h, 1))


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret"))
def fused_comb_conv(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
                    wd: jnp.ndarray, b2: jnp.ndarray, *, h: int, w: int,
                    interpret: bool = False) -> jnp.ndarray:
    """Fused 1x1-conv+BN+ReLU6+DW3x3+BN (inference).

    Args:
      x: ``[B, H*W, Cin]`` activations (flattened NHWC).
      w1: ``[Cin, Cout]`` BN1-folded pointwise weights; b1: ``[Cout]``.
      wd: ``[9, Cout]`` BN2-folded depthwise taps (dy-major); b2: ``[Cout]``.

    Returns ``[B, H*W, Cout]``.
    """
    b, hw, cin = x.shape
    cout = w1.shape[1]
    cin_p = _round_up(cin, 128)
    cout_p = _round_up(cout, 128)
    tile_rows = _pick_tile_rows(h, w, cin_p, cout_p)
    n_tiles = -(-h // tile_rows)
    h_pad = n_tiles * tile_rows
    dtype = x.dtype

    # pad rows to the grid and channels to the 128-lane tiling; the halo
    # comes from the neighbouring blocks (prev/cur/next input specs), which
    # the pallas pipeline double-buffers — no manual DMA
    xp = jnp.pad(x.reshape(b, h, w, cin),
                 ((0, 0), (0, h_pad - h), (0, 0), (0, cin_p - cin)))
    xp = xp.reshape(b, h_pad * w, cin_p)
    w1p = jnp.pad(w1, ((0, cin_p - cin), (0, 0)))

    kernel = functools.partial(_comb_kernel, h=h, w=w, tile_rows=tile_rows,
                               cin=cin_p, cout=cout)
    blk = (1, tile_rows * w, cin_p)
    last = n_tiles - 1
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(blk, lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda i, t: (i, jnp.maximum(t - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda i, t, last=last: (i, jnp.minimum(t + 1, last), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),     # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),     # b1 [1, Cout]
            pl.BlockSpec(memory_space=pltpu.VMEM),     # wd [9, Cout]
            pl.BlockSpec(memory_space=pltpu.VMEM),     # b2 [1, Cout]
        ],
        out_specs=pl.BlockSpec((1, tile_rows * w, cout),
                               lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h_pad * w, cout), dtype),
        interpret=interpret,
    )(xp, xp, xp, w1p.astype(dtype),
      b1.reshape(1, -1).astype(jnp.float32),
      wd.astype(jnp.float32), b2.reshape(1, -1).astype(jnp.float32))
    return out[:, :hw]


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret"))
def fused_dw_conv(x: jnp.ndarray, wd: jnp.ndarray, b2: jnp.ndarray, *,
                  h: int, w: int, interpret: bool = False) -> jnp.ndarray:
    """Fused depthwise 3x3 + BN (stride 1, inference): ``[B, H*W, C]``."""
    b, hw, c = x.shape
    c_p = _round_up(c, 128)
    tile_rows = _pick_tile_rows(h, w, c_p, c_p)
    n_tiles = -(-h // tile_rows)
    h_pad = n_tiles * tile_rows
    dtype = x.dtype
    xp = jnp.pad(x.reshape(b, h, w, c),
                 ((0, 0), (0, h_pad - h), (0, 0), (0, c_p - c)))
    xp = xp.reshape(b, h_pad * w, c_p)
    wdp = jnp.pad(wd, ((0, 0), (0, c_p - c)))
    b2p = jnp.pad(b2.reshape(-1), (0, c_p - c))
    kernel = functools.partial(_dw_only_kernel, h=h, w=w,
                               tile_rows=tile_rows, cout=c)
    blk = (1, tile_rows * w, c_p)
    last = n_tiles - 1
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(blk, lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda i, t: (i, jnp.maximum(t - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda i, t, last=last: (i, jnp.minimum(t + 1, last), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_rows * w, c), lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h_pad * w, c), dtype),
        interpret=interpret,
    )(xp, xp, xp, wdp.astype(jnp.float32),
      b2p.reshape(1, -1).astype(jnp.float32))
    return out[:, :hw]
