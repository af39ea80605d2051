"""Static-shape RoI pooling / RoI align for TPU.

Replaces the reference's ``torchvision.ops.RoIPool`` native kernel
(``nets/classify.py:17,43``).  Two implementations:

* :func:`roi_pool` — max pooling with torchvision RoIPool semantics
  (rounded integer rois, floor/ceil adaptive bins, empty bin -> 0), expressed
  as a *separable masked max*: bin windows are axis-aligned ranges, so
  ``max over bin = max over rows of (max over cols)`` — two dense masked
  reductions, no gathers, pure VPU work.
* :func:`roi_align` — bilinear-sampled average pooling (the standard
  higher-quality op), expressed as 4 gathers per sample point.

Both operate on a single image's ``[H, W, C]`` feature map with ``[R, 4]``
rois in feature-map coordinates scaled by ``spatial_scale``; batch dimensions
are added by ``jax.vmap`` at the call site (which also removes the
reference's batch-index/expand bookkeeping, ``nets/classify.py:38``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


def _bin_edges_pool(lo: jnp.ndarray, hi: jnp.ndarray, pooled: int):
    """torchvision RoIPool bin ranges along one axis.

    Computed with exact integer arithmetic (``floor(p*size/P) == p*size // P``
    since the rounded roi coordinates are integers) — deterministic where the
    float kernel's ``ceil((p+1)*bin_size)`` is half-ulp compiler-dependent.

    Args:
      lo, hi: ``[R]`` rounded-integral roi start/end.
      pooled: number of output bins ``P``.

    Returns:
      ``(start, end)`` each ``[R, pooled]`` float bin boundaries
      (start inclusive, end exclusive), un-clamped.
    """
    lo_i = lo.astype(jnp.int32)
    size = jnp.maximum(hi.astype(jnp.int32) - lo_i, 1)  # [R]
    p = jnp.arange(pooled, dtype=jnp.int32)
    start = (p[None, :] * size[:, None]) // pooled + lo_i[:, None]
    end = ((p[None, :] + 1) * size[:, None] + pooled - 1) // pooled + lo_i[:, None]
    return start.astype(jnp.float32), end.astype(jnp.float32)


def roi_pool(features: jnp.ndarray, rois: jnp.ndarray, output_size: int = 7,
             spatial_scale: float = 1.0) -> jnp.ndarray:
    """Max RoI pooling, torchvision semantics, static shapes.

    Args:
      features: ``[H, W, C]`` feature map.
      rois: ``[R, 4]`` xyxy boxes (multiplied by ``spatial_scale`` to reach
        feature coordinates).
      output_size: pooled spatial size ``P``.

    Returns:
      ``[R, P, P, C]`` pooled features (empty bins are 0).
    """
    h, w, _ = features.shape
    p = output_size
    r = jnp.round(rois.astype(jnp.float32) * spatial_scale)
    x1, y1, x2, y2 = r[:, 0], r[:, 1], r[:, 2], r[:, 3]

    xs, xe = _bin_edges_pool(x1, x2, p)                 # [R, P]
    ys, ye = _bin_edges_pool(y1, y2, p)

    xs = jnp.clip(xs, 0, w)
    xe = jnp.clip(xe, 0, w)
    ys = jnp.clip(ys, 0, h)
    ye = jnp.clip(ye, 0, h)

    cols = jnp.arange(w, dtype=jnp.float32)
    rows = jnp.arange(h, dtype=jnp.float32)
    col_mask = (cols[None, None, :] >= xs[:, :, None]) & (cols[None, None, :] < xe[:, :, None])  # [R, P, W]
    row_mask = (rows[None, None, :] >= ys[:, :, None]) & (rows[None, None, :] < ye[:, :, None])  # [R, P, H]

    # stage 1: masked max over W -> [R, Pw, H, C]
    f = features[None, None]                            # [1, 1, H, W, C]
    cm = col_mask[:, :, None, :, None]                  # [R, Pw, 1, W, 1]
    stage1 = jnp.max(jnp.where(cm, f, NEG_INF), axis=3)  # [R, Pw, H, C]

    # stage 2: masked max over H -> [R, Ph, Pw, C]
    rm = row_mask[:, :, None, :, None]                  # [R, Ph, 1, H, 1]
    pooled = jnp.max(jnp.where(rm, stage1[:, None], NEG_INF), axis=3)  # [R, Ph, Pw, C]

    empty = (pooled <= NEG_INF / 2)
    return jnp.where(empty, 0.0, pooled)


def _pool_masks(rois: jnp.ndarray, h: int, w: int, p: int):
    """Column/row bin-membership masks: ``(col [R,P,W], row [R,P,H])``."""
    r = jnp.round(rois.astype(jnp.float32))
    xs, xe = _bin_edges_pool(r[:, 0], r[:, 2], p)
    ys, ye = _bin_edges_pool(r[:, 1], r[:, 3], p)
    xs, xe = jnp.clip(xs, 0, w), jnp.clip(xe, 0, w)
    ys, ye = jnp.clip(ys, 0, h), jnp.clip(ye, 0, h)
    cols = jnp.arange(w, dtype=jnp.float32)
    rows = jnp.arange(h, dtype=jnp.float32)
    cm = (cols[None, None, :] >= xs[:, :, None]) & (cols[None, None, :] < xe[:, :, None])
    rm = (rows[None, None, :] >= ys[:, :, None]) & (rows[None, None, :] < ye[:, :, None])
    return cm, rm


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def roi_pool_structured(features: jnp.ndarray, rois: jnp.ndarray,
                        output_size: int = 7, spatial_scale: float = 1.0):
    """:func:`roi_pool` with a hand-structured backward.

    Forward is identical.  The backward recomputes the two separable max
    stages and assigns gradient credit with equality masks, dividing each
    stage's credit by its tie count — the same tie-sharing semantics as
    XLA's ``reduce_max`` VJP of the same two-stage forward (ties within a
    row/column split evenly; exercised by a constant-feature test) — but
    expressed so XLA's reduce fusion never materialises the
    ``[R, P, H, W, C]`` broadcast its autodiff produces (measured 32 ms vs
    49 ms for the train-scale 16x128-roi pooling fwd+bwd, v5e).
    """
    return roi_pool(features, rois, output_size, spatial_scale)


def _structured_fwd(features, rois, output_size, spatial_scale):
    return roi_pool(features, rois, output_size, spatial_scale), (features, rois)


def _structured_bwd(output_size, spatial_scale, res, g):
    f, rois = res
    h, w, _ = f.shape
    p = output_size
    cm, rm = _pool_masks(rois * spatial_scale, h, w, p)
    # recompute both stages: comparisons against the recomputation are exact
    # (max returns an element of its input, in any dtype)
    s1 = jnp.max(jnp.where(cm[:, :, None, :, None], f[None, None], NEG_INF),
                 axis=3)                                          # [R,Pw,H,C]
    s2 = jnp.max(jnp.where(rm[:, :, None, :, None], s1[:, None], NEG_INF),
                 axis=3)                                          # [R,Ph,Pw,C]
    g = g.astype(jnp.float32)
    # stage-2 credit (empty bins die at the stage-1 compare: f != NEG_INF).
    # Each stage divides its credit by the tie count so exact ties (constant
    # regions, bf16 collisions) share the cotangent like reduce_max's VJP
    # instead of each receiving the full value.
    eq2 = (rm[:, :, None, :, None]
           & (s1[:, None] == s2[:, :, :, None, :])).astype(jnp.float32)
    n2 = jnp.maximum(jnp.sum(eq2, axis=3, keepdims=True), 1.0)    # [R,Ph,Pw,1,C]
    ds1 = jnp.sum(eq2 / n2 * g[:, :, :, None, :], axis=1)         # [R,Pw,H,C]
    eq1 = (cm[:, :, None, :, None]
           & (f[None, None] == s1[:, :, :, None, :])).astype(jnp.float32)
    n1 = jnp.maximum(jnp.sum(eq1, axis=3, keepdims=True), 1.0)    # [R,Pw,H,1,C]
    dfeat = jnp.sum(eq1 / n1 * ds1[:, :, :, None, :], axis=(0, 1))  # [H,W,C]
    return dfeat.astype(f.dtype), None


roi_pool_structured.defvjp(_structured_fwd, _structured_bwd)


def roi_pool_mean(features: jnp.ndarray, rois: jnp.ndarray,
                  output_size: int = 7, spatial_scale: float = 1.0) -> jnp.ndarray:
    """Average RoI pooling over the same adaptive bins as :func:`roi_pool`.

    NOT reference semantics (torchvision RoIPool is max) — an opt-in speed
    mode: the separable masked *mean* is two matmuls, so both forward and
    backward run on the MXU (measured: the whole RoI train path drops from
    +67 ms to +9 ms per batch-16 step).  Quality-wise bin-averaging is the
    RoIAlign family's choice; models must train AND eval with the same mode.

    Same signature/contract as :func:`roi_pool`; empty bins are 0.
    """
    h, w, _ = features.shape
    p = output_size
    cm, rm = _pool_masks(rois.astype(jnp.float32) * spatial_scale, h, w, p)
    dt = features.dtype
    r = rois.shape[0]
    cnt_c = jnp.maximum(cm.sum(-1), 1).astype(jnp.float32)        # [R,P]
    cnt_r = jnp.maximum(rm.sum(-1), 1).astype(jnp.float32)
    # stage 1: [R*P, W] @ [W, H*C] on the MXU
    f2 = features.transpose(1, 0, 2).reshape(w, -1).astype(dt)
    s1 = (cm.astype(dt).reshape(-1, w) @ f2).reshape(r, p, h, -1)  # [R,Pw,H,C]
    # stage 2: contract H per roi
    s2 = jnp.einsum("rph,rqhc->rpqc", rm.astype(dt), s1)           # [R,Ph,Pw,C]
    norm = (cnt_r[:, :, None, None] * cnt_c[:, None, :, None])
    return s2 / norm.astype(dt)


def _align_weights(lo: jnp.ndarray, span: jnp.ndarray, p: int, s: int,
                   size: int) -> jnp.ndarray:
    """Dense separable RoIAlign weights along one axis: ``[R, P, size]``.

    Row ``(r, q)`` holds the averaged bilinear interpolation weights of bin
    ``q``'s ``s`` sample points — at most ``2s`` nonzeros per row.
    """
    bin_sz = span / p                                    # [R]
    grid = (jnp.arange(p)[:, None]
            + (jnp.arange(s)[None, :] + 0.5) / s).reshape(-1)   # [P*S]
    c = lo[:, None] + grid[None, :] * bin_sz[:, None]    # [R, P*S]
    c = jnp.clip(c, 0.0, size - 1.0)
    i0 = jnp.floor(c).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, size - 1)
    f = c - i0
    w = (jax.nn.one_hot(i0, size, dtype=jnp.float32) * (1.0 - f)[..., None]
         + jax.nn.one_hot(i1, size, dtype=jnp.float32) * f[..., None])
    return w.reshape(-1, p, s, size).sum(axis=2) / s     # [R, P, size]


def roi_align_mm(features: jnp.ndarray, rois: jnp.ndarray,
                 output_size: int = 7, spatial_scale: float = 1.0,
                 sampling_ratio: int = 2, aligned: bool = False) -> jnp.ndarray:
    """:func:`roi_align` as two MXU matmuls (TPU fast path).

    Bilinear interpolation is separable, so the sample-average pooling is
    ``out[r,py,px,c] = sum_h WY[r,py,h] * sum_w WX[r,px,w] * f[h,w,c]`` with
    dense per-roi weight matrices — the same einsum shape as
    :func:`roi_pool_mean`, so forward AND backward run on the MXU instead
    of the gather pipeline (the gather version measures 93.5 ms at predict
    scale; this form benches with the mean path).  Numerically identical to
    :func:`roi_align` up to float summation order (tested).
    """
    h, w, _ = features.shape
    p, s = output_size, sampling_ratio
    off = 0.5 if aligned else 0.0
    r4 = rois.astype(jnp.float32) * spatial_scale - off
    roi_w = jnp.maximum(r4[:, 2] - r4[:, 0], 1.0)
    roi_h = jnp.maximum(r4[:, 3] - r4[:, 1], 1.0)
    wy = _align_weights(r4[:, 1], roi_h, p, s, h)        # [R, P, H]
    wx = _align_weights(r4[:, 0], roi_w, p, s, w)        # [R, P, W]
    dt = features.dtype
    r = rois.shape[0]
    # stage 1: [R*P, H] @ [H, W*C] on the MXU
    f2 = features.reshape(h, -1).astype(dt)
    s1 = (wy.astype(dt).reshape(-1, h) @ f2).reshape(r, p, w, -1)  # [R,Py,W,C]
    # stage 2: contract W per roi
    return jnp.einsum("rqw,rpwc->rpqc", wx.astype(dt), s1)         # [R,Py,Px,C]


def roi_align(features: jnp.ndarray, rois: jnp.ndarray, output_size: int = 7,
              spatial_scale: float = 1.0, sampling_ratio: int = 2,
              aligned: bool = False) -> jnp.ndarray:
    """Bilinear RoI align (average over ``sampling_ratio**2`` samples/bin).

    Args:
      features: ``[H, W, C]``.
      rois: ``[R, 4]`` xyxy boxes.
      output_size: pooled size ``P``.
      sampling_ratio: samples per bin per axis.
      aligned: if True, apply the half-pixel offset correction.

    Returns:
      ``[R, P, P, C]``.
    """
    h, w, c = features.shape
    p, s = output_size, sampling_ratio
    off = 0.5 if aligned else 0.0
    r = rois.astype(jnp.float32) * spatial_scale - off
    x1, y1 = r[:, 0], r[:, 1]
    roi_w = jnp.maximum(r[:, 2] - r[:, 0], 1.0)
    roi_h = jnp.maximum(r[:, 3] - r[:, 1], 1.0)
    bin_w = roi_w / p                                  # [R]
    bin_h = roi_h / p

    # sample grid: for bin i, samples at (i + (k + .5)/s) * bin
    grid = (jnp.arange(p)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s).reshape(-1)  # [P*S]
    sx = x1[:, None] + grid[None, :] * bin_w[:, None]   # [R, P*S]
    sy = y1[:, None] + grid[None, :] * bin_h[:, None]

    def bilinear(coords_y, coords_x):
        """coords: [R, Ny], [R, Nx] -> [R, Ny, Nx, C] bilinear samples."""
        cy = jnp.clip(coords_y, 0.0, h - 1.0)
        cx = jnp.clip(coords_x, 0.0, w - 1.0)
        y0 = jnp.floor(cy).astype(jnp.int32)
        x0 = jnp.floor(cx).astype(jnp.int32)
        y1i = jnp.minimum(y0 + 1, h - 1)
        x1i = jnp.minimum(x0 + 1, w - 1)
        wy = (cy - y0)[:, :, None, None]                # [R, Ny, 1, 1]
        wx = (cx - x0)[:, None, :, None]                # [R, 1, Nx, 1]

        def gather(yi, xi):
            # [R, Ny] x [R, Nx] -> [R, Ny, Nx, C]
            return features[yi[:, :, None], xi[:, None, :]]

        v00 = gather(y0, x0)
        v01 = gather(y0, x1i)
        v10 = gather(y1i, x0)
        v11 = gather(y1i, x1i)
        return (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                v10 * wy * (1 - wx) + v11 * wy * wx)

    samples = bilinear(sy, sx)                          # [R, P*S, P*S, C]
    samples = samples.reshape(-1, p, s, p, s, c)
    return samples.mean(axis=(2, 4))                    # [R, P, P, C]


def _align_weights_local(c_global: jnp.ndarray, origin: jnp.ndarray,
                         p: int, s: int, win: int) -> jnp.ndarray:
    """Window-relative RoIAlign weights: ``[R, P, win]``.

    ``c_global [R, P*S]`` are the already-clipped sample coordinates on the
    full level map (exactly :func:`_align_weights`' ``c``); ``origin [R]``
    is each roi's window start.  Samples are clamped into the window — a
    no-op whenever the window covers the roi's span (see
    :func:`multilevel_roi_align`), the documented edge-clamp approximation
    otherwise.
    """
    c = jnp.clip(c_global - origin[:, None].astype(jnp.float32),
                 0.0, win - 1.0)
    i0 = jnp.floor(c).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, win - 1)
    f = c - i0
    w = (jax.nn.one_hot(i0, win, dtype=jnp.float32) * (1.0 - f)[..., None]
         + jax.nn.one_hot(i1, win, dtype=jnp.float32) * f[..., None])
    return w.reshape(-1, p, s, win).sum(axis=2) / s      # [R, P, win]


def _level_align_weights(rois: jnp.ndarray, sy: float, sx: float, p: int,
                         s: int, h: int, w: int, aligned: bool):
    """Dense RoIAlign weight pair for one pyramid level: ``(wy, wx)``.

    Exactly the matrices :func:`roi_align_mm` builds internally for rois
    pre-scaled by ``(sx, sy, sx, sy)`` — factored out so the hybrid
    backward (:func:`multilevel_roi_align_hybrid`) reproduces the dense
    path's gradient bit for bit.
    """
    off = 0.5 if aligned else 0.0
    r4 = (rois.astype(jnp.float32)
          * jnp.asarray([sx, sy, sx, sy], jnp.float32) - off)
    roi_w = jnp.maximum(r4[:, 2] - r4[:, 0], 1.0)
    roi_h = jnp.maximum(r4[:, 3] - r4[:, 1], 1.0)
    wy = _align_weights(r4[:, 1], roi_h, p, s, h)        # [R, P, H]
    wx = _align_weights(r4[:, 0], roi_w, p, s, w)        # [R, P, W]
    return wy, wx


def _norm_scales(scales, n_levels: int):
    """Static per-level ``(sy, sx)`` pairs from scalar-or-pair ``scales``."""
    out = []
    for li in range(n_levels):
        s = scales[li]
        out.append((float(s), float(s)) if not isinstance(s, (tuple, list))
                   else (float(s[0]), float(s[1])))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def multilevel_roi_align_hybrid(pyramid, rois: jnp.ndarray,
                                levels: jnp.ndarray, scales,
                                output_size: int = 7, sampling_ratio: int = 2,
                                window: int = 32, aligned: bool = False):
    """:func:`multilevel_roi_align` forward with the DENSE matmul backward.

    The train-path trade (measured, scripts/profile_fpn_train.py, v5e
    batch 16 R=128): the windowed forward is the fast one (each roi reads a
    [window, window, C] slice of its assigned level, K=window matmuls), but
    its autodiff backward is a dynamic-slice scatter-add that runs 19 ms
    SLOWER per step than the dense blend's MXU matmul VJP.  This custom_vjp
    takes the best half of each: forward = windowed, backward = the dense
    formulation's gradient
    ``dF_l = sum_r 1[lvl_r = l] * WY_l[r]^T g[r] WX_l[r]`` — two einsums per
    level that XLA lowers to MXU matmuls, identical to what autodiff of the
    dense forward produces.

    Valid because the two forwards are equal wherever the window covers the
    roi's span (every box of aspect <~5 at its assigned level — the same
    documented approximation the windowed forward already makes; degenerate
    boxes get the dense gradient of their edge-clamped value).

    Gradients flow to ``pyramid`` only: ``rois``/``levels`` are
    non-differentiable samples in this framework (proposals are generated
    under ``stop_gradient``, nets/detector.py), so their cotangents are
    zero — matching torchvision RoIAlign, which also provides no box
    gradient.
    """
    return multilevel_roi_align(pyramid, rois, levels, scales, output_size,
                                sampling_ratio, window, aligned)


def _ml_hybrid_fwd(pyramid, rois, levels, scales, output_size, sampling_ratio,
                   window, aligned):
    out = multilevel_roi_align(pyramid, rois, levels, scales, output_size,
                               sampling_ratio, window, aligned)
    return out, (pyramid, rois, levels)


def _ml_hybrid_bwd(scales, output_size, sampling_ratio, window, aligned,
                   res, g):
    pyramid, rois, levels = res
    p, s = output_size, sampling_ratio
    sc = _norm_scales(scales, len(pyramid))
    d_pyr = []
    for li, f in enumerate(pyramid):
        h, w, _ = f.shape
        dt = f.dtype
        sy, sx = sc[li]
        wy, wx = _level_align_weights(rois, sy, sx, p, s, h, w, aligned)
        gm = jnp.where((levels == li)[:, None, None, None], g, 0).astype(dt)
        # dF = WY^T @ (g contracted with WX): both on the MXU
        t = jnp.einsum("rqw,rpqc->rpwc", wx.astype(dt), gm)   # [R,P,W,C]
        df = jnp.einsum("rph,rpwc->hwc", wy.astype(dt), t)    # [H,W,C]
        d_pyr.append(df.astype(f.dtype))
    d_pyr = (tuple(d_pyr) if isinstance(pyramid, tuple) else
             jax.tree_util.tree_unflatten(
                 jax.tree_util.tree_structure(pyramid), d_pyr))
    d_levels = np.zeros(levels.shape, dtype=jax.dtypes.float0)
    return d_pyr, jnp.zeros_like(rois), d_levels


multilevel_roi_align_hybrid.defvjp(_ml_hybrid_fwd, _ml_hybrid_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def multilevel_roi_align_hybrid_batched(pyramid, rois: jnp.ndarray,
                                        levels: jnp.ndarray, scales,
                                        output_size: int = 7,
                                        sampling_ratio: int = 2,
                                        window: int = 32,
                                        aligned: bool = False,
                                        use_pallas: bool = False):
    """Batched :func:`multilevel_roi_align_hybrid`: same trade (windowed
    forward, dense matmul backward), whole batch at once.

    ``use_pallas=True`` runs the forward through the Pallas window-DMA
    kernel (``ops/pallas_windowed_align.py``) — legal inside a train step
    precisely because this custom_vjp supplies the backward itself (the
    kernel is forward-only).  ``pyramid``: per-level ``[B, H, W, C]``;
    ``rois [B, R, 4]``; ``levels [B, R]``.
    """
    return _ml_batched_fwd_value(pyramid, rois, levels, scales, output_size,
                                 sampling_ratio, window, aligned, use_pallas)


def _ml_batched_fwd_value(pyramid, rois, levels, scales, output_size,
                          sampling_ratio, window, aligned, use_pallas):
    if use_pallas:
        from two_stage_object_detection_tpu.ops.pallas_windowed_align import (
            windowed_roi_align_batched)
        return windowed_roi_align_batched(
            tuple(pyramid), rois, levels, scales, output_size,
            sampling_ratio, window, aligned,
            interpret=jax.default_backend() == "cpu")
    return jax.vmap(lambda pyr_i, rois_i, lv_i: multilevel_roi_align(
        pyr_i, rois_i, lv_i, scales, output_size, sampling_ratio, window,
        aligned))(tuple(pyramid), rois, levels)


def _ml_batched_hybrid_fwd(pyramid, rois, levels, scales, output_size,
                           sampling_ratio, window, aligned, use_pallas):
    out = _ml_batched_fwd_value(pyramid, rois, levels, scales, output_size,
                                sampling_ratio, window, aligned, use_pallas)
    return out, (pyramid, rois, levels)


def _ml_batched_hybrid_bwd(scales, output_size, sampling_ratio, window,
                           aligned, use_pallas, res, g):
    """Batched form of :func:`_ml_hybrid_bwd`: two einsums per level with a
    batch axis — identical math, one XLA program for the whole batch."""
    pyramid, rois, levels = res
    p, s = output_size, sampling_ratio
    sc = _norm_scales(scales, len(pyramid))
    d_pyr = []
    for li, f in enumerate(pyramid):
        _, h, w, _ = f.shape
        dt = f.dtype
        sy, sx = sc[li]
        wy, wx = jax.vmap(lambda r: _level_align_weights(
            r, sy, sx, p, s, h, w, aligned))(rois)        # [B,R,P,H/W]
        gm = jnp.where((levels == li)[..., None, None, None], g, 0).astype(dt)
        t = jnp.einsum("brqw,brpqc->brpwc", wx.astype(dt), gm)
        df = jnp.einsum("brph,brpwc->bhwc", wy.astype(dt), t)
        d_pyr.append(df.astype(f.dtype))
    d_pyr = (tuple(d_pyr) if isinstance(pyramid, tuple) else
             jax.tree_util.tree_unflatten(
                 jax.tree_util.tree_structure(pyramid), d_pyr))
    d_levels = np.zeros(levels.shape, dtype=jax.dtypes.float0)
    return d_pyr, jnp.zeros_like(rois), d_levels


multilevel_roi_align_hybrid_batched.defvjp(_ml_batched_hybrid_fwd,
                                           _ml_batched_hybrid_bwd)


def _windowed_prologue(pyramid, rois: jnp.ndarray, levels: jnp.ndarray,
                       scales, p: int, s: int, win: int, aligned: bool,
                       win_x: int = None, x_quant: int = 1):
    """Shared XLA prologue of the windowed multi-level RoIAlign.

    Builds the level atlas and each roi's window origin + interpolation
    weights; consumed by :func:`multilevel_roi_align` (dynamic-slice +
    einsum form) and by the Pallas kernel
    (``ops/pallas_windowed_align.py``), which replaces the window
    materialisation with in-kernel DMA.

    ``x_quant``/``win_x``: Mosaic DMA slices must start at a multiple of
    the 8-row sublane tile in the atlas' W dimension, so the Pallas caller
    passes ``x_quant=8`` with an 8-wider ``win_x`` — origins round DOWN to
    the tile and the wider window keeps covering ``[ox, ox+win)``; weights
    are built against the quantized origin, so results are identical.

    Returns ``(atlas [sum_hb, w_pad(+win_x-win), C], starts_y [R], ox [R],
    wy [R, P, win], wx [R, P, win_x])``.
    """
    win_x = win if win_x is None else win_x
    # --- level atlas: blocks (padded to >= win per axis) stacked on rows ---
    w_pad = max(max(int(f.shape[1]) for f in pyramid), win)
    w_cols = w_pad + (win_x - win)        # room for quantized wide windows
    blocks, row_off, block_h = [], [], []
    off = 0
    for f in pyramid:
        h_l, w_l = int(f.shape[0]), int(f.shape[1])
        hb = max(h_l, win)
        blocks.append(jnp.pad(f, ((0, hb - h_l), (0, w_cols - w_l), (0, 0))))
        row_off.append(off)
        block_h.append(hb)
        off += hb
    atlas = jnp.concatenate(blocks, axis=0)              # [sum_hb, w_cols, C]

    sizes = jnp.asarray([[f.shape[0], f.shape[1]] for f in pyramid],
                        jnp.float32)                     # [L, 2] (H, W)
    sc = jnp.asarray(scales, jnp.float32)
    if sc.ndim == 1:                                     # scalar = 1/stride
        sc = jnp.stack([sc, sc], axis=-1)                # [L, 2] (sy, sx)
    row_off_t = jnp.asarray(row_off, jnp.int32)
    block_h_t = jnp.asarray(block_h, jnp.int32)

    off05 = 0.5 if aligned else 0.0
    sy = sc[levels, 0]
    sx = sc[levels, 1]                                   # [R]
    r4 = (rois.astype(jnp.float32)
          * jnp.stack([sx, sy, sx, sy], axis=-1) - off05)
    h_l = sizes[levels, 0]
    w_l = sizes[levels, 1]
    roi_w = jnp.maximum(r4[:, 2] - r4[:, 0], 1.0)
    roi_h = jnp.maximum(r4[:, 3] - r4[:, 1], 1.0)

    grid = (jnp.arange(p)[:, None]
            + (jnp.arange(s)[None, :] + 0.5) / s).reshape(-1)    # [P*S]
    cy = jnp.clip(r4[:, 1:2] + grid[None, :] * (roi_h / p)[:, None],
                  0.0, (h_l - 1.0)[:, None])             # [R, P*S]
    cx = jnp.clip(r4[:, 0:1] + grid[None, :] * (roi_w / p)[:, None],
                  0.0, (w_l - 1.0)[:, None])

    # window origins: cover from floor(first sample); clamp into the block
    oy = jnp.clip(jnp.floor(cy[:, 0]).astype(jnp.int32), 0,
                  block_h_t[levels] - win)               # [R] block-local
    ox = jnp.clip(jnp.floor(cx[:, 0]).astype(jnp.int32), 0, w_pad - win)
    if x_quant > 1:
        ox = (ox // x_quant) * x_quant      # still covers [ox, ox+win)

    wy = _align_weights_local(cy, oy, p, s, win)         # [R, P, win]
    wx = _align_weights_local(cx, ox, p, s, win_x)       # [R, P, win_x]
    starts_y = row_off_t[levels] + oy                    # [R] atlas rows
    return atlas, starts_y, ox, wy, wx


def multilevel_roi_align(pyramid, rois: jnp.ndarray, levels: jnp.ndarray,
                         scales, output_size: int = 7,
                         sampling_ratio: int = 2, window: int = 32,
                         aligned: bool = False) -> jnp.ndarray:
    """FPN multi-level RoIAlign via per-roi windows (TPU fast path).

    The dense form (:func:`roi_align_mm` per level, one-hot blend) pays for
    every roi on every level: at fpn_infer scale its per-level [R*P, H]@
    [H, W*C] matmuls plus 4x per-roi batched stage-2 einsums measure 46 ms
    of a 71 ms predict (scripts/profile_fpn.py).  Here each roi reads ONE
    static ``[window, window, C]`` slice of its ASSIGNED level (the FPN
    paper's eq.-1 assignment bounds a roi's span at its own level to
    sqrt-area 7-28 cells, so a 32-cell window covers every box of aspect
    ratio <~ 5; beyond that the samples edge-clamp — a documented
    approximation for degenerate boxes) and both interpolation matmuls run
    at K=window instead of K=H_level.

    Args:
      pyramid: per-level ``[H_l, W_l, C]`` features (RoI levels, e.g. P2..P5).
      rois: ``[R, 4]`` xyxy in IMAGE coordinates.
      levels: ``[R]`` int32 index into ``pyramid`` (0 = finest).
      scales: per-level image->feature coordinate scale — either scalars
        (``1/stride``) or ``(sy, sx)`` pairs (``feat/img``, matching the
        dense path's ceil-halving geometry on non-multiple sizes).

    Returns:
      ``[R, P, P, C]`` pooled features, equal to the dense per-level
      :func:`roi_align_mm` + one-hot blend wherever the window covers
      (pinned by tests/test_roi_pool.py::test_multilevel_windowed_*).
    """
    p, s, win = output_size, sampling_ratio, window
    c_feat = pyramid[0].shape[-1]
    dt = pyramid[0].dtype

    atlas, starts_y, ox, wy, wx = _windowed_prologue(
        pyramid, rois, levels, scales, p, s, win, aligned)
    windows = jax.vmap(
        lambda y0, x0: jax.lax.dynamic_slice(
            atlas, (y0, x0, 0), (win, win, c_feat)))(starts_y, ox)

    # stage 1: contract the window rows; stage 2: the window columns
    s1 = jnp.einsum("rph,rhwc->rpwc", wy.astype(dt), windows)
    return jnp.einsum("rqw,rpwc->rpqc", wx.astype(dt), s1)


def window_coverage(rois: jnp.ndarray, levels: jnp.ndarray, sizes,
                    scales, output_size: int = 7, sampling_ratio: int = 2,
                    window: int = 32, aligned: bool = False) -> jnp.ndarray:
    """Per-roi: does the windowed forward cover ALL of the roi's taps?

    Mirrors :func:`multilevel_roi_align` geometry exactly (same scaling,
    clamping, and origin clip) and returns a bool ``[R]`` — True where the
    ``[window, window]`` slice contains every bilinear neighbour, i.e. the
    windowed result equals the dense blend.  False = the documented
    edge-clamp approximation engaged (aspect >~5 at the assigned level).
    Used by scripts/ablate_real_fixture.py to bound how often real RPN
    proposals fall outside the window (round-4 verdict weak #6).

    Args:
      sizes: ``[L, 2]`` per-level (H, W) feature shapes.
      scales: per-level image->feature scale, scalars or (sy, sx) pairs —
        same convention as :func:`multilevel_roi_align`.
    """
    p, s, win = output_size, sampling_ratio, window
    sizes = jnp.asarray(sizes, jnp.float32)
    sc = jnp.asarray(scales, jnp.float32)
    if sc.ndim == 1:
        sc = jnp.stack([sc, sc], axis=-1)
    off05 = 0.5 if aligned else 0.0
    sy, sx = sc[levels, 0], sc[levels, 1]
    r4 = (rois.astype(jnp.float32)
          * jnp.stack([sx, sy, sx, sy], axis=-1) - off05)
    h_l, w_l = sizes[levels, 0], sizes[levels, 1]
    block_h = jnp.maximum(h_l, float(win))
    block_w = jnp.maximum(w_l, float(win))     # w_pad >= every level width
    roi_w = jnp.maximum(r4[:, 2] - r4[:, 0], 1.0)
    roi_h = jnp.maximum(r4[:, 3] - r4[:, 1], 1.0)
    grid_last = (p - 1) + (s - 0.5) / s
    y0 = jnp.clip(r4[:, 1] + 0.5 / s * (roi_h / p), 0.0, h_l - 1.0)
    x0 = jnp.clip(r4[:, 0] + 0.5 / s * (roi_w / p), 0.0, w_l - 1.0)
    y1 = jnp.clip(r4[:, 1] + grid_last * (roi_h / p), 0.0, h_l - 1.0)
    x1 = jnp.clip(r4[:, 0] + grid_last * (roi_w / p), 0.0, w_l - 1.0)
    oy = jnp.clip(jnp.floor(y0), 0.0, block_h - win)
    ox = jnp.clip(jnp.floor(x0), 0.0, block_w - win)
    # bilinear interp of a sample at c touches rows floor(c) and ceil(c):
    # for an integral c (e.g. clipped to the level edge) the +1 neighbour
    # has zero weight, so ceil — not floor+1 — is the exact requirement
    cover_y = jnp.ceil(y1) <= oy + (win - 1)
    cover_x = jnp.ceil(x1) <= ox + (win - 1)
    return cover_y & cover_x
