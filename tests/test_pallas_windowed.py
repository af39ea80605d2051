"""Pallas windowed multi-level RoIAlign kernel vs the XLA windowed path.

The kernel (ops/pallas_windowed_align.py) must produce the XLA windowed
form's numbers (ops/roi_pool.py:multilevel_roi_align) — same prologue, the
window materialisation replaced by in-kernel DMA and the two einsums
collapsed into one matmul.  Runs in interpreter mode on the CPU backend.
"""

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

rp = importlib.import_module("two_stage_object_detection_tpu.ops.roi_pool")
pw = importlib.import_module(
    "two_stage_object_detection_tpu.ops.pallas_windowed_align")
from two_stage_object_detection_tpu.nets.fpn import fpn_level_assign  # noqa: E402

LEVELS_HW = [(40, 40), (20, 20), (10, 10), (5, 5)]
SCALES = tuple((h / 160.0, w / 160.0) for h, w in LEVELS_HW)


def _data(rng, b=2, r=24, c=128, extreme=False):
    pyr = [jnp.asarray(rng.rand(b, h, w, c), jnp.float32)
           for h, w in LEVELS_HW]
    if extreme:
        sides = np.concatenate([rng.choice([20, 60, 150], size=(b, r - 8)),
                                np.full((b, 8), 80.0)], axis=1)
        ar = np.concatenate([rng.uniform(0.5, 2.0, size=(b, r - 8)),
                             rng.uniform(8.0, 20.0, size=(b, 8))], axis=1)
    else:
        sides = rng.choice([20, 60, 150, 300], size=(b, r))
        ar = rng.uniform(0.5, 2.0, size=(b, r))
    x1 = rng.rand(b, r) * 100
    y1 = rng.rand(b, r) * 100
    rois = jnp.asarray(np.stack(
        [x1, y1, x1 + sides * np.sqrt(ar), y1 + sides / np.sqrt(ar)], -1),
        jnp.float32)
    levels = jax.vmap(lambda q: fpn_level_assign(q, 2, 5) - 2)(rois)
    return pyr, rois, levels


def _xla(pyr, rois, levels):
    return jax.vmap(lambda pi, ri, li: rp.multilevel_roi_align(
        pi, ri, li, SCALES, 7, window=32))(tuple(pyr), rois, levels)


def test_matches_xla_windowed(rng):
    pyr, rois, levels = _data(rng)
    want = _xla(pyr, rois, levels)
    got = pw.windowed_roi_align_batched(pyr, rois, levels, SCALES, 7,
                                        window=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_matches_on_edge_clamped_rois(rng):
    """Extreme-aspect rois take the same edge-clamp approximation in both
    forms (identical weights from the shared prologue)."""
    pyr, rois, levels = _data(rng, extreme=True)
    want = _xla(pyr, rois, levels)
    got = pw.windowed_roi_align_batched(pyr, rois, levels, SCALES, 7,
                                        window=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_roi_count_not_tile_multiple(rng):
    """R_tot not divisible by ROI_TILE exercises the padding path."""
    pyr, rois, levels = _data(rng, b=1, r=19)
    want = _xla(pyr, rois, levels)
    got = pw.windowed_roi_align_batched(pyr, rois, levels, SCALES, 7,
                                        window=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_quantized_prologue_matches_unquantized(rng):
    """x_quant=8 + wider win_x reproduces the exact unquantized pooling
    (weights rebuilt against the shifted origin)."""
    pyr, rois, levels = _data(rng, b=1, r=16)
    f = [p[0] for p in pyr]
    atlas, sy, ox, wy, wx = rp._windowed_prologue(
        f, rois[0], levels[0], SCALES, 7, 2, 32, False, win_x=40, x_quant=8)
    assert int(jnp.max(ox % 8)) == 0
    win = jax.vmap(lambda y0, x0: jax.lax.dynamic_slice(
        atlas, (y0, x0, 0), (32, 40, atlas.shape[-1])))(sy, ox)
    s1 = jnp.einsum("rph,rhwc->rpwc", wy, win)
    got = jnp.einsum("rqw,rpwc->rpqc", wx, s1)
    want = rp.multilevel_roi_align(f, rois[0], levels[0], SCALES, 7,
                                   window=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fpn_head_uses_kernel_when_forced(rng):
    """FPNRoIHead pallas='on' (interpreted on CPU) == pallas='off'."""
    from two_stage_object_detection_tpu.nets.fpn import FPNRoIHead

    pyr, rois, levels = _data(rng, b=2, r=8, c=128)
    kw = dict(n_class=4, min_level=2, n_pool_levels=4, fc_dim=32)
    head_on = FPNRoIHead(pallas="on", **kw)
    head_off = FPNRoIHead(pallas="off", **kw)
    v = head_on.init(jax.random.PRNGKey(0), pyr, rois, (160, 160))
    locs_on, scores_on = head_on.apply(v, pyr, rois, (160, 160))
    locs_off, scores_off = head_off.apply(v, pyr, rois, (160, 160))
    np.testing.assert_allclose(np.asarray(locs_on), np.asarray(locs_off),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(scores_on), np.asarray(scores_off),
                               rtol=1e-4, atol=1e-4)


def test_hybrid_batched_matches_vmapped_hybrid(rng):
    """Batched hybrid (value + pyramid gradient) == vmapped per-image
    hybrid — the train path swap is numerics-neutral."""
    from two_stage_object_detection_tpu.ops.roi_pool import (
        multilevel_roi_align_hybrid, multilevel_roi_align_hybrid_batched)

    pyr, rois, levels = _data(rng, b=2, r=8, c=128)

    def loss_batched(p0):
        out = multilevel_roi_align_hybrid_batched(
            (p0,) + tuple(pyr[1:]), rois, levels, SCALES, 7, 2, 32, False,
            False)
        return jnp.sum(out ** 2)

    def loss_vmapped(p0):
        out = jax.vmap(lambda pi, ri, li: multilevel_roi_align_hybrid(
            pi, ri, li, SCALES, 7, 2, 32, False))(
                (p0,) + tuple(pyr[1:]), rois, levels)
        return jnp.sum(out ** 2)

    vb, gb = jax.value_and_grad(loss_batched)(pyr[0])
    vv, gv = jax.value_and_grad(loss_vmapped)(pyr[0])
    np.testing.assert_allclose(float(vb), float(vv), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gv),
                               rtol=1e-4, atol=1e-4)


def test_hybrid_batched_pallas_forward_matches(rng):
    """use_pallas=True (interpreted on CPU): same value, same dense
    backward."""
    from two_stage_object_detection_tpu.ops.roi_pool import (
        multilevel_roi_align_hybrid_batched)

    pyr, rois, levels = _data(rng, b=2, r=8, c=128)

    def loss(p0, use_pallas):
        out = multilevel_roi_align_hybrid_batched(
            (p0,) + tuple(pyr[1:]), rois, levels, SCALES, 7, 2, 32, False,
            use_pallas)
        return jnp.sum(out ** 2)

    vp, gp = jax.value_and_grad(lambda p0: loss(p0, True))(pyr[0])
    vx, gx = jax.value_and_grad(lambda p0: loss(p0, False))(pyr[0])
    np.testing.assert_allclose(float(vp), float(vx), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               rtol=1e-4, atol=1e-4)
