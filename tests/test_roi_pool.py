import pytest
import jax
import jax.numpy as jnp
import numpy as np

from two_stage_object_detection_tpu.ops.roi_pool import (
    roi_align, roi_align_mm, roi_pool, roi_pool_mean, roi_pool_structured)


def naive_roi_pool(feat, rois, p, scale):
    """Direct numpy transcription of torchvision RoIPool max semantics.

    Bin edges via exact integer arithmetic (the rounded roi coords are
    integers), matching the framework's deterministic edge convention.
    """
    h, w, c = feat.shape
    out = np.zeros((len(rois), p, p, c), np.float32)
    for r, roi in enumerate(rois):
        x1, y1, x2, y2 = (int(v) for v in np.round(roi.astype(np.float32) * np.float32(scale)))
        rw = max(x2 - x1, 1)
        rh = max(y2 - y1, 1)
        for ph in range(p):
            for pw in range(p):
                hs = int(np.clip(ph * rh // p + y1, 0, h))
                he = int(np.clip(-((ph + 1) * rh // -p) + y1, 0, h))
                ws = int(np.clip(pw * rw // p + x1, 0, w))
                we = int(np.clip(-((pw + 1) * rw // -p) + x1, 0, w))
                if he > hs and we > ws:
                    out[r, ph, pw] = feat[hs:he, ws:we].max(axis=(0, 1))
    return out


def test_roi_pool_matches_naive(rng):
    feat = rng.randn(38, 38, 8).astype(np.float32)
    rois = rng.rand(16, 4).astype(np.float32) * 500
    rois[:, 2:] = rois[:, :2] + rng.rand(16, 2).astype(np.float32) * 100 + 20
    got = np.asarray(roi_pool(jnp.array(feat), jnp.array(rois), 7, 1.0 / 16))
    want = naive_roi_pool(feat, rois, 7, 1.0 / 16)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_roi_pool_small_roi():
    """A sub-pixel roi still produces a full 7x7 output (size clamp to 1)."""
    feat = np.arange(10 * 10, dtype=np.float32).reshape(10, 10, 1)
    rois = np.array([[3.0, 3.0, 3.2, 3.2]], np.float32)
    got = np.asarray(roi_pool(jnp.array(feat), jnp.array(rois), 7, 1.0))
    assert got.shape == (1, 7, 7, 1)
    assert np.isfinite(got).all()
    want = naive_roi_pool(feat, rois, 7, 1.0)
    np.testing.assert_allclose(got, want)


def test_roi_pool_out_of_bounds_roi():
    feat = np.ones((10, 10, 2), np.float32)
    rois = np.array([[-20.0, -20.0, -5.0, -5.0]], np.float32)  # fully outside
    got = np.asarray(roi_pool(jnp.array(feat), jnp.array(rois), 7, 1.0))
    np.testing.assert_allclose(got, 0.0)  # empty bins -> 0


def test_roi_align_constant_field(rng):
    """Bilinear sampling of a constant map returns the constant."""
    feat = np.full((20, 20, 3), 2.5, np.float32)
    rois = rng.rand(5, 4).astype(np.float32) * 15
    rois[:, 2:] = rois[:, :2] + 3
    got = np.asarray(roi_align(jnp.array(feat), jnp.array(rois), 7, 1.0))
    np.testing.assert_allclose(got, 2.5, rtol=1e-5)


def test_roi_align_linear_field():
    """Bilinear sampling reproduces a linear ramp exactly (interior rois)."""
    h = w = 30
    xs = np.arange(w, dtype=np.float32)
    feat = np.broadcast_to(xs[None, :, None], (h, w, 1)).copy()
    rois = np.array([[5.0, 5.0, 15.0, 15.0]], np.float32)
    got = np.asarray(roi_align(jnp.array(feat), jnp.array(rois), 4, 1.0, sampling_ratio=2))
    # bin k center-of-mass x = 5 + (k + .5) * 2.5 averaged over samples
    bw = 10.0 / 4
    want_x = 5.0 + (np.arange(4) + 0.5) * bw
    np.testing.assert_allclose(got[0, 0, :, 0], want_x, rtol=1e-5)


def test_roi_align_mm_matches_gather(rng):
    """The MXU matmul form of RoIAlign equals the gather form (fwd + grad)."""
    feat = jnp.array(rng.randn(25, 25, 8).astype(np.float32))
    rois = rng.rand(10, 4).astype(np.float32) * 300
    rois[:, 2:] = rois[:, :2] + rng.rand(10, 2).astype(np.float32) * 120 + 16
    rois = jnp.array(rois)
    for sr, aligned in ((2, False), (2, True), (4, False)):
        a = roi_align(feat, rois, 7, 1.0 / 16, sampling_ratio=sr,
                      aligned=aligned)
        b = roi_align_mm(feat, rois, 7, 1.0 / 16, sampling_ratio=sr,
                         aligned=aligned)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    wgt = jnp.array(rng.randn(10, 7, 7, 8).astype(np.float32))
    g_a = jax.grad(lambda f: jnp.sum(
        roi_align(f, rois, 7, 1.0 / 16) * wgt))(feat)
    g_b = jax.grad(lambda f: jnp.sum(
        roi_align_mm(f, rois, 7, 1.0 / 16) * wgt))(feat)
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_b),
                               rtol=1e-4, atol=1e-4)


def test_roi_pool_structured_matches_forward_and_grad(rng):
    """The custom-VJP variant must be bit-equal to XLA autodiff, fwd and bwd."""
    feat = jnp.array(rng.randn(25, 25, 16).astype(np.float32))
    rois = rng.rand(12, 4).astype(np.float32) * 300
    rois[:, 2:] = rois[:, :2] + rng.rand(12, 2).astype(np.float32) * 120 + 16
    rois = jnp.array(rois)

    out_ref = roi_pool(feat, rois, 7, 1.0 / 16)
    out_sv = roi_pool_structured(feat, rois, 7, 1.0 / 16)
    np.testing.assert_array_equal(np.asarray(out_ref), np.asarray(out_sv))

    # downstream-weighted loss so the cotangent is non-uniform
    wgt = jnp.array(rng.randn(*out_ref.shape).astype(np.float32))
    g_ref = jax.grad(lambda f: jnp.sum(roi_pool(f, rois, 7, 1.0 / 16) * wgt))(feat)
    g_sv = jax.grad(
        lambda f: jnp.sum(roi_pool_structured(f, rois, 7, 1.0 / 16) * wgt))(feat)
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_sv),
                               rtol=1e-6, atol=1e-6)


def test_roi_pool_structured_grad_ties(rng):
    """Exact max ties (constant regions / bf16 collisions) must split the
    cotangent among tied elements like XLA's reduce_max VJP, not give each
    tie the full value (advisor round-2 finding: 16x gradient inflation on
    a constant map before tie normalization)."""
    feat = jnp.ones((8, 8, 4), jnp.float32)          # every element ties
    rois = jnp.array([[0.0, 0.0, 8.0, 8.0]], jnp.float32)

    g_ref = jax.grad(lambda f: jnp.sum(roi_pool(f, rois, 2, 1.0)))(feat)
    g_sv = jax.grad(
        lambda f: jnp.sum(roi_pool_structured(f, rois, 2, 1.0)))(feat)
    np.testing.assert_allclose(np.asarray(g_sv), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)

    # partial ties: duplicated columns inside otherwise-random data
    base = rng.randn(8, 8, 4).astype(np.float32)
    base[:, 4] = base[:, 3]                          # tie along W
    base[5] = base[2]                                # tie along H
    feat2 = jnp.array(base)
    wgt = jnp.array(rng.randn(1, 3, 3, 4).astype(np.float32))
    g_ref2 = jax.grad(
        lambda f: jnp.sum(roi_pool(f, rois, 3, 1.0) * wgt))(feat2)
    g_sv2 = jax.grad(
        lambda f: jnp.sum(roi_pool_structured(f, rois, 3, 1.0) * wgt))(feat2)
    np.testing.assert_allclose(np.asarray(g_sv2), np.asarray(g_ref2),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_roi_pool_structured_grad_vmap(rng):
    """Batched (vmapped) structured grads match per-image XLA grads."""
    feats = jnp.array(rng.randn(2, 19, 19, 4).astype(np.float32))
    rois = rng.rand(2, 6, 4).astype(np.float32) * 200
    rois[..., 2:] = rois[..., :2] + 60
    rois = jnp.array(rois)

    def loss(pool_fn, f):
        out = jax.vmap(lambda a, b: pool_fn(a, b, 7, 1.0 / 16))(f, rois)
        return jnp.sum(out * (1.0 + jnp.arange(out.size).reshape(out.shape) % 3))

    g_ref = jax.grad(lambda f: loss(roi_pool, f))(feats)
    g_sv = jax.grad(lambda f: loss(roi_pool_structured, f))(feats)
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_sv),
                               rtol=1e-6, atol=1e-6)


def naive_roi_pool_mean(feat, rois, p, scale):
    """Numpy bin-average with the same adaptive edges as naive_roi_pool."""
    h, w, c = feat.shape
    out = np.zeros((len(rois), p, p, c), np.float32)
    for r, roi in enumerate(rois):
        x1, y1, x2, y2 = (int(v) for v in np.round(roi.astype(np.float32) * np.float32(scale)))
        rw = max(x2 - x1, 1)
        rh = max(y2 - y1, 1)
        for ph in range(p):
            for pw in range(p):
                hs = int(np.clip(ph * rh // p + y1, 0, h))
                he = int(np.clip(-((ph + 1) * rh // -p) + y1, 0, h))
                ws = int(np.clip(pw * rw // p + x1, 0, w))
                we = int(np.clip(-((pw + 1) * rw // -p) + x1, 0, w))
                if he > hs and we > ws:
                    out[r, ph, pw] = feat[hs:he, ws:we].mean(axis=(0, 1))
    return out


def test_roi_pool_mean_matches_naive(rng):
    feat = rng.randn(38, 38, 8).astype(np.float32)
    rois = rng.rand(16, 4).astype(np.float32) * 500
    rois[:, 2:] = rois[:, :2] + rng.rand(16, 2).astype(np.float32) * 100 + 20
    got = np.asarray(roi_pool_mean(jnp.array(feat), jnp.array(rois), 7, 1.0 / 16))
    want = naive_roi_pool_mean(feat, rois, 7, 1.0 / 16)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_roi_pool_mean_empty_bins_zero():
    feat = np.ones((10, 10, 2), np.float32)
    rois = np.array([[-20.0, -20.0, -5.0, -5.0]], np.float32)
    got = np.asarray(roi_pool_mean(jnp.array(feat), jnp.array(rois), 7, 1.0))
    np.testing.assert_allclose(got, 0.0)


def test_roi_ops_vmap(rng):
    feats = rng.randn(2, 19, 19, 4).astype(np.float32)
    rois = rng.rand(2, 8, 4).astype(np.float32) * 200
    rois[..., 2:] = rois[..., :2] + 50
    batched = jax.vmap(lambda f, r: roi_pool(f, r, 7, 1.0 / 16))(
        jnp.array(feats), jnp.array(rois))
    single = np.stack([np.asarray(roi_pool(jnp.array(feats[i]), jnp.array(rois[i]), 7, 1.0 / 16))
                       for i in range(2)])
    np.testing.assert_allclose(np.asarray(batched), single, rtol=1e-5)


class TestMultilevelWindowed:
    """Windowed multi-level RoIAlign vs the dense per-level blend."""

    def _setup(self, rng):
        import importlib
        rp = importlib.import_module(
            "two_stage_object_detection_tpu.ops.roi_pool")
        from two_stage_object_detection_tpu.nets.fpn import fpn_level_assign
        levels_hw = [(40, 40), (20, 20), (10, 10), (5, 5)]
        scales = tuple((h / 160.0, w / 160.0) for h, w in levels_hw)
        pyr = [jnp.asarray(rng.rand(h, w, 16), jnp.float32)
               for h, w in levels_hw]
        return rp, fpn_level_assign, pyr, scales

    def test_matches_dense_all_levels(self, rng):
        rp, assign, pyr, scales = self._setup(rng)
        # sides chosen to hit every level; aspect <= 2 so windows cover
        sides = rng.choice([20, 60, 150, 300, 450], size=24)
        ar = rng.uniform(0.5, 2.0, size=24)
        bw, bh = sides * np.sqrt(ar), sides / np.sqrt(ar)
        x1 = rng.rand(24) * 159
        y1 = rng.rand(24) * 159
        rois = jnp.asarray(np.stack([x1, y1, x1 + bw, y1 + bh], -1),
                           jnp.float32)
        levels = assign(rois, 2, 5) - 2
        assert len(set(np.asarray(levels).tolist())) >= 3  # spread

        got = rp.multilevel_roi_align(pyr, rois, levels, scales, 7,
                                      window=32)
        oh = jax.nn.one_hot(levels, 4)
        want = sum(
            rp.roi_align_mm(pyr[li],
                            rois * jnp.array([scales[li][1], scales[li][0]]
                                             * 2), 7, 1.0)
            * oh[:, li][:, None, None, None]
            for li in range(4))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)

    def test_window_coverage_predicts_equality(self, rng):
        """window_coverage: True exactly marks rois where windowed == dense.

        Mixes normal boxes with extreme-aspect ones (>5:1) whose span at the
        assigned level exceeds the 32-cell window, so both branches of the
        predicate are exercised.
        """
        rp, assign, pyr, scales = self._setup(rng)
        sides = np.concatenate([rng.choice([20, 60, 150], size=16),
                                np.full(8, 80.0)])
        ar = np.concatenate([rng.uniform(0.5, 2.0, size=16),
                             rng.uniform(8.0, 20.0, size=8)])
        bw, bh = sides * np.sqrt(ar), sides / np.sqrt(ar)
        x1 = rng.rand(24) * 100
        y1 = rng.rand(24) * 100
        rois = jnp.asarray(np.stack([x1, y1, x1 + bw, y1 + bh], -1),
                           jnp.float32)
        levels = assign(rois, 2, 5) - 2
        sizes = [(f.shape[0], f.shape[1]) for f in pyr]
        cov = np.asarray(rp.window_coverage(rois, levels, sizes, scales,
                                            window=32))
        assert cov.any() and not cov.all()     # both branches exercised

        got = np.asarray(rp.multilevel_roi_align(pyr, rois, levels, scales,
                                                 7, window=32))
        oh = jax.nn.one_hot(levels, 4)
        want = np.asarray(sum(
            rp.roi_align_mm(pyr[li],
                            rois * jnp.array([scales[li][1], scales[li][0]]
                                             * 2), 7, 1.0)
            * oh[:, li][:, None, None, None]
            for li in range(4)))
        np.testing.assert_allclose(got[cov], want[cov], rtol=1e-4, atol=1e-5)

    def test_grad_flows_to_pyramid(self, rng):
        rp, assign, pyr, scales = self._setup(rng)
        rois = jnp.asarray([[8.0, 8.0, 70.0, 70.0],
                            [4.0, 4.0, 20.0, 24.0]], jnp.float32)
        levels = assign(rois, 2, 5) - 2

        def loss(p0):
            out = rp.multilevel_roi_align([p0] + pyr[1:], rois, levels,
                                          scales, 7, window=32)
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(pyr[0])
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.sum(jnp.abs(g))) > 0.0


class TestMultilevelHybrid:
    """multilevel_roi_align_hybrid: windowed forward, dense matmul backward."""

    def _setup(self, rng):
        import importlib
        rp = importlib.import_module(
            "two_stage_object_detection_tpu.ops.roi_pool")
        from two_stage_object_detection_tpu.nets.fpn import fpn_level_assign
        levels_hw = [(40, 40), (20, 20), (10, 10), (5, 5)]
        scales = tuple((h / 160.0, w / 160.0) for h, w in levels_hw)
        pyr = tuple(jnp.asarray(rng.rand(h, w, 16), jnp.float32)
                    for h, w in levels_hw)
        sides = rng.choice([20, 60, 150, 300], size=12)
        ar = rng.uniform(0.5, 2.0, size=12)
        bw, bh = sides * np.sqrt(ar), sides / np.sqrt(ar)
        x1, y1 = rng.rand(12) * 100, rng.rand(12) * 100
        rois = jnp.asarray(np.stack([x1, y1, x1 + bw, y1 + bh], -1),
                           jnp.float32)
        levels = fpn_level_assign(rois, 2, 5) - 2
        return rp, pyr, rois, levels, scales

    def test_forward_is_windowed(self, rng):
        rp, pyr, rois, levels, scales = self._setup(rng)
        got = rp.multilevel_roi_align_hybrid(pyr, rois, levels, scales,
                                             7, 2, 32, False)
        want = rp.multilevel_roi_align(pyr, rois, levels, scales, 7,
                                       window=32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))

    def test_backward_matches_dense_blend(self, rng):
        """grad through the hybrid == autodiff grad of the dense one-hot
        blend (the training-path gradient it substitutes for)."""
        rp, pyr, rois, levels, scales = self._setup(rng)
        g_out = jnp.asarray(rng.randn(12, 7, 7, 16), jnp.float32)

        def hybrid_loss(p):
            out = rp.multilevel_roi_align_hybrid(p, rois, levels, scales,
                                                 7, 2, 32, False)
            return jnp.sum(out * g_out)

        def dense_loss(p):
            oh = jax.nn.one_hot(levels, 4)
            out = sum(
                rp.roi_align_mm(p[li],
                                rois * jnp.array([scales[li][1],
                                                  scales[li][0]] * 2), 7, 1.0)
                * oh[:, li][:, None, None, None]
                for li in range(4))
            return jnp.sum(out * g_out)

        gh = jax.grad(hybrid_loss)(pyr)
        gd = jax.grad(dense_loss)(pyr)
        for a, b in zip(gh, gd):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_roi_cotangent_is_zero(self, rng):
        rp, pyr, rois, levels, scales = self._setup(rng)

        def loss(r):
            out = rp.multilevel_roi_align_hybrid(pyr, r, levels, scales,
                                                 7, 2, 32, False)
            return jnp.sum(out)

        g = jax.grad(loss)(rois)
        np.testing.assert_allclose(np.asarray(g), 0.0)

    def test_vmap_matches_loop(self, rng):
        rp, pyr, rois, levels, scales = self._setup(rng)
        pyr_b = tuple(jnp.stack([f, f * 2.0]) for f in pyr)
        rois_b = jnp.stack([rois, rois + 3.0])
        lv_b = jnp.stack([levels, levels])
        batched = jax.vmap(lambda p, r, l: rp.multilevel_roi_align_hybrid(
            p, r, l, scales, 7, 2, 32, False))(pyr_b, rois_b, lv_b)
        for i in range(2):
            one = rp.multilevel_roi_align_hybrid(
                tuple(f[i] for f in pyr_b), rois_b[i], lv_b[i], scales,
                7, 2, 32, False)
            np.testing.assert_allclose(np.asarray(batched[i]),
                                       np.asarray(one), rtol=1e-5, atol=1e-6)
