"""Pallas RoI pool kernel vs jnp reference (interpret mode) + gradient."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from two_stage_object_detection_tpu.ops.pallas_roi import roi_pool_pallas
from two_stage_object_detection_tpu.ops.roi_pool import roi_pool


def _rand_rois(rng, n, size=500.0):
    rois = rng.rand(n, 4).astype(np.float32) * size
    rois[:, 2:] = rois[:, :2] + rng.rand(n, 2).astype(np.float32) * 100 + 20
    return rois


def test_pallas_roi_matches_jnp(rng):
    feat = rng.randn(19, 19, 8).astype(np.float32)
    rois = _rand_rois(rng, 12, size=280.0)
    want = np.asarray(roi_pool(jnp.array(feat), jnp.array(rois), 7, 1.0 / 16))
    got = np.asarray(roi_pool_pallas(jnp.array(feat), jnp.array(rois), 7,
                                     1.0 / 16, True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_roi_empty_bins(rng):
    feat = np.ones((10, 10, 4), np.float32)
    rois = np.array([[-30.0, -30.0, -10.0, -10.0]], np.float32)
    got = np.asarray(roi_pool_pallas(jnp.array(feat), jnp.array(rois), 7,
                                     1.0, True))
    np.testing.assert_allclose(got, 0.0)


@pytest.mark.slow
def test_pallas_roi_gradient_matches_jnp(rng):
    feat = rng.randn(11, 11, 4).astype(np.float32)
    rois = _rand_rois(rng, 4, size=150.0)

    def loss_pallas(f):
        return jnp.sum(roi_pool_pallas(f, jnp.array(rois), 5, 1.0 / 16, True) ** 2)

    def loss_jnp(f):
        return jnp.sum(roi_pool(f, jnp.array(rois), 5, 1.0 / 16) ** 2)

    g1 = np.asarray(jax.grad(loss_pallas)(jnp.array(feat)))
    g2 = np.asarray(jax.grad(loss_jnp)(jnp.array(feat)))
    # gradients agree wherever the max is unique; allow tiny tie slack
    close = np.isclose(g1, g2, rtol=1e-4, atol=1e-4)
    assert close.mean() > 0.999, close.mean()


def test_pallas_roi_vmap(rng):
    feats = rng.randn(2, 10, 10, 4).astype(np.float32)
    rois = np.stack([_rand_rois(rng, 6, size=150.0) for _ in range(2)])
    got = jax.vmap(lambda f, r: roi_pool_pallas(f, r, 7, 1.0 / 16, True))(
        jnp.array(feats), jnp.array(rois))
    for i in range(2):
        want = roi_pool(jnp.array(feats[i]), jnp.array(rois[i]), 7, 1.0 / 16)
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
