"""Pallas RoI-pool backward kernel vs XLA autodiff (interpret mode)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from two_stage_object_detection_tpu.ops.pallas_roi_bwd import roi_pool_fast
from two_stage_object_detection_tpu.ops.roi_pool import roi_pool


def _rand(rng, n_rois=8, h=19, w=19, c=8, size=280.0):
    feat = rng.randn(h, w, c).astype(np.float32)
    rois = rng.rand(n_rois, 4).astype(np.float32) * size
    rois[:, 2:] = rois[:, :2] + rng.rand(n_rois, 2).astype(np.float32) * 100 + 20
    return feat, rois


def test_forward_is_reference(rng):
    feat, rois = _rand(rng)
    a = roi_pool_fast(jnp.array(feat[None]), jnp.array(rois[None]), 7,
                      1.0 / 16, True)
    b = roi_pool(jnp.array(feat), jnp.array(rois), 7, 1.0 / 16)
    np.testing.assert_allclose(np.asarray(a)[0], np.asarray(b))


def test_backward_matches_xla(rng):
    feat, rois = _rand(rng)
    w = rng.randn(8).astype(np.float32)

    def loss_fast(f):
        out = roi_pool_fast(f, jnp.array(rois[None]), 7, 1.0 / 16, True)
        return jnp.sum(out * out) + jnp.sum(out @ jnp.array(w))

    def loss_xla(f):
        out = roi_pool(f[0], jnp.array(rois), 7, 1.0 / 16)
        return jnp.sum(out * out) + jnp.sum(out @ jnp.array(w))

    g1 = np.asarray(jax.grad(loss_fast)(jnp.array(feat[None])))[0]
    g2 = np.asarray(jax.grad(loss_xla)(jnp.array(feat[None])))[0]
    # continuous random data -> unique argmaxes -> identical gradients
    close = np.isclose(g1, g2, rtol=1e-4, atol=1e-4)
    assert close.mean() > 0.999, close.mean()


def test_backward_empty_bins_zero_grad(rng):
    feat = np.ones((1, 10, 10, 4), np.float32)
    rois = np.array([[[-40.0, -40.0, -20.0, -20.0]]], np.float32)

    def loss(f):
        return jnp.sum(roi_pool_fast(f, jnp.array(rois), 7, 1.0, True))

    g = np.asarray(jax.grad(loss)(jnp.array(feat)))
    np.testing.assert_allclose(g, 0.0)


@pytest.mark.slow
def test_backward_batched(rng):
    feats = rng.randn(2, 13, 13, 4).astype(np.float32)
    rois = np.stack([_rand(rng, n_rois=4, size=150.0)[1] for _ in range(2)])

    def loss_fast(f):
        out = roi_pool_fast(f, jnp.array(rois), 5, 1.0 / 16, True)
        return jnp.sum(out ** 2)

    def loss_xla(f):
        out = jax.vmap(lambda ff, rr: roi_pool(ff, rr, 5, 1.0 / 16))(
            f, jnp.array(rois))
        return jnp.sum(out ** 2)

    g1 = np.asarray(jax.grad(loss_fast)(jnp.array(feats)))
    g2 = np.asarray(jax.grad(loss_xla)(jnp.array(feats)))
    close = np.isclose(g1, g2, rtol=1e-4, atol=1e-4)
    assert close.mean() > 0.999, close.mean()
