"""Fused inference layer kernels vs lax conv reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from two_stage_object_detection_tpu.ops.pallas_fused_layers import (
    fused_comb_conv, fused_dw_conv)


def _ref_comb(x_img, w1, b1, wd, b2):
    """lax reference: 1x1 conv + bias + relu6 + dw3x3 + bias (NHWC)."""
    cin, cout = w1.shape
    y = lax.conv_general_dilated(
        x_img, w1.reshape(1, 1, cin, cout), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jnp.minimum(jnp.maximum(y + b1, 0.0), 6.0)
    kd = wd.reshape(3, 3, 1, cout)
    y = lax.conv_general_dilated(
        y, kd, (1, 1), "SAME", feature_group_count=cout,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b2


def test_fused_comb_matches_lax(rng):
    b, h, w, cin, cout = 2, 10, 12, 16, 8
    x = rng.randn(b, h, w, cin).astype(np.float32)
    w1 = rng.randn(cin, cout).astype(np.float32) * 0.3
    b1 = rng.randn(cout).astype(np.float32) * 0.1
    wd = rng.randn(9, cout).astype(np.float32) * 0.3
    b2 = rng.randn(cout).astype(np.float32) * 0.1

    want = np.asarray(_ref_comb(jnp.array(x), jnp.array(w1), jnp.array(b1),
                                jnp.array(wd), jnp.array(b2)))
    got = np.asarray(fused_comb_conv(
        jnp.array(x.reshape(b, h * w, cin)), jnp.array(w1), jnp.array(b1),
        jnp.array(wd), jnp.array(b2), h=h, w=w, interpret=True))
    np.testing.assert_allclose(got.reshape(b, h, w, cout), want,
                               rtol=1e-4, atol=1e-4)


def test_fused_comb_tile_boundaries(rng):
    """h divisible by several tile sizes — boundary rows must be exact."""
    b, h, w, cin, cout = 1, 15, 7, 4, 4
    x = rng.randn(b, h, w, cin).astype(np.float32)
    w1 = np.eye(cin, cout).astype(np.float32)
    b1 = np.zeros(cout, np.float32)
    wd = np.zeros((9, cout), np.float32)
    wd[1] = 1.0   # pick up the (dy=-1, dx=0) neighbour only
    b2 = np.zeros(cout, np.float32)
    got = np.asarray(fused_comb_conv(
        jnp.array(x.reshape(b, h * w, cin)), jnp.array(w1), jnp.array(b1),
        jnp.array(wd), jnp.array(b2), h=h, w=w, interpret=True)).reshape(b, h, w, cout)
    want = np.zeros_like(got)
    # relu6 of identity-projected x, shifted down by one row, zero at top
    act = np.clip(x, 0, 6)
    want[:, 1:] = act[:, :-1]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_dw_matches_lax(rng):
    b, h, w, c = 2, 6, 10, 8
    x = rng.randn(b, h, w, c).astype(np.float32)
    wd = rng.randn(9, c).astype(np.float32) * 0.3
    b2 = rng.randn(c).astype(np.float32) * 0.1
    kd = wd.reshape(3, 3, 1, c)
    want = lax.conv_general_dilated(
        jnp.array(x), jnp.array(kd), (1, 1), "SAME", feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b2
    got = np.asarray(fused_dw_conv(
        jnp.array(x.reshape(b, h * w, c)), jnp.array(wd), jnp.array(b2),
        h=h, w=w, interpret=True))
    np.testing.assert_allclose(got.reshape(b, h, w, c), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
