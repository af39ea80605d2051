"""Fused-inference HarDNet executor vs the flax module (interpret mode)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from two_stage_object_detection_tpu.models.hardnet import (
    HarDNetFeatureExtraction)
from two_stage_object_detection_tpu.models.hardnet_fused import (

pytestmark = pytest.mark.slow
    fused_hardnet_features)


def test_fused_matches_flax(rng):
    model = HarDNetFeatureExtraction(arch=39)
    x = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    want = np.asarray(model.apply(variables, x, train=False))

    got = np.asarray(fused_hardnet_features(
        variables["params"], variables["batch_stats"], x, arch=39,
        dtype=jnp.float32, interpret=True))
    assert got.shape == want.shape == (2, 4, 4, 512)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_fused_bf16_close(rng):
    model = HarDNetFeatureExtraction(arch=39)
    x = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x)
    want = np.asarray(model.apply(variables, x, train=False))
    got = np.asarray(fused_hardnet_features(
        variables["params"], variables["batch_stats"], x, arch=39,
        dtype=jnp.bfloat16, interpret=True)).astype(np.float32)
    # bf16 rounding through ~20 layers: loose tolerance, same structure
    err = np.abs(got - want) / (np.abs(want) + 1e-2)
    assert np.median(err) < 0.05, np.median(err)
