"""HarDNet-68/85 variants: stride-16, 512-channel contract."""

import jax
import jax.numpy as jnp
import pytest

from two_stage_object_detection_tpu.models.hardnet import (
    HarDNetFeatureExtraction)
from two_stage_object_detection_tpu.models.registry import build_backbone


@pytest.mark.slow
@pytest.mark.parametrize("arch", [68, 85])
def test_hardnet_variant_shapes(arch):
    model = HarDNetFeatureExtraction(arch=arch)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 4, 4, 512)


def test_registry_hardnet_names():
    for name in ("hardnet39", "hardnet68", "hardnet85"):
        mod, ch = build_backbone(name)
        assert ch == 512
        assert mod.arch == int(name.replace("hardnet", ""))
