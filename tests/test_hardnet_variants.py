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
        assert not mod.strided
    for name in ("hardnet39s", "hardnet68s", "hardnet85s"):
        mod, ch = build_backbone(name)
        assert ch == 512
        assert mod.strided


def test_hardnet_strided_keeps_stride16_contract():
    """hardnet39s: true stride-2 downs, same stride-16 512-ch output as the
    reference layout (blocks run at 1/2 and 1/4 the spatial size)."""
    model = HarDNetFeatureExtraction(arch=39, strided=True)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 4, 4, 512)
    # identical parameter structure family: the same layer names exist
    # (down layers + tail), only strides differ
    names = set(params["params"].keys())
    assert {"block0", "block1", "block2", "block3", "down0", "down1",
            "down2", "tail0", "tail1", "tail2"} <= names


def test_hardnet_strided_600_gives_38():
    """600x600 -> 38x38 feature map, matching the anchor table's
    cfg.feat_size so the strided variant drops into the detector."""
    model = HarDNetFeatureExtraction(arch=39, strided=True)
    x = jnp.zeros((1, 600, 600, 3))
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    y = jax.eval_shape(model.apply, params, x)
    assert y.shape == (1, 38, 38, 512)


@pytest.mark.slow
def test_hardnet39s_train_step_runs():
    """A full train step on the strided variant produces finite losses."""
    import numpy as np
    from tests.test_detector import tiny_batch, tiny_config
    from two_stage_object_detection_tpu.nets.trainer import (
        create_train_state, train_step)
    cfg = tiny_config(backbone="hardnet39s")
    _, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                  init_image_size=(32, 32))
    batch = tiny_batch(cfg, np.random.RandomState(0))
    state, losses = train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(losses["total"]))
