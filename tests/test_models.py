import jax
import jax.numpy as jnp
import numpy as np
import pytest

from two_stage_object_detection_tpu.models.hardnet import (
    GlobalAvgPoolClassifier, HarDBlock, HarDNetFeatureExtraction,
    hard_block_links)
from two_stage_object_detection_tpu.models.registry import build_backbone


def test_hard_block_links_golden():
    """Channel math of HarDNet-39's first block (in=48, gr=16, grmul=1.6, n=4).

    Layer widths follow out = gr * grmul^(k-1) with the reference's
    int(int(x+1)/2)*2 evenning (models/hardnet.py:58-75):
    t1: 16, t2: int(int(25.6+1)/2)*2 = 26, t3: 16, t4: int(int(40.96+1)/2)*2 = 40;
    block output concat = layers 1,3,4 -> 16+16+40 = 72.
    """
    out_chs, in_chs, links, block_out = hard_block_links(4, 48, 16, 1.6)
    assert out_chs == [48, 16, 26, 16, 40]
    assert links == [[0], [1, 0], [2], [3, 2, 0]]
    assert in_chs == [48, 64, 26, 90]
    assert block_out == 16 + 16 + 40


def test_hardblock_forward_channels():
    blk = HarDBlock(in_channels=48, growth_rate=16, grmul=1.6, n_layers=4)
    x = jnp.zeros((1, 8, 8, 48))
    params = blk.init(jax.random.PRNGKey(0), x)
    y = blk.apply(params, x)
    assert y.shape == (1, 8, 8, blk.out_channels)
    assert blk.out_channels == 72


@pytest.mark.parametrize("size", [
    (64, 64),
    pytest.param((96, 64), marks=pytest.mark.slow),
])
def test_hardnet39_stride16_512ch(size):
    model = HarDNetFeatureExtraction(arch=39)
    x = jnp.zeros((1, *size, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, size[0] // 16, size[1] // 16, 512)


@pytest.mark.slow
def test_hardnet_batch_stats_update():
    model = HarDNetFeatureExtraction(arch=39)
    x = jnp.ones((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" in variables
    y, new_state = model.apply(variables, x, train=True, mutable=["batch_stats"])
    # running stats actually moved
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(new_state["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_classifier_pools():
    x = jnp.arange(2 * 7 * 7 * 4, dtype=jnp.float32).reshape(2, 7, 7, 4)
    clf = GlobalAvgPoolClassifier()
    y = clf.apply(clf.init(jax.random.PRNGKey(0), x), x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x).mean(axis=(1, 2)), rtol=1e-6)


@pytest.mark.parametrize("name,ch", [
    pytest.param("resnet50", 1024, marks=pytest.mark.slow),
    ("resnet34", 256)])
def test_resnet_feature_shapes(name, ch):
    model, out_ch = build_backbone(name)
    assert out_ch == ch
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 4, 4, ch)


def test_registry_rejects_unknown():
    with pytest.raises(ValueError):
        build_backbone("vgg16")
