"""Torch-weight import: numeric parity against the actual torch reference.

Loads the reference's own ``models/hardnet.py`` (read-only, skipped when
``/root/reference`` is absent), converts its randomly-initialised state dict
with :mod:`utils.torch_import`, and checks the flax backbone reproduces the
torch features bit-for-bit (up to f32 conv reassociation).  The RPN / RoI
dense heads are checked against synthetic torch layers with the reference's
exact permute/reshape semantics (``nets/rpn.py:107-114``).
"""

import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from two_stage_object_detection_tpu.utils.torch_import import (  # noqa: E402
    convert_extractor, convert_state_dict, load_torch_checkpoint)

REFERENCE = "/root/reference"
pytestmark = pytest.mark.slow


def _torch_backbone(arch=39):
    sys.path.insert(0, REFERENCE)
    try:
        import importlib
        mod = importlib.import_module("models.hardnet")
    finally:
        sys.path.remove(REFERENCE)
    return mod.HarDNetFeatureExtraction(depth_wise=True, arch=arch)


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="no reference checkout")
def test_backbone_forward_parity_hardnet39():
    torch.manual_seed(0)
    tm = _torch_backbone(39)
    # give the BN running stats non-trivial values, then freeze
    tm.train()
    with torch.no_grad():
        for _ in range(2):
            tm(torch.randn(2, 3, 64, 64))
    tm.eval()

    params, stats = convert_extractor(
        {k: v for k, v in tm.state_dict().items()}, arch=39)

    from two_stage_object_detection_tpu.models.hardnet import (
        HarDNetFeatureExtraction)
    fm = HarDNetFeatureExtraction(arch=39, dtype=jnp.float32)

    x = np.random.RandomState(1).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()          # NCHW
    got = fm.apply({"params": params, "batch_stats": stats},
                   jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_rpn_and_head_dense_parity():
    """Converted 1x1 convs / Linears reproduce the reference's
    permute-reshape outputs (nets/rpn.py:107-114, nets/classify.py:48-50)."""
    torch.manual_seed(1)
    n_anchor, c, h, w, n_class = 9, 32, 5, 6, 4
    loc = torch.nn.Conv2d(c, n_anchor * 4, 1)
    score = torch.nn.Conv2d(c, n_anchor * 2, 1)
    cls_loc = torch.nn.Linear(c, n_class * 4)
    cls_score = torch.nn.Linear(c, n_class)

    sd = {}
    for name, m in [("rpn.loc", loc), ("rpn.score", score),
                    ("head.cls_loc", cls_loc), ("head.score", cls_score)]:
        sd[f"{name}.weight"] = m.weight.detach()
        sd[f"{name}.bias"] = m.bias.detach()
    # backbone keys are required by convert_state_dict only via convert_extractor;
    # call the head/rpn paths directly through convert_state_dict's sub-dicts
    from two_stage_object_detection_tpu.utils.torch_import import (
        _conv_kernel, _dense_kernel, _take)

    x = np.random.RandomState(2).rand(2, c, h, w).astype(np.float32)
    with torch.no_grad():
        tl = loc(torch.from_numpy(x))
        want_loc = tl.permute(0, 2, 3, 1).contiguous().view(2, -1, 4).numpy()
        ts = score(torch.from_numpy(x))
        want_score = ts.permute(0, 2, 3, 1).contiguous().view(2, -1, 2).numpy()

    from two_stage_object_detection_tpu.nets.rpn import RPNHead
    head = RPNHead(n_anchors=n_anchor, dtype=jnp.float32)
    params = {"loc": {"kernel": _conv_kernel(_take(sd, "rpn.loc.weight")),
                      "bias": _take(sd, "rpn.loc.bias")},
              "score": {"kernel": _conv_kernel(_take(sd, "rpn.score.weight")),
                        "bias": _take(sd, "rpn.score.bias")}}
    got_loc, got_score = head.apply(
        {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(got_loc), want_loc, rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_score), want_score, rtol=1e-5,
                               atol=1e-5)

    flat = np.random.RandomState(3).rand(7, c).astype(np.float32)
    with torch.no_grad():
        want_cl = cls_loc(torch.from_numpy(flat)).numpy()
        want_cs = cls_score(torch.from_numpy(flat)).numpy()
    got_cl = flat @ _dense_kernel(_take(sd, "head.cls_loc.weight")) + \
        _take(sd, "head.cls_loc.bias")
    got_cs = flat @ _dense_kernel(_take(sd, "head.score.weight")) + \
        _take(sd, "head.score.bias")
    np.testing.assert_allclose(got_cl, want_cl, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_cs, want_cs, rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="no reference checkout")
def test_load_torch_checkpoint_roundtrip(tmp_path):
    """A reference-format .pth (model_state_dict wrapper) loads into a
    TrainState and every leaf lands with the right shape."""
    torch.manual_seed(0)
    tm = _torch_backbone(39)
    c = 512
    full_sd = {f"feat_extra.{k}": v for k, v in tm.state_dict().items()}
    full_sd.update({
        "rpn.loc.weight": torch.randn(36, c, 1, 1),
        "rpn.loc.bias": torch.randn(36),
        "rpn.score.weight": torch.randn(18, c, 1, 1),
        "rpn.score.bias": torch.randn(18),
        "head.cls_loc.weight": torch.randn(4 * 4, c),
        "head.cls_loc.bias": torch.randn(4 * 4),
        "head.score.weight": torch.randn(4, c),
        "head.score.bias": torch.randn(4),
    })
    path = str(tmp_path / "FasterRCNNTrainer_best.pth")
    torch.save({"model_state_dict": full_sd}, path)

    from tests.test_detector import tiny_config
    from two_stage_object_detection_tpu.nets.trainer import create_train_state
    cfg = tiny_config(num_classes=3)   # n_class = 4 incl. background
    _, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                  init_image_size=(32, 32))
    new_state = load_torch_checkpoint(path, state, arch=39)
    kern = np.asarray(new_state.params["rpn_head"]["loc"]["kernel"])
    np.testing.assert_allclose(
        kern, np.transpose(full_sd["rpn.loc.weight"].numpy(), (2, 3, 1, 0)))
    # a deep backbone leaf survived too
    b0 = np.asarray(
        new_state.params["extractor"]["block0"]["layer0"]["layer1"]["conv"]["kernel"])
    assert b0.ndim == 4


def test_export_import_roundtrip():
    """flax -> torch state dict -> flax must be the identity."""
    from tests.test_detector import tiny_config
    from two_stage_object_detection_tpu.nets.trainer import create_train_state
    from two_stage_object_detection_tpu.utils.torch_import import (
        export_state_dict)

    cfg = tiny_config()
    _, state = create_train_state(cfg, jax.random.PRNGKey(3),
                                  init_image_size=(32, 32))
    params = jax.device_get(state.params)
    stats = jax.device_get(state.batch_stats)
    sd = export_state_dict(params, stats, arch=39)
    back_p, back_s = convert_state_dict(sd, arch=39)

    flat_a = jax.tree_util.tree_leaves_with_path(dict(params))
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back_p))

    def cmp(tree_ref, tree_new, where):
        la = jax.tree_util.tree_leaves_with_path(tree_ref)
        lb = dict(jax.tree_util.tree_leaves_with_path(tree_new))
        assert set(lb) == set(p for p, _ in la), where
        for p, v in la:
            np.testing.assert_array_equal(np.asarray(v), lb[p],
                                          err_msg=f"{where}{p}")

    cmp(dict(params), back_p, "params")
    cmp(dict(stats), back_s, "stats")


def test_export_loads_into_reference_trainer():
    """The exported dict must load into the actual reference model
    (strict up to BN num_batches_tracked counters)."""
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference checkout not available")
    from tests.test_detector import tiny_config
    from two_stage_object_detection_tpu.nets.trainer import create_train_state
    from two_stage_object_detection_tpu.utils.torch_import import (
        export_state_dict)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, "/root/repo/scripts")
    import parity_reference as P
    P.build_shim()
    P.install_torchvision_stub()
    sys.path.insert(0, P.SHIM)
    from nets.frcnn_training import FasterRCNNTrainer

    cfg = tiny_config()
    _, state = create_train_state(cfg, jax.random.PRNGKey(4),
                                  init_image_size=(32, 32))
    sd = export_state_dict(jax.device_get(state.params),
                           jax.device_get(state.batch_stats), arch=39)
    model = FasterRCNNTrainer(mode="train", num_classes=cfg.num_classes)
    res = model.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False)
    assert not res.unexpected_keys, res.unexpected_keys
    assert all(k.endswith("num_batches_tracked") for k in res.missing_keys), \
        res.missing_keys


# ------------------------------------------------------- resnet backbones
def _torch_resnet(name="resnet34"):
    sys.path.insert(0, REFERENCE)
    try:
        import importlib
        mod = importlib.import_module("models.resnet")
    finally:
        sys.path.remove(REFERENCE)
    return getattr(mod, name)(include_top=False)


def _torch_trunk(tm, x, n_stages=3):
    """Reference resnet stem + layer1..layerN (stride-16 cut at N=3)."""
    y = tm.maxpool(tm.relu(tm.bn1(tm.conv1(x))))
    for li in range(1, n_stages + 1):
        y = getattr(tm, f"layer{li}")(y)
    return y


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="no reference checkout")
@pytest.mark.parametrize("name,block", [("resnet34", "basic"),
                                        ("resnet50", "bottleneck")])
def test_resnet_backbone_import_parity(name, block):
    """Reference torch resnet weights -> flax trunk, bit-level features."""
    from two_stage_object_detection_tpu.models.resnet import (
        ResNetFeatureExtraction)
    from two_stage_object_detection_tpu.utils.torch_import import (
        convert_resnet_state_dict)

    torch.manual_seed(0)
    tm = _torch_resnet(name)
    tm.train()
    with torch.no_grad():
        for _ in range(2):
            _torch_trunk(tm, torch.randn(2, 3, 64, 64))   # warm BN stats
    tm.eval()

    params, stats = convert_resnet_state_dict(
        tm.state_dict(), block=block, blocks_num=(3, 4, 6))
    fm = ResNetFeatureExtraction(block=block, blocks_num=(3, 4, 6),
                                 dtype=jnp.float32)
    x = np.random.RandomState(1).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = _torch_trunk(tm, torch.from_numpy(x)).numpy()     # NCHW
    got = fm.apply({"params": params, "batch_stats": stats},
                   jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               want, atol=2e-4, rtol=2e-4)


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="no reference checkout")
def test_resnet_import_torchvision_style_relu():
    """Torchvision-style dicts (no PReLU keys) import as exact ReLU nets.

    Pin the semantic claim behind ImageNet transfer: alpha=0 PReLU == ReLU,
    so a checkpoint trained with ReLU computes identically here.
    """
    from two_stage_object_detection_tpu.models.resnet import (
        ResNetFeatureExtraction)
    from two_stage_object_detection_tpu.utils.torch_import import (
        convert_resnet_state_dict)

    torch.manual_seed(1)
    tm = _torch_resnet("resnet34")
    with torch.no_grad():                     # force PReLU == ReLU in torch
        for m in tm.modules():
            if isinstance(m, torch.nn.PReLU):
                m.weight.zero_()
    tm.eval()
    sd = {k: v for k, v in tm.state_dict().items()
          if not k.endswith("relu.weight")}   # torchvision has no such keys
    params, stats = convert_resnet_state_dict(sd, block="basic",
                                              blocks_num=(3, 4, 6))
    fm = ResNetFeatureExtraction(block="basic", blocks_num=(3, 4, 6),
                                 dtype=jnp.float32)
    x = np.random.RandomState(2).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = _torch_trunk(tm, torch.from_numpy(x)).numpy()
    got = fm.apply({"params": params, "batch_stats": stats},
                   jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               want, atol=2e-4, rtol=2e-4)


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="no reference checkout")
def test_load_resnet_backbone_into_detector_state():
    """load_resnet_backbone seeds a full detector TrainState (incl. FPN)."""
    from tests.test_detector import tiny_config
    from two_stage_object_detection_tpu.nets.trainer import create_train_state
    from two_stage_object_detection_tpu.utils.torch_import import (
        load_resnet_backbone)

    torch.manual_seed(2)
    tm = _torch_resnet("resnet34")
    cfg = tiny_config(backbone="resnet34", fpn=True, fpn_channels=32,
                      fpn_fc_dim=64)
    _, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                  init_image_size=(32, 32))
    new = load_resnet_backbone(tm.state_dict(), state, block="basic",
                               blocks_num=(3, 4, 6, 3))    # pyramid: +layer4
    w = np.asarray(new.params["extractor"]["conv1"]["kernel"])
    want = np.transpose(tm.state_dict()["conv1.weight"].numpy(), (2, 3, 1, 0))
    np.testing.assert_array_equal(w, want)
    # heads untouched
    np.testing.assert_array_equal(
        np.asarray(new.params["roi_head"]["cls_loc"]["kernel"]),
        np.asarray(state.params["roi_head"]["cls_loc"]["kernel"]))
