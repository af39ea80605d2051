"""End-to-end: synthetic COCO -> train steps -> eval -> mAP -> checkpoint."""

import os

import jax
import numpy as np
import pytest

from two_stage_object_detection_tpu.data.coco import load_coco
from two_stage_object_detection_tpu.data.pipeline import DetectionDataset, Loader
from two_stage_object_detection_tpu.data.synthetic import generate_synthetic_coco
from two_stage_object_detection_tpu.eval.evaluator import evaluate
from two_stage_object_detection_tpu.nets.trainer import (
    create_train_state, train_step)
from two_stage_object_detection_tpu.utils import checkpoint as ckpt
from tests.test_detector import tiny_config


@pytest.fixture(scope="module")
def _pipeline_once(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e"))
    ann, img_dir = generate_synthetic_coco(root, num_images=4, num_classes=3,
                                           image_size=(64, 64), seed=7)
    cfg = tiny_config(batch_size=2, num_workers=2)
    index = load_coco(ann, img_dir)
    ds = DetectionDataset(index, cfg.input_size, cfg.max_gt_boxes, train=True,
                          seed=0)
    loader = Loader(ds, cfg.batch_size, shuffle=True, num_workers=2, seed=0)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                      init_image_size=(32, 32))
    return cfg, loader, model, state


@pytest.fixture
def pipeline(_pipeline_once):
    # train_step donates its state; give each test a fresh buffer copy
    import jax.numpy as jnp
    cfg, loader, model, state = _pipeline_once
    state = jax.tree_util.tree_map(
        lambda x: jnp.array(x) if hasattr(x, "dtype") else x, state)
    return cfg, loader, model, state


@pytest.mark.slow
def test_train_loop_on_synthetic(pipeline):
    cfg, loader, model, state = pipeline
    losses = []
    for epoch in range(2):
        for i, batch in enumerate(loader):
            state, out = train_step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(out["total"]))
    assert all(np.isfinite(losses))
    # evaluation produces a numeric mAP and finite loss
    loss, m, metrics = evaluate(state, iter(loader), cfg,
                                map_iou_threshold=0.5, max_batches=2)
    assert np.isfinite(loss)
    assert 0.0 <= m <= 1.0
    assert set(metrics["class_metrics"].keys()) == {1, 2, 3}


def test_checkpoint_roundtrip(pipeline, tmp_path):
    cfg, loader, model, state = pipeline
    path = str(tmp_path / "weights")
    os.makedirs(path, exist_ok=True)
    ckpt.save_checkpoint(path, state, name=ckpt.BEST)
    restored = ckpt.restore_checkpoint(path, state, name=ckpt.BEST)
    assert restored is not None
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # params_only restore keeps fresh optimizer but same params
    restored2 = ckpt.restore_checkpoint(path, state, name=ckpt.BEST,
                                        params_only=True)
    b2 = jax.tree_util.tree_leaves(restored2.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b2))
    assert ckpt.restore_checkpoint(path, state, name="missing") is None


@pytest.mark.slow
def test_train_resume_continues_from_last(tmp_path):
    """resume=True restores the FULL state (step counter + optimiser) from
    the _last checkpoint and continues at the next epoch."""
    from two_stage_object_detection_tpu.train import train

    root = str(tmp_path / "data")
    generate_synthetic_coco(root, split="train2017", num_images=4,
                            num_classes=3, image_size=(64, 64), seed=7)
    generate_synthetic_coco(root, split="val2017", num_images=2,
                            num_classes=3, image_size=(64, 64), seed=8)
    cfg = tiny_config(batch_size=2, num_workers=2, num_epochs=1,
                      train_ratio=1.0, eval_ratio=1.0)
    weights = str(tmp_path / "weights")
    s1 = train(visualization=False, cfg=cfg, data_root=root,
               weights_dir=weights, eval_period=1, mesh=None)
    steps_per_epoch = 2          # 4 images / batch 2
    assert int(s1.step) == steps_per_epoch
    # the global-best eval loss is persisted next to the _last checkpoint so
    # a resumed run doesn't unconditionally overwrite _best (advisor r2)
    import json
    with open(os.path.join(weights, "train_meta.json")) as f:
        assert np.isfinite(json.load(f)["min_eval_loss"])

    # same run resumed with a longer horizon: continues, does not restart
    cfg2 = tiny_config(batch_size=2, num_workers=2, num_epochs=2,
                       train_ratio=1.0, eval_ratio=1.0)
    s2 = train(visualization=False, cfg=cfg2, data_root=root,
               weights_dir=weights, eval_period=1, mesh=None, resume=True)
    assert int(s2.step) == 2 * steps_per_epoch
    # optimiser state was restored, not fresh: the second-epoch update used
    # the first run's Adam moments (smoke: params differ from s1's)
    a = jax.tree_util.tree_leaves(s1.params)[0]
    b = jax.tree_util.tree_leaves(s2.params)[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))
