"""Driver smoke tests: train() and multi_inference() end to end on a tiny
synthetic COCO tree (CPU, tiny config)."""

import os

import numpy as np
import pytest

from two_stage_object_detection_tpu.data.synthetic import generate_synthetic_coco
from tests.test_detector import tiny_config


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("drv"))
    generate_synthetic_coco(root, split="train2017", num_images=4,
                            num_classes=3, image_size=(64, 64), seed=1)
    generate_synthetic_coco(root, split="val2017", num_images=2,
                            num_classes=3, image_size=(64, 64), seed=2)
    return root


@pytest.mark.slow
def test_train_driver(data_root, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from two_stage_object_detection_tpu.train import train
    cfg = tiny_config(num_epochs=1, batch_size=2, num_workers=2,
                      train_ratio=1.0, eval_ratio=1.0)
    weights = str(tmp_path / "weights")
    state = train(visualization=True, cfg=cfg, data_root=data_root,
                  weights_dir=weights, eval_period=1)
    assert int(state.step) >= 1
    assert os.path.exists(os.path.join(weights, "FasterRCNNTrainer_last"))
    assert os.path.exists("training_metrics.png")
    # resume from the saved checkpoint (pre_train path)
    state2 = train(visualization=False, cfg=cfg, data_root=data_root,
                   weights_dir=weights, pre_train=True, eval_period=1)
    assert int(state2.step) >= 1


def test_infer_driver(data_root, tmp_path):
    from two_stage_object_detection_tpu.infer import multi_inference
    cfg = tiny_config(batch_size=2, eval_ratio=1.0)
    out_dir = str(tmp_path / "inference_results")
    outputs = multi_inference(num_inference=2, cfg=cfg, data_root=data_root,
                              weights_dir=str(tmp_path / "nonexistent"),
                              output_dir=out_dir)
    assert len(outputs) == 2
    for p in outputs:
        assert os.path.exists(p) and os.path.getsize(p) > 0
