import json

import pytest

from two_stage_object_detection_tpu.config import Config, load_config


def test_defaults_match_reference_contract():
    cfg = Config()
    assert cfg.num_epochs == 2
    assert cfg.lr == 1e-3
    assert cfg.batch_size == 16
    assert cfg.n_train_post_nms == 600 and cfg.n_test_post_nms == 300
    assert cfg.rpn_n_sample == 256 and cfg.roi_n_sample == 128
    assert cfg.grad_accum_steps == 32
    assert cfg.feat_size == (38, 38)
    assert cfg.num_anchors == 12996
    assert cfg.n_anchors_per_cell == 9


def test_load_config_json(tmp_path):
    p = tmp_path / "config.json"
    p.write_text(json.dumps({"num_epochs": 7, "lr": 0.01, "batch_size": 4,
                             "train_ratio": 0.5, "eval_ratio": 0.5,
                             "device": "tpu", "num_workers": 2,
                             "prefetch_factor": 2,
                             "persistent_workers": False}))
    cfg = load_config(str(p))
    assert cfg.num_epochs == 7 and cfg.lr == 0.01 and cfg.batch_size == 4
    # overrides win
    cfg2 = load_config(str(p), num_epochs=9)
    assert cfg2.num_epochs == 9


def test_load_config_extended_keys(tmp_path):
    p = tmp_path / "config.json"
    p.write_text(json.dumps({"num_epochs": 1, "backbone": "resnet50",
                             "num_classes": 20}))
    cfg = load_config(str(p))
    assert cfg.backbone == "resnet50" and cfg.num_classes == 20


def test_replace():
    cfg = Config().replace(batch_size=2)
    assert cfg.batch_size == 2
    with pytest.raises(Exception):
        cfg.batch_size = 3   # frozen
