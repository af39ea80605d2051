"""CLI + standalone eval driver + compilation cache tests.

The reference has no CLI, no standalone eval, and (eager torch) no compile
cache; these are framework additions — tested here end to end on the tiny
synthetic COCO tree.
"""

import json
import os

import jax
import jax.numpy as jnp
import pytest

from two_stage_object_detection_tpu.__main__ import _parse_override, main
from two_stage_object_detection_tpu.config import Config
from two_stage_object_detection_tpu.data.synthetic import generate_synthetic_coco
from tests.test_detector import tiny_config


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cli"))
    generate_synthetic_coco(root, split="val2017", num_images=2,
                            num_classes=3, image_size=(64, 64), seed=7)
    return root


@pytest.fixture(scope="module")
def weights_dir(tmp_path_factory):
    """A saved best-checkpoint from a freshly initialised tiny state."""
    from two_stage_object_detection_tpu.nets.trainer import create_train_state
    from two_stage_object_detection_tpu.utils import checkpoint as ckpt
    cfg = tiny_config(eval_ratio=1.0, batch_size=2)
    _, state = create_train_state(cfg, jax.random.PRNGKey(0))
    path = str(tmp_path_factory.mktemp("w"))
    ckpt.save_checkpoint(path, state, name=ckpt.BEST)
    ckpt.wait_for_saves()
    return path


# ----------------------------------------------------------------- overrides

def test_parse_override_types():
    cfg = Config()
    assert _parse_override(cfg, "batch_size=4") == ("batch_size", 4)
    assert _parse_override(cfg, "weight_decay=0.01") == ("weight_decay", 0.01)
    assert _parse_override(cfg, "backbone=resnet34") == ("backbone", "resnet34")
    key, val = _parse_override(cfg, "remat_backbone=true")
    assert key == "remat_backbone" and val is True
    key, val = _parse_override(cfg, "remat_backbone=0")
    assert val is False
    key, val = _parse_override(cfg, "anchor_ratios=0.5,1,2")
    assert key == "anchor_ratios" and val == (0.5, 1.0, 2.0)


def test_parse_override_rejects_unknown():
    cfg = Config()
    with pytest.raises(SystemExit):
        _parse_override(cfg, "not_a_field=1")
    with pytest.raises(SystemExit):
        _parse_override(cfg, "novalue")
    with pytest.raises(SystemExit):
        _parse_override(cfg, "remat_backbone=maybe")


# ------------------------------------------------------------- eval driver

def test_evaluate_checkpoint(data_root, weights_dir):
    from two_stage_object_detection_tpu.evaluate import evaluate_checkpoint
    cfg = tiny_config(eval_ratio=1.0, batch_size=2, num_workers=1)
    sweep = evaluate_checkpoint(weights_dir=weights_dir, cfg=cfg,
                                data_root=data_root)
    for k in ("mAP50", "mAP95", "mAP50_95", "eval_loss"):
        assert k in sweep
        assert 0.0 <= float(sweep[k]) or k == "eval_loss"


def test_evaluate_checkpoint_missing_raises(data_root, tmp_path):
    from two_stage_object_detection_tpu.evaluate import evaluate_checkpoint
    cfg = tiny_config(eval_ratio=1.0, batch_size=2)
    with pytest.raises(FileNotFoundError):
        evaluate_checkpoint(weights_dir=str(tmp_path / "nope"), cfg=cfg,
                            data_root=data_root)


def test_cli_eval_main(data_root, weights_dir, tmp_path, capsys):
    """Whole CLI path: config override -> eval -> JSON on stdout."""
    cfg = tiny_config(eval_ratio=1.0, batch_size=2, num_workers=1)
    cfg_path = str(tmp_path / "config.json")
    # the JSON file carries most of the tiny recipe (extended-key surface);
    # --set exercises the typed command-line overrides on top
    with open(cfg_path, "w") as f:
        json.dump({"eval_ratio": cfg.eval_ratio, "batch_size": cfg.batch_size,
                   "num_workers": cfg.num_workers,
                   "num_classes": cfg.num_classes,
                   "max_gt_boxes": cfg.max_gt_boxes,
                   "n_train_pre_nms": cfg.n_train_pre_nms,
                   "n_train_post_nms": cfg.n_train_post_nms,
                   "n_test_pre_nms": cfg.n_test_pre_nms,
                   "n_test_post_nms": cfg.n_test_post_nms,
                   "roi_n_sample": cfg.roi_n_sample,
                   "rpn_n_sample": cfg.rpn_n_sample,
                   "max_detections": cfg.max_detections,
                   "grad_accum_steps": cfg.grad_accum_steps,
                   "compute_dtype": cfg.compute_dtype}, f)
    rc = main(["eval", "--config", cfg_path, "--weights", weights_dir,
               "--data-root", data_root, "--checkpoint", "best",
               "--set", "input_size=64,64"])
    assert rc == 0
    out = capsys.readouterr().out
    payload = json.loads(out[out.index("{"):])
    assert "mAP50" in payload


# ---------------------------------------------------------- compile cache

def test_compile_cache_enable(tmp_path):
    """enable() populates the dir; maybe_enable('') is a no-op. Restores the
    suite's own cache config afterwards (conftest sets a shared dir)."""
    from two_stage_object_detection_tpu.utils import compile_cache
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_secs = jax.config.jax_persistent_cache_min_compile_time_secs
    prev_bytes = jax.config.jax_persistent_cache_min_entry_size_bytes
    try:
        assert compile_cache.maybe_enable("") is None
        assert compile_cache.maybe_enable(None) is None
        d = compile_cache.enable(str(tmp_path / "cc"))
        assert os.path.isdir(d)
        # a fresh jitted program must land in the cache directory

        @jax.jit
        def f(x):
            return jnp.tanh(x) * 3.25 + jnp.cos(x)

        f(jnp.arange(97, dtype=jnp.float32)).block_until_ready()
        entries = os.listdir(d)
        assert entries, "persistent cache dir stayed empty after a compile"
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          prev_secs)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                          prev_bytes)
        from jax._src import compilation_cache as _cc
        _cc.reset_cache()       # re-point the singleton back at prev_dir


def test_flagship_preset_applies_and_set_overrides():
    """--flagship = FPN + resnet50 + loc_normalize; --set wins on top."""
    import argparse

    from two_stage_object_detection_tpu.__main__ import _load_cfg

    args = argparse.Namespace(config=None, set=None, compile_cache=None,
                              flagship=True)
    cfg = _load_cfg(args)
    assert cfg.fpn and cfg.backbone == "resnet50" and cfg.loc_normalize

    args = argparse.Namespace(config=None, set=["backbone=resnet34"],
                              compile_cache=None, flagship=True)
    cfg = _load_cfg(args)
    assert cfg.fpn and cfg.backbone == "resnet34"
