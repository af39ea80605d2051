"""Unified CLI: ``python -m two_stage_object_detection_tpu <command>``.

The reference has no entry points at all — its drivers are bare scripts
run with ``sys.path`` hacks (``train/train.py:3``, ``multi_inference.py:3``).
This exposes every driver behind one command surface:

    python -m two_stage_object_detection_tpu train  --data-root data
    python -m two_stage_object_detection_tpu eval   --weights weights --predict
    python -m two_stage_object_detection_tpu infer  --num 5
    python -m two_stage_object_detection_tpu serve  --port 8000
    python -m two_stage_object_detection_tpu export --out frcnn.stablehlo

Shared flags: ``--config`` (reference-format ``config.json``),
``--set key=value`` (override any :class:`~.config.Config` field from the
command line, e.g. ``--set backbone=hardnet39s --set roi_pool_mode=align``),
and ``--compile-cache DIR`` (persistent XLA compilation cache — repeat runs
skip the multi-second cold compile; see ``utils/compile_cache.py``).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

from two_stage_object_detection_tpu.config import Config, load_config


def _parse_override(cfg: Config, kv: str):
    """``key=value`` -> (key, typed value), typed against the Config field."""
    if "=" not in kv:
        raise SystemExit(f"--set expects key=value, got {kv!r}")
    key, raw = kv.split("=", 1)
    fields = {f.name: f for f in dataclasses.fields(Config)}
    if key not in fields:
        raise SystemExit(f"--set: unknown Config field {key!r}")
    cur = getattr(cfg, key)
    if isinstance(cur, bool):           # bool before int: bool is an int
        if raw.lower() in ("1", "true", "yes", "on"):
            return key, True
        if raw.lower() in ("0", "false", "no", "off"):
            return key, False
        raise SystemExit(f"--set {key}: expected a bool, got {raw!r}")
    if isinstance(cur, int):
        return key, int(raw)
    if isinstance(cur, float):
        return key, float(raw)
    if isinstance(cur, (tuple, list)):
        vals = [v for v in raw.replace("(", "").replace(")", "").split(",") if v]
        elem = type(cur[0]) if len(cur) else float
        return key, tuple(elem(v) for v in vals)
    return key, raw


def _load_cfg(args) -> Config:
    cfg = load_config(getattr(args, "config", None))
    if getattr(args, "flagship", False):
        # the round-5 recommended production recipe (see docs/DESIGN.md
        # "Round 5: flagship promotion"); --set still overrides on top
        cfg = cfg.replace(fpn=True, backbone="resnet50", loc_normalize=True)
    overrides = dict(_parse_override(cfg, kv)
                     for kv in (getattr(args, "set", None) or []))
    if getattr(args, "compile_cache", None):
        overrides["compilation_cache"] = args.compile_cache
    if overrides:
        cfg = cfg.replace(**overrides)
    return cfg


def _add_common(p: argparse.ArgumentParser):
    p.add_argument("--config", default=None,
                   help="config.json path (reference key surface)")
    p.add_argument("--set", action="append", metavar="KEY=VALUE",
                   help="override any Config field (repeatable)")
    p.add_argument("--flagship", action="store_true",
                   help="use the recommended production preset: FPN + "
                        "resnet50 + loc_normalize (428 img/s batched "
                        "inference on v5e; --set overrides on top)")
    p.add_argument("--compile-cache", default=None, metavar="DIR",
                   help="persistent XLA compilation cache directory")
    p.add_argument("--data-root", default="data")
    p.add_argument("--weights", default="weights")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="two_stage_object_detection_tpu",
        description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train", help="run the training loop (train.train)")
    _add_common(p)
    p.add_argument("--resume", action="store_true",
                   help="continue from the _last full-state checkpoint")
    p.add_argument("--pre-train", action="store_true",
                   help="start from _best weights (fresh optimiser)")
    p.add_argument("--spatial", action="store_true",
                   help="shard image height over the mesh's model axis")
    p.add_argument("--eval-period", type=int, default=10)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--no-viz", action="store_true")

    p = sub.add_parser("eval", help="score a checkpoint on the val set")
    _add_common(p)
    p.add_argument("--checkpoint", default=None, choices=(None, "best", "last"),
                   help="which checkpoint (default: best)")
    p.add_argument("--predict", action="store_true",
                   help="score the true inference path instead of the "
                        "reference's trainer-graph protocol")
    p.add_argument("--coco", action="store_true",
                   help="also print the COCO-style summary (area bins, AR)")

    p = sub.add_parser("infer", help="render GT vs predictions to PNGs")
    _add_common(p)
    p.add_argument("--num", type=int, default=5)
    p.add_argument("--out", default="inference_results")
    p.add_argument("--seed", type=int, default=0)

    p = sub.add_parser("serve", help="HTTP serving front (serving_http)")
    _add_common(p)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--wire", default="yuv420", choices=("f32", "u8", "yuv420"))
    p.add_argument("--buckets", default="1,8,16")
    p.add_argument("--wait-ms", type=float, default=5.0)

    p = sub.add_parser("export", help="serialize predict to StableHLO")
    _add_common(p)
    p.add_argument("--out", default="frcnn.stablehlo")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--tpu-only", action="store_true",
                   help="keep TPU custom calls (default artifact is portable)")
    p.add_argument("--checkpoint", default=None, choices=(None, "best", "last"))

    args = ap.parse_args(argv)
    cfg = _load_cfg(args)

    from two_stage_object_detection_tpu.utils.compile_cache import maybe_enable
    maybe_enable(cfg.compilation_cache)

    if args.cmd == "train":
        from two_stage_object_detection_tpu.train import train
        train(visualization=not args.no_viz, cfg=cfg,
              data_root=args.data_root, weights_dir=args.weights,
              pre_train=args.pre_train, resume=args.resume,
              eval_period=args.eval_period, seed=args.seed,
              spatial=args.spatial)
        return 0

    if args.cmd == "eval":
        from two_stage_object_detection_tpu.evaluate import evaluate_checkpoint
        from two_stage_object_detection_tpu.utils import checkpoint as ckpt
        name = {None: None, "best": ckpt.BEST, "last": ckpt.LAST}[args.checkpoint]
        sweep = evaluate_checkpoint(
            weights_dir=args.weights, cfg=cfg, data_root=args.data_root,
            name=name, use_predict=args.predict, coco_summary=args.coco)
        print(json.dumps(sweep, indent=2, default=float))
        return 0

    if args.cmd == "infer":
        from two_stage_object_detection_tpu.infer import multi_inference
        multi_inference(args.num, cfg=cfg, data_root=args.data_root,
                        weights_dir=args.weights, output_dir=args.out,
                        seed=args.seed)
        return 0

    if args.cmd == "serve":
        from two_stage_object_detection_tpu.serving import Predictor
        from two_stage_object_detection_tpu.serving_http import DetectionServer
        pred = Predictor.from_checkpoint(
            args.weights, cfg, wire=args.wire, calibrate=True,
            batch_sizes=tuple(int(b) for b in args.buckets.split(",")))
        with DetectionServer(pred, max_wait_ms=args.wait_ms,
                             host=args.host, port=args.port) as srv:
            print(f"serving on http://{srv.host}:{srv.port}  "
                  f"(wire={args.wire}, buckets={pred.batch_sizes})",
                  flush=True)
            try:
                srv.serve_forever()
            except KeyboardInterrupt:
                pass
        return 0

    if args.cmd == "export":
        import jax

        from two_stage_object_detection_tpu.nets.trainer import (
            create_train_state)
        from two_stage_object_detection_tpu.serving import export_stablehlo
        from two_stage_object_detection_tpu.utils import checkpoint as ckpt
        _, state = create_train_state(cfg, jax.random.PRNGKey(0))
        name = {None: ckpt.BEST, "best": ckpt.BEST,
                "last": ckpt.LAST}[args.checkpoint]
        restored = ckpt.restore_checkpoint(args.weights, state, name=name,
                                           params_only=True)
        if restored is None:
            raise SystemExit(f"no checkpoint {name!r} under {args.weights!r}")
        n = export_stablehlo(cfg, restored.params, restored.batch_stats,
                             args.out, batch_size=args.batch_size,
                             portable=not args.tpu_only)
        print(f"wrote {args.out} ({n} bytes, "
              f"{'TPU-only' if args.tpu_only else 'portable'})")
        return 0

    raise SystemExit(f"unknown command {args.cmd!r}")   # pragma: no cover


if __name__ == "__main__":
    raise SystemExit(main())
