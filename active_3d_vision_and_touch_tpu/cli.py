"""Command-line interface: one binary, subcommands per engine.

Replaces the reference's per-script argparse mains (every ``train.py`` has
its own ``__main__``) with a single typed entry point::

    python -m active_3d_vision_and_touch_tpu.cli generate-data --root data --objects 100
    python -m active_3d_vision_and_touch_tpu.cli train-touch --root data --exp-id t0
    python -m active_3d_vision_and_touch_tpu.cli train-vision --root data --setting v_t_g
    python -m active_3d_vision_and_touch_tpu.cli make-touch-charts --root data --touch-location <ckpt>
    python -m active_3d_vision_and_touch_tpu.cli train-auto --root data --vision-location <ckpt>
    python -m active_3d_vision_and_touch_tpu.cli policy even --root data ...
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

from active_3d_vision_and_touch_tpu.core.config import (
    AutoencoderConfig,
    PolicyConfig,
    TouchConfig,
    VisionConfig,
)

SETTINGS = {
    "v_t_p": dict(use_img=True, finger=True),
    "v_t_g": dict(use_img=True, finger=False),
    "t_p": dict(use_img=False, finger=True),
    "t_g": dict(use_img=False, finger=False),
}


def _add_config_args(parser: argparse.ArgumentParser, cls) -> None:
    for f in dataclasses.fields(cls):
        if f.name in ("eval",):
            parser.add_argument("--eval", action="store_true", default=False)
            continue
        arg = "--" + f.name.replace("_", "-")
        if f.type == "bool" or isinstance(f.default, bool):
            parser.add_argument(
                arg, action="store_true", default=f.default, dest=f.name
            )
        elif isinstance(f.default, (int, float, str)):
            parser.add_argument(
                arg, type=type(f.default), default=f.default, dest=f.name
            )


def _config_from_args(args, cls):
    names = {f.name for f in dataclasses.fields(cls)}
    values = {k: v for k, v in vars(args).items() if k in names}
    cfg = cls(**values)
    if getattr(args, "setting", None):
        for k, v in SETTINGS[args.setting].items():
            setattr(cfg, k, v)
    return cfg


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="a3vt")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("generate-data", help="procedural dataset generation")
    p.add_argument("--root", required=True)
    p.add_argument("--objects", type=int, default=100)
    p.add_argument("--actions", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dist-version", type=int, default=3,
                   help="procedural distribution version (4 = touch-dominant)")
    p.add_argument("--from-obj-dir", default=None,
                   help="ingest external .obj meshes instead of generating "
                        "procedural objects (reference ABC path)")

    p = sub.add_parser("train-touch")
    p.add_argument("--root", required=True)
    _add_config_args(p, TouchConfig)

    p = sub.add_parser("train-vision")
    p.add_argument("--root", required=True)
    p.add_argument("--setting", choices=sorted(SETTINGS), default=None)
    _add_config_args(p, VisionConfig)

    p = sub.add_parser("make-touch-charts")
    p.add_argument("--root", required=True)
    p.add_argument("--touch-location", required=True)
    p.add_argument("--num-actions", type=int, default=50)

    p = sub.add_parser("train-auto")
    p.add_argument("--root", required=True)
    p.add_argument("--setting", choices=sorted(SETTINGS), default=None)
    _add_config_args(p, AutoencoderConfig)

    p = sub.add_parser("policy")
    p.add_argument(
        "policy_name",
        choices=[
            "random", "even", "greedy", "mfba", "leba",
            "nearest", "supervised", "ddqn",
        ],
    )
    p.add_argument("--root", required=True)
    p.add_argument("--setting", choices=sorted(SETTINGS), default=None)
    p.add_argument("--train", action="store_true", default=False)
    _add_config_args(p, PolicyConfig)

    p = sub.add_parser("bench", help="run the headline benchmark")

    args = parser.parse_args(argv)

    if args.command == "generate-data":
        from active_3d_vision_and_touch_tpu.data.generation import generate_dataset

        splits = generate_dataset(
            args.root, args.objects, seed=args.seed, num_actions=args.actions,
            version=args.dist_version, from_obj_dir=args.from_obj_dir
        )
        print(json.dumps({k: len(v) for k, v in splits.items()}))
        return 0

    if args.command == "train-touch":
        from active_3d_vision_and_touch_tpu.data.datasets import Loader, TouchDataset
        from active_3d_vision_and_touch_tpu.train.touch import TouchEngine

        cfg = _config_from_args(args, TouchConfig)
        engine = TouchEngine(cfg)
        limit = 3000 if cfg.limit_data else None

        def make(split, shuffle):
            ds = TouchDataset(
                args.root, split=split, num_samples=cfg.num_samples, limit=limit
            )
            return lambda: Loader(ds, batch_size=cfg.batch_size, shuffle=shuffle)

        if cfg.eval:
            print("eval loss:", engine.evaluate(make("test", False)()))
        else:
            print("best loss:", engine.fit(make("recon_train", True), make("valid", False)))
        return 0

    if args.command == "train-vision":
        from active_3d_vision_and_touch_tpu.data.datasets import VisionDataset
        from active_3d_vision_and_touch_tpu.data.datasets import Loader
        from active_3d_vision_and_touch_tpu.train.vision import VisionEngine

        cfg = _config_from_args(args, VisionConfig)
        engine = VisionEngine(cfg)

        def make(split, shuffle):
            ds = VisionDataset(
                args.root,
                split=split,
                use_img=cfg.use_img,
                use_touch=cfg.use_touch,
                finger=cfg.finger,
                num_grasps=cfg.num_grasps,
                number_points=cfg.number_points,
                eval_mode=cfg.eval,
                limit=2000 if cfg.limit_data else None,
            )
            return lambda: Loader(ds, batch_size=cfg.batch_size, shuffle=shuffle)

        if cfg.eval:
            print("eval loss:", engine.evaluate(make("test", False)()))
        else:
            print("best loss:", engine.fit(make("recon_train", True), make("valid", False)))
        return 0

    if args.command == "make-touch-charts":
        import jax

        from active_3d_vision_and_touch_tpu.core.config import load_config
        from active_3d_vision_and_touch_tpu.data.generation import make_touch_charts
        from active_3d_vision_and_touch_tpu.train.common import CheckpointManager
        from active_3d_vision_and_touch_tpu.train.touch import TouchEngine

        cfg = load_config(args.touch_location, TouchConfig)
        cfg.eval = True
        engine = TouchEngine(cfg, log=False)
        template = engine.init_state(jax.random.PRNGKey(0))
        state = (
            CheckpointManager(args.touch_location).restore(template, "best")
            or template
        )
        make_touch_charts(args.root, engine, state, num_actions=args.num_actions)
        print("touch charts written")
        return 0

    if args.command == "train-auto":
        from active_3d_vision_and_touch_tpu.data.datasets import Loader, VisionDataset
        from active_3d_vision_and_touch_tpu.train.autoencoder import AutoencoderEngine

        cfg = _config_from_args(args, AutoencoderConfig)
        engine = AutoencoderEngine(cfg)

        def make(split, shuffle):
            ds = VisionDataset(
                args.root,
                split=split,
                use_img=cfg.use_img,
                use_touch=cfg.use_touch,
                finger=cfg.finger,
                num_grasps=cfg.num_grasps,
                number_points=cfg.number_points,
                limit=2000 if cfg.limit_data else None,
            )
            return lambda: Loader(ds, batch_size=cfg.batch_size, shuffle=shuffle)

        if cfg.eval:
            print("eval loss:", engine.evaluate(make("test", False)()))
        else:
            print("best loss:", engine.fit(make("auto_train", True), make("valid", False)))
        return 0

    if args.command == "policy":
        from active_3d_vision_and_touch_tpu.active.policies import (
            dataset_specific,
            ddqn,
            nearest,
            simple,
            supervised,
        )

        engines = {
            "random": simple.RandomEngine,
            "even": simple.EvenEngine,
            "greedy": simple.GreedyEngine,
            "mfba": dataset_specific.MFBAEngine,
            "leba": dataset_specific.LEBAEngine,
            "nearest": nearest.NearestNeighborEngine,
            "supervised": supervised.SupervisedEngine,
            "ddqn": ddqn.DDQNEngine,
        }
        cfg = _config_from_args(args, PolicyConfig)
        engine = engines[args.policy_name](cfg, data_root=args.root)
        if args.train and hasattr(engine, "train"):
            engine.train()
        if args.train and hasattr(engine, "train_epoch"):
            for _ in range(cfg.epochs):
                print(engine.train_epoch())
        result = engine.evaluate(split="test" if cfg.eval else "valid")
        print(json.dumps(result.summary()))
        return 0

    if args.command == "bench":
        import bench

        bench.main()
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
