"""Mini-run stage 2: autoencoder + learned policies on real hardware.

Continues scripts/mini_train.py (requires its checkpoints): trains the mesh
autoencoder against the frozen vision model, then trains and evaluates the
latent-conditioned policies (nearest-neighbor, supervised, DDQN) plus MFBA/
LEBA, completing the policy table. Results merge into results_mini/summary.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# persistent XLA compilation cache: repeat runs skip the multi-minute compiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data_mini")
    ap.add_argument("--out", default="results_mini")
    ap.add_argument("--auto-epochs", type=int, default=6)
    ap.add_argument("--train-batches", type=int, default=2)
    ap.add_argument("--ddqn-epochs", type=int, default=3)
    args = ap.parse_args()

    import jax
    import numpy as np

    from active_3d_vision_and_touch_tpu.active.env import ActiveTouchEnv
    from active_3d_vision_and_touch_tpu.active.policies.dataset_specific import (
        LEBAEngine,
        MFBAEngine,
    )
    from active_3d_vision_and_touch_tpu.active.policies.ddqn import DDQNEngine
    from active_3d_vision_and_touch_tpu.active.policies.nearest import (
        NearestNeighborEngine,
    )
    from active_3d_vision_and_touch_tpu.active.policies.supervised import (
        SupervisedEngine,
    )
    from active_3d_vision_and_touch_tpu.core.config import (
        AutoencoderConfig,
        PolicyConfig,
        TouchConfig,
        VisionConfig,
    )
    from active_3d_vision_and_touch_tpu.data.datasets import Loader, VisionDataset
    from active_3d_vision_and_touch_tpu.train.autoencoder import AutoencoderEngine
    from active_3d_vision_and_touch_tpu.train.common import CheckpointManager
    from active_3d_vision_and_touch_tpu.train.touch import TouchEngine
    from active_3d_vision_and_touch_tpu.train.vision import VisionEngine

    exp = os.path.join(args.out, "exp")
    summary_path = os.path.join(args.out, "summary.json")
    summary = json.load(open(summary_path)) if os.path.exists(summary_path) else {}

    # frozen stage-1 models
    tcfg = TouchConfig(
        batch_size=32, num_samples=2000, experiments_root=exp,
        exp_type="touch", exp_id="mini", eval=True,
    )
    touch = TouchEngine(tcfg, log=False)
    tstate = CheckpointManager(tcfg.checkpoint_dir).restore(
        touch.init_state(jax.random.PRNGKey(0)), "best"
    )
    vcfg = VisionConfig(
        use_img=False, use_touch=True, finger=False, batch_size=8,
        number_points=10000, experiments_root=exp, exp_type="vision",
        exp_id="mini_t_g", eval=True,
    )
    vision = VisionEngine(vcfg, log=False)
    vstate = CheckpointManager(vcfg.checkpoint_dir).restore(
        vision.init_state(jax.random.PRNGKey(1)), "best"
    )
    assert tstate is not None and vstate is not None, "run mini_train.py first"

    # ---------------- autoencoder ----------------
    t0 = time.time()
    acfg = AutoencoderConfig(
        use_img=False, use_touch=True, finger=False, batch_size=8,
        number_points=10000, encoding_size=200, experiments_root=exp,
        exp_type="auto", exp_id="mini_t_g", patience=20,
    )
    auto = AutoencoderEngine(
        acfg, vision_engine=vision, vision_state=vstate, log=False
    )

    def aloader(split, shuffle):
        ds = VisionDataset(
            args.root, split=split, use_img=False, use_touch=True,
            num_grasps=5, number_points=10000,
        )
        return lambda: Loader(ds, 8, shuffle=shuffle)

    auto.build()
    a_first = auto.run_epoch(aloader("valid", False)(), train=False)
    a_best = auto.fit(
        aloader("auto_train", True), aloader("valid", False), epochs=args.auto_epochs
    )
    summary["autoencoder_t_g"] = {
        "untrained_valid_cd": a_first,
        "best_valid_cd": a_best,
        "epochs": args.auto_epochs,
        "seconds": round(time.time() - t0, 1),
    }
    print("autoencoder:", summary["autoencoder_t_g"])

    # ---------------- latent env ----------------
    pcfg_base = dict(
        use_img=False, use_touch=True, finger=False, number_points=10000,
        env_batch_size=5, budget=5, num_grasps=5, greedy_checks=8,
        use_latent=True, experiments_root=exp, eval=True,
        hidden_dim=64, layers=3, lr=1e-3,
        burn_in=10, train_batch_size=16, mem_capacity=300,
        epsilon_decay=0.99,
    )
    env = ActiveTouchEnv(
        PolicyConfig(**pcfg_base),
        tstate,
        vstate,
        chart_cache_root=args.root,
        auto_state={"params": jax.device_get(auto.state)["params"]},
        auto_model=auto.model,
    )

    def run(name, engine_cls, train_fn):
        t1 = time.time()
        cfg = PolicyConfig(**pcfg_base, exp_id=f"mini_{name}")
        engine = engine_cls(cfg, data_root=args.root, env=env)
        train_fn(engine)
        result = engine.evaluate("test")
        entry = result.summary()
        entry["seconds"] = round(time.time() - t1, 1)
        summary.setdefault("policies", {})[name] = entry
        print(name, entry)
        json.dump(summary, open(summary_path, "w"), indent=2)

    tb = args.train_batches
    run("mfba", MFBAEngine, lambda e: e.train(train_fraction=1.0, max_batches=tb))
    run("leba", LEBAEngine, lambda e: e.train(train_fraction=1.0, max_batches=tb))
    run(
        "nearest_neighbor",
        NearestNeighborEngine,
        lambda e: e.train(train_fraction=1.0, max_batches=tb),
    )
    run("supervised", SupervisedEngine, lambda e: e.train(max_batches_per_step=tb))
    run("ddqn", DDQNEngine, lambda e: [e.train_epoch() for _ in range(args.ddqn_epochs)])

    json.dump(summary, open(summary_path, "w"), indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
