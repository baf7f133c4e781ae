"""Mini end-to-end training run on real hardware.

Trains the full stack on the generated `data_mini` dataset (60 procedural
objects, 50 grasps each) and evaluates the non-learned policies, writing a
summary table to results_mini/summary.json.  This is the round-level
evidence that every stage learns and composes:

  touch CNN → chart cache → vision deformation (t_g) → active env →
  random / even / greedy policy comparison (% CD remaining, BASELINE metric)

Usage: python scripts/mini_train.py [--root data_mini] [--epochs N]
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
    ap.add_argument("--touch-epochs", type=int, default=4)
    ap.add_argument("--vision-epochs", type=int, default=8)
    ap.add_argument("--out", default="results_mini")
    args = ap.parse_args()

    import jax

    from active_3d_vision_and_touch_tpu.active.env import ActiveTouchEnv
    from active_3d_vision_and_touch_tpu.active.policies.simple import (
        EvenEngine,
        GreedyEngine,
        RandomEngine,
    )
    from active_3d_vision_and_touch_tpu.core.config import (
        PolicyConfig,
        TouchConfig,
        VisionConfig,
    )
    from active_3d_vision_and_touch_tpu.data.datasets import (
        Loader,
        TouchDataset,
        VisionDataset,
    )
    from active_3d_vision_and_touch_tpu.data.generation import make_touch_charts
    from active_3d_vision_and_touch_tpu.train.touch import TouchEngine
    from active_3d_vision_and_touch_tpu.train.vision import VisionEngine

    os.makedirs(args.out, exist_ok=True)
    summary = {"backend": jax.default_backend()}
    exp = os.path.join(args.out, "exp")

    # ---------------- touch model ----------------
    t0 = time.time()
    tcfg = TouchConfig(
        batch_size=32, num_samples=2000, experiments_root=exp,
        exp_type="touch", exp_id="mini", patience=20,
    )
    touch = TouchEngine(tcfg, log=False)
    train_ds = TouchDataset(args.root, "recon_train", num_samples=2000)
    valid_ds = TouchDataset(args.root, "valid", num_samples=2000)
    print(f"touch items: train={len(train_ds)} valid={len(valid_ds)}")
    tl = lambda: Loader(train_ds, 32, shuffle=True)  # noqa: E731
    vl = lambda: Loader(valid_ds, 32, shuffle=False)  # noqa: E731
    first = touch.build() and None
    first_loss = touch.run_epoch(vl(), train=False)
    best = touch.fit(tl, vl, epochs=args.touch_epochs)
    summary["touch"] = {
        "untrained_valid_cd": first_loss,
        "best_valid_cd": best,
        "epochs": args.touch_epochs,
        "seconds": round(time.time() - t0, 1),
    }
    print("touch:", summary["touch"])

    # ---------------- chart cache ----------------
    t0 = time.time()
    make_touch_charts(args.root, touch, touch.state, num_actions=50)
    summary["touch_charts_seconds"] = round(time.time() - t0, 1)

    # ---------------- vision model (t_g) ----------------
    t0 = time.time()
    vcfg = VisionConfig(
        use_img=False, use_touch=True, finger=False, batch_size=8,
        number_points=10000, experiments_root=exp, exp_type="vision",
        exp_id="mini_t_g", patience=20,
    )
    vision = VisionEngine(vcfg, log=False)

    def vloader(split, shuffle):
        ds = VisionDataset(
            args.root, split=split, use_img=False, use_touch=True,
            num_grasps=5, number_points=10000,
        )
        return lambda: Loader(ds, 8, shuffle=shuffle)

    vision.build()
    v_first = vision.run_epoch(vloader("valid", False)(), train=False)
    v_best = vision.fit(
        vloader("recon_train", True), vloader("valid", False),
        epochs=args.vision_epochs,
    )
    summary["vision_t_g"] = {
        "untrained_valid_cd": v_first,
        "best_valid_cd": v_best,
        "epochs": args.vision_epochs,
        "seconds": round(time.time() - t0, 1),
    }
    print("vision:", summary["vision_t_g"])

    # ---------------- policies ----------------
    t0 = time.time()
    pcfg_base = dict(
        use_img=False, use_touch=True, finger=False, number_points=10000,
        env_batch_size=5, budget=5, num_grasps=5, greedy_checks=10,
        experiments_root=exp, eval=True,
    )
    env = ActiveTouchEnv(
        PolicyConfig(**pcfg_base), touch.state, vision.state,
        chart_cache_root=args.root,
    )
    summary["policies"] = {}
    for cls in (RandomEngine, EvenEngine, GreedyEngine):
        cfg = PolicyConfig(**pcfg_base, exp_id=f"mini_{cls.name}")
        result = cls(cfg, data_root=args.root, env=env).evaluate("test")
        summary["policies"][cls.name] = result.summary()
        print(cls.name, result.summary())
    summary["policies_seconds"] = round(time.time() - t0, 1)

    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
