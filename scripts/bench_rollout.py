"""Active-loop benchmark: greedy oracle rollout wall-clock.

Measures the expensive production path (SURVEY §3.4: greedy_checks
reconstructions + CD scorings per env step) and the effect of the
(object, action) signal cache + host/device pipelining in
active/env.py::best_step.  Run on the real chip:

    python scripts/bench_rollout.py --root data_mini \
        --ckpt results_mini/exp/checkpoint
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data_mini")
    ap.add_argument("--ckpt", default="results_mini/exp/checkpoint")
    ap.add_argument("--batches", type=int, default=2)
    ap.add_argument("--budget", type=int, default=5)
    ap.add_argument("--greedy-checks", type=int, default=8)
    ap.add_argument("--env-batch-size", type=int, default=8)
    ap.add_argument("--no-cache", action="store_true")
    args = ap.parse_args()

    import json

    from active_3d_vision_and_touch_tpu.active.policies.simple import GreedyEngine
    from active_3d_vision_and_touch_tpu.core.config import PolicyConfig

    cfg = PolicyConfig(
        use_img=False, use_touch=True, finger=False, number_points=10000,
        env_batch_size=args.env_batch_size, budget=args.budget,
        num_grasps=5, greedy_checks=args.greedy_checks, use_latent=False,
        experiments_root="/tmp/bench_rollout_exp", eval=True,
        exp_id="bench_greedy",
        touch_location=os.path.join(args.ckpt, "touch", "mini"),
        vision_location=os.path.join(args.ckpt, "vision", "mini_t_g"),
    )
    eng = GreedyEngine(cfg, data_root=args.root)
    if args.no_cache:
        # disable by making the capacity 0 → every lookup misses
        eng.env._sig_cache_cap = -1
        orig = eng.env._apply_signals

        def no_cache_apply(actions):
            eng.env._sig_cache.clear()
            orig(actions)

        eng.env._apply_signals = no_cache_apply

    # warmup: compile the device pipeline
    t0 = time.time()
    eng.evaluate(split="valid", max_batches=1)
    compile_s = time.time() - t0

    t0 = time.time()
    result = eng.evaluate(split="test", max_batches=args.batches)
    dt = time.time() - t0
    env_steps = result.scores.shape[0] * args.budget
    print(json.dumps({
        "metric": "greedy_env_steps_per_sec",
        "value": round(env_steps / dt, 4),
        "unit": "env steps/s",
        "cache": not args.no_cache,
        "episodes": int(result.scores.shape[0]),
        "wall_s": round(dt, 1),
        "compile_warmup_s": round(compile_s, 1),
        "pct_cd_remaining": round(result.pct_cd_remaining, 2),
    }))


if __name__ == "__main__":
    main()
