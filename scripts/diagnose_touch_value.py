"""Diagnostic: does the trained deformation model exploit touch charts?

Evaluates the frozen t_g vision model on the valid split with a FIXED
number of grasps (val_grasps = 0..5).  If CD does not decrease with more
grasps, the model ignores its touch inputs — which would explain active
policies hovering at ~100% CD remaining.

Usage: python scripts/diagnose_touch_value.py --root data_div --out results_div
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data_div")
    ap.add_argument("--out", default="results_div")
    ap.add_argument("--exp-id", default="mini_t_g")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--number-points", type=int, default=10000)
    ap.add_argument("--touch-global", action=argparse.BooleanOptionalAction,
                    default=True, help="must match the trained checkpoint")
    ap.add_argument("--touch-plane", action=argparse.BooleanOptionalAction,
                    default=False, help="must match the trained checkpoint")
    ap.add_argument("--suffix", default="",
                    help="output filename suffix: touch_value<suffix>.json "
                         "(A/B runs against variant checkpoints)")
    args = ap.parse_args()

    import jax

    from active_3d_vision_and_touch_tpu.core.config import VisionConfig
    from active_3d_vision_and_touch_tpu.data.datasets import Loader, VisionDataset
    from active_3d_vision_and_touch_tpu.train.common import CheckpointManager
    from active_3d_vision_and_touch_tpu.train.vision import VisionEngine

    exp = os.path.join(args.out, "exp")
    vcfg = VisionConfig(
        use_img=False, use_touch=True, finger=False, batch_size=args.batch_size,
        touch_global=args.touch_global,
        touch_plane=args.touch_plane,
        number_points=args.number_points, experiments_root=exp, exp_type="vision",
        exp_id=args.exp_id, eval=True,
    )
    engine = VisionEngine(vcfg, log=False)
    engine.build()
    state = CheckpointManager(vcfg.checkpoint_dir).restore(engine.state, "best")
    assert state is not None
    from active_3d_vision_and_touch_tpu.parallel import replicate

    engine.state = replicate(state, engine.mesh)

    results = {}
    for grasps in range(6):
        ds = VisionDataset(
            args.root, split="valid", use_img=False, use_touch=True,
            num_grasps=5, number_points=args.number_points, val_grasps=grasps,
            eval_mode=True,
        )
        loader = Loader(ds, args.batch_size, shuffle=False)
        cd = engine.run_epoch(iter(loader), train=False)
        results[grasps] = round(float(cd), 3)
        print(f"val_grasps={grasps}: CD={cd:.3f}")
    with open(os.path.join(args.out, f"touch_value{args.suffix}.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
