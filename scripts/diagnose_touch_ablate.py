"""Ablation: WHERE does the v4 touch-hurts signal come from?

The round-4 gate (`diagnose_touch_value.py`) measured CD *increasing*
with grasps on v4 (45.9 -> 49.1 over 0->5).  On v4, 45% of
(grasp, finger) slots are mask=1 (grasp-without-touch, chart collapsed
to the off-surface sensor position) vs mask=2 on-surface predictions.
Mask=1 charts are zero-area (invisible to area-weighted sampling) but
still sit in the GCN graph as off-surface vertices.

This script evaluates the FROZEN campaign_t_g model at val_grasps in
{0, 5} under three chart treatments:
  raw    — as trained (reproduces the gate numbers)
  drop1  — mask=1 slots zeroed to padding (xyz=0, mask=0)
  none   — all touch slots zeroed (sanity: should match raw cd_0)

If drop1 recovers (cd_5 < cd_0), the harm is the mask=1 graph vertices
and the fix is at the data/featurization layer; if not, the trained
deformation itself misuses on-surface charts.
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
    ap.add_argument("--root", default="data_r4")
    ap.add_argument("--out", default="results_r4")
    ap.add_argument("--exp-id", default="campaign_t_g")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--number-points", type=int, default=10000)
    ap.add_argument("--touch-global", action=argparse.BooleanOptionalAction,
                    default=True, help="must match the trained checkpoint")
    args = ap.parse_args()

    import numpy as np

    from active_3d_vision_and_touch_tpu.core.config import VisionConfig
    from active_3d_vision_and_touch_tpu.data.datasets import Loader, VisionDataset
    from active_3d_vision_and_touch_tpu.parallel import replicate
    from active_3d_vision_and_touch_tpu.train.common import CheckpointManager
    from active_3d_vision_and_touch_tpu.train.vision import VisionEngine

    exp = os.path.join(args.out, "exp")
    vcfg = VisionConfig(
        use_img=False, use_touch=True, finger=False, batch_size=args.batch_size,
        touch_global=args.touch_global,
        number_points=args.number_points, experiments_root=exp, exp_type="vision",
        exp_id=args.exp_id, eval=True,
    )
    engine = VisionEngine(vcfg, log=False)
    engine.build()
    state = CheckpointManager(vcfg.checkpoint_dir).restore(engine.state, "best")
    assert state is not None
    engine.state = replicate(state, engine.mesh)

    def make_loader(grasps: int, mode: str):
        ds = VisionDataset(
            args.root, split="valid", use_img=False, use_touch=True,
            num_grasps=5, number_points=args.number_points, val_grasps=grasps,
            eval_mode=True,
        )
        base_get = ds.__getitem__

        def patched(index):
            data = base_get(index)
            tc = data["touch_charts"]
            if mode == "drop1":
                bad = tc[..., 3] == 1.0
                tc = tc.copy()
                tc[bad] = 0.0
            elif mode == "none":
                tc = np.zeros_like(tc)
            data["touch_charts"] = tc
            return data

        ds.__getitem__ = patched
        return Loader(ds, args.batch_size, shuffle=False)

    results = {}
    for mode in ("raw", "drop1", "none"):
        for grasps in (0, 5):
            cd = engine.run_epoch(iter(make_loader(grasps, mode)), train=False)
            results[f"{mode}_g{grasps}"] = round(float(cd), 3)
            print(f"{mode} val_grasps={grasps}: CD={cd:.3f}", flush=True)
    with open(os.path.join(args.out, "touch_ablation.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
