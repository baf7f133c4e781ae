"""Medoid proxy: gate a procedural distribution's touch value BEFORE training.

Round-3 lesson (ROADMAP.md): training ON a mixture absorbs family-level
entropy, so per-family diagnostics run after training mislead.  This proxy
needs no training and no simulation — just ground-truth clouds:

  cd_prior        mean CD of the best single constant prediction (the train
                  medoid) on held-out objects — an optimistic stand-in for
                  what a 0-grasp model can do (a trained prior hedges and
                  does slightly better, so the GATE uses a margin).
  cd_scale_oracle mean CD of the medoid after per-axis rescaling to each
                  object's true extents — the information 5 grasps pin
                  exactly through the ground-truth chart anchors (20
                  contact patches bracket the object).
  ratio           cd_prior / cd_scale_oracle: how much of the prior's error
                  is recoverable from touch-observable gross scale alone.

Gate (ROADMAP round-4 #1): ratio >= 2 before committing a multi-hour
campaign to the distribution.  Reference regime for calibration: ABC T_G
leaves random policies at 25.8% CD remaining, i.e. touch recovers ~4x
(BASELINE.md).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chamfer_np(a: np.ndarray, b: np.ndarray, chunk: int = 2048) -> float:
    """Symmetric mean-of-squared-NN-distance chamfer (reference
    ``utils.py:204-217`` semantics, numpy)."""
    total = 0.0
    for x, y in ((a, b), (b, a)):
        mins = np.empty(len(x), np.float64)
        y2 = (y * y).sum(1)
        for s in range(0, len(x), chunk):
            xc = x[s : s + chunk]
            d = (xc * xc).sum(1)[:, None] - 2.0 * xc @ y.T + y2[None]
            mins[s : s + chunk] = d.min(1)
        total += float(np.maximum(mins, 0.0).mean())
    return total


def extent(pts: np.ndarray) -> np.ndarray:
    return pts.max(0) - pts.min(0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-objects", type=int, default=180)
    ap.add_argument("--train-frac", type=float, default=0.65)
    ap.add_argument("--seed", type=int, default=12)
    ap.add_argument("--versions", default="3,4")
    ap.add_argument("--num-points", type=int, default=2500)
    ap.add_argument("--dim", type=int, default=96)
    ap.add_argument("--out", default=None, help="optional JSON output path")
    args = ap.parse_args()

    from active_3d_vision_and_touch_tpu.data.generation import extract_surface_points
    from active_3d_vision_and_touch_tpu.data.primitives import random_object

    report = {}
    for version in (int(v) for v in args.versions.split(",")):
        t0 = time.time()
        rng = np.random.default_rng(args.seed)
        clouds = []
        for i in range(args.num_objects):
            mesh = random_object(
                args.seed * 1_000_003 + i, version=version
            )
            clouds.append(
                extract_surface_points(
                    mesh.verts, mesh.faces, dim=args.dim,
                    num_points=args.num_points, rng=rng,
                ).astype(np.float64)
            )
        n_train = int(len(clouds) * args.train_frac)
        train, evals = clouds[:n_train], clouds[n_train:]

        # medoid of the train clouds (subsampled pairwise CD)
        sub = [c[rng.choice(len(c), 900, replace=False)] for c in train]
        pair = np.zeros((len(sub), len(sub)))
        for i in range(len(sub)):
            for j in range(i + 1, len(sub)):
                pair[i, j] = pair[j, i] = chamfer_np(sub[i], sub[j])
        medoid = train[int(pair.mean(1).argmin())]
        med_center = (medoid.max(0) + medoid.min(0)) / 2.0
        med_ext = extent(medoid)

        cd_prior, cd_scale = [], []
        for gt in evals:
            cd_prior.append(chamfer_np(medoid, gt))
            s = extent(gt) / med_ext
            c = (gt.max(0) + gt.min(0)) / 2.0
            fitted = (medoid - med_center) * s + c
            cd_scale.append(chamfer_np(fitted, gt))
        entry = {
            "cd_prior": float(np.mean(cd_prior)),
            "cd_scale_oracle": float(np.mean(cd_scale)),
            "ratio": float(np.mean(cd_prior) / np.mean(cd_scale)),
            "n_train": n_train,
            "n_eval": len(evals),
            "seconds": round(time.time() - t0, 1),
        }
        report[f"v{version}"] = entry
        print(f"v{version}: {json.dumps(entry)}", flush=True)

    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
