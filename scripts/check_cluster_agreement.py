"""Validate the clustered-NN training loss on a generated dataset.

The Morton-pruned nearest-neighbor search (`ops/chamfer_cluster.py`) is the
training-loss accelerator; its exactness is empirical on a given point-cloud
distribution (the pruning can miss the true neighbor when a query's nearest
chunk loses the tile-selection vote).  This script measures, on REAL clouds
from a dataset root, at the production kernel parameters (S=128 chunks,
T=24 chunks/tile, 30k points):

  * neighbor agreement: fraction of queries whose found squared distance
    matches the exact brute-force minimum (rtol 1e-5),
  * Chamfer relative error of the clustered value vs the exact value.

Run at campaign start on the campaign's own dataset (VERDICT round-2 #10);
writes ``<out>/cluster_agreement.json``.

Reference context: the reference's PyTorch3D chamfer is exact brute force
(reference utils.py:204-217); ours trades a bounded, *measured* approximation
for a ~2.4x kernel speedup at 30k^2.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    ),
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data_r3", help="dataset root")
    ap.add_argument("--out", default="results_r3")
    ap.add_argument("--pairs", type=int, default=8, help="cloud pairs to test")
    ap.add_argument("--points", type=int, default=30000)
    ap.add_argument("--chunk-size", type=int, default=128)
    ap.add_argument("--chunks-per-tile", type=int, default=24)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from active_3d_vision_and_touch_tpu.ops.chamfer import _min_dists_xla
    from active_3d_vision_and_touch_tpu.ops.chamfer_cluster import (
        chamfer_distance_clustered,
        min_dists_clustered,
    )

    files = sorted(glob.glob(os.path.join(args.root, "point_cloud_info", "*.npy")))
    if len(files) < 2:
        raise SystemExit(f"no point clouds under {args.root}")
    rng = np.random.default_rng(args.seed)
    picks = rng.choice(len(files), size=min(2 * args.pairs, len(files)), replace=False)

    n = args.points
    match_fracs, cd_rel_errs = [], []
    for k in range(args.pairs):
        a = np.load(files[picks[2 * k % len(picks)]])[:n]
        b = np.load(files[picks[(2 * k + 1) % len(picks)]])[:n]
        x = jnp.asarray(a, jnp.float32)[None]
        y = jnp.asarray(b, jnp.float32)[None]
        d_ref, _ = _min_dists_xla(x, y)
        d_cl, _ = min_dists_clustered(x, y, args.chunk_size, args.chunks_per_tile)
        d_ref = np.asarray(d_ref)
        d_cl = np.asarray(d_cl)
        assert (d_cl >= d_ref - 1e-9).all(), "pruned NN beat the exact minimum"
        match_fracs.append(
            float(np.isclose(d_cl, d_ref, rtol=1e-5, atol=1e-10).mean())
        )
        cd_ref = float(np.asarray(jnp.mean(d_ref)))
        cd_cl = float(
            np.asarray(
                chamfer_distance_clustered(x, y, args.chunk_size, args.chunks_per_tile)
            )[0]
        )
        d_yx, _ = _min_dists_xla(y, x)
        cd_sym_ref = cd_ref + float(np.asarray(jnp.mean(d_yx)))
        cd_rel_errs.append(abs(cd_cl - cd_sym_ref) / max(cd_sym_ref, 1e-12))
        print(
            f"pair {k}: agreement {match_fracs[-1]:.5f}  "
            f"CD rel err {cd_rel_errs[-1]:.2e}",
            flush=True,
        )

    report = {
        "root": args.root,
        "pairs": args.pairs,
        "points": n,
        "chunk_size": args.chunk_size,
        "chunks_per_tile": args.chunks_per_tile,
        "neighbor_agreement_mean": float(np.mean(match_fracs)),
        "neighbor_agreement_min": float(np.min(match_fracs)),
        "cd_rel_err_mean": float(np.mean(cd_rel_errs)),
        "cd_rel_err_max": float(np.max(cd_rel_errs)),
    }
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "cluster_agreement.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    # Gate on what matters for a TRAINING loss: the CD bias (found-neighbor
    # gradients are exact regardless).  Measured on data_r3 (v3 lobed
    # distribution) at 30k: T=24 → 90.9% agreement / 0.64% mean CD err;
    # T=32 → 95.3% / 0.47%; T=40 → 97.0% / 0.29%.  The r3 campaign trains
    # with loss_nn="exact" at 10k points, so this is a recorded metric for
    # the 30k clustered path, not a blocker unless the bias is gross.
    if report["cd_rel_err_max"] > 0.03:
        raise SystemExit("clustered-NN CD bias above 3% on this dataset")
    if report["neighbor_agreement_mean"] < 0.95:
        print(
            "WARNING: neighbor agreement below 0.95 — prefer loss_nn='exact' "
            "or a larger --chunks-per-tile when training at this scale"
        )


if __name__ == "__main__":
    main()
