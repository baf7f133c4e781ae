"""A/B the tile-selection cost knobs (_VOTE_STRIDE, _CAND_FACTOR) on TPU.

For each knob combination: times the pair NN sweep at bench shapes and
measures neighbor agreement + CD relative error against the exact kernel
on surface-like clouds (the same validation protocol as
scripts/check_cluster_agreement.py, synthetic fallback when no dataset is
given).  Prints one JSON line per combination.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    ),
)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)

from active_3d_vision_and_touch_tpu.ops import chamfer
from active_3d_vision_and_touch_tpu.ops import chamfer_cluster as cc


def surface_clouds(rng, b, n):
    """Lobed-sphere surface clouds (the v3/v4 shape class)."""
    out = np.zeros((b, n, 3), np.float32)
    for i in range(b):
        d = rng.normal(size=(n, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        amp = rng.uniform(0.05, 0.25)
        freq = rng.uniform(2, 6)
        r = 0.13 * (1 + amp * np.sin(freq * d[:, 0]) * np.cos(freq * d[:, 1]))
        out[i] = (d * r[:, None]).astype(np.float32)
    return out


def load_clouds(root, b, n, rng):
    from glob import glob

    files = sorted(glob(os.path.join(root, "point_cloud_info", "*.npy")))[: 2 * b]
    if not files:
        return None
    pts = []
    for f in files:
        p = np.load(f).astype(np.float32)
        pts.append(p[rng.choice(len(p), n, replace=len(p) < n)])
    return np.stack(pts[:b]), np.stack(pts[b : 2 * b])


def timed(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).sum()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).sum()
    return (time.perf_counter() - t0) / iters * 1000, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=None, help="dataset root for real clouds")
    ap.add_argument("--b", type=int, default=16)
    ap.add_argument("--n", type=int, default=30000)
    ap.add_argument("--combos", default="1:3,2:3,2:2,4:3,1:2")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    pair = load_clouds(args.root, args.b, args.n, rng) if args.root else None
    if pair is None:
        x = surface_clouds(rng, args.b, args.n)
        y = surface_clouds(rng, args.b, args.n)
    else:
        x, y = pair
    xd, yd = jnp.asarray(x), jnp.asarray(y)

    # exact reference neighbors (indices into y) + value
    d_ex, i_ex = chamfer._min_dists(xd, yd)
    i_ex = np.asarray(i_ex)
    cd_ex = np.asarray(jnp.mean(d_ex, axis=1))

    base = (cc._VOTE_STRIDE, cc._CAND_FACTOR)
    for combo in args.combos.split(","):
        vs, cf = (int(v) for v in combo.split(":"))
        cc._VOTE_STRIDE, cc._CAND_FACTOR = vs, cf

        fn = jax.jit(lambda a, b_: cc.min_dists_clustered(a, b_))
        ms, (d_cl, i_cl) = timed(fn, xd, yd)
        i_cl = np.asarray(i_cl)
        agree = float((i_cl == i_ex).mean())
        cd_cl = np.asarray(jnp.mean(d_cl, axis=1))
        rel = float(np.abs(cd_cl - cd_ex).max() / cd_ex.mean())

        pair_fn = jax.jit(
            lambda a, b_: cc.chamfer_distance_clustered(a, b_)
        )
        pair_ms, _ = timed(pair_fn, xd, yd)
        grad_fn = jax.jit(
            jax.grad(lambda a, b_: cc.chamfer_distance_clustered(a, b_).sum())
        )
        grad_ms, _ = timed(grad_fn, xd, yd)
        print(
            json.dumps(
                {
                    "vote_stride": vs,
                    "cand_factor": cf,
                    "one_dir_ms": round(ms, 2),
                    "pair_fwd_ms": round(pair_ms, 2),
                    "pair_grad_ms": round(grad_ms, 2),
                    "neighbor_agreement": round(agree, 4),
                    "cd_rel_err_max": round(rel, 5),
                }
            ),
            flush=True,
        )
    cc._VOTE_STRIDE, cc._CAND_FACTOR = base


if __name__ == "__main__":
    main()
