"""Hedged-prior gate: the true 0-grasp floor of a procedural distribution.

The medoid proxy (scripts/proxy_medoid.py) underestimates a trained model's
0-grasp ability: under symmetric Chamfer a model free to output ANY point
set hedges across the distribution and beats every single training shape
(v3 calibration: medoid 2.9e-3 vs trained 0-grasp 1.4e-3).  This script
computes that floor directly — Adam-optimizes a free point cloud against
ground-truth clouds (no model, no grasps) and evaluates it held-out:

    cd_hedged(dist) = min_P  E_obj[ CD(P, obj) ]

A distribution is touch-dominant only if cd_hedged is several times the
~1.2e-3 raw CD the 5-grasp reconstruction reaches (v3 campaign,
results_r3/summary.json: trained valid CD 10.87 at loss scale 9000).
Gate for v4 (ROADMAP round-4 #1): cd_hedged(v4) >= 2.5 x cd_hedged(v3).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def optimize_hedged(train, eval_, num_points=2000, steps=400, batch=8, seed=0):
    import jax
    import jax.numpy as jnp
    import optax

    train = jnp.asarray(np.stack(train))  # (N, M, 3)
    key = jax.random.PRNGKey(seed)
    # init from the marginal point distribution (points pooled across clouds)
    pool = np.stack(train).reshape(-1, 3)
    init = pool[
        np.random.default_rng(seed).choice(len(pool), num_points, replace=False)
    ]
    params = jnp.asarray(init)

    def cd(pred, gt):  # symmetric mean squared NN distance
        d = (
            (pred * pred).sum(-1)[:, None]
            - 2.0 * pred @ gt.T
            + (gt * gt).sum(-1)[None]
        )
        return jnp.maximum(d.min(0), 0.0).mean() + jnp.maximum(d.min(1), 0.0).mean()

    def loss_fn(p, clouds):
        return jax.vmap(lambda g: cd(p, g))(clouds).mean()

    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, k):
        idx = jax.random.choice(k, train.shape[0], (batch,), replace=False)
        l, g = jax.value_and_grad(loss_fn)(p, train[idx])
        updates, s = opt.update(g, s)
        return optax.apply_updates(p, updates), s, l

    for i in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, l = step(params, opt_state, sub)

    evals = jnp.asarray(np.stack(eval_))
    eval_cd = jax.jit(loss_fn)(params, evals)
    return float(eval_cd), np.asarray(params)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-objects", type=int, default=180)
    ap.add_argument("--train-frac", type=float, default=0.65)
    ap.add_argument("--seed", type=int, default=12)
    ap.add_argument("--versions", default="3,4")
    ap.add_argument("--num-points", type=int, default=2500)
    ap.add_argument("--dim", type=int, default=96)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from active_3d_vision_and_touch_tpu.data.generation import extract_surface_points
    from active_3d_vision_and_touch_tpu.data.primitives import random_object

    report = {}
    for version in (int(v) for v in args.versions.split(",")):
        t0 = time.time()
        rng = np.random.default_rng(args.seed)
        clouds = []
        for i in range(args.num_objects):
            mesh = random_object(args.seed * 1_000_003 + i, version=version)
            clouds.append(
                extract_surface_points(
                    mesh.verts, mesh.faces, dim=args.dim,
                    num_points=args.num_points, rng=rng,
                ).astype(np.float32)
            )
        n_train = int(len(clouds) * args.train_frac)
        cd_hedged, _ = optimize_hedged(
            clouds[:n_train], clouds[n_train:], steps=args.steps, seed=args.seed
        )
        entry = {
            "cd_hedged": cd_hedged,
            "cd_hedged_x9000": round(cd_hedged * 9000, 2),
            "n_train": n_train,
            "n_eval": len(clouds) - n_train,
            "seconds": round(time.time() - t0, 1),
        }
        report[f"v{version}"] = entry
        print(f"v{version}: {json.dumps(entry)}", flush=True)

    if len(report) > 1 and "v3" in report and "v4" in report:
        report["v4_over_v3"] = report["v4"]["cd_hedged"] / report["v3"]["cd_hedged"]
        print(f"v4/v3 hedged ratio: {report['v4_over_v3']:.2f}", flush=True)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
