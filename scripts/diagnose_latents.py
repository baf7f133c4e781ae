"""Diagnostic: are the autoencoder latents informative enough for the
latent-conditioned policies (NN, supervised, DDQN_l)?

Round-3 finding (ROADMAP): on v3 the step-0 latent was nearly
object-independent — the prior reconstruction collapsed to a hedged mean
shape, so latent-NN retrieval and latent value regression had nothing to
condition on, and NN/supervised could not beat random.  This script
quantifies that on the current dataset + checkpoints:

  * between-object spread of step-0 latents vs the mean step displacement
    (||z_1 - z_0||) — if steps move latents further than objects differ,
    the latent tracks touch; if objects barely differ at step 0 the NN
    bank's step-0 keys are uninformative;
  * step-0 latent -> first_score ridge probe R^2 (can the latent predict
    how bad the prior is for THIS object?);
  * step-0 retrieval: leave-one-out 1-NN on latents must map an episode
    to itself across two independent resets (deterministic here, so this
    checks padding/noise paths) — reported as a sanity flag only.

Usage: python scripts/diagnose_latents.py --root data_r4 --out results_r4 \
           --setting t_g
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
    ap.add_argument("--setting", default="t_g")
    ap.add_argument("--env-batch-size", type=int, default=8)
    ap.add_argument("--number-points", type=int, default=10000)
    ap.add_argument("--max-batches", type=int, default=12)
    args = ap.parse_args()

    import jax
    import numpy as np

    from active_3d_vision_and_touch_tpu.active.env import ActiveTouchEnv
    from active_3d_vision_and_touch_tpu.cli import SETTINGS
    from active_3d_vision_and_touch_tpu.core.config import (
        AutoencoderConfig, PolicyConfig, TouchConfig, VisionConfig, load_config,
    )
    from active_3d_vision_and_touch_tpu.data.datasets import ActiveDataset, Loader
    from active_3d_vision_and_touch_tpu.models.autoencoder import MeshAutoEncoder
    from active_3d_vision_and_touch_tpu.train.common import CheckpointManager
    from active_3d_vision_and_touch_tpu.train.touch import TouchEngine
    from active_3d_vision_and_touch_tpu.train.vision import VisionEngine

    exp = os.path.join(args.out, "exp")
    setting = SETTINGS[args.setting]
    use_img, finger = setting["use_img"], setting["finger"]

    tcfg = TouchConfig(
        experiments_root=exp, exp_type="touch", exp_id="campaign", eval=True
    )
    touch = TouchEngine(tcfg, log=False)
    tstate = CheckpointManager(tcfg.checkpoint_dir).restore(
        touch.init_state(jax.random.PRNGKey(0)), "best"
    )
    # model-shape flags must match the trained checkpoint — read them back
    # from the checkpoint's own config.json instead of re-deriving
    vsaved = load_config(
        os.path.join(exp, "checkpoint", "vision", f"campaign_{args.setting}"),
        VisionConfig,
    )
    vcfg = VisionConfig(
        use_img=use_img, use_touch=True, finger=finger, batch_size=16,
        touch_global=vsaved.touch_global,
        num_gcn_layers=vsaved.num_gcn_layers,
        hidden_gcn_size=vsaved.hidden_gcn_size, cut=vsaved.cut,
        number_points=args.number_points, experiments_root=exp,
        exp_type="vision", exp_id=f"campaign_{args.setting}", eval=True,
    )
    vision = VisionEngine(vcfg, log=False)
    vstate = CheckpointManager(vcfg.checkpoint_dir).restore(
        vision.init_state(jax.random.PRNGKey(1)), "best"
    )
    acfg = AutoencoderConfig(
        experiments_root=exp, exp_type="auto",
        exp_id=f"campaign_{args.setting}", eval=True, encoding_size=200,
    )
    raw = CheckpointManager(acfg.checkpoint_dir).restore_raw("best")
    assert tstate is not None and vstate is not None and raw is not None
    saved = load_config(acfg.checkpoint_dir, AutoencoderConfig)
    auto_model = MeshAutoEncoder(
        encoding_size=saved.encoding_size, num_gcn_layers=saved.num_gcn_layers,
        hidden_gcn_size=saved.hidden_gcn_size, cut=saved.cut,
        grid_size=saved.grid_size,
    )
    pcfg = PolicyConfig(
        use_img=use_img, use_touch=True, finger=finger,
        touch_global=vsaved.touch_global,
        num_gcn_layers=vsaved.num_gcn_layers,
        hidden_gcn_size=vsaved.hidden_gcn_size, cut=vsaved.cut,
        number_points=args.number_points, env_batch_size=args.env_batch_size,
        budget=5, num_grasps=5, use_latent=True, experiments_root=exp,
        eval=True,
    )
    env = ActiveTouchEnv(pcfg, tstate, vstate, {"params": raw["params"]},
                         auto_model, chart_cache_root=args.root)

    ds = ActiveDataset(args.root, split="valid", use_img=use_img,
                       number_points=args.number_points,
                       env_batch_size=args.env_batch_size)
    loader = Loader(ds, args.env_batch_size, shuffle=False, drop_last=True)

    z0, z1, first_scores = [], [], []
    rng = np.random.default_rng(0)
    for v, batch in enumerate(loader):
        if v >= args.max_batches:
            break
        obs = env.reset(batch)
        z0.append(np.asarray(obs["latent"]))
        first_scores.append(np.asarray(obs["first_score"]))
        acts = rng.integers(pcfg.num_actions, size=args.env_batch_size)
        obs, _, _ = env.step(acts)
        z1.append(np.asarray(obs["latent"]))
    z0 = np.concatenate(z0)  # (N, 200)
    z1 = np.concatenate(z1)
    first = np.concatenate(first_scores)
    n = len(z0)

    centered = z0 - z0.mean(0, keepdims=True)
    spread = float(np.sqrt((centered ** 2).sum(1).mean()))
    step_disp = float(np.sqrt(((z1 - z0) ** 2).sum(1).mean()))

    # ridge probe: step-0 latent -> first_score, leave-out-last-quarter
    k = max(1, n // 4)
    Xtr, ytr, Xte, yte = centered[:-k], first[:-k], centered[-k:], first[-k:]
    ytr_c = ytr - ytr.mean()
    lam = 1e-2 * np.trace(Xtr.T @ Xtr) / Xtr.shape[1]
    w = np.linalg.solve(Xtr.T @ Xtr + lam * np.eye(Xtr.shape[1]), Xtr.T @ ytr_c)
    pred = Xte @ w + ytr.mean()
    ss_res = float(((yte - pred) ** 2).sum())
    ss_tot = float(((yte - yte.mean()) ** 2).sum())
    r2 = 1.0 - ss_res / max(ss_tot, 1e-12)

    out = {
        "setting": args.setting,
        "episodes": n,
        "latent_spread_step0": round(spread, 5),
        "latent_step_displacement": round(step_disp, 5),
        "displacement_over_spread": round(step_disp / max(spread, 1e-12), 4),
        "probe_r2_first_score": round(r2, 4),
        "first_score_mean": round(float(first.mean()), 4),
        "first_score_std": round(float(first.std()), 4),
    }
    path = os.path.join(args.out, f"latent_diag_{args.setting}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
