"""Pre-compile the policies-stage jit programs on a tiny synthetic dataset.

Mirrors stage_policies' PolicyConfig exactly (env_batch_size, 10k points,
latent) so the overnight campaign hits a warm compilation cache for the
env reconstruction/scoring pipeline and the DDQN update.
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

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--setting", default="t_g")
    ap.add_argument("--env-batch-size", type=int, default=8)
    ap.add_argument("--number-points", type=int, default=10000)
    args = ap.parse_args()

    from active_3d_vision_and_touch_tpu.active.env import ActiveTouchEnv
    from active_3d_vision_and_touch_tpu.cli import SETTINGS
    from active_3d_vision_and_touch_tpu.core.config import (
        AutoencoderConfig, PolicyConfig, TouchConfig, VisionConfig,
    )
    from active_3d_vision_and_touch_tpu.data.generation import (
        object_dirs, save_object_info, save_point_info,
    )
    from active_3d_vision_and_touch_tpu.models.autoencoder import MeshAutoEncoder
    from active_3d_vision_and_touch_tpu.train.touch import TouchEngine
    from active_3d_vision_and_touch_tpu.train.vision import VisionEngine

    s = SETTINGS[args.setting]
    use_img, finger = s["use_img"], s["finger"]
    b = args.env_batch_size

    root = "/tmp/warm_policies_data"
    names = save_object_info(root, b, seed=99)
    save_point_info(root, dim=64, num_points=args.number_points)
    dirs = object_dirs(root)

    tcfg = TouchConfig(eval=True)
    touch = TouchEngine(tcfg, log=False)
    tstate = touch.init_state(jax.random.PRNGKey(0))
    vcfg = VisionConfig(
        use_img=use_img, use_touch=True, finger=finger, batch_size=16,
        number_points=args.number_points, eval=True,
    )
    vis = VisionEngine(vcfg, log=False)
    vstate = vis.init_state(jax.random.PRNGKey(1))
    acfg = AutoencoderConfig(encoding_size=200, eval=True)
    auto_model = MeshAutoEncoder(
        encoding_size=acfg.encoding_size, num_gcn_layers=acfg.num_gcn_layers,
        hidden_gcn_size=acfg.hidden_gcn_size, cut=acfg.cut,
        grid_size=acfg.grid_size,
    )
    # latent path: init autoencoder params against the vision chart shapes
    astate = None
    try:
        from active_3d_vision_and_touch_tpu.train.autoencoder import AutoencoderEngine

        aeng = AutoencoderEngine(
            AutoencoderConfig(
                use_img=use_img, use_touch=True, finger=finger, batch_size=16,
                number_points=args.number_points, encoding_size=200, eval=True,
            ),
            vision_engine=vis, vision_state=vstate, log=False,
        )
        astate = {"params": aeng.init_state(jax.random.PRNGKey(2))["params"]}
    except Exception as e:  # latent path is optional in stage_policies too
        print("no latent warm:", e, flush=True)

    pcfg = PolicyConfig(
        use_img=use_img, use_touch=True, finger=finger,
        number_points=args.number_points, env_batch_size=b,
        budget=5, num_grasps=5, greedy_checks=10,
        use_latent=astate is not None, eval=True,
        hidden_dim=200, layers=5, lr=1e-3, burn_in=20,
        train_batch_size=16, mem_capacity=300, epsilon_decay=0.9999,
    )
    env = ActiveTouchEnv(pcfg, tstate, vstate, astate, auto_model)

    rng = np.random.default_rng(0)
    batch = {
        "names": [os.path.join(dirs["object_info"], n) for n in names],
        "gt_points": np.stack([
            np.load(os.path.join(dirs["point_cloud_info"], n + ".npy"))
            for n in names
        ]).astype(np.float32),
    }
    if use_img:
        batch["img"] = rng.uniform(size=(b, 256, 256, 3)).astype(np.float32)

    t0 = time.time()
    obs = env.reset(batch)
    print(f"env.reset (recon compile): {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    env.step(np.arange(b) % pcfg.num_actions)
    print(f"env.step: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    env.best_step(greedy_checks=2)
    print(f"env.best_step: {time.time()-t0:.1f}s", flush=True)

    if astate is not None:
        from active_3d_vision_and_touch_tpu.active.policies.ddqn import DDQNEngine

        import jax.numpy as jnp

        eng = DDQNEngine(pcfg, data_root=root, env=env)
        t0 = time.time()
        tb = pcfg.train_batch_size
        batch = {
            "rewards": rng.normal(size=tb).astype(np.float32),
            "first_score": np.ones(tb, np.float32),
            "score": np.ones(tb, np.float32),
            "actions": rng.integers(0, pcfg.num_actions, tb).astype(np.int32),
            "mask": np.zeros((tb, pcfg.num_actions), np.float32),
            "mask_n": np.zeros((tb, pcfg.num_actions), np.float32),
            "latent": rng.normal(size=(tb, 200)).astype(np.float32),
            "latent_n": rng.normal(size=(tb, 200)).astype(np.float32),
            "first_latent": rng.normal(size=(tb, 200)).astype(np.float32),
        }
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        eng.params, eng.opt_state, loss = eng._update(
            eng.params, eng.target_params, eng.opt_state, batch
        )
        jax.block_until_ready(loss)
        print(f"ddqn update warm: {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
