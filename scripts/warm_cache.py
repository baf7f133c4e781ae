"""Pre-compile the campaign's jit programs on synthetic batches.

Training stages each pay an 8-10 min first-compile on the real chip; the
persistent compilation cache (.jax_cache) makes that a one-time cost, so
this script front-loads every (engine, shape) pair the campaign will hit
while the CPU is busy generating the dataset and the TPU is idle.
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


def warm(label, engine, batch):
    t0 = time.time()
    key = jax.random.PRNGKey(0)
    state, loss = engine._jit_train(engine.state, batch, key)
    jax.block_until_ready(loss)
    engine.state = state
    t1 = time.time()
    loss = engine._jit_eval(engine.state, batch, key)
    jax.block_until_ready(loss)
    print(f"{label}: train {t1 - t0:.1f}s, eval {time.time() - t1:.1f}s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--number-points", type=int, default=10000)
    ap.add_argument("--settings", default="t_g")
    args = ap.parse_args()

    rng = np.random.default_rng(0)

    from active_3d_vision_and_touch_tpu.cli import SETTINGS
    from active_3d_vision_and_touch_tpu.core.config import (
        AutoencoderConfig, TouchConfig, VisionConfig,
    )
    from active_3d_vision_and_touch_tpu.train.autoencoder import AutoencoderEngine
    from active_3d_vision_and_touch_tpu.train.touch import TouchEngine
    from active_3d_vision_and_touch_tpu.train.vision import VisionEngine

    # touch stage: bs 64, 2000-point GT per touch
    tcfg = TouchConfig(batch_size=64, num_samples=2000, eval=True)
    touch = TouchEngine(tcfg, log=False)
    touch.build()
    tb = {
        "sim_touch": rng.uniform(size=(64, 121, 121, 3)).astype(np.float32),
        "samples": rng.normal(size=(64, 2000, 3)).astype(np.float32) * 0.05,
        "ref_pos": rng.normal(size=(64, 3)).astype(np.float32),
        "ref_rot": np.tile(np.eye(3, dtype=np.float32), (64, 1, 1)),
    }
    warm("touch bs64", touch, tb)

    for name in args.settings.split(","):
        s = SETTINGS[name]
        vcfg = VisionConfig(
            use_img=s["use_img"], use_touch=True, finger=s["finger"],
            batch_size=16, number_points=args.number_points, eval=True,
        )
        vis = VisionEngine(vcfg, log=False)
        vis.build()
        vb = {
            "gt_points": rng.normal(size=(16, args.number_points, 3)).astype(np.float32) * 0.1,
        }
        if s["use_img"]:
            vb["img"] = rng.uniform(size=(16, 256, 256, 3)).astype(np.float32)
        shape = (16, 5, 25, 4) if s["finger"] else (16, 5, 4, 25, 4)
        vb["touch_charts"] = rng.normal(size=shape).astype(np.float32) * 0.05
        warm(f"vision {name} bs16 n{args.number_points}", vis, vb)

        acfg = AutoencoderConfig(
            use_img=s["use_img"], use_touch=True, finger=s["finger"],
            batch_size=16, number_points=args.number_points,
            encoding_size=200, eval=True,
        )
        auto = AutoencoderEngine(acfg, vision_engine=vis, vision_state=vis.state, log=False)
        auto.build()
        warm(f"auto {name} bs16", auto, vb)


if __name__ == "__main__":
    main()
