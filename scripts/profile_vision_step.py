"""Profile the campaign vision train step at its real shapes.

Times (a) the jit'd train_step on-device for loss_nn in {clustered, exact,
xla}, (b) the host data-loader, on the campaign config (bs 16, 10k points,
t_g).  Decides whether the 4-setting round-3 campaign should train with
the clustered or the exact NN at 10k points.

Usage: python scripts/profile_vision_step.py --root data_campaign
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
    ap.add_argument("--root", default="data_campaign")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--number-points", type=int, default=10000)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    import jax

    from active_3d_vision_and_touch_tpu.core.config import VisionConfig
    from active_3d_vision_and_touch_tpu.data.datasets import Loader, VisionDataset
    from active_3d_vision_and_touch_tpu.train.vision import VisionEngine

    ds = VisionDataset(
        args.root, split="recon_train", use_img=False, use_touch=True,
        num_grasps=5, number_points=args.number_points,
    )
    loader = Loader(ds, args.batch_size, shuffle=True)

    # host loader timing (threaded prefetch, single core)
    t0 = time.time()
    batches = []
    for i, b in enumerate(loader):
        batches.append(b)
        if i >= args.steps:
            break
    host_s = (time.time() - t0) / len(batches)
    print(f"host loader: {host_s*1000:.0f} ms/batch", flush=True)

    batch0 = {k: v for k, v in batches[0].items() if k != "names"}
    for nn in ("clustered", "exact", "xla"):
        cfg = VisionConfig(
            use_img=False, use_touch=True, finger=False,
            batch_size=args.batch_size, number_points=args.number_points,
            experiments_root="/tmp/profile_exp", exp_id=f"prof_{nn}",
            loss_nn=nn,
        )
        eng = VisionEngine(cfg, log=False)
        eng.build()
        step = jax.jit(eng.train_step)
        state = eng.state
        key = jax.random.PRNGKey(0)
        state, loss = step(state, batch0, key)  # compile
        jax.block_until_ready(loss)
        t0 = time.time()
        for i in range(args.steps):
            b = {k: v for k, v in batches[i % len(batches)].items() if k != "names"}
            state, loss = step(state, b, key)
        jax.block_until_ready(loss)
        dt = (time.time() - t0) / args.steps
        print(f"loss_nn={nn}: {dt*1000:.0f} ms/step ({1/dt:.2f} steps/s)",
              flush=True)


if __name__ == "__main__":
    main()
