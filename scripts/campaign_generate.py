"""Resumable large-scale dataset generation for the parity campaign.

Same pipeline as data.generation.generate_dataset but skips objects whose
simulation dumps already exist, so an interrupted multi-hour run continues
where it left off.  Split is (re)written at the end of every chunk so
training can start on a prefix while generation continues.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data_campaign")
    ap.add_argument("--num-objects", type=int, default=2500)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--num-actions", type=int, default=50)
    ap.add_argument("--chunk", type=int, default=50)
    ap.add_argument("--dist-version", type=int, default=3)
    ap.add_argument("--no-split", action="store_true",
                    help="skip data_split.npy rewrites: grow a dataset "
                    "behind a RUNNING campaign without changing what its "
                    "loaders see; write the split later with a final "
                    "plain run or data.generation.make_data_split")
    args = ap.parse_args()

    from active_3d_vision_and_touch_tpu.data.generation import (
        make_data_split,
        object_dirs,
        save_object_info,
        save_point_info,
        save_simulation,
    )

    dirs = object_dirs(args.root)
    t0 = time.time()
    # provenance: a recycle must never orphan a results table again — the
    # campaign driver asserts its GEN_SEED against this file before training
    import json

    os.makedirs(args.root, exist_ok=True)
    meta_path = os.path.join(args.root, "gen_meta.json")
    meta = {
        "seed": args.seed,
        "dist_version": args.dist_version,
        "num_objects": args.num_objects,
        "num_actions": args.num_actions,
    }
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            old = json.load(f)
        if old.get("seed") != meta["seed"] or old.get("dist_version") != meta["dist_version"]:
            raise SystemExit(
                f"gen_meta.json mismatch: {old} on disk vs requested {meta} — "
                "refusing to mix distributions in one dataset root"
            )
    with open(meta_path, "w") as f:
        json.dump(meta, f, indent=2)
    names = save_object_info(
        args.root, args.num_objects, args.seed, version=args.dist_version
    )
    save_point_info(args.root)
    print(f"objects+clouds ready ({time.time() - t0:.0f}s)", flush=True)

    def sim_done(name: str) -> bool:
        # the last action's directory is written last; its presence marks
        # the object's sim dump complete
        return os.path.isdir(
            os.path.join(dirs["grasp_info"], name, str(args.num_actions - 1))
        )

    todo = [n for n in names if not sim_done(n)]
    print(f"{len(todo)}/{len(names)} objects need simulation", flush=True)
    for start in range(0, len(todo), args.chunk):
        chunk = todo[start : start + args.chunk]
        t1 = time.time()
        save_simulation(args.root, num_actions=args.num_actions, names=chunk)
        if not args.no_split:
            make_data_split(args.root)
        done = len(names) - len(todo) + start + len(chunk)
        rate = (time.time() - t1) / len(chunk)
        print(
            f"simulated {done}/{len(names)} ({rate:.1f}s/obj, "
            f"{(len(todo) - start - len(chunk)) * rate / 60:.0f} min left)",
            flush=True,
        )
    if not args.no_split:
        make_data_split(args.root)
    print(f"done in {(time.time() - t0) / 60:.1f} min", flush=True)


if __name__ == "__main__":
    main()
