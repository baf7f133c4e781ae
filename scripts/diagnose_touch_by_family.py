"""Diagnostic: WHICH object families does touch help on?

Breaks the touch-value curve (diagnose_touch_value.py) down by procedural
family, recomputing each object's family from its generation seed
(campaign_generate.py: seed*1_000_003 + i; primitives.random_object draws
u once to pick the branch).  Hypothesis driving the round-3 dataset design:
eccentric singles are *inferable* from sparse touch (a few contacts reveal
orientation + extent), while multi-part compositions are not (part
placement stays unobserved), so families differ sharply in touch value.

Usage: python scripts/diagnose_touch_by_family.py --root data_campaign \
    --out results_campaign --exp-id campaign_t_g --gen-seed 7
"""

import argparse
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)


def family_of(seed: int, version: int = 3) -> str:
    """Replays random_object's branch draws (primitives.py) without meshing.
    version=2 is the round-2 mixture (data_campaign); u is the first draw
    in every version."""
    rng = np.random.default_rng(seed)
    u = rng.uniform()
    if version == 2:
        if u < 0.45:
            return "eccentric_single"
        if u < 0.80:
            return "composed"
        return "legacy_mix"
    if version >= 4:
        # Mirrors primitives.random_object version>=4 exactly (u is the
        # first rng draw there too; amp/width gains are drawn after u).
        if u < 0.35:
            return "lobed_blob"
        if u < 0.50:
            return "multi_blob"
        if u < 0.80:
            return "slab_assembly"
        if u < 0.90:
            return "eccentric_single"
        return "legacy_mix"
    if u < 0.55:
        return "lobed_blob"
    if u < 0.80:
        return "multi_blob"
    if u < 0.90:
        return "eccentric_single"
    return "legacy_mix"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data_campaign")
    ap.add_argument("--out", default="results_campaign")
    ap.add_argument("--exp-id", default="campaign_t_g")
    ap.add_argument("--gen-seed", type=int, default=7)
    ap.add_argument("--dist-version", type=int, default=3)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--number-points", type=int, default=10000)
    ap.add_argument("--touch-global", action=argparse.BooleanOptionalAction,
                    default=True, help="must match the trained checkpoint")
    ap.add_argument("--touch-plane", action=argparse.BooleanOptionalAction,
                    default=False, help="must match the trained checkpoint")
    ap.add_argument("--suffix", default="",
                    help="output suffix: touch_value_by_family<suffix>.json")
    ap.add_argument("--split", default="valid")
    args = ap.parse_args()

    from active_3d_vision_and_touch_tpu.core.config import VisionConfig
    from active_3d_vision_and_touch_tpu.data.datasets import Loader, VisionDataset
    from active_3d_vision_and_touch_tpu.parallel import replicate
    from active_3d_vision_and_touch_tpu.train.common import CheckpointManager
    from active_3d_vision_and_touch_tpu.train.vision import VisionEngine

    exp = os.path.join(args.out, "exp")
    vcfg = VisionConfig(
        use_img=False, use_touch=True, finger=False, batch_size=args.batch_size,
        touch_global=args.touch_global,
        touch_plane=args.touch_plane,
        number_points=args.number_points, experiments_root=exp, exp_type="vision",
        exp_id=args.exp_id, eval=True,
    )
    engine = VisionEngine(vcfg, log=False)
    engine.build()
    state = CheckpointManager(vcfg.checkpoint_dir).restore(engine.state, "best")
    assert state is not None
    engine.state = replicate(state, engine.mesh)

    per_grasps = {}
    for grasps in (0, 1, 5):
        ds = VisionDataset(
            args.root, split=args.split, use_img=False, use_touch=True,
            num_grasps=5, number_points=args.number_points, val_grasps=grasps,
            eval_mode=True,
        )
        loader = Loader(ds, args.batch_size, shuffle=False)
        _, per_object = engine.evaluate_detailed(iter(loader))
        per_grasps[grasps] = {o["name"]: o["cd"] for o in per_object}
        print(f"val_grasps={grasps}: mean CD="
              f"{np.mean(list(per_grasps[grasps].values())):.3f}", flush=True)

    fam_cds = defaultdict(lambda: defaultdict(list))
    for name, cd0 in per_grasps[0].items():
        obj_id = int(name.split("/")[-1]) if "/" in name else int(name)
        fam = family_of(args.gen_seed * 1_000_003 + obj_id, args.dist_version)
        for g, table in per_grasps.items():
            fam_cds[fam][g].append(table[name])

    report = {}
    for fam, by_g in sorted(fam_cds.items()):
        entry = {f"cd_{g}": round(float(np.mean(v)), 3) for g, v in sorted(by_g.items())}
        entry["n"] = len(by_g[0])
        entry["pct_remaining_5"] = round(100.0 * entry["cd_5"] / entry["cd_0"], 1)
        report[fam] = entry
        print(fam, entry, flush=True)
    with open(os.path.join(args.out, f"touch_value_by_family{args.suffix}.json"), "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
