"""Format results_campaign/summary.json as the reference's results table.

Reference table (README.md:176-181 / images/Results.png): % of initial
Chamfer distance remaining after 5 touches, one row per setting, one
column per policy, mean ± std over trained-model seeds (BASELINE.md
reproduces the numbers).  Writes <out>/TABLE.md and prints it.
"""

import argparse
import json
import os

COLUMNS = [
    ("greedy", "Oracle"),
    ("random", "Random"),
    ("even", "Even"),
    ("mfba", "MFBA"),
    ("leba", "LEBA"),
    ("nearest_neighbor", "NN"),
    ("ddqn_m", "DDQN_m"),
    ("ddqn", "DDQN_l"),
    ("supervised", "Supervised"),
]

REFERENCE = {  # BASELINE.md (reference Results.png), for the side-by-side
    "t_p": {"Oracle": 19.35, "Random": 36.38, "Even": 33.25, "MFBA": 32.40,
            "LEBA": 29.85, "NN": 33.46, "DDQN_m": 32.41, "DDQN_l": 31.10,
            "Supervised": 31.21},
    "t_g": {"Oracle": 16.38, "Random": 25.83, "Even": 24.53, "MFBA": 23.46,
            "LEBA": 23.04, "NN": 24.34, "DDQN_m": 23.92, "DDQN_l": 23.84,
            "Supervised": 23.70},
    "v_t_p": {"Oracle": 78.95, "Random": 94.56, "Even": 93.95, "MFBA": 93.59,
              "LEBA": 92.36, "NN": 91.79, "DDQN_m": 93.75, "DDQN_l": 92.62,
              "Supervised": 93.12},
    "v_t_g": {"Oracle": 77.18, "Random": 90.65, "Even": 90.29, "MFBA": 89.39,
              "LEBA": 89.31, "NN": 88.53, "DDQN_m": 90.07, "DDQN_l": 89.32,
              "Supervised": 89.46},
}


def fmt_cell(cell) -> str:
    """mean±std (n=seeds) — every cell states its n (VERDICT r4 #7)."""
    if not cell:
        return "| — "
    val = cell.get("pct_cd_remaining")
    if val is None:
        return "| — "
    std = cell.get("pct_cd_std")
    n_seeds = len(cell.get("seeds", {}))
    if std is not None and n_seeds > 1:
        return f"| {val:.1f}±{std:.1f} (n={n_seeds}) "
    return f"| {val:.1f} (n={n_seeds or 1}) "


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results_campaign")
    args = ap.parse_args()

    summary = json.load(open(os.path.join(args.out, "summary.json")))
    lines = [
        "# Campaign results — % of initial CD remaining after 5 touches",
        "",
        "Lower is better.  `ours` = this framework on its procedural ABC"
        " stand-in (zero-egress environment); ± is std over policy seeds"
        " where more than one was trained (reference: over 5 trained"
        " models).  `ref` = the reference's published numbers on ABC"
        " (BASELINE.md) — distribution differs, so compare the *ordering"
        " and separation*, not absolute cells.",
        "",
        "| Setting | Src | " + " | ".join(label for _, label in COLUMNS) + " |",
        "|---|---|" + "---|" * len(COLUMNS),
    ]
    for key, block in sorted(summary.items()):
        if not key.startswith("policies_"):
            continue
        setting = key[len("policies_"):]
        row = [f"| {setting} | ours "]
        for pol, _ in COLUMNS:
            row.append(fmt_cell(block.get(pol)))
        lines.append("".join(row) + "|")
        ref = REFERENCE.get(setting)
        if ref:
            lines.append(
                f"| {setting} | ref "
                + "".join(f"| {ref[label]:.1f} " for _, label in COLUMNS)
                + "|"
            )
    have = {
        k[len("policies_"):].replace("_r4legacy", "").replace("_plane", "")
        for k in summary if k.startswith("policies_")
    }
    missing = [s for s in ("t_p", "t_g", "v_t_p", "v_t_g") if s not in have]
    if missing:
        lines += [
            "",
            "Settings with no rows yet (pending campaign stages): "
            + ", ".join(f"`{s}`" for s in missing),
        ]
    # evaluation protocol per setting: episodes per cell + seeds per policy
    # (reference: 1000 test objects x 5 deterministic draws, 5 models)
    proto = []
    for key, block in sorted(summary.items()):
        if not key.startswith("policies_"):
            continue
        eps = sorted({
            cell.get("episodes") for cell in block.values()
            if isinstance(cell, dict) and cell.get("episodes")
        })
        seeds = {
            pol: len(cell.get("seeds", {}))
            for pol, cell in block.items() if isinstance(cell, dict)
        }
        proto.append(
            f"- `{key[len('policies_'):]}`: {'/'.join(str(e) for e in eps)}"
            " test episodes per cell; seeds: "
            + ", ".join(f"{p}={n}" for p, n in sorted(seeds.items()))
        )
    if proto:
        lines += ["", "Protocol (episodes per cell, models per policy):"] + proto
    # per-setting provenance: which vision checkpoint / dataset incarnation /
    # split every row was scored against (rows accumulate across sessions)
    prov_lines = []
    for key, block in sorted(summary.items()):
        if not key.startswith("policies_"):
            continue
        provs = {
            json.dumps(cell["provenance"], sort_keys=True)
            for cell in block.values()
            if isinstance(cell, dict) and cell.get("provenance")
        }
        for p in sorted(provs):
            d = json.loads(p)
            gm = d.get("gen_meta") or {}
            prov_lines.append(
                f"- `{key[len('policies_'):]}`: vision `{d.get('vision_exp_id')}`"
                f" digest {d.get('vision_param_digest')}"
                + (f", auto digest {d.get('auto_param_digest')}"
                   if d.get("auto_param_digest") else "")
                + f"; data `{d.get('data_root')}` (seed {gm.get('seed')},"
                f" dist v{gm.get('dist_version')}, {gm.get('num_objects')} objects)"
                f"; test split {d.get('split_sizes', {}).get('test')} objects"
            )
        n_missing = sum(
            1 for cell in block.values()
            if isinstance(cell, dict) and not cell.get("provenance")
        )
        if n_missing:
            prov_lines.append(
                f"- `{key[len('policies_'):]}`: {n_missing} cell(s) predate"
                " provenance capture (pre-round-5 sessions)"
            )
    if prov_lines:
        lines += ["", "Provenance (checkpoint + dataset lineage per row):"] + prov_lines
    # learned-policy conclusion (VERDICT r4 ask #4): for every setting with
    # a random anchor, state whether each learned policy beats random and by
    # how many sigma (sigma = sqrt(std_r^2 + std_p^2) over policy seeds), and
    # attach the latent-informativeness probe when one was committed.
    LEARNED = ["nearest_neighbor", "ddqn", "ddqn_m", "supervised"]
    concl = []
    for key, block in sorted(summary.items()):
        if not key.startswith("policies_"):
            continue
        setting = key[len("policies_"):]
        rnd = block.get("random")
        if not isinstance(rnd, dict) or rnd.get("pct_cd_remaining") is None:
            continue
        r_val, r_std = rnd["pct_cd_remaining"], rnd.get("pct_cd_std") or 0.0
        parts = []
        for pol in LEARNED:
            cell = block.get(pol)
            if not isinstance(cell, dict) or cell.get("pct_cd_remaining") is None:
                continue
            p_val = cell["pct_cd_remaining"]
            p_std = cell.get("pct_cd_std") or 0.0
            margin = r_val - p_val
            sigma = (r_std ** 2 + p_std ** 2) ** 0.5
            z = abs(margin) / sigma if sigma > 0 else None
            sig = f"{z:.1f}σ" if z is not None else "n/a σ"
            if margin <= 0:
                verdict = "does not beat"
            elif z is not None and z < 2:
                verdict = "edges (within noise)"
            else:
                verdict = "beats"
            parts.append(
                f"{pol} {verdict} random by {margin:+.1f} pts ({sig},"
                f" n={len(cell.get('seeds', {}))})"
            )
        if not parts:
            continue
        diag_path = os.path.join(
            args.out, f"latent_diag_{setting.replace('_r4legacy', '')}.json")
        diag = ""
        if os.path.exists(diag_path):
            d = json.load(open(diag_path))
            diag = (
                f"  Latent probe: step-0 linear probe R²="
                f"{d.get('probe_r2_first_score'):.2f} for first-grasp value,"
                f" step displacement/spread="
                f"{d.get('displacement_over_spread'):.2f} — "
                + ("latents carry little linearly-decodable first-action"
                   " signal; the wins above come from learned non-linear"
                   " value structure." if (d.get("probe_r2_first_score") or 0)
                   < 0.1 else "latents are linearly informative.")
            )
        concl.append(f"- `{setting}`: " + "; ".join(parts) + "." + diag)
    if concl:
        lines += ["", "Learned-policy conclusion (vs the random anchor):"] + concl
    extras = []
    for key, block in sorted(summary.items()):
        if key.startswith("policies_") and block.get("supervised_max"):
            cell = block["supervised_max"]
            val = cell.get("pct_cd_remaining")
            if val is not None:
                std = cell.get("pct_cd_std") or 0.0
                extras.append(f"{key[len('policies_'):]} {val:.1f}±{std:.1f}")
    if extras:
        lines += [
            "",
            "`supervised_max` (sign-consistent argmax selection over the"
            " same trained value models — the reference selects argmin of a"
            " regressed improvement, supervised/train.py:125,195): "
            + ", ".join(extras),
        ]
    table = "\n".join(lines) + "\n"
    with open(os.path.join(args.out, "TABLE.md"), "w") as f:
        f.write(table)
    print(table)


if __name__ == "__main__":
    main()
