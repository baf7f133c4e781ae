#!/bin/bash
# Round-5 campaign driver — the VERDICT r4 execution plan, ordered by
# value-per-minute under a ~11 h clock:
#
#   A. touch + charts (shared; ~5 min)
#   B. v_t_g — vision/auto/latent-diag + 8 policy columns (supervised
#      deferred to phase E): the never-delivered image-conditioned rows.
#   C. t_g — RETRAINED vision/auto (the r4 checkpoints died in a machine
#      recycle; the old policies_t_g rows are preserved under
#      policies_t_g_r4legacy and every column re-runs against the fresh
#      checkpoint with provenance recorded per row).
#   D. t_g touch_plane A/B (--tag plane): same data, same seeds, plane
#      pathway ON; commits touch_value_plane.json + by-family split.
#      (VERDICT r4 missing #2 / weak #5.)
#   E. supervised: t_g 3 seeds + supervised_max, v_t_g 2 seeds (the most
#      expensive, statistically weakest column runs after everything
#      cheaper is banked).
#   F. t_p then v_t_p — full columns, supervised 1 seed.
#   G. table + finalize (growth re-score rides scripts/finalize_round.sh).
#
# Every stage is checkpoint/summary-resumable; re-running continues.  The
# driver git-commits $OUT after each stage so a machine recycle can never
# orphan more than one stage's results (the r3/r4 failure mode).
#
# Usage: [ROOT=data_r4] [OUT=results_r4] bash scripts/campaign_run8.sh
set -uo pipefail
cd "$(dirname "$0")/.."

ROOT=${ROOT:-data_r4}
OUT=${OUT:-results_r4}
GEN_SEED=${GEN_SEED:-13}
LOGS="$OUT/logs"
mkdir -p "$LOGS"

python - "$ROOT" "$GEN_SEED" <<'EOF' || exit 1
import json, sys
meta = json.load(open(f"{sys.argv[1]}/gen_meta.json"))
want = int(sys.argv[2])
assert meta["seed"] == want and meta["dist_version"] == 4, \
    f"dataset provenance mismatch: {meta} vs GEN_SEED={want}, dist_version=4"
EOF

# preserve the r4-lineage t_g rows (scored against a checkpoint lost to a
# recycle) under a legacy key, exactly once
python - "$OUT" <<'EOF'
import json, os, sys
path = os.path.join(sys.argv[1], "summary.json")
if os.path.exists(path):
    s = json.load(open(path))
    if "policies_t_g" in s and "policies_t_g_r4legacy" not in s:
        s["policies_t_g_r4legacy"] = s.pop("policies_t_g")
        json.dump(s, open(path, "w"), indent=2)
        print("moved policies_t_g -> policies_t_g_r4legacy")
EOF

bank() {  # commit the results dir after a stage (recycle insurance)
  git add -A "$OUT" 2>/dev/null
  git commit -q -m "campaign r5: $1" 2>/dev/null || true
}

stage() {
  local name=$1; shift
  echo "=== stage $name: $(date -u +%H:%M:%S) ===" | tee -a "$LOGS/driver.log"
  python scripts/campaign_train.py --root "$ROOT" --out "$OUT" "$@" \
    >> "$LOGS/$name.log" 2>&1
  local rc=$?
  echo "=== stage $name rc=$rc: $(date -u +%H:%M:%S) ===" | tee -a "$LOGS/driver.log"
  bank "$name"
  return $rc
}

pol() {  # pol <setting> <policy-subset> [extra args...]
  local S=$1 P=$2; shift 2
  stage "policies_${S}_${P//,/-}" --stage policies --setting "$S" \
    --policies "$P" --greedy-checks 50 --seeds 0,1,2 --baseline-seeds 0,1,2 \
    --eval-batches 25 --ddqn-epochs 3 --policy-train-batches 40 \
    --seq-train-fraction 0.4 --epsilon-decay 0.994 "$@"
}

vis_auto_diag() {  # vis_auto_diag <setting> <vision-epochs>
  local S=$1 VE=$2
  stage "vision_$S" --stage vision --setting "$S" \
    --vision-epochs "$VE" --patience 10 || return 1
  stage "auto_$S" --stage auto --setting "$S" --auto-epochs 16 || return 1
  if [ ! -f "$OUT/latent_diag_$S.json" ]; then
    python scripts/diagnose_latents.py --root "$ROOT" --out "$OUT" \
      --setting "$S" >> "$LOGS/diagnose.log" 2>&1 || true
    bank "latent diag $S"
  fi
}

# ---- A: shared stages
stage touch --stage touch --touch-epochs 10 \
  --touch-limit-train 400 --touch-limit-valid 80 --skip-first-eval || exit 1
stage charts --stage charts || exit 1

# ---- B: v_t_g (cheapest policies first; supervised deferred to E)
vis_auto_diag v_t_g 45 || exit 1
for P in random,even greedy ddqn ddqn_m nearest_neighbor mfba leba; do
  pol v_t_g "$P" || exit 1
done
python scripts/make_results_table.py --out "$OUT" >> "$LOGS/driver.log" 2>&1 || true
bank "v_t_g columns (supervised pending)"

# ---- C: t_g retrain + full columns
vis_auto_diag t_g 60 || exit 1
python scripts/diagnose_touch_value.py --root "$ROOT" --out "$OUT" \
  --exp-id campaign_t_g >> "$LOGS/diagnose.log" 2>&1 || true
python scripts/diagnose_touch_by_family.py --root "$ROOT" --out "$OUT" \
  --exp-id campaign_t_g --gen-seed "$GEN_SEED" --dist-version 4 \
  >> "$LOGS/diagnose.log" 2>&1 || true
bank "t_g touch-value diagnostics"
for P in random,even greedy ddqn ddqn_m nearest_neighbor mfba leba; do
  pol t_g "$P" || exit 1
done
python scripts/make_results_table.py --out "$OUT" >> "$LOGS/driver.log" 2>&1 || true
bank "t_g columns (supervised pending)"

# ---- D: touch_plane A/B (same data + training seed; only the pathway flag
# and the exp tag differ from phase C's vision stage)
stage vision_t_g_plane --stage vision --setting t_g --tag plane \
  --touch-plane --vision-epochs 60 --patience 10 || exit 1
python scripts/diagnose_touch_value.py --root "$ROOT" --out "$OUT" \
  --exp-id campaign_t_g_plane --touch-plane --suffix _plane \
  >> "$LOGS/diagnose.log" 2>&1 || true
python scripts/diagnose_touch_by_family.py --root "$ROOT" --out "$OUT" \
  --exp-id campaign_t_g_plane --touch-plane --suffix _plane \
  --gen-seed "$GEN_SEED" --dist-version 4 >> "$LOGS/diagnose.log" 2>&1 || true
bank "touch_plane A/B diagnostics"
# random-policy row on the plane model: the regime check (VERDICT #2 done
# criterion is random-policy CD remaining on the best configuration)
pol t_g random --tag plane --touch-plane || true
python scripts/make_results_table.py --out "$OUT" >> "$LOGS/driver.log" 2>&1 || true
bank "touch_plane random row"

# ---- E: supervised (most expensive column; t_g first — VERDICT ask #4)
pol t_g supervised || exit 1
pol v_t_g supervised --seeds 0,1 || exit 1
python scripts/make_results_table.py --out "$OUT" >> "$LOGS/driver.log" 2>&1 || true
bank "supervised columns t_g + v_t_g"

# ---- F: the remaining two settings (supervised 1 seed)
for S in t_p v_t_p; do
  VE=60; [ "$S" = v_t_p ] && VE=45
  vis_auto_diag "$S" "$VE" || exit 1
  for P in random,even greedy ddqn ddqn_m nearest_neighbor mfba leba; do
    pol "$S" "$P" || exit 1
  done
  pol "$S" supervised --seeds 0 || exit 1
  python scripts/make_results_table.py --out "$OUT" >> "$LOGS/driver.log" 2>&1 || true
  bank "$S columns complete"
done

# ---- G: final table
python scripts/make_results_table.py --out "$OUT" | tee -a "$LOGS/driver.log"
bank "final results table"
echo "campaign run8 complete" | tee -a "$LOGS/driver.log"
