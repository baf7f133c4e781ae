#!/bin/bash
# Round-5 campaign driver, revision 2 — run8's plan re-budgeted for the
# measured ~4.4 h of TPU time left in the round (run8's full plan needed
# ~7 h).  Differences from run8:
#
#   * DEADLINE GATE: no new stage starts after $GATE_EPOCH; the watchdog
#     (scripts/r5_watchdog.sh) hard-kills the tree at $KILL_EPOCH so the
#     end-of-round bench gets the chip to itself (the 5x bar rides on it).
#   * v_t_g completes ALL NINE policy columns (supervised included, 2
#     seeds) before t_g work starts: one complete image-conditioned
#     setting beats two partial ones (VERDICT r4 missing #1 / #4).
#   * expensive learned/sequence policies run 2 seeds instead of 3
#     (VERDICT asks >=2 for DDQN, >=2 for greedy); cheap baselines and NN
#     keep 3.
#   * the touch_plane A/B (vision retrain + touch-value + by-family
#     diagnostics for BOTH arms) is banked BEFORE the t_g policy columns:
#     it is the round's science deliverable (VERDICT r4 missing #2,
#     weak #5) and costs ~40 min, while full t_g columns cost ~90.
#   * t_g policy order is value-first: random,even (the regime anchor) ->
#     ddqn,ddqn_m (missing #3) -> nearest_neighbor -> greedy -> mfba,leba
#     -> supervised.  Whatever the gate cuts off is the cheapest loss.
#   * t_p / v_t_p are dropped from this revision — they never fit in the
#     remaining clock; the table states the gap.
#
# Every stage is checkpoint/summary-resumable (campaign_train.py restores
# recent checkpoints + early-stop state); re-running continues.  The
# driver git-commits $OUT after each stage so a recycle can never orphan
# more than one stage.
#
# Usage: [ROOT=data_r4] [OUT=results_r4] [GATE_EPOCH=...] bash scripts/campaign_run9.sh
set -uo pipefail
cd "$(dirname "$0")/.."

ROOT=${ROOT:-data_r4}
OUT=${OUT:-results_r4}
GEN_SEED=${GEN_SEED:-13}
# round start 1787098690 (PROGRESS.jsonl ts - wall_s); round ends ~+12 h =
# 1787141890 (~12:15 UTC).  Gate at 11:40, leaving the longest plausible
# in-flight stage room to finish before the watchdog's 12:00 hard kill.
GATE_EPOCH=${GATE_EPOCH:-1787139600}
LOGS="$OUT/logs"
mkdir -p "$LOGS"

python - "$ROOT" "$GEN_SEED" <<'EOF' || exit 1
import json, sys
meta = json.load(open(f"{sys.argv[1]}/gen_meta.json"))
want = int(sys.argv[2])
assert meta["seed"] == want and meta["dist_version"] == 4, \
    f"dataset provenance mismatch: {meta} vs GEN_SEED={want}, dist_version=4"
EOF

bank() {  # commit the results dir after a stage (recycle insurance)
  git add -A "$OUT" 2>/dev/null
  git commit -q -m "campaign r5: $1" 2>/dev/null || true
}

gate() {  # no new stage after the gate epoch — free the chip for bench
  if [ "$(date +%s)" -ge "$GATE_EPOCH" ]; then
    echo "=== deadline gate hit before stage $1: $(date -u +%H:%M:%S) ===" \
      | tee -a "$LOGS/driver.log"
    python scripts/make_results_table.py --out "$OUT" >> "$LOGS/driver.log" 2>&1 || true
    bank "table at deadline gate"
    exit 0
  fi
}

stage() {
  local name=$1; shift
  gate "$name"
  echo "=== stage $name: $(date -u +%H:%M:%S) ===" | tee -a "$LOGS/driver.log"
  python scripts/campaign_train.py --root "$ROOT" --out "$OUT" "$@" \
    >> "$LOGS/$name.log" 2>&1
  local rc=$?
  echo "=== stage $name rc=$rc: $(date -u +%H:%M:%S) ===" | tee -a "$LOGS/driver.log"
  bank "$name"
  return $rc
}

pol() {  # pol <setting> <policy-subset> <seeds> [extra args...]
  local S=$1 P=$2 SEEDS=$3; shift 3
  stage "policies_${S}_${P//,/-}" --stage policies --setting "$S" \
    --policies "$P" --greedy-checks 50 --seeds "$SEEDS" \
    --baseline-seeds 0,1,2 --eval-batches 25 --ddqn-epochs 3 \
    --policy-train-batches 40 --seq-train-fraction 0.4 \
    --epsilon-decay 0.994 "$@"
}

table() {
  python scripts/make_results_table.py --out "$OUT" >> "$LOGS/driver.log" 2>&1 || true
}

# ---- B: v_t_g — the never-delivered image-conditioned setting, COMPLETE
stage vision_v_t_g --stage vision --setting v_t_g \
  --vision-epochs 45 --patience 10 || exit 1
stage auto_v_t_g --stage auto --setting v_t_g --auto-epochs 16 || exit 1
if [ ! -f "$OUT/latent_diag_v_t_g.json" ]; then
  python scripts/diagnose_latents.py --root "$ROOT" --out "$OUT" \
    --setting v_t_g >> "$LOGS/diagnose.log" 2>&1 || true
  bank "latent diag v_t_g"
fi
pol v_t_g random,even 0,1,2 || exit 1
pol v_t_g ddqn 0,1 || exit 1
pol v_t_g ddqn_m 0,1,2 || exit 1  # ddqn_m slices seeds[:n-1] -> 2 seeds
pol v_t_g nearest_neighbor 0,1,2 || exit 1
pol v_t_g greedy 0,1 || exit 1
pol v_t_g mfba 0,1 || exit 1
pol v_t_g leba 0,1 || exit 1
pol v_t_g supervised 0,1 || exit 1
table; bank "v_t_g columns complete (9 policies)"

# ---- C1: t_g vision/auto/latents (the A/B baseline arm)
stage vision_t_g --stage vision --setting t_g \
  --vision-epochs 45 --patience 8 || exit 1
stage auto_t_g --stage auto --setting t_g --auto-epochs 16 || exit 1
if [ ! -f "$OUT/latent_diag_t_g.json" ]; then
  python scripts/diagnose_latents.py --root "$ROOT" --out "$OUT" \
    --setting t_g >> "$LOGS/diagnose.log" 2>&1 || true
  bank "latent diag t_g"
fi
gate "t_g diagnostics"
python scripts/diagnose_touch_value.py --root "$ROOT" --out "$OUT" \
  --exp-id campaign_t_g >> "$LOGS/diagnose.log" 2>&1 || true
python scripts/diagnose_touch_by_family.py --root "$ROOT" --out "$OUT" \
  --exp-id campaign_t_g --gen-seed "$GEN_SEED" --dist-version 4 \
  >> "$LOGS/diagnose.log" 2>&1 || true
bank "t_g touch-value diagnostics"

# ---- C2: touch_plane A/B arm (same data + training seed; only the
# pathway flag and the exp tag differ) — the round's science deliverable
stage vision_t_g_plane --stage vision --setting t_g --tag plane \
  --touch-plane --vision-epochs 45 --patience 8 || exit 1
gate "plane diagnostics"
python scripts/diagnose_touch_value.py --root "$ROOT" --out "$OUT" \
  --exp-id campaign_t_g_plane --touch-plane --suffix _plane \
  >> "$LOGS/diagnose.log" 2>&1 || true
python scripts/diagnose_touch_by_family.py --root "$ROOT" --out "$OUT" \
  --exp-id campaign_t_g_plane --touch-plane --suffix _plane \
  --gen-seed "$GEN_SEED" --dist-version 4 >> "$LOGS/diagnose.log" 2>&1 || true
bank "touch_plane A/B diagnostics"

# ---- C3: t_g policy columns, value-first
pol t_g random,even 0,1,2 || exit 1
# regime check on the plane arm: random-policy CD remaining on the best
# configuration is VERDICT #2's done criterion
pol t_g random 0,1,2 --tag plane --touch-plane || true
table; bank "t_g regime rows (plain + plane random)"
pol t_g ddqn 0,1 || exit 1
pol t_g ddqn_m 0,1,2 || exit 1  # ddqn_m slices seeds[:n-1] -> 2 seeds
pol t_g nearest_neighbor 0,1,2 || exit 1
pol t_g greedy 0,1 || exit 1
pol t_g mfba 0,1 || exit 1
pol t_g leba 0,1 || exit 1
pol t_g supervised 0,1 || exit 1
table; bank "t_g columns complete (9 policies)"

# ---- G: final table
python scripts/make_results_table.py --out "$OUT" | tee -a "$LOGS/driver.log"
bank "final results table"
echo "campaign run9 complete" | tee -a "$LOGS/driver.log"
