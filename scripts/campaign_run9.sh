#!/bin/bash
# Round-5 campaign driver, revision 3 — re-budgeted against the MEASURED
# stage pace (vision ~65 s/epoch at 552 recon_train objects; policy
# stages dominated by per-process env build + per-(policy,seed) sweeps).
# Total remaining TPU work exceeds the remaining round clock, so stages
# run in strict value order (VERDICT r4 asks #1-#4) and two deadline
# gates cut the tail rather than the head:
#
#   1. v_t_g vision/auto/latent-diag        (prereq for any v_t_g row)
#   2. v_t_g random,even,greedy             (the setting's anchor rows)
#   3. v_t_g ddqn,ddqn_m,nearest_neighbor   (VERDICT #3: DDQN rows on v4)
#   4. t_g A/B: plain + plane vision arms at EQUAL epoch budgets, each
#      followed by touch-value + by-family diagnostics (VERDICT #2)
#   5. t_g random,even (plain) + random (plane): the regime anchors
#   6. v_t_g supervised (VERDICT #4), then mfba,leba
#   7. t_g auto/latents + learned t_g columns (whatever still fits)
#
# Grouped policy subsets share one process/env build (~2-3 min saved per
# merge); summary entries are written per (policy, seed), so even a kill
# mid-stage loses at most one cell.  GATE_HEAVY stops new >15-min stages,
# GATE_LIGHT stops everything; scripts/r5_watchdog.sh hard-kills the tree
# at ~12:03 UTC so the end-of-round bench owns the chip.
#
# Usage: [ROOT=data_r4] [OUT=results_r4] bash scripts/campaign_run9.sh
set -uo pipefail
cd "$(dirname "$0")/.."

ROOT=${ROOT:-data_r4}
OUT=${OUT:-results_r4}
GEN_SEED=${GEN_SEED:-13}
# round start 1787098690 (PROGRESS.jsonl ts - wall_s); ends ~1787141890.
GATE_HEAVY=${GATE_HEAVY:-1787139480}   # ~11:38 UTC
GATE_LIGHT=${GATE_LIGHT:-1787140500}   # ~11:55 UTC
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

gated() {  # gated <epoch> <label>: exit cleanly once past the deadline
  if [ "$(date +%s)" -ge "$1" ]; then
    echo "=== gate hit before $2: $(date -u +%H:%M:%S) ===" \
      | tee -a "$LOGS/driver.log"
    python scripts/make_results_table.py --out "$OUT" >> "$LOGS/driver.log" 2>&1 || true
    bank "table at deadline gate"
    exit 0
  fi
}

stage() {  # stage <gate-epoch> <name> <campaign_train args...>
  local g=$1 name=$2; shift 2
  gated "$g" "stage $name"
  echo "=== stage $name: $(date -u +%H:%M:%S) ===" | tee -a "$LOGS/driver.log"
  python scripts/campaign_train.py --root "$ROOT" --out "$OUT" "$@" \
    >> "$LOGS/$name.log" 2>&1
  local rc=$?
  echo "=== stage $name rc=$rc: $(date -u +%H:%M:%S) ===" | tee -a "$LOGS/driver.log"
  bank "$name"
  return $rc
}

pol() {  # pol <gate> <setting> <policy-subset> <seeds> [extra args...]
  local G=$1 S=$2 P=$3 SEEDS=$4; shift 4
  stage "$G" "policies_${S}_${P//,/-}" --stage policies --setting "$S" \
    --policies "$P" --greedy-checks 50 --seeds "$SEEDS" \
    --baseline-seeds 0,1,2 --eval-batches 25 --ddqn-epochs 3 \
    --policy-train-batches 40 --seq-train-fraction 0.4 \
    --epsilon-decay 0.994 "$@"
}

table() {
  python scripts/make_results_table.py --out "$OUT" >> "$LOGS/driver.log" 2>&1 || true
}

# ---- 1: v_t_g vision/auto/latents — prereq for the never-delivered
# image-conditioned rows
stage "$GATE_HEAVY" vision_v_t_g --stage vision --setting v_t_g \
  --vision-epochs 45 --patience 10 || exit 1
stage "$GATE_HEAVY" auto_v_t_g --stage auto --setting v_t_g \
  --auto-epochs 16 || exit 1
if [ ! -f "$OUT/latent_diag_v_t_g.json" ]; then
  python scripts/diagnose_latents.py --root "$ROOT" --out "$OUT" \
    --setting v_t_g >> "$LOGS/diagnose.log" 2>&1 || true
  bank "latent diag v_t_g"
fi

# ---- 2: v_t_g anchor rows (random/even n=3, greedy n=2 via bseeds[:2])
pol "$GATE_HEAVY" v_t_g random,even,greedy 0,1,2 || exit 1
table; bank "v_t_g anchor rows"

# ---- 3: v_t_g learned rows — DDQN on v4 is VERDICT r4 missing #3
# (ddqn n=3, ddqn_m n=2 via seeds[:n-1], nearest_neighbor n=3)
pol "$GATE_HEAVY" v_t_g ddqn,ddqn_m,nearest_neighbor 0,1,2 || exit 1
table; bank "v_t_g ddqn/ddqn_m/nn rows"

# ---- 4: t_g touch_plane A/B — both arms at the SAME epoch budget on the
# same data and training seed; diagnostics bank right after each arm
stage "$GATE_HEAVY" vision_t_g --stage vision --setting t_g \
  --vision-epochs 28 --patience 5 || exit 1
gated "$GATE_LIGHT" "t_g diagnostics"
python scripts/diagnose_touch_value.py --root "$ROOT" --out "$OUT" \
  --exp-id campaign_t_g >> "$LOGS/diagnose.log" 2>&1 || true
python scripts/diagnose_touch_by_family.py --root "$ROOT" --out "$OUT" \
  --exp-id campaign_t_g --gen-seed "$GEN_SEED" --dist-version 4 \
  >> "$LOGS/diagnose.log" 2>&1 || true
bank "t_g touch-value diagnostics (plain arm)"

stage "$GATE_HEAVY" vision_t_g_plane --stage vision --setting t_g \
  --tag plane --touch-plane --vision-epochs 28 --patience 5 || exit 1
gated "$GATE_LIGHT" "plane diagnostics"
python scripts/diagnose_touch_value.py --root "$ROOT" --out "$OUT" \
  --exp-id campaign_t_g_plane --touch-plane --suffix _plane \
  >> "$LOGS/diagnose.log" 2>&1 || true
python scripts/diagnose_touch_by_family.py --root "$ROOT" --out "$OUT" \
  --exp-id campaign_t_g_plane --touch-plane --suffix _plane \
  --gen-seed "$GEN_SEED" --dist-version 4 >> "$LOGS/diagnose.log" 2>&1 || true
bank "touch_plane A/B diagnostics"

# ---- 5: t_g regime anchor rows on the fresh checkpoints
pol "$GATE_LIGHT" t_g random,even 0,1,2 || exit 1
pol "$GATE_LIGHT" t_g random 0,1,2 --tag plane --touch-plane || true
table; bank "t_g regime rows (plain + plane random)"

# ---- 6: v_t_g long tail (supervised = VERDICT #4, then sequence policies)
pol "$GATE_HEAVY" v_t_g supervised 0,1 || exit 1
pol "$GATE_HEAVY" v_t_g mfba,leba 0,1 || exit 1
table; bank "v_t_g supervised + sequence rows"

# ---- 7: t_g learned columns (auto/latents first), value-first
stage "$GATE_HEAVY" auto_t_g --stage auto --setting t_g --auto-epochs 12 || exit 1
if [ ! -f "$OUT/latent_diag_t_g.json" ]; then
  python scripts/diagnose_latents.py --root "$ROOT" --out "$OUT" \
    --setting t_g >> "$LOGS/diagnose.log" 2>&1 || true
  bank "latent diag t_g"
fi
pol "$GATE_HEAVY" t_g ddqn,ddqn_m,nearest_neighbor 0,1,2 || exit 1
table; bank "t_g ddqn/ddqn_m/nn rows"
pol "$GATE_HEAVY" t_g greedy 0,1 || exit 1
pol "$GATE_HEAVY" t_g supervised 0,1 || exit 1
pol "$GATE_HEAVY" t_g mfba,leba 0,1 || exit 1
table; bank "t_g long-tail rows"

# ---- final table
python scripts/make_results_table.py --out "$OUT" | tee -a "$LOGS/driver.log"
bank "final results table"
echo "campaign run9 complete" | tee -a "$LOGS/driver.log"
