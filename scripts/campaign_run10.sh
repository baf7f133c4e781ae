#!/bin/bash
# Round-5 campaign driver, revision 4 — takes over from run9 after its
# v_t_g ddqn/ddqn_m/nearest_neighbor stage banks (~10:30 UTC), because the
# run9 tail (two 28-epoch t_g vision arms + anchors + long tail) cannot
# fit the ~85 min of chip left before the 12:03 UTC watchdog kill.  This
# revision re-budgets so that BOTH of the judge's top remaining asks land:
#
#   1. t_g touch_plane A/B (VERDICT r4 #2) at EQUAL 16-epoch budgets —
#      plain arm, its diagnostics, plane arm, its diagnostics, in that
#      order so a deadline cut always leaves a complete arm, not two
#      halves.  16 epochs (~32 s/epoch measured on campaign_v_t_g) keeps
#      the whole A/B ≈ 40 min vs run9's unaffordable 28-epoch arms.
#   2. v_t_g mfba,leba (VERDICT r4 #1): pushes the first image-conditioned
#      row to 8/9 columns (supervised alone doesn't fit: measured
#      2078 s/seed on t_g legacy — it is LAST, gated, and will only run
#      if everything else finishes early).
#   3. t_g random/even anchors on the fresh plain arm + random on the
#      plane arm (policy-level A/B), gated.
#
# Usage: [ROOT=data_r4] [OUT=results_r4] bash scripts/campaign_run10.sh
set -uo pipefail
cd "$(dirname "$0")/.."

ROOT=${ROOT:-data_r4}
OUT=${OUT:-results_r4}
GEN_SEED=${GEN_SEED:-13}
# round start 1787098690, ends ~1787141890; watchdog kill 1787141000.
GATE_AB=${GATE_AB:-1787139000}       # ~11:30 — last start for a vision arm
GATE_DIAG=${GATE_DIAG:-1787140080}   # ~11:48 — last start for diagnostics
GATE_POL=${GATE_POL:-1787139900}     # ~11:45 — last start for policy rows
GATE_SUP=${GATE_SUP:-1787136600}     # ~10:50 — supervised only if very early
LOGS="$OUT/logs"
mkdir -p "$LOGS"

python - "$ROOT" "$GEN_SEED" <<'EOF' || exit 1
import json, sys
meta = json.load(open(f"{sys.argv[1]}/gen_meta.json"))
want = int(sys.argv[2])
assert meta["seed"] == want and meta["dist_version"] == 4, \
    f"dataset provenance mismatch: {meta} vs GEN_SEED={want}, dist_version=4"
EOF

bank() {
  git add -A "$OUT" 2>/dev/null
  git commit -q -m "campaign r5: $1" 2>/dev/null || true
}

gated() {
  if [ "$(date +%s)" -ge "$1" ]; then
    echo "=== gate hit before $2: $(date -u +%H:%M:%S) ===" \
      | tee -a "$LOGS/driver.log"
    return 1
  fi
  return 0
}

stage() {  # stage <gate-epoch> <name> <campaign_train args...>
  local g=$1 name=$2; shift 2
  gated "$g" "stage $name" || return 9
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

# ---- 1: touch_plane A/B, complete-arm-first ordering
stage "$GATE_AB" vision_t_g --stage vision --setting t_g \
  --vision-epochs 16 --patience 8
if gated "$GATE_DIAG" "t_g diagnostics (plain arm)"; then
  python scripts/diagnose_touch_value.py --root "$ROOT" --out "$OUT" \
    --exp-id campaign_t_g >> "$LOGS/diagnose.log" 2>&1 || true
  python scripts/diagnose_touch_by_family.py --root "$ROOT" --out "$OUT" \
    --exp-id campaign_t_g --gen-seed "$GEN_SEED" --dist-version 4 \
    >> "$LOGS/diagnose.log" 2>&1 || true
  bank "t_g touch-value diagnostics (plain arm, 16-epoch)"
fi

stage "$GATE_AB" vision_t_g_plane --stage vision --setting t_g \
  --tag plane --touch-plane --vision-epochs 16 --patience 8
if gated "$GATE_DIAG" "t_g diagnostics (plane arm)"; then
  python scripts/diagnose_touch_value.py --root "$ROOT" --out "$OUT" \
    --exp-id campaign_t_g_plane --touch-plane --suffix _plane \
    >> "$LOGS/diagnose.log" 2>&1 || true
  python scripts/diagnose_touch_by_family.py --root "$ROOT" --out "$OUT" \
    --exp-id campaign_t_g_plane --touch-plane --suffix _plane \
    --gen-seed "$GEN_SEED" --dist-version 4 >> "$LOGS/diagnose.log" 2>&1 || true
  bank "touch_plane A/B diagnostics (16-epoch equal budgets)"
fi

# ---- 2: v_t_g sequence policies — completes the image-conditioned row
# to 8/9 columns (per-seed summary writes, so a deadline kill loses at
# most the in-flight seed)
pol "$GATE_POL" v_t_g mfba,leba 0,1
table; bank "v_t_g mfba/leba rows"

# ---- 3: t_g regime anchors on the fresh arms (policy-level A/B)
pol "$GATE_POL" t_g random,even 0,1,2
pol "$GATE_POL" t_g random 0,1,2 --tag plane --touch-plane
table; bank "t_g regime rows (plain + plane random)"

# ---- 4: only reached if everything above ran unexpectedly fast
pol "$GATE_SUP" v_t_g supervised 0,1

python scripts/make_results_table.py --out "$OUT" | tee -a "$LOGS/driver.log"
bank "final results table (run10)"
echo "campaign run10 complete" | tee -a "$LOGS/driver.log"
