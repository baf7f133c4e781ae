#!/bin/bash
# Round-4 continuation (second recycle recovery): data_r4 and checkpoints
# were lost again; the dataset is regenerated bit-for-bit (GEN_SEED=13)
# and this driver resumes with a strict value-per-minute ordering under a
# ~1 h clock:
#   1. touch + charts (shared by every setting)
#   2. v_t_g vision/auto + policies — the FIRST image-conditioned rows
#      (VERDICT r3 missing #1), cheapest-first so an interrupt still
#      leaves committed columns: random/even (~25 s/seed) -> greedy
#      (~180 s) -> ddqn/ddqn_m (~300 s/seed) -> NN (~520 s/seed) ->
#      mfba/leba (~320 s) -> supervised LAST (~2100 s).
#   3. t_g vision/auto retrain (same data, same training seeds as the
#      committed rows) + its missing cells (ddqn, ddqn_m, supervised
#      seeds 1-2 + supervised_max).
# Every stage is checkpoint/summary-resumable; re-running continues.
#
# Usage: [ROOT=data_r4] [OUT=results_r4] bash scripts/campaign_run7.sh
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

stage() {
  local name=$1; shift
  echo "=== stage $name: $(date -u +%H:%M:%S) ===" | tee -a "$LOGS/driver.log"
  python scripts/campaign_train.py --root "$ROOT" --out "$OUT" "$@" \
    >> "$LOGS/$name.log" 2>&1
  local rc=$?
  echo "=== stage $name rc=$rc: $(date -u +%H:%M:%S) ===" | tee -a "$LOGS/driver.log"
  return $rc
}

pol() {  # pol <setting> <policy-subset>
  stage "policies_$1_${2//,/-}" --stage policies --setting "$1" \
    --policies "$2" --greedy-checks 50 --seeds 0,1,2 --baseline-seeds 0,1,2 \
    --eval-batches 25 --ddqn-epochs 3 --policy-train-batches 40 \
    --seq-train-fraction 0.4 --epsilon-decay 0.994
}

stage touch --stage touch --touch-epochs 10 \
  --touch-limit-train 400 --touch-limit-valid 80 --skip-first-eval || exit 1
stage charts --stage charts || exit 1

for S in v_t_g t_g; do
  VE=45; [ "$S" = t_g ] && VE=60
  stage "vision_$S" --stage vision --setting "$S" \
    --vision-epochs "$VE" --patience 10 || exit 1
  stage "auto_$S" --stage auto --setting "$S" --auto-epochs 16 || exit 1
  if [ ! -f "$OUT/latent_diag_$S.json" ]; then
    python scripts/diagnose_latents.py --root "$ROOT" --out "$OUT" \
      --setting "$S" >> "$LOGS/diagnose.log" 2>&1 || true
  fi
  # cheapest -> most expensive; each call commits its column on completion
  pol "$S" random,even || exit 1
  pol "$S" greedy || exit 1
  pol "$S" ddqn || exit 1
  pol "$S" ddqn_m || exit 1
  pol "$S" nearest_neighbor || exit 1
  pol "$S" mfba || exit 1
  pol "$S" leba || exit 1
  pol "$S" supervised || exit 1
  python scripts/make_results_table.py --out "$OUT" >> "$LOGS/driver.log" 2>&1 || true
  echo "campaign ($S) complete" | tee -a "$LOGS/driver.log"
done
echo "campaign run7 complete" | tee -a "$LOGS/driver.log"
