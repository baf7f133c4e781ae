#!/bin/bash
# Round-3 parity campaign on the v4 (touch-dominant) dataset: all 4
# experiment settings, 3-seed learned policies, DDQN_m column.  Each stage
# is resumable (checkpoints + per-seed summary entries), so re-running this
# script continues where it stopped.
#
# v4 vs the run4 script: fresh touch training (no surviving warm-start
# checkpoint), --dist-version 4 diagnostics, 3 seeds for learned policies.
#
# Usage: [ROOT=data_r4] [OUT=results_r4] [SETTINGS="t_g v_t_g t_p v_t_p"]
#        bash scripts/campaign_run5.sh
set -uo pipefail
cd "$(dirname "$0")/.."

ROOT=${ROOT:-data_r4}
OUT=${OUT:-results_r4}
SETTINGS=${SETTINGS:-"t_g v_t_g t_p v_t_p"}
SEEDS=${SEEDS:-"0,1,2"}
BASELINE_SEEDS=${BASELINE_SEEDS:-"0,1,2"}
GEN_SEED=${GEN_SEED:-13}
TOUCH_EPOCHS=${TOUCH_EPOCHS:-10}
VISION_EPOCHS=${VISION_EPOCHS:-60}
VISION_EPOCHS_AUX=${VISION_EPOCHS_AUX:-45}   # non-t_g settings
AUTO_EPOCHS=${AUTO_EPOCHS:-16}
DDQN_EPOCHS=${DDQN_EPOCHS:-3}
TRAIN_BATCHES=${TRAIN_BATCHES:-40}
EVAL_BATCHES=${EVAL_BATCHES:-25}   # x env_batch_size 8 = 200 episodes
LOGS="$OUT/logs"
mkdir -p "$LOGS"

# Dataset provenance gate (VERDICT r3 #6): the results table must be tied
# to a reproducible generator seed/version.  campaign_generate.py writes
# gen_meta.json; refuse to train against a root whose provenance does not
# match this campaign's GEN_SEED.
if [ -f "$ROOT/gen_meta.json" ]; then
  python - "$ROOT" "$GEN_SEED" <<'EOF' || exit 1
import json, sys
meta = json.load(open(f"{sys.argv[1]}/gen_meta.json"))
want = int(sys.argv[2])
assert meta["seed"] == want and meta["dist_version"] == 4, \
    f"dataset provenance mismatch: {meta} vs GEN_SEED={want}, dist_version=4"
EOF
else
  echo "WARNING: $ROOT/gen_meta.json missing — provenance unverified" \
    | tee -a "$LOGS/driver.log"
fi

# VERDICT r2 #10: re-measure clustered-NN agreement on this dataset before
# trusting it as the training loss (logged metric; aborts campaign if the
# CD bias exceeds the gate)
if [ ! -f "$OUT/cluster_agreement.json" ]; then
  python scripts/check_cluster_agreement.py --root "$ROOT" --out "$OUT" \
    > "$LOGS/cluster_agreement.log" 2>&1 || exit 1
fi

stage() {
  local name=$1; shift
  echo "=== stage $name: $(date -u +%H:%M:%S) ===" | tee -a "$LOGS/driver.log"
  python scripts/campaign_train.py --root "$ROOT" --out "$OUT" "$@" \
    >> "$LOGS/$name.log" 2>&1
  local rc=$?
  echo "=== stage $name rc=$rc: $(date -u +%H:%M:%S) ===" | tee -a "$LOGS/driver.log"
  return $rc
}

stage touch --stage touch --touch-epochs "$TOUCH_EPOCHS" \
  --touch-limit-train 400 --touch-limit-valid 80 --skip-first-eval || exit 1
stage charts --stage charts || exit 1

for S in $SETTINGS; do
  VE="$VISION_EPOCHS"; [ "$S" != t_g ] && VE="$VISION_EPOCHS_AUX"
  stage "vision_$S" --stage vision --setting "$S" \
    --vision-epochs "$VE" --patience 10 || exit 1
  if [ "$S" = t_g ]; then
    echo "=== touch-value diagnostic ===" | tee -a "$LOGS/driver.log"
    python scripts/diagnose_touch_value.py --root "$ROOT" --out "$OUT" \
      --exp-id campaign_t_g >> "$LOGS/diagnose.log" 2>&1 || true
    python scripts/diagnose_touch_by_family.py --root "$ROOT" --out "$OUT" \
      --exp-id campaign_t_g --gen-seed "$GEN_SEED" --dist-version 4 \
      >> "$LOGS/diagnose.log" 2>&1 || true
  fi
  stage "auto_$S" --stage auto --setting "$S" --auto-epochs "$AUTO_EPOCHS" || exit 1
  # latent informativeness (VERDICT r3 #3: on v3 the step-0 latent was
  # nearly object-independent, starving NN/supervised/DDQN_l of signal)
  if [ ! -f "$OUT/latent_diag_$S.json" ]; then
    python scripts/diagnose_latents.py --root "$ROOT" --out "$OUT" \
      --setting "$S" >> "$LOGS/diagnose.log" 2>&1 || true
  fi
  stage "policies_$S" --stage policies --setting "$S" --greedy-checks 50 \
    --seeds "$SEEDS" --baseline-seeds "$BASELINE_SEEDS" \
    --eval-batches "$EVAL_BATCHES" --ddqn-epochs "$DDQN_EPOCHS" \
    --policy-train-batches "$TRAIN_BATCHES" --seq-train-fraction 0.4 \
    --epsilon-decay 0.994 || exit 1
  python scripts/make_results_table.py --out "$OUT" >> "$LOGS/driver.log" 2>&1 || true
  echo "campaign ($S) complete" | tee -a "$LOGS/driver.log"
done
echo "campaign run5 complete" | tee -a "$LOGS/driver.log"
