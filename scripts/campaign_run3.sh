#!/bin/bash
# Full parity-campaign orchestration: waits for dataset generation (pid in
# /tmp/campaign_gen.pid, if running), then chains every stage for one
# setting, logging to results_campaign/logs/.  Each stage is resumable, so
# re-running this script continues where it stopped.
set -uo pipefail
cd "$(dirname "$0")/.."

ROOT=${ROOT:-data_campaign}
OUT=${OUT:-results_campaign}
SETTING=${SETTING:-t_g}
LOGS="$OUT/logs"
mkdir -p "$LOGS"

if [ -f /tmp/campaign_gen.pid ] && kill -0 "$(cat /tmp/campaign_gen.pid)" 2>/dev/null; then
  echo "waiting for dataset generation ($(cat /tmp/campaign_gen.pid))..."
  while kill -0 "$(cat /tmp/campaign_gen.pid)" 2>/dev/null; do sleep 60; done
fi
echo "generation done: $(ls "$ROOT"/point_cloud_info 2>/dev/null | wc -l) clouds"

stage() {
  local name=$1; shift
  echo "=== stage $name: $(date -u +%H:%M:%S) ===" | tee -a "$LOGS/driver.log"
  python scripts/campaign_train.py --root "$ROOT" --out "$OUT" "$@" \
    >> "$LOGS/$name.log" 2>&1
  local rc=$?
  echo "=== stage $name rc=$rc: $(date -u +%H:%M:%S) ===" | tee -a "$LOGS/driver.log"
  return $rc
}

stage touch --stage touch --touch-epochs 6 --touch-limit-train 250 --touch-limit-valid 80 --skip-first-eval || exit 1
stage charts --stage charts || exit 1
stage "vision_$SETTING" --stage vision --setting "$SETTING" --vision-epochs 100 || exit 1
echo "=== touch-value diagnostic ===" | tee -a "$LOGS/driver.log"
python scripts/diagnose_touch_value.py --root "$ROOT" --out "$OUT" \
  --exp-id "campaign_$SETTING" >> "$LOGS/diagnose.log" 2>&1 || true
stage "auto_$SETTING" --stage auto --setting "$SETTING" --auto-epochs 30 || exit 1
stage "policies_$SETTING" --stage policies --setting "$SETTING" --greedy-checks 50 --policy-train-batches 12 || exit 1
python scripts/make_results_table.py --out "$OUT" >> "$LOGS/driver.log" 2>&1 || true
echo "campaign ($SETTING) complete" | tee -a "$LOGS/driver.log"

for EXTRA in ${EXTRA_SETTINGS:-}; do
  stage "vision_$EXTRA" --stage vision --setting "$EXTRA" --vision-epochs 100 || exit 1
  stage "auto_$EXTRA" --stage auto --setting "$EXTRA" --auto-epochs 25 || exit 1
  stage "policies_$EXTRA" --stage policies --setting "$EXTRA" --greedy-checks 50 --policy-train-batches 12 || exit 1
  python scripts/make_results_table.py --out "$OUT" >> "$LOGS/driver.log" 2>&1 || true
  echo "campaign ($EXTRA) complete" | tee -a "$LOGS/driver.log"
done
