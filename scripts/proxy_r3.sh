#!/bin/bash
# Round-3 proxy: validate the v3 (lobed) distribution's touch value on the
# 600-object data_r3 prefix before committing to the full campaign.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=results_r3
LOGS="$OUT/logs"; mkdir -p "$LOGS"

python scripts/campaign_train.py --root data_r3 --out "$OUT" --stage touch \
  --touch-epochs 5 --touch-limit-train 250 --touch-limit-valid 55 --skip-first-eval \
  --warm-start results_campaign/exp/checkpoint/touch/campaign \
  > "$LOGS/touch.log" 2>&1 || exit 1
echo "touch done $(date -u +%H:%M:%S)"
python scripts/campaign_train.py --root data_r3 --out "$OUT" --stage charts \
  > "$LOGS/charts.log" 2>&1 || exit 1
echo "charts done $(date -u +%H:%M:%S)"
python scripts/campaign_train.py --root data_r3 --out "$OUT" --stage vision \
  --setting t_g --vision-epochs 50 --patience 12 \
  > "$LOGS/vision_t_g.log" 2>&1 || exit 1
echo "vision done $(date -u +%H:%M:%S)"
python scripts/diagnose_touch_value.py --root data_r3 --out "$OUT" \
  --exp-id campaign_t_g > "$LOGS/diagnose.log" 2>&1
python scripts/diagnose_touch_by_family.py --root data_r3 --out "$OUT" \
  --exp-id campaign_t_g --gen-seed 11 --dist-version 3 >> "$LOGS/diagnose.log" 2>&1
echo "proxy complete $(date -u +%H:%M:%S)"
cat "$OUT/touch_value.json"
