#!/bin/bash
# Post-campaign finalization: run once the campaign driver exits and the
# chip is quiet.  Safe to re-run; every step is guarded or idempotent.
#
# Usage: [ROOT=data_r4] [OUT=results_r4] bash scripts/finalize_round.sh
set -uo pipefail
cd "$(dirname "$0")/.."

ROOT=${ROOT:-data_r4}
OUT=${OUT:-results_r4}
LOGS="$OUT/logs"
mkdir -p "$LOGS"

# latent-informativeness diagnostics for any setting whose earlier run
# failed or was skipped (requires the setting's auto checkpoint)
for S in t_g v_t_g t_p v_t_p; do
  if [ ! -f "$OUT/latent_diag_$S.json" ] \
     && [ -d "$OUT/exp/checkpoint/auto/campaign_$S" ]; then
    echo "latent diag $S" | tee -a "$LOGS/finalize.log"
    python scripts/diagnose_latents.py --root "$ROOT" --out "$OUT" \
      --setting "$S" >> "$LOGS/finalize.log" 2>&1 || true
  fi
done

python scripts/make_results_table.py --out "$OUT" | tee -a "$LOGS/finalize.log"

# ---- grown-test re-scoring (only once the background growth run wrote
# all 2000 objects): adopt the deferred split, extend the chart cache to
# the new objects, and re-evaluate every trained (policy, seed) on the
# bigger test split into $OUT-big — no retraining, pure eval.
NOBJ=$(ls "$ROOT/point_cloud_info" 2>/dev/null | wc -l)
LASTDIR="$ROOT/grasp_info/$(printf %06d $((NOBJ - 1)))/49"
if [ "$NOBJ" -ge 2000 ] && [ -d "$LASTDIR" ]; then
  echo "adopting grown split ($NOBJ objects)" | tee -a "$LOGS/finalize.log"
  python -c "
from active_3d_vision_and_touch_tpu.data.generation import make_data_split
import json
print(json.dumps({k: len(v) for k, v in make_data_split('$ROOT').items()}))
" | tee -a "$LOGS/finalize.log"
  python scripts/campaign_train.py --root "$ROOT" --out "$OUT" \
    --stage charts >> "$LOGS/finalize.log" 2>&1
  for S in t_g v_t_g t_p v_t_p; do
    [ -d "$OUT/exp/checkpoint/vision/campaign_$S" ] || continue
    python scripts/campaign_train.py --root "$ROOT" --out "${OUT}_big" \
      --exp-root "$OUT/exp" --stage policies --setting "$S" --eval-only \
      --greedy-checks 50 --seeds 0,1,2 --baseline-seeds 0,1,2 \
      >> "$LOGS/finalize.log" 2>&1
    python scripts/make_results_table.py --out "${OUT}_big" \
      >> "$LOGS/finalize.log" 2>&1 || true
  done
fi

# headline bench on the quiet chip (driver re-measures at round end; this
# is the builder's own record)
python bench.py | tee "$OUT/bench_final.json"
