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

# headline bench on the quiet chip (driver re-measures at round end; this
# is the builder's own record)
python bench.py | tee "$OUT/bench_final.json"
