#!/bin/bash
# One-glance campaign status: stage markers, last log lines, summary keys.
OUT=${1:-results_r4}
echo "--- driver ---"
tail -4 "$OUT/logs/driver.log" 2>/dev/null
last=$(ls -t "$OUT"/logs/*.log 2>/dev/null | head -1)
echo "--- $last ---"
tail -4 "$last" 2>/dev/null | grep -v WARNING
if [ -f "$OUT/summary.json" ]; then
  echo "--- summary keys ---"
  python - "$OUT" <<'EOF'
import json, sys
s = json.load(open(f"{sys.argv[1]}/summary.json"))
for k, v in s.items():
    if isinstance(v, dict) and "seeds" not in v:
        sub = {kk: (round(vv, 3) if isinstance(vv, float) else
                    (sorted(vv.get("seeds", {})) if isinstance(vv, dict) else vv))
               for kk, vv in list(v.items())[:6]}
        print(k, sub)
    else:
        print(k, v if not isinstance(v, dict) else list(v)[:8])
EOF
fi
