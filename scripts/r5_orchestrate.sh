#!/bin/bash
# Round-5 session orchestrator: wait for the in-flight dataset generation
# and touch-stage processes to finish, sanity-check dataset completeness,
# then hand off to the stage-resumable campaign driver (run8).  Exists so
# a single background task owns the whole pipeline — no idle gap between
# generation finishing and training starting.
set -u
cd "$(dirname "$0")/.."

wait_pid() {  # wait for a non-child pid to exit
  local pid=$1
  while kill -0 "$pid" 2>/dev/null; do sleep 20; done
}

[ -f /tmp/gen_r5.pid ] && wait_pid "$(cat /tmp/gen_r5.pid)"
[ -f /tmp/touch_r5.pid ] && wait_pid "$(cat /tmp/touch_r5.pid)"

# dataset completeness gate: every object must have its final grasp dir
python - <<'EOF' || exit 1
import json, os
meta = json.load(open("data_r4/gen_meta.json"))
n, a = meta["num_objects"], meta["num_actions"]
done = sum(
    os.path.isdir(os.path.join("data_r4/grasp_info", f"{i:06d}", str(a - 1)))
    for i in range(n)
)
print(f"grasped {done}/{n}", flush=True)
assert done == n, "generation incomplete - not starting the campaign"
EOF

git add -A data_r4/gen_meta.json 2>/dev/null
git commit -q -m "data_r4 regeneration complete: 2000 objects, dist v4, seed 13" 2>/dev/null

exec bash scripts/campaign_run8.sh
