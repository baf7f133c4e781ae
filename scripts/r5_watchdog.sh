#!/bin/bash
# Round-5 watchdog: keep campaign_run9 alive until it completes, and
# hard-kill it at $KILL_EPOCH so the end-of-round bench run owns the TPU.
#
# run9 is fully stage/checkpoint-resumable, so a relaunch after an OOM or
# stray kill loses at most one epoch of the in-flight stage.  The watchdog
# tracks run9 by PID (never by process-name patterns) and kills its whole
# process group (run9 is started with setsid).
#
# Usage: nohup bash scripts/r5_watchdog.sh > /tmp/watchdog_r5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

KILL_EPOCH=${KILL_EPOCH:-1787141000}   # ~12:03 UTC, round ends ~12:15
PIDFILE=/tmp/run9.pid
DRIVER_LOG=results_r4/logs/driver.log

alive() { [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; }

launch() {
  setsid bash scripts/campaign_run9.sh >> /tmp/run9.log 2>&1 &
  echo $! > "$PIDFILE"
  echo "watchdog: launched run9 pid $(cat "$PIDFILE") at $(date -u)"
}

while true; do
  now=$(date +%s)
  if [ "$now" -ge "$KILL_EPOCH" ]; then
    if alive; then
      pid=$(cat "$PIDFILE")
      echo "watchdog: kill epoch reached, killing run9 group $pid at $(date -u)"
      kill -TERM -- "-$pid" 2>/dev/null
      sleep 10
      kill -KILL -- "-$pid" 2>/dev/null
    fi
    echo "watchdog: done (deadline)"
    exit 0
  fi
  if grep -q "campaign run9 complete" "$DRIVER_LOG" 2>/dev/null; then
    echo "watchdog: run9 completed at $(date -u)"
    exit 0
  fi
  alive || launch
  sleep 45
done
