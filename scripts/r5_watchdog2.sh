#!/bin/bash
# Round-5 watchdog, phase 2: supervises campaign_run10.sh (the re-budgeted
# takeover driver) exactly as r5_watchdog.sh supervised run9 — PID-file
# tracking only (never process-name patterns), process-group kill at
# $KILL_EPOCH so the end-of-round bench owns the TPU.
#
# Usage: nohup bash scripts/r5_watchdog2.sh > /tmp/watchdog2_r5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

KILL_EPOCH=${KILL_EPOCH:-1787141000}   # ~12:03 UTC, round ends ~12:15
PIDFILE=/tmp/run10.pid
DRIVER_LOG=results_r4/logs/driver.log

alive() { [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; }

launch() {
  setsid bash scripts/campaign_run10.sh >> /tmp/run10.log 2>&1 &
  echo $! > "$PIDFILE"
  echo "watchdog2: launched run10 pid $(cat "$PIDFILE") at $(date -u)"
}

while true; do
  now=$(date +%s)
  if [ "$now" -ge "$KILL_EPOCH" ]; then
    if alive; then
      pid=$(cat "$PIDFILE")
      echo "watchdog2: kill epoch reached, killing run10 group $pid at $(date -u)"
      kill -TERM -- "-$pid" 2>/dev/null
      sleep 10
      kill -KILL -- "-$pid" 2>/dev/null
    fi
    echo "watchdog2: done (deadline)"
    exit 0
  fi
  if grep -q "campaign run10 complete" "$DRIVER_LOG" 2>/dev/null; then
    echo "watchdog2: run10 completed at $(date -u)"
    exit 0
  fi
  alive || launch
  sleep 45
done
