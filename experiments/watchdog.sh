#!/bin/bash
# Progress-based watchdog for long chip jobs: the axon tunnel sporadically
# hangs an RPC forever (futex wait, no exit), which the plain retry wrapper
# cannot catch.  Every stage of the round-4 drivers is resume-guarded, so
# the cheapest recovery from a silent hang is kill + relaunch.
#
#   experiments/watchdog.sh <stall_seconds> <progress_dir> <log> -- cmd...
#
# Restarts cmd whenever <progress_dir> sees no new file writes for
# <stall_seconds> while cmd is running.  Stops for good when cmd exits 0 or
# when /tmp/stop_watchdog exists.
set -u
STALL=$1; PROGRESS_DIR=$2; LOG=$3; shift 3
[ "$1" = "--" ] && shift
for attempt in $(seq 1 40); do
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  T0=$(date +%s)
  echo "=== watchdog attempt $attempt pid=$PID $(date +%H:%M:%S) ===" >> "$LOG"
  while kill -0 "$PID" 2>/dev/null; do
    sleep 30
    if [ -e /tmp/stop_watchdog ]; then
      kill -9 "$PID" 2>/dev/null
      echo "=== watchdog stopped by /tmp/stop_watchdog ===" >> "$LOG"
      exit 0
    fi
    # grace period: old workspace files may all be stale right after a
    # restart (the hang that triggered it aged everything), and a fresh
    # process needs minutes to re-acquire a kill-wedged chip claim
    if [ $(( $(date +%s) - T0 )) -lt $(( STALL + 300 )) ]; then
      continue
    fi
    # any file written recently anywhere under the workspace counts; the
    # job's own log is progress too (training jobs print every epoch but
    # may checkpoint less often than STALL)
    if [ -z "$(find "$PROGRESS_DIR" "$LOG" -type f -newermt "-${STALL} seconds" -print -quit 2>/dev/null)" ]; then
      echo "=== watchdog: no writes for ${STALL}s, killing $PID $(date +%H:%M:%S) ===" >> "$LOG"
      # SIGTERM first so the tunnel client can release its chip claim
      kill "$PID" 2>/dev/null
      sleep 10
      kill -9 "$PID" 2>/dev/null
      sleep 5
      break
    fi
  done
  wait "$PID" 2>/dev/null
  RC=$?
  if [ "$RC" -eq 0 ]; then
    echo "=== watchdog: job finished rc=0 ===" >> "$LOG"
    exit 0
  fi
  echo "=== watchdog: job rc=$RC, restarting $(date +%H:%M:%S) ===" >> "$LOG"
  sleep 10
done
# all attempts exhausted with the job still failing: report FAILURE so a
# queue chaining on this watchdog does not launch dependents against
# missing prerequisites
echo "=== watchdog: giving up after 40 attempts ===" >> "$LOG"
exit 1
