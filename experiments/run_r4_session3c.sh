#!/bin/bash
# Round-4 session-3 queue, part C: reprioritized tail for a shortened
# session.  Part B's label top-up (13+ min) would push mode-7 past the
# session_tail stop time, so part B is cancelled via /tmp/stop_queue_b and
# this script runs, as soon as part A's tiny720 job releases the chip:
#
#   mode-7 (live tiny@720 infer, frozen 10-object roster)  ->
#   atto scaling point (usually cut by session_tail)       ->
#   open-ended label top-up (always cut by session_tail)
#
#   nohup bash experiments/run_r4_session3c.sh > /tmp/r4s3c_queue.log 2>&1 &
set -u
cd /root/repo
W=experiments/watchdog.sh
ART=experiments/artifacts
WS=.workspace/prv3_ws

say() { echo "[queueC] $1 $(date +%H:%M:%S)"; }

# wait for part A's tiny720 job to release the chip (read-only /proc scan)
other_chip_job() {
  for d in /proc/[0-9]*; do
    p=${d#/proc/}
    [ "$p" = "$$" ] && continue
    tr '\0' ' ' < "$d/cmdline" 2>/dev/null | \
      grep -qE "exp_dataset300|exp_prvnet_r4" && return 0
  done
  return 1
}
MISS=0
while [ "$MISS" -lt 3 ]; do
  if other_chip_job; then
    MISS=0
    sleep 45
  else
    MISS=$((MISS + 1))
    sleep 15
  fi
done
say "chip free, starting part C"

# NOTE: /tmp/stop_queue is already set (it ends part A after tiny720), so
# part C gates on its own flag + the session_tail flag (stop_watchdog).
gate() {
  if [ -e /tmp/stop_queue_c ] || [ -e /tmp/stop_watchdog ]; then
    say "stopped before: $1"
    exit 0
  fi
  say "starting: $1"
  STEP="$1"
}
run() {
  if ! "$@"; then
    say "FAILED: $STEP — aborting queue"
    exit 1
  fi
}

gate mode7-r4
run bash $W 600 $WS /tmp/mode7_r4.log -- \
  env PRV4_MODE7_DEADLINE_MIN=40 python -u experiments/exp_mode7_r4.py

gate prvnet-atto-scaling
run bash $W 900 $ART /tmp/atto_scaling.log -- \
  python -u experiments/exp_prvnet_r4.py --phase atto

gate label-topup
run bash $W 600 $WS /tmp/label_topup.log -- \
  env PRV4_DEADLINE_MIN=600 python -u experiments/exp_dataset300.py --phase all

say "all jobs done"
