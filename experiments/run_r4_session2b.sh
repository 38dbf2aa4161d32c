#!/bin/bash
# Round-4 session-2 queue, part B: reprioritized tail.
#
# Part A (run_r4_session2.sh) runs dataset300 -> tiny720 and is then told
# to stop via /tmp/stop_queue (its remaining order atto -> mode7 -> mode21
# risks the session ending before mode-7, the highest-value item).  This
# script waits for part A's active job to release the chip, then runs
#
#   mode-7 (live tiny@720 infer, 45 min)  ->  atto scaling point  ->
#   mode-21 five-method table (incremental rows until session end)  ->
#   open-ended label top-up
#
#   nohup bash experiments/run_r4_session2b.sh > /tmp/r4s2b_queue.log 2>&1 &
set -u
cd /root/repo
W=experiments/watchdog.sh
ART=experiments/artifacts
WS=.workspace/prv3_ws

say() { echo "[queueB] $1 $(date +%H:%M:%S)"; }

# wait for part A's chip job (dataset300 or tiny720) to finish: only ONE
# TPU process may run at a time.  Read-only /proc scan; never kill by
# pattern.
other_chip_job() {
  for d in /proc/[0-9]*; do
    p=${d#/proc/}
    [ "$p" = "$$" ] && continue
    if tr '\0' ' ' < "$d/cmdline" 2>/dev/null | \
        grep -qE "exp_dataset300|exp_prvnet_r4"; then
      echo "$p"
      return 0
    fi
  done
  return 1
}
MISS=0
while [ "$MISS" -lt 3 ]; do
  if PRE=$(other_chip_job); then
    MISS=0
    sleep 60
  else
    MISS=$((MISS + 1))
    sleep 20
  fi
done
say "chip free, starting part B"

gate() {
  if [ -e /tmp/stop_queue_b ]; then
    say "stopped by /tmp/stop_queue_b before: $1"
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

# short label top-up BEFORE mode-7: grows the never-trained pool so the
# roster phase B freezes is ~2x the 14 objects currently labeled (budget
# is CUMULATIVE labeling minutes — 75 total ≈ 35 fresh minutes ≈ +13
# objects), then reassembles the dataset + roster
gate label-topup-short
run bash $W 600 $WS /tmp/label_topup.log -- \
  env PRV4_DEADLINE_MIN=75 python -u experiments/exp_dataset300.py --phase all

gate mode7-r4
run bash $W 600 $WS /tmp/mode7_r4.log -- \
  env PRV4_MODE7_DEADLINE_MIN=45 \
  python -u experiments/exp_mode7_r4.py

gate prvnet-atto-scaling
run bash $W 900 $ART /tmp/atto_scaling.log -- \
  python -u experiments/exp_prvnet_r4.py --phase atto

gate mode21-r4
run bash $W 600 $WS /tmp/mode21_r4.log -- \
  python -u experiments/exp_mode21_r4.py

gate label-topup
run bash $W 600 $WS /tmp/label_topup.log -- \
  env PRV4_DEADLINE_MIN=600 python -u experiments/exp_dataset300.py --phase all

say "all jobs done"
