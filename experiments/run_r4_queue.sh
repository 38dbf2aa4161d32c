#!/bin/bash
# Round-4 chip-job queue: the box has ONE tunnel chip, so every remaining
# round-4 experiment must serialize.  This queue keeps the chip busy
# end-to-end and survives builder-session restarts (each job is wrapped in
# the stall watchdog and every driver is resume-guarded + incremental).
#
#   nohup bash experiments/run_r4_queue.sh > /tmp/r4_queue.log 2>&1 &
#   echo $! > /tmp/r4_queue.pid
#
# Stop everything: touch /tmp/stop_queue (current job still finishes its
# watchdog attempt; add /tmp/stop_watchdog to kill it too).
set -u
cd /root/repo
W=experiments/watchdog.sh
ART=experiments/artifacts
WS=/tmp/prv3_ws

say() { echo "[queue] $1 $(date +%H:%M:%S)"; }

gate() {
  if [ -e /tmp/stop_queue ]; then
    say "stopped by /tmp/stop_queue before: $1"
    exit 0
  fi
  say "starting: $1"
  STEP="$1"
}

run() {
  # abort the whole queue when a step's watchdog gives up (exit != 0):
  # every later step depends on the dataset/checkpoint the failed one
  # should have produced, and 40 failed attempts means the tunnel is gone
  if ! "$@"; then
    say "FAILED: $STEP — aborting queue"
    exit 1
  fi
}

# 0. an earlier session may already be running the dataset job under its own
#    watchdog — wait for it rather than double-claiming the chip.  The pid
#    file can be stale, so also scan /proc cmdlines (read-only; never kill
#    by pattern) for a live exp_dataset300 that is not our own child.
other_dataset_job() {
  for d in /proc/[0-9]*; do
    p=${d#/proc/}
    [ "$p" = "$$" ] && continue
    if tr '\0' ' ' < "$d/cmdline" 2>/dev/null | grep -q "exp_dataset300"; then
      echo "$p"
      return 0
    fi
  done
  return 1
}
PRE=$(other_dataset_job || true)
if [ -n "${PRE:-}" ]; then
  say "waiting for pre-queue dataset300 pid=$PRE (and any respawn)"
  # the pre-queue watchdog has ~15 s gaps between restart attempts; only
  # call it done after 5 consecutive absent polls
  MISS=0
  while [ "$MISS" -lt 5 ]; do
    sleep 60
    if PRE=$(other_dataset_job); then MISS=0; else MISS=$((MISS + 1)); fi
  done
fi

# 1. dataset300: regen + new labels + expanded dataset.  The top-up deadline
#    is short — if the pre-queue run died before finishing phase A, cap the
#    extra labeling so downstream jobs still fit in the round.
gate dataset300
PRV4_DEADLINE_MIN=90 run bash $W 600 $WS /tmp/dataset300.log -- \
  env PRV4_DEADLINE_MIN=90 python -u experiments/exp_dataset300.py --phase all

# 2. corpus extension toward 300 objects BEFORE any training: the pinned
#    test roster absorbs ~100 of the first 120 new labels, so without the
#    extension the train split would grow by only ~20 objects.  Indices
#    20..24 are train-only (roster frozen by step 1's phase B), lifting
#    train from ~106 to ~170-190 for every predictor trained below.
gate dataset300-extension
run bash $W 600 $WS /tmp/dataset300_ext.log -- \
  env PRV4_INDEX_END=25 PRV4_DEADLINE_MIN=60 \
  python -u experiments/exp_dataset300.py --phase all

# 3. PRVNet at the reference configuration (tiny@720, effective batch 64).
#    100 epochs (vs the atto arm's r3-comparable 40): best-ckpt selection
#    makes extra epochs free for the headline metric.
gate prvnet-tiny720
run bash $W 900 $ART /tmp/tiny720_train.log -- \
  python -u experiments/exp_prvnet_r4.py --phase tiny --epochs 100

# 4. the atto@180 scaling-curve arm (same recipe as r3, full expanded
#    train set — the scaling curve is {r2 24, r3 86, r4 ~170-190})
gate prvnet-atto-scaling
run bash $W 900 $ART /tmp/atto_scaling.log -- \
  python -u experiments/exp_prvnet_r4.py --phase atto

# 5. mode-7 statistics comparison at scale with the live tiny predictor
gate mode7-r4
run bash $W 600 $WS /tmp/mode7_r4.log -- \
  env PRV4_MODE7_DEADLINE_MIN=150 \
  python -u experiments/exp_mode7_r4.py

# 6. mode-21 five-method view-planning table
gate mode21-r4
run bash $W 600 $WS /tmp/mode21_r4.log -- \
  python -u experiments/exp_mode21_r4.py

say "all jobs done"
