#!/bin/bash
# Round-4 SESSION-2 chip queue.  The previous session's background jobs died
# with the VM restart and /tmp (the old workspace) was wiped; the workspace
# now lives at .workspace/prv3_ws inside the repo so everything generated
# here survives into round 5.  Budgets are sized for a ~3 h session:
#
#   1. dataset300 phase R (regen legacy images) + phase A (25 min of new
#      labels) + phase B (assemble expanded dataset + hd sets)
#   2. PRVNet tiny@720 reference-config training (VERDICT #3)
#   3. atto@180 scaling point on the expanded train split (VERDICT #4)
#   4. mode-7 live-infer comparison over the frozen roster (VERDICT #5)
#   5. mode-21 five-method table, multi-object (VERDICT #6)
#   6. open-ended label top-up: banks objects for round 5 until the
#      session ends (incremental flush; the roster grows leakage-free via
#      ever_trained_new tracking in phase B)
#
#   nohup bash experiments/run_r4_session2.sh > /tmp/r4s2_queue.log 2>&1 &
#   echo $! > /tmp/r4s2_queue.pid
#
# Stop: touch /tmp/stop_queue (+ /tmp/stop_watchdog to kill the active job).
set -u
cd /root/repo
W=experiments/watchdog.sh
ART=experiments/artifacts
WS=.workspace/prv3_ws
mkdir -p "$WS"

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
  if ! "$@"; then
    say "FAILED: $STEP — aborting queue"
    exit 1
  fi
}

gate dataset300
PRV4_DEADLINE_MIN=25 run bash $W 600 $WS /tmp/dataset300.log -- \
  env PRV4_DEADLINE_MIN=25 python -u experiments/exp_dataset300.py --phase all

gate prvnet-tiny720
run bash $W 900 $ART /tmp/tiny720_train.log -- \
  python -u experiments/exp_prvnet_r4.py --phase tiny --epochs 100

gate prvnet-atto-scaling
run bash $W 900 $ART /tmp/atto_scaling.log -- \
  python -u experiments/exp_prvnet_r4.py --phase atto

gate mode7-r4
run bash $W 600 $WS /tmp/mode7_r4.log -- \
  env PRV4_MODE7_DEADLINE_MIN=45 \
  python -u experiments/exp_mode7_r4.py

gate mode21-r4
run bash $W 600 $WS /tmp/mode21_r4.log -- \
  python -u experiments/exp_mode21_r4.py

# open-ended: label more of the 10..19 roster until the session dies, then
# (if it ever finishes early) refresh phase B so round 5 starts assembled
gate label-topup
run bash $W 600 $WS /tmp/label_topup.log -- \
  env PRV4_DEADLINE_MIN=600 python -u experiments/exp_dataset300.py --phase all

say "all jobs done"
