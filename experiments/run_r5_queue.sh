#!/bin/bash
# Round-5 chip queue — launch FIRST THING next session:
#
#   rm -f /tmp/stop_queue /tmp/stop_watchdog
#   nohup bash experiments/run_r5_queue.sh > /tmp/r5_queue.log 2>&1 &
#
# Self-contained continuation of the round-4 measurement program
# (HANDOFF.md).  Every job is resume-guarded: whatever round 4 finished is
# fast-skipped, whatever it missed runs here.  Order = value density:
#
#   0. regen/assemble whatever the persistent workspace is missing
#   1. tiny720 checkpoint if round 4 didn't train one (mode-7/21 need it)
#   2. mode-7 rows for any unconsumed roster objects (cheap if none)
#   3. mode-21 five-method table to >=5 objects
#   4. +2 h of labels -> phase B grows roster toward 100 & train split
#   5. mode-7 again over the grown roster (the ">=100 objects" deliverable)
#   6. fresh atto + tiny720 scaling points on the larger corpus
#   7. open-ended labels until the session dies
#
# Stop: touch /tmp/stop_queue (+ /tmp/stop_watchdog for the active job).
set -u
cd /root/repo
W=experiments/watchdog.sh
ART=experiments/artifacts
WS=.workspace/prv3_ws
mkdir -p "$WS"

say() { echo "[r5] $1 $(date +%H:%M:%S)"; }
gate() {
  [ -e /tmp/stop_queue ] && { say "stopped before: $1"; exit 0; }
  say "starting: $1"; STEP="$1"
}
run() { "$@" || { say "FAILED: $STEP — aborting"; exit 1; }; }

# cumulative labeling minutes already invested (see HANDOFF.md)
spent() {
  python - <<'EOF'
import json
try:
    d = json.load(open("experiments/artifacts/dataset300_labels.json"))
    print(int(sum(d.get("seconds_per_object", {}).values()) / 60))
except Exception:
    print(0)
EOF
}

# 0+1: dataset state + (if missing) the tiny@720 reference-config ckpt
gate dataset-sync
S=$(spent)
run bash $W 600 $WS /tmp/dataset300.log -- \
  env PRV4_DEADLINE_MIN=$S python -u experiments/exp_dataset300.py --phase all

# Gate on the artifact JSON, not the checkpoint: session 3 ran out of
# round mid-training, leaving a best_checkpoint.msgpack from a PARTIAL run
# (~epoch 30 of 100).  run_two_stage writes the JSON only on completion,
# and train_regression auto-resumes from the best checkpoint, so re-running
# here CONTINUES the session-3 weights rather than retraining from scratch.
# Cost reality (session 3, 127-object corpus): ~17 min warm-up (hd decode +
# 2x140 s compile) + ~2 min/epoch including the every-2-epoch val pass.
if [ ! -f $ART/prvnet_tiny720.json ]; then
  gate prvnet-tiny720
  run bash $W 900 $ART /tmp/tiny720_train.log -- \
    python -u experiments/exp_prvnet_r4.py --phase tiny --epochs 40
fi

gate mode7-catchup
run bash $W 600 $WS /tmp/mode7_r4.log -- \
  env PRV4_MODE7_DEADLINE_MIN=40 python -u experiments/exp_mode7_r4.py

gate mode21-r4
run bash $W 600 $WS /tmp/mode21_r4.log -- \
  python -u experiments/exp_mode21_r4.py

gate label-growth
S=$(spent)
run bash $W 600 $WS /tmp/label_topup.log -- \
  env PRV4_DEADLINE_MIN=$((S + 120)) \
  python -u experiments/exp_dataset300.py --phase all

gate mode7-grown-roster
run bash $W 600 $WS /tmp/mode7_r4.log -- \
  env PRV4_MODE7_DEADLINE_MIN=150 python -u experiments/exp_mode7_r4.py

gate atto-scaling
run bash $W 900 $ART /tmp/atto_scaling.log -- \
  env PRV4_ATTO_TAG=prvnet_r5 python -u experiments/exp_prvnet_r4.py \
  --phase atto

# fresh tiny720 point on the larger corpus (independent ckpt dir)
gate tiny720-rescale
run bash $W 900 $ART /tmp/tiny720_rescale.log -- \
  env PRV4_TINY_TAG=prvnet_tiny720_rescale PRV4_ATTO_TAG=prvnet_r5 \
  python -u experiments/exp_prvnet_r4.py --phase tiny --epochs 100

gate label-openended
S=$(spent)
run bash $W 600 $WS /tmp/label_topup.log -- \
  env PRV4_DEADLINE_MIN=$((S + 600)) \
  python -u experiments/exp_dataset300.py --phase all

say "all jobs done"
