#!/bin/bash
# Round-5 SECOND queue — the first r5 queue was stopped deliberately after
# diagnosing why tiny720 never converged (1 optimizer step/epoch through
# the tunnel-bound streaming loader; see prvnet/train.py device_data).
# This queue re-runs the program with the device-resident trainer and the
# reference's actual 800-epoch protocol, highest value first:
#
#   rm -f /tmp/stop_queue /tmp/stop_watchdog
#   nohup bash experiments/run_r5b_queue.sh > /tmp/r5b_queue.log 2>&1 &
#
#   1. exp_adam_lowp         (quick; a clean gate raises the official bench)
#   2. tiny720 two-stage     (FRESH ckpt dirs; pretrain 100 + regression 800)
#   3. mode-7 table          (predictor-gated: no rows from a flat ckpt)
#   4. mode-21 table         (predictor-gated)
#   5. +2 h labels -> roster growth
#   6. mode-7 over the grown roster
#   7. atto + knot calibration
#   8. open-ended labels until stopped
#
# Stop: touch /tmp/stop_queue (+ /tmp/stop_watchdog for the active job).
set -u
cd /root/repo
W=experiments/watchdog.sh
ART=experiments/artifacts
WS=.workspace/prv3_ws
mkdir -p "$WS"

say() { echo "[r5b] $1 $(date +%H:%M:%S)"; }
gate() {
  [ -e /tmp/stop_queue ] && { say "stopped before: $1"; exit 0; }
  say "starting: $1"; STEP="$1"
}
run() { "$@" || { say "FAILED: $STEP — continuing to next gate"; return 1; }; }

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

# 1: bf16-moment Adam + unroll 8 (speed, then 6-seed quality gate)
if [ ! -f $ART/adam_lowp.json ] || ! grep -q '"decision"' $ART/adam_lowp.json; then
  gate adam-lowp
  run bash $W 600 $ART /tmp/adam_lowp.log -- \
    python -u experiments/exp_adam_lowp.py
fi

# 2: the reference-config PRVNet, fresh dirs (the r4 partials were moved
# aside by the builder; auto-resume continues THIS run on watchdog restart)
if [ ! -f $ART/prvnet_tiny720.json ]; then
  gate prvnet-tiny720
  run bash $W 900 $ART /tmp/tiny720_train.log -- \
    python -u experiments/exp_prvnet_r4.py --phase tiny
fi

# 3: mode-7 rows (exp_mode7_r4 exits via predictor_gate if the ckpt is
# degenerate — rows pin budgets forever, so no rows beats noise rows)
gate mode7
run bash $W 600 $WS /tmp/mode7_r4.log -- \
  env PRV4_MODE7_DEADLINE_MIN=40 python -u experiments/exp_mode7_r4.py

# 4: mode-21 five-method table (same gate)
gate mode21
run bash $W 600 $WS /tmp/mode21_r4.log -- \
  python -u experiments/exp_mode21_r4.py

# 5: +2 h of labels -> phase B grows the roster with never-trained objects
gate label-growth
S=$(spent)
run bash $W 600 $WS /tmp/label_topup.log -- \
  env PRV4_DEADLINE_MIN=$((S + 120)) \
  python -u experiments/exp_dataset300.py --phase all

# 6: mode-7 again over the grown roster
gate mode7-grown
run bash $W 600 $WS /tmp/mode7_r4.log -- \
  env PRV4_MODE7_DEADLINE_MIN=120 python -u experiments/exp_mode7_r4.py

# 7a: fresh atto scaling point on the expanded corpus
gate atto-scaling
run bash $W 900 $ART /tmp/atto_scaling.log -- \
  env PRV4_ATTO_TAG=prvnet_r5 PRV4_PRETRAIN_BLR=1.5e-4 \
  PRV4_PRETRAIN_SCHEDULE=0 python -u experiments/exp_prvnet_r4.py \
  --phase atto --epochs 200  # r3-recipe pretrain: scaling-curve purity

# 7b: second real textured mesh through the calibration path
if [ ! -f $ART/real_object_calibration_knot.json ]; then
  gate real-object-knot
  run bash $W 600 $ART /tmp/exp_real_knot.log -- \
    python -u experiments/exp_real_object.py --object knot
fi

# 8: open-ended labels until the session dies / tail stops us
gate label-openended
S=$(spent)
run bash $W 600 $WS /tmp/label_topup.log -- \
  env PRV4_DEADLINE_MIN=$((S + 600)) \
  python -u experiments/exp_dataset300.py --phase all

say "all jobs done"
