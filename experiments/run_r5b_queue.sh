#!/bin/bash
# Round-5 SECOND queue — relaunched after diagnosing the tiny720 flatline
# (1 optimizer step/epoch through the tunnel-bound streaming loader; see
# prvnet/train.py device_data + HANDOFF.md).  Order = value density:
#
#   rm -f /tmp/stop_queue /tmp/stop_watchdog
#   nohup bash experiments/run_r5b_queue.sh > /tmp/r5b_queue.log 2>&1 &
#
#   1. exp_adam_lowp         (done: bf16+u8 = 1.76 ms but fails quality gate)
#   2. tiny720 two-stage     (resident trainer; pretrain 100 + regression 800)
#   2b. fresh atto@180       (scaling point AND fallback predictor)
#   3. mode-7 table          (best qualifying predictor via pick_predictor)
#   4. mode-21 table         (same predictor)
#   5. +2 h labels -> roster growth
#   6. mode-7 over the grown roster
#   7. knot calibration
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

# 2: the reference-config PRVNet (fresh dirs; auto-resume on restart)
if [ ! -f $ART/prvnet_tiny720.json ]; then
  gate prvnet-tiny720
  run bash $W 900 $ART /tmp/tiny720_train.log -- \
    python -u experiments/exp_prvnet_r4.py --phase tiny
fi

# 2b: fresh atto@180 on the current corpus — the dataset-scaling point AND
# the fallback predictor for the tables (r3 recipe: scaling-curve purity)
if [ ! -f $ART/prvnet_r5_scaling.json ]; then
  gate atto-scaling
  run bash $W 900 $ART /tmp/atto_scaling.log -- \
    env PRV4_ATTO_TAG=prvnet_r5 PRV4_PRETRAIN_BLR=1.5e-4 \
    PRV4_PRETRAIN_SCHEDULE=0 python -u experiments/exp_prvnet_r4.py \
    --phase atto --epochs 200
fi

# 2c: the reference ARCHITECTURE at the r3-proven input geometry —
# tiny@180 on the qcam dataset (see exp_pool_collapse.py: at 720 the
# global mean pool dilutes per-object signal below what 90-sample
# training escapes; at 180 the encoder family demonstrably
# discriminates).  Runs BEFORE the tables so rows never mix predictors.
if [ ! -f $ART/prvnet_tiny180.json ]; then
  gate tiny180
  run bash $W 900 $ART /tmp/tiny180_train.log -- \
    python -u experiments/exp_prvnet_r4.py --phase tiny180
fi

# 3: mode-7 rows with the best qualifying predictor (pick_predictor exits
# nonzero if none clears the corr/span floor — rows pin budgets forever,
# so no rows beats noise rows)
gate mode7
if eval "$(python experiments/pick_predictor.py)"; then
  run bash $W 600 $WS /tmp/mode7_r4.log -- \
    env PRV4_MODE7_DEADLINE_MIN=40 PRV4_CKPT=$PRV4_CKPT \
    PRV4_ARCH=$PRV4_ARCH PRV4_CROP=$PRV4_CROP \
    PRV4_GATE_ARTIFACT=$PRV4_GATE_ARTIFACT \
    python -u experiments/exp_mode7_r4.py
else
  say "mode7 SKIPPED: no qualifying predictor"
fi

# 4: mode-21 five-method table (same predictor)
gate mode21
if eval "$(python experiments/pick_predictor.py)"; then
  run bash $W 600 $WS /tmp/mode21_r4.log -- \
    env PRV4_CKPT=$PRV4_CKPT PRV4_ARCH=$PRV4_ARCH PRV4_CROP=$PRV4_CROP \
    PRV4_GATE_ARTIFACT=$PRV4_GATE_ARTIFACT \
    python -u experiments/exp_mode21_r4.py
else
  say "mode21 SKIPPED: no qualifying predictor"
fi

# 5: +2 h of labels -> phase B grows the roster with never-trained objects
gate label-growth
S=$(spent)
run bash $W 600 $WS /tmp/label_topup.log -- \
  env PRV4_DEADLINE_MIN=$((S + 75)) \
  python -u experiments/exp_dataset300.py --phase all

# 6: mode-7 again over the grown roster
gate mode7-grown
if eval "$(python experiments/pick_predictor.py)"; then
  run bash $W 600 $WS /tmp/mode7_r4.log -- \
    env PRV4_MODE7_DEADLINE_MIN=120 PRV4_CKPT=$PRV4_CKPT \
    PRV4_ARCH=$PRV4_ARCH PRV4_CROP=$PRV4_CROP \
    PRV4_GATE_ARTIFACT=$PRV4_GATE_ARTIFACT \
    python -u experiments/exp_mode7_r4.py
fi

# 7: second real textured mesh through the calibration path
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
