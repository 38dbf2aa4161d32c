#!/bin/bash
# Round-5 session-2 queue (workspace-missing contingency).
#
# The persistent workspace (.workspace/prv3_ws) did NOT survive into this
# VM image, so phase B / roster growth / mode-7 extension are out of reach
# (phase B would re-render hd sets for ~117 train objects, ~43 min, before
# doing anything useful).  What IS reachable with a self-contained cost:
#
#   1. wait for the knot calibration (launched separately, chip job)
#   2. phase-A label growth: each new object is generated from scratch
#      (families.make_family_object -> coverage -> NeRF sweep -> fit),
#      no legacy assets needed; budget is cumulative-minutes (+LABEL_MIN)
#
# session_tail.sh (armed separately) stops everything at its epoch and
# runs one clean idle-chip bench so BENCH_r05 is uncontended.
#
#   nohup bash experiments/run_r5c_queue.sh > /tmp/r5c_queue.log 2>&1 &
set -u
cd /root/repo
W=experiments/watchdog.sh
ART=experiments/artifacts
LABEL_MIN=${LABEL_MIN:-18}

say() { echo "[r5c] $1 $(date +%H:%M:%S)"; }

# 1: wait for the knot calibration to finish (artifact or process gone)
while [ ! -f $ART/real_object_calibration_knot.json ]; do
  [ -e /tmp/stop_queue ] && { say "stopped waiting for knot"; exit 0; }
  if ! ls /proc/[0-9]*/cmdline 2>/dev/null | while read -r c; do
       tr '\0' ' ' < "$c" 2>/dev/null; echo; done | grep -q exp_real_object; then
    say "knot process gone without artifact — moving on"
    break
  fi
  sleep 20
done
say "knot stage over"

[ -e /tmp/stop_queue ] && { say "stopped before labels"; exit 0; }

# 2: bounded phase-A label growth (cumulative-minutes budget)
S=$(python - <<'EOF'
import json
try:
    d = json.load(open("experiments/artifacts/dataset300_labels.json"))
    print(int(sum(d.get("seconds_per_object", {}).values()) / 60))
except Exception:
    print(0)
EOF
)
say "labels: cumulative spend ${S} min, budget +${LABEL_MIN}"
bash $W 600 $ART /tmp/label_topup.log -- \
  env PRV4_DEADLINE_MIN=$((S + LABEL_MIN)) \
  python -u experiments/exp_dataset300.py --phase a \
  || say "label phase failed"

say "all jobs done"
