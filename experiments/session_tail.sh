#!/bin/bash
# End-of-session tail: at <stop_epoch> (arg 1, unix seconds) stop every
# queued chip job, wait for the chip to free, then run ONE clean bench.py
# so the round's recorded throughput is measured on an idle chip.  The
# driver's own end-of-round bench then also finds the chip idle.
#
#   nohup bash experiments/session_tail.sh <stop_epoch> > /tmp/session_tail.log 2>&1 &
set -u
STOP_AT=$1
cd /root/repo

say() { echo "[tail] $1 $(date +%H:%M:%S)"; }

NOW=$(date +%s)
if [ "$STOP_AT" -gt "$NOW" ]; then
  say "sleeping $((STOP_AT - NOW))s until stop time"
  sleep $((STOP_AT - NOW))
fi

say "setting stop flags"
touch /tmp/stop_queue /tmp/stop_queue_b /tmp/stop_watchdog

chip_busy() {
  for d in /proc/[0-9]*; do
    p=${d#/proc/}
    [ "$p" = "$$" ] && continue
    if tr '\0' ' ' < "$d/cmdline" 2>/dev/null | \
        grep -qE "exp_dataset300|exp_prvnet_r4|exp_mode7_r4|exp_mode21_r4|exp_real_object"; then
      return 0
    fi
  done
  return 1
}

for i in $(seq 1 40); do
  chip_busy || break
  say "chip still busy ($i)"
  sleep 15
done
say "chip free; waiting 60s for the tunnel claim to release"
sleep 60

say "running bench.py"
if timeout 900 python bench.py > /tmp/bench_tail.json 2> /tmp/bench_tail.err; then
  # keep only the final JSON line as the artifact
  tail -1 /tmp/bench_tail.json > BENCH_local.json
  say "bench done: $(cat BENCH_local.json)"
else
  say "bench FAILED (see /tmp/bench_tail.err)"
fi
say "tail complete"
