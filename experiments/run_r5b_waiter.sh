#!/bin/bash
# Wait for the orphaned tiny720 job (watchdog 21220 / python lineage) to
# finish, then launch the updated r5b queue.  The queue's tiny720 gate
# skips when prvnet_tiny720.json exists, or resumes the checkpoint if the
# orphan died mid-run — either way no double-training.
set -u
cd /root/repo
busy() {
  for d in /proc/[0-9]*; do
    tr '\0' ' ' < "$d/cmdline" 2>/dev/null | grep -q "exp_prvnet_r4" && return 0
  done
  return 1
}
while busy; do sleep 60; done
echo "[waiter] tiny720 lineage done $(date +%H:%M:%S)"
exec bash experiments/run_r5b_queue.sh
