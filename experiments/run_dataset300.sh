#!/bin/bash
# Auto-retry wrapper for the round-4 dataset job: the axon tunnel's remote
# compiler faults sporadically (HTTP 500 / truncated body); every stage of
# exp_dataset300.py is resume-guarded, so the cheapest recovery is relaunch.
cd "$(dirname "$0")/.."
for i in $(seq 1 30); do
  python -u experiments/exp_dataset300.py --phase all && break
  echo "=== RESTART $i ($(date +%H:%M:%S)) ===" >&2
  sleep 45
done
