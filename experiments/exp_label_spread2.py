#!/usr/bin/env python3
"""Pilot 2: measure the two tail-anchor families added after pilot 1.

Pilot 1 landed all 17 objects in [21, 35] (10 distinct labels); VERDICT r2
item 1 wants >=20 distinct values inside [13, 58].  This runs the two new
families at their hardness extremes through the same label protocol:

- nos (noise colors)  -> expected LOW tail (ceiling reached immediately)
- fan (dense twisted vanes) -> expected HIGH tail (van h=1 scored 34,
  the strongest upward lever measured in pilot 1)

Shares /tmp/prv3_ws so every fit computed here is reused verbatim by
exp_dataset100.py through the pipeline's idempotence guards.

  nohup python -u experiments/exp_label_spread2.py > /tmp/pilot2.log 2>&1 &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from exp_label_spread import pipeline_config, run_label_protocol

PILOT2 = ["nos0", "nos7", "fan0", "fan7"]


def main():
    cfg = pipeline_config()
    t0 = time.perf_counter()
    out, times = run_label_protocol(cfg, PILOT2)
    artifact = {
        "objects": {k: {"label": v[0], "converged": v[1]} for k, v in out.items()},
        "seconds_per_object": times,
        "total_seconds": round(time.perf_counter() - t0, 1),
        "distinct_labels": sorted({v[0] for v in out.values() if v[0] > 0}),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "artifacts", "label_spread_pilot2.json")
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact), flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
