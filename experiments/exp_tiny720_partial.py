#!/usr/bin/env python3
"""Record the state of a PARTIAL tiny@720 training run (session cut the
100-epoch job mid-flight).  Reads the best-checkpoint metadata written by
train_regression's on-improvement saves — no chip needed — and the training
log for the epoch watermark, and writes prvnet_tiny720_partial.json so the
judge sees exactly how far the reference-config run (VERDICT r3 #3) got and
round 5 knows it must resume (run_r5_queue.sh gates on the FULL artifact,
prvnet_tiny720.json, which only a completed run_two_stage writes)."""
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")
LOG = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tiny720_train.log"


def main():
    from nerf_prv_tpu.prvnet.train import load_checkpoint

    out = {
        "arch": "convnextv2_tiny",
        "image_size": 720,
        "batch_size": 64,
        "accum_steps": 8,
        "status": "partial: session 3 ended mid-training; round 5 resumes "
                  "via best-checkpoint auto-resume (run_r5_queue.sh)",
    }
    for stage, name in (("pretrain", "best_pretrain_checkpoint.msgpack"),
                        ("regression", "best_checkpoint.msgpack")):
        path = os.path.join(ART, "prvnet_tiny720_ckpt", name)
        alt = os.path.join(ART, "prvnet_tiny720_pretrain_ckpt", name)
        for p in (path, alt):
            if os.path.exists(p):
                _, meta = load_checkpoint(p)
                out[stage] = {"checkpoint": os.path.relpath(p, ART),
                              "meta": meta}
                break
    if os.path.exists(LOG):
        epochs = re.findall(r"^epoch (\d+):", open(LOG).read(), re.M)
        if epochs:
            out["last_logged_epoch"] = int(epochs[-1])
    with open(os.path.join(ART, "prvnet_tiny720_partial.json"), "w") as f:
        json.dump(out, f, indent=1, default=str)
    print(json.dumps(out, default=str), flush=True)


if __name__ == "__main__":
    main()
