#!/usr/bin/env python3
"""PVBPretrain on the real chip-generated dataset + encoder handoff.

Runs the reference's two-stage recipe on the dataset exp_prvnet_real.py
generated: (1) single-view PVBPretrain over every coverage view
(≙ --pre_train), (2) PVBNet regression initialized from the pretrained
encoder (≙ --premodel_file), versus the from-scratch run recorded in
prvnet_training.json.  Appends results to
experiments/artifacts/prvnet_pretrain.json.

  nohup python -u experiments/exp_pretrain_real.py > /tmp/exp_pre.log 2>&1 &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DS = "/tmp/prvnet_ws/ws/pvb_dataset"
ARCH = "convnextv2_atto"
CROP = 180


def main():
    from nerf_prv_tpu.prvnet import TrainConfig, pretrain, train_regression
    from nerf_prv_tpu.prvnet.model import IMG_PATTERN

    art_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")
    cfg = TrainConfig(arch=ARCH, batch_size=8, epochs=3, image_size=CROP)
    ck_pre = os.path.join(art_dir, "prvnet_pretrain_ckpt")
    t0 = time.perf_counter()
    _, best_pre = pretrain(
        DS, os.path.join(DS, "train_split.txt"), os.path.join(DS, "val_split.txt"),
        cfg=cfg, checkpoint_dir=ck_pre, log_every=1,
    )
    t_pre = time.perf_counter() - t0

    reg_cfg = TrainConfig(arch=ARCH, batch_size=8, epochs=15, image_size=CROP)
    t0 = time.perf_counter()
    _, best_reg = train_regression(
        DS, os.path.join(DS, "train_split.txt"), os.path.join(DS, "val_split.txt"),
        cfg=reg_cfg, pattern=IMG_PATTERN[4],
        checkpoint_dir="/tmp/prvnet_from_pretrain_ckpt", log_every=1,
        premodel_file=os.path.join(ck_pre, "best_pretrain_checkpoint.msgpack"),
    )
    t_reg = time.perf_counter() - t0
    artifact = {
        "pretrain_epochs": cfg.epochs,
        "pretrain_seconds": round(t_pre, 1),
        "pretrain_best_val_l1": round(best_pre["l1_mean"], 3),
        "regression_from_pretrain_epochs": reg_cfg.epochs,
        "regression_seconds": round(t_reg, 1),
        "regression_best_val_l1": round(best_reg["l1_mean"], 3),
        "regression_best_val_accuracy": round(best_reg["accuracy"], 3),
    }
    with open(os.path.join(art_dir, "prvnet_pretrain.json"), "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact), flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
