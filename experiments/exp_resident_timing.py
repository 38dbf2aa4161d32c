#!/usr/bin/env python3
"""Break down the device-resident PRVNet epoch on the real chip.

The r5 probe (tiny720_probe.json) showed ~60-130 s/regression-epoch net of
compile — far above the ~2-5 s compute estimate for 8 micro-steps of 40
720px images.  Time each phase separately so the dominant term is a
measurement, not a guess: decode, upload, compile, steady epoch dispatch
(x5), resident val, checkpoint save.

  nohup python -u experiments/exp_resident_timing.py > /tmp/resident_timing.log 2>&1 &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")
ROOT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".workspace", "prv3_ws")


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from nerf_prv_tpu.parallel.mesh import make_mesh, replicated
    from nerf_prv_tpu.prvnet.data import PVBDataset, resident_arrays
    from nerf_prv_tpu.prvnet.model import IMG_PATTERN
    from nerf_prv_tpu.prvnet.train import (
        TrainConfig, init_model, make_optimizer, make_resident_epoch,
        make_resident_predict, _resident_epoch_indices, _resident_metrics,
        save_checkpoint,
    )

    out = {}
    ds_root = os.path.join(ROOT, "ws", "pvb_dataset_hd")
    cfg = TrainConfig(arch="convnextv2_tiny", batch_size=64, accum_steps=8,
                      image_size=720, epochs=8)
    mesh = make_mesh()
    train_ds = PVBDataset(ds_root, os.path.join(ds_root, "train_split.txt"),
                          IMG_PATTERN[4], crop=720)
    val_ds = PVBDataset(ds_root, os.path.join(ds_root, "val_split.txt"),
                        IMG_PATTERN[4], crop=720)

    t0 = time.perf_counter()
    t_imgs_np, t_labels_np = resident_arrays(train_ds)
    out["decode_train_s"] = round(time.perf_counter() - t0, 1)
    out["train_mb"] = round(t_imgs_np.nbytes / 2**20, 1)

    rep = replicated(mesh)
    t0 = time.perf_counter()
    t_imgs = jax.device_put(t_imgs_np, rep)
    t_labels = jax.device_put(t_labels_np, rep)
    jax.block_until_ready(t_imgs)
    _ = float(np.asarray(jnp.sum(t_labels)))  # tunnel-safe sync
    out["upload_train_s"] = round(time.perf_counter() - t0, 1)

    model, params = init_model(cfg, 5)
    optimizer = make_optimizer(cfg, params, 1)
    optimizer = optax.MultiSteps(optimizer, every_k_schedule=cfg.accum_steps)
    opt_state = optimizer.init(params)
    epoch_fn = make_resident_epoch(model, cfg, optimizer, mesh)
    predict_idx = make_resident_predict(model, cfg, mesh)

    rng = np.random.default_rng(0)

    def one_epoch():
        nonlocal params, opt_state
        t0 = time.perf_counter()
        for grp in _resident_epoch_indices(len(train_ds), cfg, rng):
            params, opt_state, l = epoch_fn(
                params, opt_state, t_imgs, t_labels,
                jnp.asarray(grp, jnp.int32))
        _ = float(np.asarray(jnp.sum(l)))
        return time.perf_counter() - t0

    out["epoch_compile_s"] = round(one_epoch(), 1)
    out["epoch_steady_s"] = [round(one_epoch(), 2) for _ in range(5)]
    print(json.dumps(out), flush=True)

    # resident val
    t0 = time.perf_counter()
    v_imgs_np, v_labels_np = resident_arrays(val_ds)
    out["decode_val_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    v_imgs = jax.device_put(v_imgs_np, rep)
    jax.block_until_ready(v_imgs)
    out["upload_val_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    m = _resident_metrics(predict_idx, params, v_imgs, v_labels_np,
                          cfg.micro_batch)
    out["val_compile_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    m = _resident_metrics(predict_idx, params, v_imgs, v_labels_np,
                          cfg.micro_batch)
    out["val_steady_s"] = round(time.perf_counter() - t0, 2)
    out["val_l1"] = round(m["l1_mean"], 3)

    t0 = time.perf_counter()
    save_checkpoint("/tmp/resident_timing_ckpt.msgpack", params, {})
    out["ckpt_save_s"] = round(time.perf_counter() - t0, 1)

    with open(os.path.join(ART, "resident_timing.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
