#!/usr/bin/env python3
"""Measure PRVNet at the REFERENCE configuration on the real chip.

VERDICT r2 item 4: the reference trains ConvNeXtV2-tiny at CenterCrop(720),
batch 64, pattern [0,1,2,3,4] (≙ train_regression.py:258-260,497-500); the
repo's real training runs used atto@180.  This measures the tiny@720
training step on the v5e — trying batch 64 first and halving until it fits
in HBM — and projects the epoch wall for the reference's ~3000-object
dataset (≙ main.cpp:2496) and for the repo's 120-object round-3 dataset.

Synthetic image batches: the measurement is compute+memory rate, not
convergence.  Timing discipline per PERF.md: readback of a scalar (the
loss) is the synchronization point; first step is compile, steady state is
the median of the next 4.

  nohup python -u experiments/exp_tiny720.py > /tmp/tiny720.log 2>&1 &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")
N_VIEWS = 5  # IMG_PATTERN[4]
CROP = 720


def measure(batch_size: int) -> dict:
    import jax
    import jax.numpy as jnp

    from nerf_prv_tpu.parallel.mesh import make_mesh
    from nerf_prv_tpu.prvnet.train import (
        TrainConfig, init_model, make_optimizer, make_train_step,
    )

    cfg = TrainConfig(arch="convnextv2_tiny", batch_size=batch_size,
                      image_size=CROP)
    mesh = make_mesh()
    model, params = init_model(cfg, N_VIEWS)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    optimizer = make_optimizer(cfg, params)
    opt_state = optimizer.init(params)
    step = make_train_step(model, cfg, optimizer, mesh)

    rng = np.random.default_rng(0)
    views = jnp.asarray(
        rng.uniform(0, 1, (batch_size, N_VIEWS, CROP, CROP, 3)), jnp.float32)
    labels = jnp.asarray(rng.uniform(13, 58, (batch_size,)), jnp.float32)

    t0 = time.perf_counter()
    params, opt_state, loss = step(params, opt_state, views, labels)
    float(loss)  # sync through the tunnel (block_until_ready lies, PERF.md)
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        params, opt_state, loss = step(params, opt_state, views, labels)
        float(loss)
        times.append(time.perf_counter() - t0)
    step_s = float(np.median(times))
    return {
        "batch_size": batch_size,
        "n_params_m": round(n_params / 1e6, 1),
        "compile_seconds": round(compile_s, 1),
        "step_seconds": round(step_s, 3),
        "images_per_second": round(batch_size * N_VIEWS / step_s, 1),
        "objects_per_second": round(batch_size / step_s, 2),
    }


def main():
    result = {"arch": "convnextv2_tiny", "image_size": CROP, "n_views": N_VIEWS,
              "attempts": []}
    got = None
    for bs in (64, 32, 16, 8, 4):
        try:
            print(f"trying batch {bs}...", flush=True)
            got = measure(bs)
            print(json.dumps(got), flush=True)
            result["attempts"].append(got)
            break
        except Exception as e:  # OOM -> halve
            msg = str(e).splitlines()[0][:200]
            print(f"batch {bs} failed: {msg}", flush=True)
            result["attempts"].append({"batch_size": bs, "error": msg})
    if got:
        # epoch walls at the measured rate (grad-accum covers batch 64 if a
        # smaller micro-batch was the largest that fit)
        result["epoch_seconds_3000_objects"] = round(3000 / got["objects_per_second"], 1)
        result["epoch_seconds_120_objects"] = round(120 / got["objects_per_second"], 1)
    with open(os.path.join(ART, "tiny720.json"), "w") as f:
        json.dump(result, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
