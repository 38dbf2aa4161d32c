#!/usr/bin/env python3
"""Real-chip dp=1 overhead of the batched multi-object train path.

VERDICT r2 item 7: the multi-chip aggregate claim ("linear over ICI")
rests on each device running ONE object through nerf/batch_train.py's
vmapped+sharded step at ~the plain-jit rate.  PERF.md already measured
that K>1 per chip collapses the gather lowering (7-24 M rows/s); this
measures the K=1 boundary case directly on the real chip:

  A. plain jit train_chunk            (the serial production path)
  B. _train_chunk_batched, K=1, on a 1-device Mesh with the object axis
     device_put to the dp sharding    (exactly what each device of a pod
     slice executes under the batched path)

The B/A ms-per-step ratio is the measured per-device overhead bound for
the extrapolated multi-chip rate.  Same scene, same step count, identical
timing discipline as bench.py (scan-amortized, scalar-readback sync).

  nohup python -u experiments/exp_dp1_overhead.py > /tmp/dp1.log 2>&1 &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")
STEPS = 500


def main():
    import jax
    import jax.numpy as jnp

    from bench import _scene
    from nerf_prv_tpu.core.config import CameraConfig
    from nerf_prv_tpu.nerf import NerfConfig, init_params
    from nerf_prv_tpu.nerf.batch_train import _train_chunk_batched
    from nerf_prv_tpu.nerf.rays import load_dataset
    from nerf_prv_tpu.nerf.train import build_hit_pool, make_optimizer, train_chunk
    from nerf_prv_tpu.parallel.mesh import batch_sharding, make_mesh

    cfg = NerfConfig()
    camera = CameraConfig()
    train_js, _ = _scene(camera)
    ds = load_dataset(train_js, with_images=True)
    pixels = jnp.asarray(
        np.clip(np.asarray(ds.pixels) * 255.0 + 0.5, 0, 255).astype(np.uint8))
    rot = jnp.asarray(ds.rotations, jnp.float32)
    org = jnp.asarray(ds.origins, jnp.float32)
    pool, pool_n = build_hit_pool(rot, org, camera)

    def sync(x):
        return float(np.asarray(jnp.sum(x)))

    # ---- A: plain jit -----------------------------------------------------
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt_state = make_optimizer(cfg).init(params)

    def run_plain(seed):
        nonlocal params, opt_state
        t0 = time.perf_counter()
        params, opt_state, losses = train_chunk(
            params, opt_state, jax.random.PRNGKey(seed), pixels, rot, org,
            camera, cfg, STEPS, None, pool, pool_n)
        sync(losses)
        return time.perf_counter() - t0

    run_plain(1)  # compile
    t_plain = min(run_plain(s) for s in (2, 3))

    # ---- B: batched K=1 on a 1-device mesh --------------------------------
    mesh = make_mesh()  # 1 real device
    sh = batch_sharding(mesh)
    kp = jax.vmap(lambda kk: init_params(kk, cfg))(
        jax.random.split(jax.random.PRNGKey(7), 1))
    ks = jax.vmap(make_optimizer(cfg).init)(kp)
    kp = jax.tree.map(lambda x: jax.device_put(x, sh), kp)
    ks = jax.tree.map(lambda x: jax.device_put(x, sh), ks)
    bpix = jax.device_put(pixels[None], sh)
    brot = jax.device_put(rot[None], sh)
    borg = jax.device_put(org[None], sh)
    bnf = jax.device_put(jnp.full((1,), ds.n_frames, jnp.int32), sh)
    bpool = jax.device_put(pool[None], sh)
    bpool_n = jax.device_put(jnp.asarray([pool_n], jnp.int32), sh)

    def run_batched(seed):
        nonlocal kp, ks
        t0 = time.perf_counter()
        kp, ks, bl = _train_chunk_batched(
            kp, ks, jax.random.PRNGKey(seed), bpix, brot, borg, bnf, camera,
            cfg, STEPS, bpool, bpool_n)
        sync(bl)
        return time.perf_counter() - t0

    run_batched(8)  # compile
    t_b = min(run_batched(s) for s in (9, 10))

    out = {
        "steps": STEPS,
        "plain_ms_per_step": round(t_plain / STEPS * 1e3, 3),
        "dp1_batched_ms_per_step": round(t_b / STEPS * 1e3, 3),
        "dp1_overhead_ratio": round(t_b / t_plain, 4),
        "device": str(jax.devices()[0]),
    }
    with open(os.path.join(ART, "dp1_overhead.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
