#!/usr/bin/env python3
"""Why is K-object batched training slower than K serial trains?

BENCH r2 first cut measured batched_train_speedup = 0.71 at K=4 — worse
than serial.  Hypothesis: the vmapped grid gather/scatter tables grow to
K x 8 MB (bf16 view) / K x 16 MB (f32 scatter), crossing the v5e
fast-gather working-set cliff (~16-30 MB: 250 -> 70-95 M rows/s,
experiments/exp_vmem_gather.py).

Measures, on the real chip:
  1. batched train step time at K = 1, 2, 4 (same cfg as bench)
  2. isolated vmapped row gather at K x (64000, 64) f32 / bf16-view tables
  3. isolated vmapped scatter-add at the same shapes
  4. single-object bigger-step variants: 4096/8192/16384 rays per step
     (protocol holds total rays fixed, so step count scales down)

Run detached:
  nohup python -u experiments/exp_batched_train.py > /tmp/exp_batched.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from nerf_prv_tpu.core.config import CameraConfig
    from nerf_prv_tpu.nerf import NerfConfig, init_params
    from nerf_prv_tpu.nerf.batch_train import _train_chunk_batched
    from nerf_prv_tpu.nerf.train import make_optimizer, train_chunk

    cfg = NerfConfig()
    camera = CameraConfig()
    rng = np.random.default_rng(0)

    n_frames, h, w = 16, camera.height, camera.width
    pixels = rng.integers(0, 255, (n_frames, h, w, 4), dtype=np.uint8)
    pixels_j = jnp.asarray(pixels)
    rot_j = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (n_frames, 1, 1)))
    org_j = jnp.asarray(
        np.tile(np.array([0.5, 0.5, -0.5], np.float32), (n_frames, 1))
    )

    def sync(x):
        return float(np.asarray(jnp.sum(x)))

    # ---- 1. batched step time vs K ---------------------------------------
    steps = 100
    for k in (1, 2, 4):
        kp = jax.vmap(lambda kk: init_params(kk, cfg))(
            jax.random.split(jax.random.PRNGKey(1), k)
        )
        ks = jax.vmap(make_optimizer(cfg).init)(kp)
        bpix = jnp.broadcast_to(pixels_j[None], (k,) + pixels_j.shape)
        brot = jnp.broadcast_to(rot_j[None], (k,) + rot_j.shape)
        borg = jnp.broadcast_to(org_j[None], (k,) + org_j.shape)
        bnf = jnp.full((k,), n_frames, jnp.int32)
        kp, ks, bl = _train_chunk_batched(
            kp, ks, jax.random.PRNGKey(2), bpix, brot, borg, bnf, camera, cfg, steps
        )
        sync(bl)
        t0 = time.perf_counter()
        kp, ks, bl = _train_chunk_batched(
            kp, ks, jax.random.PRNGKey(3), bpix, brot, borg, bnf, camera, cfg, steps
        )
        sync(bl)
        dt = time.perf_counter() - t0
        print(
            f"batched K={k}: {dt/steps*1e3:7.2f} ms/step "
            f"({k*steps*cfg.train_rays/dt/1e6:6.2f} M obj-rays/s)",
            flush=True,
        )

    # ---- 2/3. isolated vmapped gather / scatter vs K ---------------------
    g3, c = 40 ** 3, 64
    n_idx = 4096 * 48  # samples per object-step at production settings

    for k in (1, 2, 4):
        tables = jax.random.normal(jax.random.PRNGKey(4), (k, g3, c))
        idx = jax.random.randint(jax.random.PRNGKey(5), (k, n_idx), 0, g3)

        @jax.jit
        def vg(t, i):
            return jnp.sum(jax.vmap(lambda tt, ii: tt.astype(jnp.bfloat16)[ii])(t, i).astype(jnp.float32))

        sync(vg(tables, idx))
        t0 = time.perf_counter()
        for _ in range(5):
            sync(vg(tables, idx))
        dt = (time.perf_counter() - t0) / 5
        print(
            f"vmap gather  K={k} ({k*g3*c*2/1e6:5.1f} MB bf16): "
            f"{k*n_idx/dt/1e6:7.1f} M rows/s",
            flush=True,
        )

        vals = jax.random.normal(jax.random.PRNGKey(6), (k, n_idx, c))

        @jax.jit
        def vs(i, v):
            return jnp.sum(
                jax.vmap(lambda ii, vv: jnp.zeros((g3, c)).at[ii].add(vv))(i, v)
            )

        sync(vs(idx, vals))
        t0 = time.perf_counter()
        for _ in range(5):
            sync(vs(idx, vals))
        dt = (time.perf_counter() - t0) / 5
        print(
            f"vmap scatter K={k} ({k*g3*c*4/1e6:5.1f} MB f32): "
            f"{k*n_idx/dt/1e6:7.1f} M rows/s",
            flush=True,
        )

    # ---- 4. single-object bigger steps -----------------------------------
    for rays in (4096, 8192, 16384):
        c2 = dataclasses.replace(cfg, train_rays=rays)
        params = init_params(jax.random.PRNGKey(7), c2)
        opt_state = make_optimizer(c2).init(params)
        params, opt_state, losses = train_chunk(
            params, opt_state, jax.random.PRNGKey(8), pixels_j, rot_j, org_j,
            camera, c2, steps
        )
        sync(losses)
        t0 = time.perf_counter()
        params, opt_state, losses = train_chunk(
            params, opt_state, jax.random.PRNGKey(9), pixels_j, rot_j, org_j,
            camera, c2, steps
        )
        sync(losses)
        dt = time.perf_counter() - t0
        print(
            f"single rays={rays:5d}: {dt/steps*1e3:7.2f} ms/step "
            f"({steps*rays/dt/1e6:6.2f} M rays/s)",
            flush=True,
        )
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
