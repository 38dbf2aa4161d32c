#!/usr/bin/env python3
"""Measure the v5e gather/scatter tier cliff at candidate voxel-grid sizes.

Decides the flagship grid size: rows = G^3 at width 8*F floats.  Run with
`python -u experiments/exp_gather_tiers.py > /tmp/exp_tiers.log` and poll the
log (axon tunnel: never timeout-kill a TPU process).

Timing discipline (see memory: axon block_until_ready is broken): every
measurement is a lax.scan of K iterations inside one jit, synchronized by a
scalar readback; rate = K*N / elapsed.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

N = 393_216  # 4096 rays x 96 samples
WIDTH = 64   # 8 corners x 8 features


@partial(jax.jit, static_argnames=("k",))
def gather_loop(table, idx, k):
    def body(acc, i):
        rows = table[(idx + i) % table.shape[0]]
        return acc + jnp.sum(rows), None
    acc, _ = jax.lax.scan(body, 0.0, jnp.arange(k))
    return acc


@partial(jax.jit, static_argnames=("k",))
def scatter_loop(table, idx, vals, k):
    def body(acc, i):
        t = jnp.zeros_like(table).at[(idx + i) % table.shape[0]].add(vals)
        return acc + t[0, 0], None
    acc, _ = jax.lax.scan(body, 0.0, jnp.arange(k))
    return acc


def sync(x):
    return float(np.asarray(x))


def measure(fn, *args, k):
    sync(fn(*args, k=2))  # compile + warm
    t0 = time.perf_counter()
    sync(fn(*args, k=k))
    return time.perf_counter() - t0


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    for g in (16, 24, 28, 32, 40):
        t = g * g * g
        table = jnp.asarray(rng.normal(size=(t, WIDTH)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, t, N), jnp.int32)
        vals = jnp.asarray(rng.normal(size=(N, WIDTH)), jnp.float32)
        k = 40
        el_g = measure(gather_loop, table, idx, k=k)
        el_s = measure(scatter_loop, table, idx, vals, k=k)
        print(
            f"G={g:3d} rows={t:6d}: gather {k*N/el_g/1e6:8.1f} Mrows/s"
            f" ({el_g/k*1e3:6.2f} ms/call)   scatter {k*N/el_s/1e6:8.1f} Mrows/s"
            f" ({el_s/k*1e3:6.2f} ms/call)",
            flush=True,
        )

    # bf16 table variant at the interesting sizes
    for g in (24, 40):
        t = g * g * g
        table = jnp.asarray(rng.normal(size=(t, WIDTH)), jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, t, N), jnp.int32)
        k = 40
        el_g = measure(gather_loop, table, idx, k=k)
        print(f"G={g:3d} bf16 gather {k*N/el_g/1e6:8.1f} Mrows/s", flush=True)

    # train-step rate per grid size (fresh compile each ~30 s on the tunnel)
    from nerf_prv_tpu.core.config import CameraConfig
    from nerf_prv_tpu.core.pose import camera_to_world
    from nerf_prv_tpu.nerf import NerfConfig, init_params
    from nerf_prv_tpu.nerf.train import make_optimizer, train_chunk

    camera = CameraConfig()
    h, w = camera.height, camera.width
    pixels = rng.integers(0, 255, (8, h, w, 4), dtype=np.uint8)
    views = rng.normal(size=(8, 3)); views[:, 2] = np.abs(views[:, 2])
    views /= np.linalg.norm(views, axis=1, keepdims=True)
    c2w = camera_to_world(views * 0.3, np.zeros(3) + 1e-4)
    rot = jnp.asarray(c2w[:, :3, :3][:, [2, 0, 1], :], jnp.float32)
    org = jnp.asarray(c2w[:, :3, 3][:, [2, 0, 1]] * 5.0 + 0.5, jnp.float32)
    px = jnp.asarray(pixels)

    for g, imp in ((40, 0), (24, 0), (24, 32), (32, 0)):
        cfg = NerfConfig(voxel_grid_size=g, n_importance=imp,
                         n_samples=32 if imp else 96)
        params = init_params(jax.random.PRNGKey(0), cfg)
        opt = make_optimizer(cfg).init(params)
        p, o, l = train_chunk(params, opt, jax.random.PRNGKey(1), px, rot, org,
                              camera, cfg, 20)
        sync(jnp.sum(l))
        t0 = time.perf_counter()
        p, o, l = train_chunk(p, o, jax.random.PRNGKey(2), px, rot, org,
                              camera, cfg, 300)
        sync(jnp.sum(l))
        el = time.perf_counter() - t0
        print(f"train G={g} imp={imp}: {300/el:6.1f} steps/s  "
              f"({el/300*1e3:6.2f} ms/step, {300*cfg.train_rays/el/1e3:8.1f} Krays/s)",
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
