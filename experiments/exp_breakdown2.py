#!/usr/bin/env python3
"""Current-defaults cost anatomy: tight train step + aux-probed render.

Maps where the remaining milliseconds live after the round-1 optimization
waves, as the starting point for the next round.

  nohup python -u experiments/exp_breakdown2.py > /tmp/exp_bd2.log 2>&1 &
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from nerf_prv_tpu.core.config import CameraConfig
    from nerf_prv_tpu.core.pose import camera_to_world
    from nerf_prv_tpu.nerf import NerfConfig, init_params
    from nerf_prv_tpu.nerf.render import (
        build_render_aux, _tighten_interval_aux, _cell_sigma_at,
        _pooled_lookup, render_rays,
    )
    from nerf_prv_tpu.nerf.rays import ray_sphere
    from nerf_prv_tpu.nerf.train import _sample_batch, make_optimizer, train_chunk

    print("device:", jax.devices()[0], flush=True)
    cfg = NerfConfig()
    camera = CameraConfig()
    h, w = camera.height, camera.width
    rng = np.random.default_rng(0)
    pixels = rng.integers(0, 255, (8, h, w, 4), dtype=np.uint8)
    views = rng.normal(size=(8, 3)); views[:, 2] = np.abs(views[:, 2])
    views /= np.linalg.norm(views, axis=1, keepdims=True)
    c2w = camera_to_world(views * 0.3, np.zeros(3) + 1e-4)
    rot = jnp.asarray(c2w[:, :3, :3][:, [2, 0, 1], :], jnp.float32)
    org = jnp.asarray(c2w[:, :3, 3][:, [2, 0, 1]] * 5.0 + 0.5, jnp.float32)
    px = jnp.asarray(pixels)

    def sync(x):
        return float(np.asarray(jnp.sum(x)))

    # ---- train step anatomy (tight phase) ---------------------------------
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(cfg).init(params)
    K = 200

    @partial(jax.jit, static_argnames=("k", "mode"))
    def loop(p, key, k, mode):
        from nerf_prv_tpu.nerf.render import render_rays as rr

        def body(c, kk):
            ks, km = jax.random.split(kk)
            o, d, tgt, bg = _sample_batch(
                ks, px, rot, org, camera, cfg.train_rays, cfg.train_hit_oversample
            )
            if mode == "sample":
                return c + jnp.sum(o) * 1e-30, None
            if mode == "fwd":
                rgb, a = rr(p, o, d, cfg, key=km)
                return c + jnp.sum(rgb) * 1e-30, None
            def lf(pp):
                rgb, a = rr(pp, o, d, cfg, key=km)
                rgb = rgb + bg * (1.0 - a[:, None])
                return jnp.mean((rgb - tgt) ** 2)
            if mode == "grad_nogrid":
                small = {kk2: v for kk2, v in p.items() if kk2 != "grid"}
                l, g = jax.value_and_grad(lambda q: lf({**p, **q}))(small)
                return c + l * 1e-30 + jnp.sum(g["sigma_w0"]) * 1e-30, None
            l, g = jax.value_and_grad(lf)(p)
            return c + l * 1e-30 + jnp.sum(g["grid"][0]) * 1e-30, None
        acc, _ = jax.lax.scan(body, 0.0, jax.random.split(key, k))
        return acc

    key = jax.random.PRNGKey(3)
    for mode in ("sample", "fwd", "grad_nogrid", "grad"):
        sync(loop(params, key, K, mode))
        t0 = time.perf_counter()
        sync(loop(params, key, K, mode))
        el = (time.perf_counter() - t0) / K
        print(f"train {mode:12s} {el*1e3:7.2f} ms/step", flush=True)

    # full step incl. adam, for reference
    p2, o2, l2 = train_chunk(params, opt, key, px, rot, org, camera, cfg, K)
    sync(l2)
    t0 = time.perf_counter()
    p2, o2, l2 = train_chunk(p2, o2, jax.random.PRNGKey(4), px, rot, org, camera, cfg, K)
    sync(l2)
    print(f"train full step      {(time.perf_counter()-t0)/K*1e3:7.2f} ms/step", flush=True)

    # ---- render anatomy at one chunk (131072 rays, current defaults) ------
    N = 1 << 17
    o = np.tile(np.array([[0.5, 0.5, -1.5]], np.float32), (N, 1))
    tgt = rng.uniform(0.3, 0.7, (N, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o_j, d_j = jnp.asarray(o), jnp.asarray(d)
    aux = build_render_aux(p2, cfg)
    g = cfg.voxel_grid_size
    KR = 20

    def t_scan(name, body):
        @partial(jax.jit, static_argnames=("k",))
        def run(o, d, k):
            def step(c, i):
                return c + body(o, d + i * 1e-12) * 1e-30, None
            c, _ = jax.lax.scan(step, 0.0, jnp.arange(k, dtype=jnp.int32))
            return c
        sync(run(o_j, d_j, KR))
        t0 = time.perf_counter()
        sync(run(o_j, d_j, KR))
        el = (time.perf_counter() - t0) / KR
        print(f"render {name:22s} {el*1e3:7.2f} ms  ({N/el/1e6:5.2f} M rays/s)", flush=True)

    def probe1(o, d):
        tmin, tmax, valid = ray_sphere(o, d)
        n1 = 8
        base1 = (jnp.arange(n1, dtype=jnp.float32)[None, :] + 0.5) / n1
        ts1 = tmin[:, None] + base1 * (tmax - tmin)[:, None]
        pos1 = jnp.clip(o[:, None, :] + d[:, None, :] * ts1[..., None], 0.0, 1.0 - 1e-6)
        return jnp.sum(_pooled_lookup(aux.pooled, pos1, g))

    def tighten(o, d):
        tmin, tmax, valid = ray_sphere(o, d)
        lo, hi, occ = _tighten_interval_aux(aux, o, d, tmin, tmax, valid, cfg)
        return jnp.sum(lo) + jnp.sum(hi)

    def full(o, d):
        rgb, a = render_rays(p2, o, d, cfg, aux=aux)
        return jnp.sum(rgb) + jnp.sum(a)

    t_scan("probe1 (8 pooled)", probe1)
    t_scan("tighten (p1+24 p2)", tighten)
    t_scan("full render_rays", full)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
