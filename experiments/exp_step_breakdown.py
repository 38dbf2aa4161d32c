#!/usr/bin/env python3
"""Decompose the train step cost: sampling vs forward vs backward vs update.

python -u experiments/exp_step_breakdown.py > /tmp/exp_breakdown.log
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
    from nerf_prv_tpu.nerf.render import render_rays
    from nerf_prv_tpu.nerf.train import _sample_batch, make_optimizer

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    camera = CameraConfig()
    h, w = camera.height, camera.width
    pixels = rng.integers(0, 255, (8, h, w, 4), dtype=np.uint8)
    views = rng.normal(size=(8, 3)); views[:, 2] = np.abs(views[:, 2])
    views /= np.linalg.norm(views, axis=1, keepdims=True)
    c2w = camera_to_world(views * 0.3, np.zeros(3) + 1e-4)
    rot = jnp.asarray(c2w[:, :3, :3][:, [2, 0, 1], :], jnp.float32)
    org = jnp.asarray(c2w[:, :3, 3][:, [2, 0, 1]] * 5.0 + 0.5, jnp.float32)
    px = jnp.asarray(pixels)

    cfg = NerfConfig(train_hit_oversample=1)  # G40 base
    params = init_params(jax.random.PRNGKey(0), cfg)
    K = 200

    def sync(x):
        return float(np.asarray(x))

    def timeit(name, jfn, *args):
        sync(jfn(*args, k=K))  # warm with the SAME static k (pays compile)
        t0 = time.perf_counter()
        sync(jfn(*args, k=K))
        el = (time.perf_counter() - t0) / K
        print(f"{name:32s} {el*1e3:8.2f} ms/iter", flush=True)
        return el

    @partial(jax.jit, static_argnames=("k", "ov"))
    def loop_sample(key, ov, k):
        def body(c, kk):
            o, d, tgt, bg = _sample_batch(kk, px, rot, org, camera, cfg.train_rays, ov)
            return c + jnp.sum(o) + jnp.sum(tgt), None
        acc, _ = jax.lax.scan(body, 0.0, jax.random.split(key, k))
        return acc

    @partial(jax.jit, static_argnames=("k",))
    def loop_fwd(p, key, k):
        def body(c, kk):
            ks, km = jax.random.split(kk)
            o, d, tgt, bg = _sample_batch(ks, px, rot, org, camera, cfg.train_rays, 1)
            rgb, acc = render_rays(p, o, d, cfg, key=km)
            return c + jnp.sum(rgb), None
        acc, _ = jax.lax.scan(body, 0.0, jax.random.split(key, k))
        return acc

    @partial(jax.jit, static_argnames=("k",))
    def loop_grad(p, key, k):
        def lf(p, kk):
            ks, km = jax.random.split(kk)
            o, d, tgt, bg = _sample_batch(ks, px, rot, org, camera, cfg.train_rays, 1)
            rgb, acc = render_rays(p, o, d, cfg, key=km)
            rgb = rgb + bg * (1.0 - acc[:, None])
            return jnp.mean((rgb - tgt) ** 2)

        def body(c, kk):
            l, g = jax.value_and_grad(lf)(p, kk)
            return c + l + jnp.sum(g["grid"][0]), None
        acc, _ = jax.lax.scan(body, 0.0, jax.random.split(key, k))
        return acc

    @partial(jax.jit, static_argnames=("k",))
    def loop_gradnogrid(p, key, k):
        def lf(pp, kk):
            ks, km = jax.random.split(kk)
            o, d, tgt, bg = _sample_batch(ks, px, rot, org, camera, cfg.train_rays, 1)
            merged = {**p, **pp}
            rgb, acc = render_rays(merged, o, d, cfg, key=km)
            rgb = rgb + bg * (1.0 - acc[:, None])
            return jnp.mean((rgb - tgt) ** 2)

        small = {kk: v for kk, v in p.items() if kk != "grid"}

        def body(c, kk):
            l, g = jax.value_and_grad(lf)(small, kk)
            return c + l + jnp.sum(g["sigma_w0"]), None
        acc, _ = jax.lax.scan(body, 0.0, jax.random.split(key, k))
        return acc

    key = jax.random.PRNGKey(3)
    timeit("sample only (4096)", loop_sample, key, 1)
    # oversample variant compiled separately (static ov)
    timeit("sample only (oversample4)", loop_sample, key, 4)
    timeit("sample + forward", loop_fwd, params, key)
    timeit("sample + fwd + bwd (all)", loop_grad, params, key)
    timeit("sample + fwd + bwd (no grid)", loop_gradnogrid, params, key)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
