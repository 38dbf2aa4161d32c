#!/usr/bin/env python3
"""Ablate the deterministic render pipeline stage by stage at production
chunk shapes (131072 rays, 24 probe + 32 fine) to find where time goes
beyond the raw gathers.

  nohup python -u experiments/exp_render_ablate.py > /tmp/exp_rablate.log 2>&1 &
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

    from nerf_prv_tpu.nerf import NerfConfig, init_params
    from nerf_prv_tpu.nerf.model import radiance
    from nerf_prv_tpu.nerf.rays import ray_sphere
    from nerf_prv_tpu.nerf.render import (
        MIN_TRANSMITTANCE, _coarse_density, _composite, _eval_field,
        _tighten_interval, render_rays,
    )
    from nerf_prv_tpu.nerf.voxelfield import _blend, pe_encode

    print("device:", jax.devices()[0], flush=True)
    cfg = NerfConfig()
    params = init_params(jax.random.PRNGKey(0), cfg)
    N = 1 << 17
    NC, NS = cfg.render_coarse, cfg.render_n_samples
    K = 20

    rng = np.random.default_rng(0)
    # rays through the sphere (realistic hit geometry)
    o = np.tile(np.array([[0.5, 0.5, -1.5]], np.float32), (N, 1))
    tgt = rng.uniform(0.3, 0.7, (N, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o_j, d_j = jnp.asarray(o), jnp.asarray(d)

    def sync(x):
        return float(np.asarray(jnp.sum(x)))

    def timeit(name, fn, *args, k=K):
        sync(fn(*args, k=k))
        t0 = time.perf_counter()
        sync(fn(*args, k=k))
        el = (time.perf_counter() - t0) / k
        print(f"{name:34s} {el*1e3:8.2f} ms  ({N/el/1e6:6.2f} M rays/s)", flush=True)
        return el

    def scanned(body):
        @partial(jax.jit, static_argnames=("k",))
        def run(params, o, d, k):
            def step(c, i):
                return c + body(params, o, d, i) * 1e-30, None
            c, _ = jax.lax.scan(step, 0.0, jnp.arange(k, dtype=jnp.int32))
            return c
        return run

    def setup_only(params, o, d, i):
        tmin, tmax, valid = ray_sphere(o, d + i * 1e-12)
        return jnp.sum(tmin) + jnp.sum(tmax)

    def probe_pos(params, o, d, i):
        tmin, tmax, valid = ray_sphere(o, d + i * 1e-12)
        base_c = (jnp.arange(NC, dtype=jnp.float32)[None, :] + 0.5) / NC
        ts_c = tmin[:, None] + base_c * (tmax - tmin)[:, None]
        pos_c = jnp.clip(o[:, None, :] + d[:, None, :] * ts_c[..., None], 0.0, 1.0 - 1e-6)
        return jnp.sum(pos_c)

    def probe_blend(params, o, d, i):
        tmin, tmax, valid = ray_sphere(o, d + i * 1e-12)
        base_c = (jnp.arange(NC, dtype=jnp.float32)[None, :] + 0.5) / NC
        ts_c = tmin[:, None] + base_c * (tmax - tmin)[:, None]
        pos_c = jnp.clip(o[:, None, :] + d[:, None, :] * ts_c[..., None], 0.0, 1.0 - 1e-6)
        feats = _blend(params, pos_c.reshape(-1, 3), cfg)
        return jnp.sum(feats)

    def probe_full(params, o, d, i):
        tmin, tmax, valid = ray_sphere(o, d + i * 1e-12)
        lo, hi, occ = _tighten_interval(params, o, d, tmin, tmax, valid, NC, cfg)
        return jnp.sum(lo) + jnp.sum(hi)

    def fine_blend(params, o, d, i):
        tmin, tmax, valid = ray_sphere(o, d + i * 1e-12)
        base = (jnp.arange(NS, dtype=jnp.float32)[None, :] + 0.5) / NS
        ts = tmin[:, None] + base * (tmax - tmin)[:, None]
        pos = jnp.clip(o[:, None, :] + d[:, None, :] * ts[..., None], 0.0, 1.0 - 1e-6)
        feats = _blend(params, pos.reshape(-1, 3), cfg)
        return jnp.sum(feats)

    def fine_density(params, o, d, i):
        tmin, tmax, valid = ray_sphere(o, d + i * 1e-12)
        base = (jnp.arange(NS, dtype=jnp.float32)[None, :] + 0.5) / NS
        ts = tmin[:, None] + base * (tmax - tmin)[:, None]
        pos = jnp.clip(o[:, None, :] + d[:, None, :] * ts[..., None], 0.0, 1.0 - 1e-6)
        sig = _coarse_density(params, pos, cfg)
        return jnp.sum(sig)

    def fine_field(params, o, d, i):
        tmin, tmax, valid = ray_sphere(o, d + i * 1e-12)
        base = (jnp.arange(NS, dtype=jnp.float32)[None, :] + 0.5) / NS
        ts = tmin[:, None] + base * (tmax - tmin)[:, None]
        pos = jnp.clip(o[:, None, :] + d[:, None, :] * ts[..., None], 0.0, 1.0 - 1e-6)
        sigma, rgb = _eval_field(params, pos, d, cfg)
        return jnp.sum(sigma) + jnp.sum(rgb)

    def full(params, o, d, i):
        rgb, a = render_rays(params, o, d + i * 1e-12, cfg)
        return jnp.sum(rgb) + jnp.sum(a)

    timeit("ray setup", scanned(setup_only), params, o_j, d_j)
    timeit("probe pos only", scanned(probe_pos), params, o_j, d_j)
    timeit("probe pos+blend(24)", scanned(probe_blend), params, o_j, d_j)
    timeit("probe full tighten", scanned(probe_full), params, o_j, d_j)
    timeit("fine pos+blend(32)", scanned(fine_blend), params, o_j, d_j)
    timeit("fine density(32)", scanned(fine_density), params, o_j, d_j)
    timeit("fine full field(32)", scanned(fine_field), params, o_j, d_j)
    timeit("render_rays full", scanned(full), params, o_j, d_j)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
