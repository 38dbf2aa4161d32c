#!/usr/bin/env python3
"""Backward-pass ablation at production settings (pooled sampler era).

exp_train_anatomy2 bounded the step at fwd 1.71 / bwd ~1.95 / opt 0.21 ms
and cleared the scatter itself (0.19 ms at the exact production shape).
This experiment splits the remaining backward cost by differentiating wrt
parameter subsets and toggling the train-probe phase, to pick the next
optimization target.

  nohup python -u experiments/exp_bwd_ablate.py > /tmp/exp_bwd.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

import numpy as np


def main():
    import dataclasses
    from functools import partial

    import jax
    import jax.numpy as jnp
    import optax

    from nerf_prv_tpu.core.config import CameraConfig
    from nerf_prv_tpu.nerf import NerfConfig, init_params
    from nerf_prv_tpu.nerf.render import render_rays
    from nerf_prv_tpu.nerf.rays import load_dataset
    from nerf_prv_tpu.nerf.train import (
        _sample_batch_pooled,
        build_hit_pool,
        make_optimizer,
    )
    from synthetic import write_scene

    cfg = NerfConfig()
    camera = CameraConfig()
    scene_dir = "/tmp/bench_scene_v2"
    train_js = os.path.join(scene_dir, "train.json")
    if not os.path.exists(train_js):
        write_scene(scene_dir, n_train=16, n_test=8, camera=camera,
                    point_size=3, n_points=120000)
    ds = load_dataset(train_js, with_images=True)
    pixels = jnp.asarray(
        np.clip(np.asarray(ds.pixels) * 255.0 + 0.5, 0, 255).astype(np.uint8))
    rot = jnp.asarray(ds.rotations, jnp.float32)
    org = jnp.asarray(ds.origins, jnp.float32)
    pool, pool_n = build_hit_pool(rot, org, camera)

    def sync(x):
        return float(np.asarray(jnp.sum(x)))

    sync(pool_n)
    params0 = init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(cfg)

    GRID_KEYS = ("grid",)

    def split(p, keys):
        a = {k: v for k, v in p.items() if k in keys}
        b = {k: v for k, v in p.items() if k not in keys}
        return a, b

    def loss_of(p, key, c):
        ks, km = jax.random.split(key)
        o, d, target, bg = _sample_batch_pooled(
            ks, pixels, rot, org, camera, c.train_rays, pool, pool_n)
        rgb, acc = render_rays(p, o, d, c, key=km)
        rgb = rgb + bg * (1.0 - acc[:, None])
        err = rgb - target
        return jnp.mean(err * err)

    def make_step(mode, c):
        @partial(jax.jit, static_argnames=(), donate_argnums=(0, 1))
        def chunk(p, s, key, n_steps=300):
            def body(carry, k):
                p, s = carry
                if mode == "fwd":
                    loss = loss_of(p, k, c)
                    return (p, s), loss
                if mode == "full":
                    loss, g = jax.value_and_grad(loss_of)(p, k, c)
                elif mode == "grid_only":
                    gp, mp = split(p, GRID_KEYS)

                    def f(gp_):
                        return loss_of({**jax.lax.stop_gradient(mp), **gp_}, k, c)

                    loss, gg = jax.value_and_grad(f)(gp)
                    g = {**{kk: jnp.zeros_like(vv) for kk, vv in mp.items()}, **gg}
                elif mode == "mlp_only":
                    gp, mp = split(p, GRID_KEYS)

                    def f(mp_):
                        return loss_of({**jax.lax.stop_gradient(gp), **mp_}, k, c)

                    loss, gm = jax.value_and_grad(f)(mp)
                    g = {**{kk: jnp.zeros_like(vv) for kk, vv in gp.items()}, **gm}
                u, s = opt.update(g, s, p)
                p = optax.apply_updates(p, u)
                return (p, s), loss

            (p, s), losses = jax.lax.scan(body, (p, s), jax.random.split(key, n_steps))
            return p, s, losses

        return chunk

    noprobe = dataclasses.replace(cfg, train_coarse=0)
    rows = [
        ("A full (pooled)", "full", cfg),
        ("B fwd only", "fwd", cfg),
        ("C grid grads only", "grid_only", cfg),
        ("D mlp grads only", "mlp_only", cfg),
        ("E full, no train probe", "full", noprobe),
        ("F fwd only, no probe", "fwd", noprobe),
    ]
    for name, mode, c in rows:
        step = make_step(mode, c)
        p = jax.tree.map(jnp.copy, params0)
        s = opt.init(p)
        p, s, losses = step(p, s, jax.random.PRNGKey(1))
        sync(losses)
        best = 1e9
        for i in range(2):
            t0 = time.perf_counter()
            p, s, losses = step(p, s, jax.random.PRNGKey(2 + i))
            sync(losses)
            best = min(best, time.perf_counter() - t0)
        print(f"{name:26s} {best / 300 * 1e3:6.3f} ms/step", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
