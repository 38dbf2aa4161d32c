#!/usr/bin/env python3
"""Round-2 late train-step cost anatomy at the ADOPTED production settings
(24 samples / 8 probes, bf16 gathers, 4096 rays, hit-oversample 4).

Successor to exp_breakdown2 (which measured the 32/16-era step).  Phases are
isolated by scan-amortized variants of the step; micro rows measure the
scatter formulations head-to-head at the exact production shape
(98,304 x 64 f32 rows into the 64,000-row grid).

  nohup python -u experiments/exp_train_anatomy2.py > /tmp/exp_ta2.log 2>&1 &
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
    from nerf_prv_tpu.nerf.rays import load_dataset
    from nerf_prv_tpu.nerf.render import render_rays
    from nerf_prv_tpu.nerf.train import _sample_batch, make_optimizer, train_chunk
    from nerf_prv_tpu.ops.sorted_grad import segmented_scatter_add
    from synthetic import write_scene

    cfg = NerfConfig()
    camera = CameraConfig()
    scene_dir = "/tmp/bench_scene_v2"
    train_js = os.path.join(scene_dir, "train.json")
    if not os.path.exists(train_js):
        write_scene(scene_dir, n_train=16, n_test=8, camera=camera,
                    point_size=3, n_points=120000)
    ds = load_dataset(train_js, with_images=True)
    pixels_j = jnp.asarray(
        np.clip(np.asarray(ds.pixels) * 255.0 + 0.5, 0, 255).astype(np.uint8))
    rot_j = jnp.asarray(ds.rotations, jnp.float32)
    org_j = jnp.asarray(ds.origins, jnp.float32)

    def sync(x):
        return float(np.asarray(jnp.sum(x)))

    key = jax.random.PRNGKey(0)
    params = init_params(key, cfg)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    # realistic occupancy: ~1000 steps of real training first
    params, opt_state, losses = train_chunk(
        params, opt_state, jax.random.PRNGKey(1), pixels_j, rot_j, org_j,
        camera, cfg, 1000)
    sync(losses)

    N_STEPS = 200

    def timed_scan(step_fn, carry, reps=3):
        @jax.jit
        def run(c):
            keys = jax.random.split(jax.random.PRNGKey(2), N_STEPS)
            c, out = jax.lax.scan(step_fn, c, keys)
            return c, out

        c, out = run(carry)
        sync(jax.tree_util.tree_leaves(out)[0])  # compile+warm
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            c2, out = run(carry)
            sync(jax.tree_util.tree_leaves(out)[0])
            best = min(best, time.perf_counter() - t0)
        return best / N_STEPS * 1e3  # ms/step

    def make_loss(p_grid_stopgrad=False):
        def loss_fn(p, k):
            ks, km = jax.random.split(k)
            if p_grid_stopgrad:
                p = dict(p, grid=jax.lax.stop_gradient(p["grid"]))
            o, d, target, bg = _sample_batch(
                ks, pixels_j, rot_j, org_j, camera, cfg.train_rays,
                cfg.train_hit_oversample)
            rgb, acc = render_rays(p, o, d, cfg, key=km)
            rgb = rgb + bg * (1.0 - acc[:, None])
            err = rgb - target
            delta = cfg.huber_delta
            abs_err = jnp.abs(err)
            huber = jnp.where(abs_err <= delta, 0.5 * err * err,
                              delta * (abs_err - 0.5 * delta))
            return jnp.mean(huber)
        return loss_fn

    loss_fn = make_loss()

    # A: full production step
    def step_full(carry, k):
        p, s = carry
        loss, grads = jax.value_and_grad(loss_fn)(p, k)
        updates, s = opt.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    # B: forward only
    def step_fwd(carry, k):
        return carry, loss_fn(carry[0], k)

    # C: fwd+bwd, no optimizer
    def step_grad(carry, k):
        loss, grads = jax.value_and_grad(loss_fn)(carry[0], k)
        return carry, loss + sum(jnp.sum(g) * 0 for g in jax.tree_util.tree_leaves(grads)) * 0 + sum(
            jnp.mean(g) for g in jax.tree_util.tree_leaves(grads))

    # D: full step, grid grad severed (no scatter, grid adam still runs on
    #    zero grads)
    loss_ng = make_loss(p_grid_stopgrad=True)

    def step_nogrid(carry, k):
        p, s = carry
        loss, grads = jax.value_and_grad(loss_ng)(p, k)
        updates, s = opt.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    # E: sampling only
    def step_sample(carry, k):
        o, d, target, bg = _sample_batch(
            k, pixels_j, rot_j, org_j, camera, cfg.train_rays,
            cfg.train_hit_oversample)
        return carry, jnp.mean(o) + jnp.mean(d) + jnp.mean(target) + jnp.mean(bg)

    # F: optimizer only, on frozen grads
    grads0 = jax.grad(loss_fn)(params, jax.random.PRNGKey(3))

    def step_opt(carry, k):
        p, s = carry
        updates, s = opt.update(grads0, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), updates["grid"][0, 0]

    # G: full step, sorted grid gradient
    cfg_sorted = dataclasses.replace(cfg, voxel_grad_impl="sorted")

    def make_loss_cfg(c):
        def loss_fn_c(p, k):
            ks, km = jax.random.split(k)
            o, d, target, bg = _sample_batch(
                ks, pixels_j, rot_j, org_j, camera, c.train_rays,
                c.train_hit_oversample)
            rgb, acc = render_rays(p, o, d, c, key=km)
            rgb = rgb + bg * (1.0 - acc[:, None])
            err = rgb - target
            return jnp.mean(jnp.where(jnp.abs(err) <= c.huber_delta,
                                      0.5 * err * err,
                                      c.huber_delta * (jnp.abs(err) - 0.5 * c.huber_delta)))
        return loss_fn_c

    loss_sorted = make_loss_cfg(cfg_sorted)

    def step_sorted(carry, k):
        p, s = carry
        loss, grads = jax.value_and_grad(loss_sorted)(p, k)
        updates, s = opt.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    rows = []
    a = timed_scan(step_full, (params, opt_state)); rows.append(("A full step", a))
    b = timed_scan(step_fwd, (params, opt_state)); rows.append(("B fwd only", b))
    c = timed_scan(step_grad, (params, opt_state)); rows.append(("C fwd+bwd", c))
    d = timed_scan(step_nogrid, (params, opt_state)); rows.append(("D full, no grid grad", d))
    e = timed_scan(step_sample, (params, opt_state)); rows.append(("E sampling only", e))
    f = timed_scan(step_opt, (params, opt_state)); rows.append(("F optimizer only", f))
    g = timed_scan(step_sorted, (params, opt_state)); rows.append(("G full step, sorted grad", g))

    # ---- micro: the scatter formulations at the exact production shape ----
    n_rows = cfg.voxel_grid_size ** 3
    m = cfg.train_rays * cfg.n_samples
    kk = jax.random.PRNGKey(5)
    idx = jax.random.randint(kk, (m,), 0, n_rows)
    # spatially-coherent duplicates like the real march: ~6 dups/cell
    idx = jnp.sort(idx) if False else idx
    upd = jax.random.normal(kk, (m, 64), jnp.float32)

    def micro(fn):
        def step(carry, _):
            return carry, fn()[0, 0]
        return timed_scan(step, 0)

    rows.append(("H xla scatter-add 98k x 64", micro(
        lambda: jnp.zeros((n_rows, 64), jnp.float32).at[idx].add(upd))))
    rows.append(("I sorted segmented scatter", micro(
        lambda: segmented_scatter_add(idx, upd, n_rows))))
    idx_s = jnp.sort(idx)
    rows.append(("J xla scatter, presorted idx", micro(
        lambda: jnp.zeros((n_rows, 64), jnp.float32).at[idx_s].add(
            upd, indices_are_sorted=True))))
    rows.append(("K argsort(98k) alone", micro(lambda: jnp.argsort(idx)[:1][None] * jnp.ones((1, 1)))))
    rows.append(("L bf16 scatter-add", micro(
        lambda: jnp.zeros((n_rows, 64), jnp.bfloat16).at[idx].add(
            upd.astype(jnp.bfloat16)))))

    for name, ms in rows:
        print(f"{name:36s} {ms:7.3f} ms/step")


if __name__ == "__main__":
    main()
