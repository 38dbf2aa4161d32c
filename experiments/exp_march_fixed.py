#!/usr/bin/env python3
"""Decompose the fine march's per-chunk cost: rows vs fixed overhead.

exp_span_bucket measured bucket-8/12/16 all at the same wall time — the
marched row count barely moves phase B.  This isolates what does:

  - march one 131k chunk at ns = 24 / 12 / 6  (row-proportional part)
  - march 2 and 4 chunks in one jit call (524k rays)  (per-dispatch part)
  - lax.map over the chunk axis inside ONE jit  (dispatch-free chunking)
  - a trivial jitted op on the same array  (pure dispatch+sync floor)

  nohup python -u experiments/exp_march_fixed.py > /tmp/exp_fixed.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from nerf_prv_tpu.core.config import CameraConfig
    from nerf_prv_tpu.nerf import NerfConfig, init_params
    from nerf_prv_tpu.nerf.rays import load_dataset, pixel_dirs_cam
    from nerf_prv_tpu.nerf.render import (
        _RENDER_TILE, _jit_march_interval, _jit_partition_packed,
        _jit_probe_l2, _jit_probe_tiles_l1, _tile_order, build_render_aux,
    )
    from nerf_prv_tpu.nerf.train import make_optimizer, train_chunk
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
    opt_state = make_optimizer(cfg).init(params)
    params, opt_state, losses = train_chunk(
        params, opt_state, jax.random.PRNGKey(1), pixels_j, rot_j, org_j,
        camera, cfg, 1000)
    sync(losses)
    aux = build_render_aux(params, cfg)

    # assemble pack2 exactly as the three-phase render does (8 frames)
    n_render = 8
    h, w = camera.height, camera.width
    u, v = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                        jnp.arange(h, dtype=jnp.float32))
    d_cam = pixel_dirs_cam(camera, u.reshape(-1), v.reshape(-1))
    d_grid = jnp.einsum("fij,nj->fni", rot_j[:n_render], d_cam)
    d_grid = d_grid / jnp.linalg.norm(d_grid, axis=-1, keepdims=True)
    d_all = d_grid.reshape(-1, 3)
    o_all = jnp.broadcast_to(org_j[:n_render, None, :],
                             (n_render, h * w, 3)).reshape(-1, 3)
    n = n_render * h * w
    t = _RENDER_TILE
    chunk = 1 << 17
    npad = (-n) % t
    od = jnp.concatenate([o_all, d_all], axis=-1)
    if npad:
        miss = jnp.tile(jnp.asarray([[0.5, 0.5, 2.0, 0.0, 0.0, 1.0]]), (npad, 1))
        od = jnp.concatenate([od, miss])
    n_p = n + npad
    n_tiles = n_p // t
    od_t = od.reshape(n_tiles, 6 * t)
    order_t, n_act = _tile_order(od, t)
    n_act = int(n_act)
    ct = max(chunk // t, 1)
    stop_t = min(((n_act + ct - 1) // ct) * ct, ((n_tiles + ct - 1) // ct) * ct)
    order_pad = jnp.concatenate(
        [order_t, jnp.zeros((max(stop_t - n_tiles, 0),), jnp.int32)])
    packs = [_jit_probe_tiles_l1(od_t, order_pad[i:i + ct], cfg, aux)
             for i in range(0, stop_t, ct)]
    pack1, pos1, n1 = _jit_partition_packed(jnp.concatenate(packs), chunk)
    n1 = int(n1)
    stop1 = min(((n1 + chunk - 1) // chunk) * chunk, pack1.shape[0])
    packs2 = [_jit_probe_l2(pack1[i:i + chunk], cfg, aux)
              for i in range(0, stop1, chunk)]
    pack2, pos2, n2 = _jit_partition_packed(jnp.concatenate(packs2), chunk)
    n2 = int(n2)
    stop2 = min(((n2 + chunk - 1) // chunk) * chunk, pack2.shape[0])
    print(f"n2 {n2}  stop2 {stop2}  chunks {stop2 // chunk}", flush=True)

    def timeit(fn, reps=5):
        fn()
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        return (time.perf_counter() - t0) / reps

    one = pack2[:chunk]

    # per-chunk march at varying ns
    for ns in (24, 16, 12, 6):
        dt = timeit(lambda ns=ns: sync(_jit_march_interval(params, one, cfg, ns=ns)))
        print(f"march 1 chunk ns={ns:2d}: {dt*1e3:7.1f} ms", flush=True)

    # multi-chunk in one call (bigger static shape)
    for k in (2, 4):
        big = pack2[:k * chunk]
        dt = timeit(lambda big=big: sync(_jit_march_interval(params, big, cfg, ns=24)))
        print(f"march {k} chunks one call ns=24: {dt*1e3:7.1f} ms "
              f"({dt*1e3/k:.1f} ms/chunk)", flush=True)

    # lax.map over the chunk axis, one dispatch for all 5 chunks
    @partial(jax.jit, static_argnames=("cfg", "ns"))
    def march_mapped(params, packs, cfg, ns):
        # nested jit inlines during tracing — one compiled program, one dispatch
        return jax.lax.map(
            lambda p: _jit_march_interval(params, p, cfg, ns=ns), packs)

    packs_all = pack2[:stop2].reshape(stop2 // chunk, chunk, 9)
    dt = timeit(lambda: sync(march_mapped(params, packs_all, cfg, 24)))
    print(f"march {stop2 // chunk} chunks lax.map ns=24: {dt*1e3:7.1f} ms "
          f"({dt*1e3/(stop2//chunk):.1f} ms/chunk)", flush=True)

    # eager loop over all chunks (the production form)
    def loop():
        outs = [_jit_march_interval(params, pack2[i:i + chunk], cfg, ns=24)
                for i in range(0, stop2, chunk)]
        return sync(jnp.concatenate(outs))

    dt = timeit(loop)
    print(f"march {stop2 // chunk} chunks eager loop ns=24: {dt*1e3:7.1f} ms "
          f"({dt*1e3/(stop2//chunk):.1f} ms/chunk)", flush=True)

    # pure dispatch floor: trivial jitted op, same sync discipline
    @jax.jit
    def triv(x):
        return x[:8, :] + 1.0

    dt = timeit(lambda: sync(triv(one)))
    print(f"trivial jit dispatch+sync: {dt*1e3:7.1f} ms", flush=True)

    # the composite/VPU share: march with the field eval replaced by a
    # constant (isolates gathers+MLP from sampling/composite overhead)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
