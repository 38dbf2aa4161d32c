#!/usr/bin/env python3
"""Cost anatomy of the FUSED sync-free tile render (successor to
exp_render_anatomy3 after the probe-march fusion).

Phases: assembly+tile-order (one jit), A1 pooled probe, partition1
(iota-scatter + wide gather), fused probe+march per chunk, tail
(unpermute + tile scatter).  Every per-phase number includes one ~29 ms
host-readback round-trip (exp_march_fixed's trivial-dispatch row) —
subtract it to estimate device time; the full render pays roughly one.

  nohup python -u experiments/exp_render_anatomy4.py > /tmp/exp_an.log 2>&1 &
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

    from nerf_prv_tpu.core.config import CameraConfig
    from nerf_prv_tpu.nerf import NerfConfig, init_params
    from nerf_prv_tpu.nerf.rays import load_dataset
    from nerf_prv_tpu.nerf.render import (
        _RENDER_TILE, _cached_pixel_dirs, _jit_assemble_tiles,
        _jit_partition_packed, _jit_probe_march, _jit_probe_tiles_l1,
        _jit_unpermute_rays, _scatter_tiles, build_render_aux, render_views,
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

    n_render = 8
    h, w = camera.height, camera.width
    n = n_render * h * w
    t = _RENDER_TILE
    chunk = 1 << 17
    npad = (-n) % t
    n_tiles = (n + npad) // t
    d_cam = _cached_pixel_dirs(camera)

    def timeit(fn, reps=3):
        for _ in range(3):
            fn()
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        return (time.perf_counter() - t0) / reps

    def full():
        imgs = render_views(params, org_j[:n_render], rot_j[:n_render],
                            camera, cfg, aux=aux)
        sync(imgs[..., 3])

    t_full = timeit(full)

    # ---- assembly + tile order ---------------------------------------------
    def assemble():
        od_t, order_t, n_act = _jit_assemble_tiles(
            org_j[:n_render], rot_j[:n_render], d_cam, t, npad)
        return sync(n_act)

    t_asm = timeit(assemble)
    od_t, order_t, n_act_dev = _jit_assemble_tiles(
        org_j[:n_render], rot_j[:n_render], d_cam, t, npad)
    n_act = int(n_act_dev)
    ct = max(chunk // t, 1)
    stop_t = min(((n_act + ct - 1) // ct) * ct, ((n_tiles + ct - 1) // ct) * ct)
    order_pad = (
        jnp.concatenate([order_t, jnp.zeros((stop_t - n_tiles,), jnp.int32)])
        if stop_t > n_tiles else order_t)

    # ---- A1 ------------------------------------------------------------------
    def phase_a1():
        outs = [_jit_probe_tiles_l1(od_t, order_pad[i:i + ct], cfg, aux)
                for i in range(0, stop_t, ct)]
        return sync(jnp.concatenate(outs)[:, 8])

    t_a1 = timeit(phase_a1)
    packs = [_jit_probe_tiles_l1(od_t, order_pad[i:i + ct], cfg, aux)
             for i in range(0, stop_t, ct)]
    pack_act = jnp.concatenate(packs)

    # ---- partition 1 -----------------------------------------------------------
    def part1():
        r = _jit_partition_packed(pack_act, chunk)
        return sync(r[2])

    t_p1 = timeit(part1)
    pack1, pos1, n1 = _jit_partition_packed(pack_act, chunk)
    n1 = int(n1)
    stop1 = ((n1 + chunk - 1) // chunk) * chunk

    # ---- fused probe + march ---------------------------------------------------
    def probe_march():
        outs = [_jit_probe_march(params, pack1[i:i + chunk], cfg, aux)
                for i in range(0, stop1, chunk)]
        return sync(jnp.concatenate(outs))

    t_pm = timeit(probe_march)
    outs = [_jit_probe_march(params, pack1[i:i + chunk], cfg, aux)
            for i in range(0, stop1, chunk)]
    rgba_l1 = jnp.concatenate(outs)

    # ---- tail ------------------------------------------------------------------
    def tail():
        rgba_act = _jit_unpermute_rays(rgba_l1, pos1)
        out = _scatter_tiles(rgba_act.reshape(stop_t, 4 * t),
                             order_pad[:stop_t], n_tiles, n_act)
        return sync(out)

    t_tail = timeit(tail)

    print(f"rays total {n} act {stop_t * t} ({stop_t * t / n:.2%}) "
          f"l1-occ {n1} ({n1 / n:.2%})", flush=True)
    print(f"full render      {t_full * 1e3:8.1f} ms  "
          f"({n / t_full / 1e6:.1f} M rays/s)", flush=True)
    acc = 0.0
    for nm, tv in [("assembly", t_asm), ("A1 probe", t_a1),
                   ("partition1", t_p1), ("probe+march", t_pm),
                   ("tail", t_tail)]:
        acc += tv
        print(f"{nm:12s} {tv * 1e3:8.1f} ms   (device est "
              f"{max(tv * 1e3 - 29, 0):6.1f})", flush=True)
    print(f"{'sum':12s} {acc * 1e3:8.1f} ms (each phase pays one ~29 ms "
          "readback; full pays ~one total)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
