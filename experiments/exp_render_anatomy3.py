#!/usr/bin/env python3
"""Cost anatomy of the THREE-phase tile render (round-2 successor to
exp_breakdown2's render rows).

Trains the bench object briefly, then times each phase of
``_render_tiles_two_phase`` separately at the production render shape
(8 frames x 1280x720): A1 pooled probe over active-tile rays, the two
partitions, A2 corner-sigma probe over level-1 survivors, B fine march
over level-2 survivors, and the un-permute/scatter tail — plus the
survivor counts that determine each phase's ray population.

  nohup python -u experiments/exp_render_anatomy3.py > /tmp/exp_an3.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from nerf_prv_tpu.core.config import CameraConfig
    from nerf_prv_tpu.nerf import NerfConfig, init_params
    from nerf_prv_tpu.nerf.rays import load_dataset, ray_sphere
    from nerf_prv_tpu.nerf.render import (
        _RENDER_TILE,
        _jit_march_interval,
        _jit_partition_packed,
        _jit_probe_l2,
        _jit_probe_tiles_l1,
        _jit_unpermute_rays,
        _scatter_tiles,
        _tile_order,
        build_render_aux,
        render_views,
    )
    from nerf_prv_tpu.nerf.rays import pixel_dirs_cam
    from nerf_prv_tpu.nerf.train import make_optimizer, train_chunk

    cfg = NerfConfig()
    camera = CameraConfig()
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
    from synthetic import write_scene

    scene_dir = "/tmp/bench_scene_v2"
    train_js = os.path.join(scene_dir, "train.json")
    if not os.path.exists(train_js):
        write_scene(scene_dir, n_train=16, n_test=8, camera=camera,
                    point_size=3, n_points=120000)
    ds = load_dataset(train_js, with_images=True)
    pixels_j = jnp.asarray(
        np.clip(np.asarray(ds.pixels) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    )
    rot_j = jnp.asarray(ds.rotations, jnp.float32)
    org_j = jnp.asarray(ds.origins, jnp.float32)

    def sync(x):
        return float(np.asarray(jnp.sum(x)))

    key = jax.random.PRNGKey(0)
    params = init_params(key, cfg)
    opt_state = make_optimizer(cfg).init(params)
    params, opt_state, losses = train_chunk(
        params, opt_state, jax.random.PRNGKey(1), pixels_j, rot_j, org_j,
        camera, cfg, 1000
    )
    sync(losses)
    aux = build_render_aux(params, cfg)

    # ---- assemble the production ray stream (8 frames) --------------------
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
        [order_t, jnp.zeros((max(stop_t - n_tiles, 0),), jnp.int32)]
    )

    def timeit(fn, reps=3):
        # warm 3x: exact pass seeds the speculative-count cache, the 2nd
        # compiles slack-rounded spec shapes, the 3rd reaches the stable
        # slack-free steady state (render.py _SPEC_COUNTS)
        for _ in range(3):
            fn()
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        return (time.perf_counter() - t0) / reps

    # ---- end-to-end reference ---------------------------------------------
    def full():
        imgs = render_views(params, org_j[:n_render], rot_j[:n_render],
                            camera, cfg, aux=aux)
        sync(imgs[..., 3])

    t_full = timeit(full)

    # ---- phase A1 ----------------------------------------------------------
    def phase_a1():
        outs = []
        for i in range(0, stop_t, ct):
            outs.append(_jit_probe_tiles_l1(od_t, order_pad[i:i + ct], cfg, aux))
        return sync(jnp.concatenate(outs)[:, 8])

    t_a1 = timeit(phase_a1)

    packs = []
    for i in range(0, stop_t, ct):
        packs.append(_jit_probe_tiles_l1(od_t, order_pad[i:i + ct], cfg, aux))
    pack_act = jnp.concatenate(packs)

    # ---- partition 1 --------------------------------------------------------
    def part1():
        r = _jit_partition_packed(pack_act, chunk)
        return sync(r[2])

    t_p1 = timeit(part1)
    pack1, pos1, n1 = _jit_partition_packed(pack_act, chunk)
    n1 = int(n1)
    stop1 = min(((n1 + chunk - 1) // chunk) * chunk, pack1.shape[0])

    # ---- phase A2 -----------------------------------------------------------
    def phase_a2():
        outs = []
        for i in range(0, stop1, chunk):
            outs.append(_jit_probe_l2(pack1[i:i + chunk], cfg, aux))
        return sync(jnp.concatenate(outs)[:, 8])

    t_a2 = timeit(phase_a2)
    packs2 = []
    for i in range(0, stop1, chunk):
        packs2.append(_jit_probe_l2(pack1[i:i + chunk], cfg, aux))
    pack2all = jnp.concatenate(packs2)

    # ---- partition 2 --------------------------------------------------------
    def part2():
        r = _jit_partition_packed(pack2all, chunk)
        return sync(r[2])

    t_p2 = timeit(part2)
    pack2, pos2, n2 = _jit_partition_packed(pack2all, chunk)
    n2 = int(n2)
    stop2 = min(((n2 + chunk - 1) // chunk) * chunk, pack2.shape[0])

    # ---- phase B ------------------------------------------------------------
    def phase_b():
        outs = []
        for i in range(0, stop2, chunk):
            outs.append(_jit_march_interval(params, pack2[i:i + chunk], cfg))
        return sync(jnp.concatenate(outs))

    t_b = timeit(phase_b)

    # ---- tail (unpermutes + tile scatter) -----------------------------------
    outs = []
    for i in range(0, stop2, chunk):
        outs.append(_jit_march_interval(params, pack2[i:i + chunk], cfg))
    rgba_occ = jnp.concatenate(outs)

    def tail():
        rgba_l1 = _jit_unpermute_rays(rgba_occ, pos2)
        rgba_act = _jit_unpermute_rays(rgba_l1, pos1)
        out = _scatter_tiles(rgba_act.reshape(stop_t, 4 * t),
                             order_pad[:stop_t], n_tiles, n_act)
        return sync(out)

    t_tail = timeit(tail)

    # ---- tile-order front --------------------------------------------------
    def front():
        o, na = _tile_order(od, t)
        return sync(na)

    t_front = timeit(front)

    print(f"rays total {n} act {stop_t * t} ({stop_t * t / n:.2%}) "
          f"l1-occ {n1} ({n1 / n:.2%}) l2-occ {n2} ({n2 / n:.2%})", flush=True)
    print(f"full render      {t_full * 1e3:8.1f} ms  "
          f"({n / t_full / 1e6:.1f} M rays/s)", flush=True)
    acc = 0.0
    for nm, tv in [("tile-order", t_front), ("A1 probe", t_a1),
                   ("partition1", t_p1), ("A2 probe", t_a2),
                   ("partition2", t_p2), ("B march", t_b), ("tail", t_tail)]:
        acc += tv
        print(f"{nm:12s} {tv * 1e3:8.1f} ms", flush=True)
    print(f"{'sum':12s} {acc * 1e3:8.1f} ms (vs full {t_full * 1e3:.1f};"
          " gap = host syncs/dispatch)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
