"""Batched multi-object NeRF training — the dataset-generation scaling axis.

The reference trains one instant-ngp per (object, view count) serially
through a GPU server; generating the PRV dataset means ~3000 objects x ~25
view counts of 2500-step trainings (SURVEY.md §7 hard part (e)).  Here K
objects train *simultaneously*: parameters carry a leading object axis that
shards over the mesh's ``dp`` dimension, every step ``vmap``s the train step
across objects, and XLA runs K independent NeRFs per chip cluster with zero
cross-talk (no collectives needed — the axis is embarrassingly parallel, so
scaling over ICI is linear).

Datasets may have different frame counts; frames are padded to the max and
sampling draws from each object's true count.

PER-CHIP CAVEAT (measured, experiments/exp_batched_train.py + PERF.md):
on a single chip K>1 is COUNTERPRODUCTIVE — XLA's batched gather/scatter
lowering runs 7-24 M rows/s vs 250-300 M unbatched, so vmapped K-object
steps cost 1.3-1.5x more per object than serial training.  Use this path
with K <= the mesh's ``dp`` size (one object per device), where each
device sees a trivial batch of 1 and scaling over ICI is linear.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..parallel.mesh import batch_sharding, make_mesh, replicated
from .model import NerfConfig, init_params
from .rays import RayDataset, rays_from_pixels
from .render import render_rays
from .train import make_optimizer


def stack_datasets(datasets: Sequence[RayDataset]):
    """Pad + stack K datasets -> device-ready batched arrays."""
    max_f = max(ds.n_frames for ds in datasets)
    h, w = datasets[0].hw
    k = len(datasets)
    pixels = np.zeros((k, max_f, h, w, 4), np.uint8)
    rot = np.zeros((k, max_f, 3, 3), np.float32)
    org = np.zeros((k, max_f, 3), np.float32)
    n_frames = np.zeros((k,), np.int32)
    for i, ds in enumerate(datasets):
        f = ds.n_frames
        pixels[i, :f] = np.clip(np.asarray(ds.pixels) * 255.0 + 0.5, 0, 255).astype(np.uint8)
        rot[i, :f] = ds.rotations
        org[i, :f] = ds.origins
        rot[i, f:] = np.eye(3)  # harmless padding
        n_frames[i] = f
    return pixels, rot, org, n_frames


def _member_loss_hoisted(params, pixels_u8, rot, org, camera, cfg, inp, pool):
    """Pool-path member loss consuming a pre-generated packed RNG block
    (train._hoisted_split_streams) instead of deriving streams in-loop.

    Per-(step, object) key, the streams equal what the single-object
    train_chunk hoisted path draws, so dp1-vs-batched step comparisons are
    like-for-like for the default train_rng="split" AND the batched scan
    sheds the same ~0.5 ms/step of tiny threefry launches the single-object
    path shed (exp_step_residue)."""
    from .train import _huber_mean, _pool_ray_batch, _unpack_hoisted

    r, bg, jitter = _unpack_hoisted(inp)
    o, d, rgba = _pool_ray_batch(pool[r], pixels_u8, rot, org, camera)
    target = rgba[:, :3] * rgba[:, 3:4] + bg * (1.0 - rgba[:, 3:4])
    rgb, acc = render_rays(params, o, d, cfg, jitter=jitter)
    return _huber_mean(rgb + bg * (1.0 - acc[:, None]) - target, cfg)


def _member_loss(params, pixels_u8, rot, org, n_frames, camera, cfg, key, pool=None, pool_n=None):
    if pool is not None and cfg.train_rng == "fused":
        # one-dispatch RNG, identical semantics to the plain-jit fused path
        # (train._sample_batch_pooled_fused) so dp1/batched comparisons stay
        # like-for-like when the fused default is on
        from .train import _fused_streams, _huber_mean, _pool_ray_batch

        r, bg, jitter = _fused_streams(key, cfg.train_rays, pool_n, cfg.n_samples)
        o, d, rgba = _pool_ray_batch(pool[r], pixels_u8, rot, org, camera)
        target = rgba[:, :3] * rgba[:, 3:4] + bg * (1.0 - rgba[:, 3:4])
        rgb, acc = render_rays(params, o, d, cfg, jitter=jitter)
        return _huber_mean(rgb + bg * (1.0 - acc[:, None]) - target, cfg)
    ks, km, kb, kf, ku, kv = jax.random.split(key, 6)
    n_rays = cfg.train_rays
    h, w = pixels_u8.shape[1:3]
    if pool is not None:
        # precomputed hit-pixel pool (see train.build_hit_pool): uniform
        # over sphere-hitting pixels with zero per-step partition cost
        r = jax.random.randint(kf, (n_rays,), 0, jnp.maximum(pool_n, 1))
        flat_idx = pool[r]
        f = flat_idx // (h * w)
        p = flat_idx % (h * w)
        vi, ui = p // w, p % w
        o, d = rays_from_pixels(rot, org, camera, f, ui.astype(jnp.float32), vi.astype(jnp.float32))
    else:
        oversample = cfg.train_hit_oversample if cfg.bound == "sphere" else 1
        n_cand = n_rays * max(oversample, 1)
        f = jax.random.randint(kf, (n_cand,), 0, n_frames)
        ui = jax.random.randint(ku, (n_cand,), 0, w)
        vi = jax.random.randint(kv, (n_cand,), 0, h)
        o, d = rays_from_pixels(rot, org, camera, f, ui.astype(jnp.float32), vi.astype(jnp.float32))
        if oversample > 1:
            # hit-ray compaction (see train._sample_batch)
            from .rays import ray_sphere

            _, _, valid = ray_sphere(o, d)
            order = jnp.argsort(~valid)[:n_rays]
            f, ui, vi = f[order], ui[order], vi[order]
            o, d = o[order], d[order]
        flat_idx = (f * h + vi) * w + ui
    flat = pixels_u8.reshape(-1, 4)
    rgba = flat[flat_idx].astype(jnp.float32) / 255.0
    bg = jax.random.uniform(kb, (n_rays, 3))
    target = rgba[:, :3] * rgba[:, 3:4] + bg * (1.0 - rgba[:, 3:4])
    rgb, acc = render_rays(params, o, d, cfg, key=km)
    from .train import _huber_mean

    return _huber_mean(rgb + bg * (1.0 - acc[:, None]) - target, cfg)


@partial(
    jax.jit,
    static_argnames=("camera", "cfg", "n_steps"),
    donate_argnums=(0, 1),
)
def _train_chunk_batched(
    params, opt_state, key, pixels_u8, rot, org, n_frames, camera, cfg, n_steps,
    pools=None, pool_ns=None,
):
    opt = make_optimizer(cfg)
    k_obj = pixels_u8.shape[0]
    # hoist the split path's per-step RNG out of the scan exactly like the
    # single-object train_chunk: one batched derivation, packed uint32
    # block, one dynamic-slice per scan iteration (train._hoisted_split_streams).
    # HBM cost scales with K — (n_steps, K, n_rays, 4+n_samples) u32 ≈
    # 164 MB x K per 500-step chunk; callers with large per-chip K should
    # lower chunk_steps (on the intended one-object-per-dp-device layout the
    # block shards with the object axis, so per-device cost is the
    # single-object one)
    hoist = pools is not None and cfg.train_rng == "split" and cfg.n_importance == 0

    def one_object_step(p, s, px, r, o, nf, key, pool=None, pool_n=None):
        loss, grads = jax.value_and_grad(_member_loss)(
            p, px, r, o, nf, camera, cfg, key, pool, pool_n
        )
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    def one_object_step_hoisted(p, s, px, r, o, inp, pool):
        loss, grads = jax.value_and_grad(_member_loss_hoisted)(
            p, px, r, o, camera, cfg, inp, pool
        )
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    def step(carry, xs):
        p, s = carry
        if hoist:
            p, s, loss = jax.vmap(one_object_step_hoisted)(
                p, s, pixels_u8, rot, org, xs, pools
            )
        elif pools is not None:
            keys = jax.random.split(xs, k_obj)
            p, s, loss = jax.vmap(one_object_step)(
                p, s, pixels_u8, rot, org, n_frames, keys, pools, pool_ns
            )
        else:
            keys = jax.random.split(xs, k_obj)
            p, s, loss = jax.vmap(one_object_step)(p, s, pixels_u8, rot, org, n_frames, keys)
        return (p, s), loss

    step_keys = jax.random.split(key, n_steps)
    if hoist:
        from .train import _hoisted_split_streams

        # (n_steps, K) per-object keys, same derivation the in-loop path used
        obj_keys = jax.vmap(lambda kk: jax.random.split(kk, k_obj))(step_keys)
        xs = jax.vmap(
            lambda ks, nh: _hoisted_split_streams(
                ks, cfg.train_rays, nh, cfg.n_samples
            ),
            in_axes=(1, 0),
            out_axes=1,
        )(obj_keys, pool_ns)  # (n_steps, K, n_rays, 4+n_samples) uint32
    else:
        xs = step_keys
    (params, opt_state), losses = jax.lax.scan(
        step, (params, opt_state), xs, unroll=cfg.train_scan_unroll
    )
    return params, opt_state, losses  # losses (steps, K)


def train_batch(
    datasets: Sequence[RayDataset],
    cfg: Optional[NerfConfig] = None,
    seed: int = 0,
    mesh=None,
    chunk_steps: int = 500,
) -> Tuple[dict, np.ndarray]:
    """Train K NeRFs at once; returns (params with leading K axis,
    per-object per-step losses (steps, K)).

    With a mesh, the object axis shards over ``dp`` — pad K to a multiple of
    the mesh size for an even split.
    """
    cfg = cfg or NerfConfig()
    if cfg.n_steps <= chunk_steps:
        chunk_steps = cfg.n_steps
    k = len(datasets)
    camera = datasets[0].camera
    pixels, rot, org, n_frames = stack_datasets(datasets)

    key = jax.random.PRNGKey(seed)
    key, kinit = jax.random.split(key)
    params = jax.vmap(lambda kk: init_params(kk, cfg))(jax.random.split(kinit, k))
    opt = make_optimizer(cfg)
    opt_state = jax.vmap(opt.init)(params)

    if mesh is not None:
        obj_sh = batch_sharding(mesh)
        params = jax.tree.map(lambda x: jax.device_put(x, obj_sh), params)
        opt_state = jax.tree.map(lambda x: jax.device_put(x, obj_sh), opt_state)
        pixels = jax.device_put(jnp.asarray(pixels), obj_sh)
        rot = jax.device_put(jnp.asarray(rot), obj_sh)
        org = jax.device_put(jnp.asarray(org), obj_sh)
        n_frames = jax.device_put(jnp.asarray(n_frames), obj_sh)
    else:
        pixels = jnp.asarray(pixels)
        rot = jnp.asarray(rot)
        org = jnp.asarray(org)
        n_frames = jnp.asarray(n_frames)

    pools = pool_ns = None
    if cfg.bound == "sphere":
        from .train import build_hit_pool

        pools, pool_ns = jax.vmap(
            lambda r, o, nf: build_hit_pool(r, o, camera, nf)
        )(rot, org, n_frames)
        if mesh is not None:
            obj_sh = batch_sharding(mesh)
            pools = jax.device_put(pools, obj_sh)
            pool_ns = jax.device_put(pool_ns, obj_sh)

    all_losses = []
    steps_left = cfg.n_steps
    while steps_left > 0:
        n = min(chunk_steps, steps_left)
        key, kc = jax.random.split(key)
        params, opt_state, losses = _train_chunk_batched(
            params, opt_state, kc, pixels, rot, org, n_frames, camera, cfg, n,
            pools, pool_ns
        )
        all_losses.append(np.asarray(losses))
        steps_left -= n
    return params, np.concatenate(all_losses, axis=0)


def slice_params(batched_params, i: int):
    """Extract object i's parameter tree from a batched train."""
    return jax.tree.map(lambda x: x[i], batched_params)
