"""Volume rendering: fixed-step marching + compositing.

The CUDA testbed the reference drives marches rays with per-ray variable step
counts, ray compaction, and an occupancy grid.  On TPU's dense-tiling model we
instead march a *fixed* number of stratified samples inside each ray's cube
intersection and mask dead samples with transmittance — shapes stay static,
XLA fuses the whole march, and "skipped" work costs nothing extra on the MXU
because the batch is already dense (SURVEY.md §7 hard part (a)).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .model import NerfConfig, field
from .rays import ray_aabb, ray_sphere

MIN_TRANSMITTANCE = 1e-4  # ≙ render_min_transmittance (run.py:235)


def _eval_field(params, pos, dirs_b, cfg):
    n, ns = pos.shape[:2]
    flat_pos = pos.reshape(n * ns, 3)
    flat_dirs = jnp.broadcast_to(dirs_b[:, None, :], (n, ns, 3)).reshape(n * ns, 3)
    if cfg.field_impl == "hash":
        # remat the hash field: recompute gathers + MLPs in the backward pass
        # instead of keeping per-level gather intermediates live in HBM —
        # trades ~2x field FLOPs for an order of magnitude less live memory
        sigma, rgb = jax.checkpoint(
            lambda p, x, d: field(p, x, d, cfg), static_argnums=()
        )(params, flat_pos, flat_dirs)
    else:
        # the voxel field's activations are small; remat would only re-pay
        # the gather latency
        sigma, rgb = field(params, flat_pos, flat_dirs, cfg)
    return sigma.reshape(n, ns), rgb.reshape(n, ns, 3)


def _composite(sigma, rgb, deltas):
    n = sigma.shape[0]
    alpha = 1.0 - jnp.exp(-sigma * deltas)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = jnp.concatenate([jnp.ones((n, 1)), trans[:, :-1]], axis=-1)
    # transmittance cutoff ≙ ngp's early ray termination
    weights = jnp.where(trans > MIN_TRANSMITTANCE, trans * alpha, 0.0)
    out_rgb = jnp.sum(weights[..., None] * rgb, axis=1)
    out_alpha = jnp.sum(weights, axis=1)
    return out_rgb, out_alpha, weights


def _coarse_density(params, pos, cfg):
    from .model import density

    n, ns = pos.shape[:2]
    return density(params, pos.reshape(n * ns, 3), cfg).reshape(n, ns)


def _sample_cdf(ts, weights, n_fine, key):
    """Inverse-CDF sampling of fine ts from coarse weights (jaxnerf-style).

    ``ts`` (N, S) ascending coarse sample positions define S-1 bins; bin mass
    is the mean of its endpoint weights.
    """
    n, s = weights.shape
    w = 0.5 * (weights[:, :-1] + weights[:, 1:]) + 1e-5  # (N, S-1)
    cdf = jnp.cumsum(w, axis=-1)
    cdf = cdf / cdf[:, -1:]
    cdf = jnp.concatenate([jnp.zeros((n, 1)), cdf], axis=-1)  # (N, S)
    if key is not None:
        u = jnp.sort(jax.random.uniform(key, (n, n_fine)), axis=-1)
    else:
        u = jnp.broadcast_to(
            (jnp.arange(n_fine, dtype=jnp.float32) + 0.5) / n_fine, (n, n_fine)
        )
    idx = jnp.clip(
        jax.vmap(partial(jnp.searchsorted, side="right"))(cdf, u) - 1, 0, s - 2
    )
    c0 = jnp.take_along_axis(cdf, idx, axis=1)
    c1 = jnp.take_along_axis(cdf, idx + 1, axis=1)
    t0 = jnp.take_along_axis(ts, idx, axis=1)
    t1 = jnp.take_along_axis(ts, idx + 1, axis=1)
    frac = jnp.clip((u - c0) / jnp.maximum(c1 - c0, 1e-8), 0.0, 1.0)
    return t0 + (t1 - t0) * frac


def render_rays(
    params,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    cfg: NerfConfig,
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """March rays through the bounded volume; returns (rgb (N,3), alpha (N,)).

    Stratified jitter when ``key`` is given (training); midpoint samples
    otherwise (eval/screenshots — deterministic, spp-free analytic
    compositing instead of the reference's 8-spp averaging, run.py:232).
    With ``cfg.n_importance > 0`` the n_samples pass is density-only and the
    full field evaluates at importance-resampled points.
    """
    n, ns = origins.shape[0], cfg.n_samples
    if cfg.bound == "sphere":
        tmin, tmax, valid = ray_sphere(origins, dirs)
    else:
        tmin, tmax, valid = ray_aabb(origins, dirs)
    span = (tmax - tmin) / ns
    base = jnp.arange(ns, dtype=jnp.float32)[None, :]
    if key is not None:
        key, kj = jax.random.split(key)
        jitter = jax.random.uniform(kj, (n, ns))
    else:
        jitter = 0.5
    ts = tmin[:, None] + (base + jitter) * span[:, None]
    pos = origins[:, None, :] + dirs[:, None, :] * ts[..., None]  # (N, S, 3)
    pos = jnp.clip(pos, 0.0, 1.0 - 1e-6)

    if cfg.n_importance > 0:
        sigma_c = _coarse_density(params, pos, cfg) * valid[:, None]
        alpha_c = 1.0 - jnp.exp(-sigma_c * span[:, None])
        trans_c = jnp.cumprod(1.0 - alpha_c + 1e-10, axis=-1)
        trans_c = jnp.concatenate([jnp.ones((n, 1)), trans_c[:, :-1]], axis=-1)
        w_c = trans_c * alpha_c
        kf = None
        if key is not None:
            key, kf = jax.random.split(key)
        t_fine = _sample_cdf(ts, jax.lax.stop_gradient(w_c), cfg.n_importance, kf)
        t_fine = jnp.sort(t_fine, axis=-1)
        pos_f = origins[:, None, :] + dirs[:, None, :] * t_fine[..., None]
        pos_f = jnp.clip(pos_f, 0.0, 1.0 - 1e-6)
        sigma, rgb = _eval_field(params, pos_f, dirs, cfg)
        sigma = sigma * valid[:, None]
        deltas = jnp.diff(
            t_fine, axis=-1, append=t_fine[:, -1:] + span[:, None]
        )
        out_rgb, out_alpha, _ = _composite(sigma, rgb, deltas)
        return out_rgb, out_alpha

    sigma, rgb = _eval_field(params, pos, dirs, cfg)
    sigma = sigma * valid[:, None]
    out_rgb, out_alpha, _ = _composite(sigma, rgb, jnp.broadcast_to(span[:, None], sigma.shape))
    return out_rgb, out_alpha


def _default_chunk(cfg: NerfConfig) -> int:
    # the hash field's gather temps cap the chunk; the voxel field streams
    return 1 << 14 if cfg.field_impl == "hash" else 1 << 17


def render_image(
    params,
    origin: jnp.ndarray,
    rotation: jnp.ndarray,
    camera,
    cfg: NerfConfig,
    chunk: Optional[int] = None,
):
    """Full-frame render; returns (H, W, 4) float32 RGBA on black background.

    The alpha channel carries accumulated density, matching how the
    EnsembleRGBDensity baseline reads ngp's RGBA screenshots
    (``main.cpp:2112-2127``).
    """
    return render_views(
        params, origin[None], rotation[None], camera, cfg, chunk=chunk
    )[0]


def render_views(
    params,
    origins: jnp.ndarray,   # (F, 3) grid-space camera centers
    rotations: jnp.ndarray,  # (F, 3, 3)
    camera,
    cfg: NerfConfig,
    chunk: Optional[int] = None,
):
    """Batched multi-frame render -> (F, H, W, 4).

    All frames' rays are flattened into one stream and chunked through a
    single jitted program — one dispatch per chunk, not per frame, which
    matters when dispatch latency is high (remote TPU tunnels).
    """
    from .rays import pixel_dirs_cam

    chunk = chunk or _default_chunk(cfg)
    n_frames = origins.shape[0]
    h, w = camera.height, camera.width
    u, v = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32), jnp.arange(h, dtype=jnp.float32))
    d_cam = pixel_dirs_cam(camera, u.reshape(-1), v.reshape(-1))  # (HW, 3)
    d_grid = jnp.einsum("fij,nj->fni", jnp.asarray(rotations), d_cam)
    d_grid = d_grid / jnp.linalg.norm(d_grid, axis=-1, keepdims=True)
    d_all = d_grid.reshape(-1, 3)
    o_all = jnp.broadcast_to(
        jnp.asarray(origins)[:, None, :], (n_frames, h * w, 3)
    ).reshape(-1, 3)

    n = n_frames * h * w
    # ray compaction: sort hit rays to the front (most coverage-image rays
    # miss the bounding sphere entirely — object pixel rates run 3-30%,
    # cf. object_pixel_rate in DefaultConfiguration.yaml) and march only the
    # chunks that contain hits; misses composite to black/alpha 0 exactly.
    if cfg.bound == "sphere":
        order, n_hit = _hit_order(o_all, d_all)
        n_hit = int(n_hit)
        o_sorted = o_all[order]
        d_sorted = d_all[order]
        pad = (-n) % chunk
        d_pad = jnp.concatenate([d_sorted, jnp.ones((pad, 3))], axis=0)
        o_pad = jnp.concatenate([o_sorted, jnp.zeros((pad, 3))], axis=0)
        outs_rgb, outs_a = [], []
        stop = min(n + pad, ((n_hit + chunk - 1) // chunk) * chunk)
        for i in range(0, stop, chunk):
            rgb, a = _jit_render(params, o_pad[i : i + chunk], d_pad[i : i + chunk], cfg)
            outs_rgb.append(rgb)
            outs_a.append(a)
        if outs_rgb:
            rgb_hit = jnp.concatenate(outs_rgb)[:n]
            a_hit = jnp.concatenate(outs_a)[:n]
        else:
            rgb_hit = jnp.zeros((0, 3))
            a_hit = jnp.zeros((0,))
        rgb, a = _scatter_back(rgb_hit, a_hit, order, n)
    else:
        pad = (-n) % chunk
        d_pad = jnp.concatenate([d_all, jnp.ones((pad, 3))], axis=0)
        o_pad = jnp.concatenate([o_all, jnp.zeros((pad, 3))], axis=0)
        outs_rgb, outs_a = [], []
        for i in range(0, n + pad, chunk):
            rgb, a = _jit_render(params, o_pad[i : i + chunk], d_pad[i : i + chunk], cfg)
            outs_rgb.append(rgb)
            outs_a.append(a)
        rgb = jnp.concatenate(outs_rgb)[:n]
        a = jnp.concatenate(outs_a)[:n]
    rgb = rgb.reshape(n_frames, h, w, 3)
    a = a.reshape(n_frames, h, w)
    return jnp.concatenate([rgb, a[..., None]], axis=-1)


@jax.jit
def _hit_order(origins, dirs):
    _, _, valid = ray_sphere(origins, dirs)
    order = jnp.argsort(~valid)  # hits first, stable
    return order, jnp.sum(valid)


@partial(jax.jit, static_argnames=("n",))
def _scatter_back(rgb_hit, a_hit, order, n):
    rgb = jnp.zeros((n, 3), rgb_hit.dtype)
    a = jnp.zeros((n,), a_hit.dtype)
    m = rgb_hit.shape[0]
    rgb = rgb.at[order[:m]].set(rgb_hit, unique_indices=True)
    a = a.at[order[:m]].set(a_hit, unique_indices=True)
    return rgb, a


@partial(jax.jit, static_argnames=("cfg",))
def _jit_render(params, origins, dirs, cfg):
    return render_rays(params, origins, dirs, cfg, key=None)
