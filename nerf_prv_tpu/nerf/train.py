"""NeRF training loop.

Equivalent of the reference's ``testbed.frame()`` loop to ``n_steps=2500``
(``Instantngp_scripts/run.py:186-208``, ``DefaultConfiguration.yaml:19``),
rebuilt as one jitted ``lax.scan``: every step samples a fresh ray batch from
the training images on-device, marches, and applies Adam — zero host
round-trips between steps.  Huber loss and Adam(1e-2, 0.9/0.99, eps 1e-15)
follow instant-ngp's defaults.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .model import NerfConfig, init_params
from .rays import RayDataset, rays_from_pixels
from .render import render_rays


def make_optimizer(cfg: NerfConfig) -> optax.GradientTransformation:
    def wd_mask(params):
        return {k: k not in ("table", "grid") for k in params}

    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay, mask=wd_mask),
        optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-15),
        optax.scale(-cfg.lr),
    )


def _sample_batch(key, pixels_u8, rot, org, camera, n_rays, oversample=1, n_frames=None):
    kf, ku, kv, kb = jax.random.split(key, 4)
    n_f, h, w = pixels_u8.shape[:3]
    n_cand = n_rays * max(oversample, 1)
    # n_frames may be a traced scalar < n_f: the frame axis is padded to a
    # bucket size so that every view count in a label sweep (3,5,...,100
    # coverage views) reuses one compiled program instead of paying the
    # ~25 s remote compile per distinct shape
    f = jax.random.randint(kf, (n_cand,), 0, n_f if n_frames is None else n_frames)
    ui = jax.random.randint(ku, (n_cand,), 0, w)
    vi = jax.random.randint(kv, (n_cand,), 0, h)
    o, d = rays_from_pixels(rot, org, camera, f, ui.astype(jnp.float32), vi.astype(jnp.float32))
    if oversample > 1:
        # hit-ray compaction: rays missing the bounding sphere have their
        # density masked to zero downstream, so their field evals and the
        # backward scatter are pure waste (object pixel rates run 3-30%,
        # DefaultConfiguration.yaml object_pixel_rate).  Oversample pixels,
        # keep sphere hits — every marched ray carries gradient signal.
        from .rays import ray_sphere

        _, _, valid = ray_sphere(o, d)
        order = jnp.argsort(~valid)[:n_rays]  # hits first, stable
        f, ui, vi = f[order], ui[order], vi[order]
        o, d = o[order], d[order]
    # single-axis flat gather: multi-axis advanced indexing lowers to a slow
    # multi-dim scatter/gather on TPU
    flat = pixels_u8.reshape(n_f * h * w, pixels_u8.shape[3])
    rgba = flat[(f * h + vi) * w + ui].astype(jnp.float32) / 255.0
    # random background color per ray (≙ ngp random_bg_color): supervises
    # opacity through the known alpha channel instead of leaving empty-space
    # density unconstrained on the black eval background
    bg = jax.random.uniform(kb, (n_rays, 3))
    target = rgba[:, :3] * rgba[:, 3:4] + bg * (1.0 - rgba[:, 3:4])
    return o, d, target, bg


@partial(jax.jit, static_argnames=("cfg", "camera", "n_steps"), donate_argnums=(0, 1))
def train_chunk(params, opt_state, key, pixels_u8, rot, org, camera, cfg: NerfConfig, n_steps: int, n_frames=None):
    opt = make_optimizer(cfg)

    def loss_fn(p, key):
        ks, km = jax.random.split(key)
        oversample = cfg.train_hit_oversample if cfg.bound == "sphere" else 1
        o, d, target, bg = _sample_batch(
            ks, pixels_u8, rot, org, camera, cfg.train_rays, oversample, n_frames
        )
        rgb, acc = render_rays(p, o, d, cfg, key=km)
        rgb = rgb + bg * (1.0 - acc[:, None])
        err = rgb - target
        delta = cfg.huber_delta
        abs_err = jnp.abs(err)
        huber = jnp.where(
            abs_err <= delta, 0.5 * err * err, delta * (abs_err - 0.5 * delta)
        )
        return jnp.mean(huber)

    def step(carry, key):
        p, s = carry
        loss, grads = jax.value_and_grad(loss_fn)(p, key)
        updates, s = opt.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    keys = jax.random.split(key, n_steps)
    (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), keys)
    return params, opt_state, losses


def train(
    dataset: RayDataset,
    cfg: Optional[NerfConfig] = None,
    seed: int = 0,
    chunk_steps: int = 500,
) -> Tuple[dict, np.ndarray]:
    """Train a NeRF on a loaded dataset; returns (params, per-step losses)."""
    cfg = cfg or NerfConfig()
    if cfg.n_steps <= chunk_steps:
        chunk_steps = cfg.n_steps  # single compile for short runs
    key = jax.random.PRNGKey(seed)
    key, kinit = jax.random.split(key)
    params = init_params(kinit, cfg)
    opt_state = make_optimizer(cfg).init(params)

    pixels_np = np.clip(
        np.asarray(dataset.pixels) * 255.0 + 0.5, 0, 255
    ).astype(np.uint8)
    rot_np = np.asarray(dataset.rotations, np.float32)
    org_np = np.asarray(dataset.origins, np.float32)

    # pad the frame axis to a bucket size so every coverage view count in a
    # label sweep shares one compiled train program (≙ per-shape remote
    # compiles would otherwise dominate mode-4 wall time)
    n_real = pixels_np.shape[0]
    bucket = _frame_bucket(n_real)
    if bucket > n_real:
        pad = bucket - n_real
        pixels_np = np.concatenate([pixels_np, np.zeros((pad,) + pixels_np.shape[1:], np.uint8)])
        rot_np = np.concatenate([rot_np, np.tile(np.eye(3, dtype=np.float32)[None], (pad, 1, 1))])
        org_np = np.concatenate([org_np, np.zeros((pad, 3), np.float32)])
    pixels_u8 = jnp.asarray(pixels_np)
    rot = jnp.asarray(rot_np)
    org = jnp.asarray(org_np)
    n_frames = jnp.int32(n_real)

    # phase plan: with train_coarse on, geometry first forms during a flat
    # warmup march, then the probe-tightened march takes over (the probe
    # needs a meaningful density field to bound against)
    import dataclasses

    phases = []
    if cfg.train_coarse > 0 and cfg.train_warmup_steps > 0:
        warm = dataclasses.replace(
            cfg, train_coarse=0, n_samples=cfg.train_warmup_samples
        )
        n_warm = min(cfg.train_warmup_steps, cfg.n_steps)
        phases.append((warm, n_warm))
        phases.append((cfg, cfg.n_steps - n_warm))
    else:
        phases.append((cfg, cfg.n_steps))

    losses = []
    for phase_cfg, phase_steps in phases:
        steps_left = phase_steps
        while steps_left > 0:
            n = min(chunk_steps, steps_left)
            key, kc = jax.random.split(key)
            params, opt_state, chunk_losses = train_chunk(
                params, opt_state, kc, pixels_u8, rot, org, dataset.camera,
                phase_cfg, n, n_frames
            )
            losses.append(np.asarray(chunk_losses))
            steps_left -= n
    all_losses = np.concatenate(losses) if losses else np.zeros(0)
    if all_losses.size and not np.isfinite(all_losses[-min(100, all_losses.size):]).all():
        # console-print QC in the reference's style (SURVEY.md §4): a
        # diverged fit would otherwise silently poison the PSNR curve and
        # every label derived from it downstream
        print(
            "[train] WARNING: non-finite losses in the final steps — "
            "fit diverged; downstream metrics for this scene are suspect"
        )
    return params, all_losses


def _frame_bucket(n: int) -> int:
    for b in (4, 8, 16, 32, 64, 128):
        if n <= b:
            return b
    return n
