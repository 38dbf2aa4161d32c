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


def _sample_batch(key, pixels_u8, rot, org, camera, n_rays):
    kf, ku, kv, kb = jax.random.split(key, 4)
    n_f, h, w = pixels_u8.shape[:3]
    f = jax.random.randint(kf, (n_rays,), 0, n_f)
    ui = jax.random.randint(ku, (n_rays,), 0, w)
    vi = jax.random.randint(kv, (n_rays,), 0, h)
    # single-axis flat gather: multi-axis advanced indexing lowers to a slow
    # multi-dim scatter/gather on TPU
    flat = pixels_u8.reshape(n_f * h * w, pixels_u8.shape[3])
    rgba = flat[(f * h + vi) * w + ui].astype(jnp.float32) / 255.0
    u = ui.astype(jnp.float32)
    v = vi.astype(jnp.float32)
    # random background color per ray (≙ ngp random_bg_color): supervises
    # opacity through the known alpha channel instead of leaving empty-space
    # density unconstrained on the black eval background
    bg = jax.random.uniform(kb, (n_rays, 3))
    target = rgba[:, :3] * rgba[:, 3:4] + bg * (1.0 - rgba[:, 3:4])
    o, d = rays_from_pixels(rot, org, camera, f, u, v)
    return o, d, target, bg


@partial(jax.jit, static_argnames=("cfg", "camera", "n_steps"), donate_argnums=(0, 1))
def train_chunk(params, opt_state, key, pixels_u8, rot, org, camera, cfg: NerfConfig, n_steps: int):
    opt = make_optimizer(cfg)

    def loss_fn(p, key):
        ks, km = jax.random.split(key)
        o, d, target, bg = _sample_batch(ks, pixels_u8, rot, org, camera, cfg.train_rays)
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

    pixels_u8 = jnp.asarray(
        np.clip(np.asarray(dataset.pixels) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    )
    rot = jnp.asarray(dataset.rotations)
    org = jnp.asarray(dataset.origins)

    losses = []
    steps_left = cfg.n_steps
    while steps_left > 0:
        n = min(chunk_steps, steps_left)
        key, kc = jax.random.split(key)
        params, opt_state, chunk_losses = train_chunk(
            params, opt_state, kc, pixels_u8, rot, org, dataset.camera, cfg, n
        )
        losses.append(np.asarray(chunk_losses))
        steps_left -= n
    return params, np.concatenate(losses) if losses else np.zeros(0)
