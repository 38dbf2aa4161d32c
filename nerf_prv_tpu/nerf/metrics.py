"""Image quality metrics: PSNR + SSIM, in JAX.

Reproduces the reference's eval protocol (``Instantngp_scripts/run.py:
213-277``): metrics over sRGB-clipped RGB against ground truth composited on a
black background; SSIM follows Wang et al. with the standard 11x11 Gaussian
window, averaged over channels.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def linear_to_srgb(x):
    """≙ ngp's linear_to_srgb used at run.py:257-258."""
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x <= 0.0031308, 12.92 * x, 1.055 * x ** (1.0 / 2.4) - 0.055)


def srgb_to_linear(x):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def mse2psnr(mse):
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def psnr(img, ref):
    mse = jnp.mean((img - ref) ** 2)
    return mse2psnr(mse)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    return g / g.sum()


@partial(jax.jit, static_argnames=("size",))
def ssim(img, ref, size: int = 11, sigma: float = 1.5, c1: float = 0.01**2, c2: float = 0.03**2):
    """Mean SSIM over an (H, W, C) pair in [0, 1]."""
    img = jnp.asarray(img, jnp.float32)
    ref = jnp.asarray(ref, jnp.float32)
    k = _gaussian_kernel(size, sigma)

    def blur(x):
        # separable Gaussian, valid padding, per channel: (H, W, C)
        x = jnp.moveaxis(x, -1, 0)[:, None]  # (C, 1, H, W)
        kh = k.reshape(1, 1, -1, 1)
        kw = k.reshape(1, 1, 1, -1)
        # HIGHEST precision: the default bf16 MXU path makes the
        # variance cancellation blur(x^2) - mu^2 wrong by ~4e-3, far above
        # c2 = 9e-4 — observed as SSIM > 1 on TPU
        x = jax.lax.conv_general_dilated(
            x, kh, (1, 1), "VALID", precision=jax.lax.Precision.HIGHEST
        )
        x = jax.lax.conv_general_dilated(
            x, kw, (1, 1), "VALID", precision=jax.lax.Precision.HIGHEST
        )
        return jnp.moveaxis(x[:, 0], 0, -1)

    mu_x = blur(img)
    mu_y = blur(ref)
    mu_x2 = mu_x * mu_x
    mu_y2 = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_x2 = blur(img * img) - mu_x2
    sigma_y2 = blur(ref * ref) - mu_y2
    sigma_xy = blur(img * ref) - mu_xy
    num = (2.0 * mu_xy + c1) * (2.0 * sigma_xy + c2)
    den = (mu_x2 + mu_y2 + c1) * (sigma_x2 + sigma_y2 + c2)
    return jnp.mean(num / den)


def evaluate_pair(pred_rgb, gt_rgb):
    """(psnr, ssim, mse) for one image pair, already in sRGB [0,1]."""
    a = jnp.clip(pred_rgb, 0.0, 1.0)
    r = jnp.clip(gt_rgb, 0.0, 1.0)
    mse = jnp.mean((a - r) ** 2)
    return mse2psnr(mse), ssim(a, r), mse
