"""ConvNeXt-V2 encoder in Flax.

The reference imports the external facebookresearch/ConvNeXt-V2 PyTorch repo
(``PRVNet/train_regression.py:24-25``, ``convnextv2_tiny``).  This is a
from-scratch Flax implementation of the same architecture — depthwise 7x7
convs, LayerNorm, 4x pointwise MLP with GELU and Global Response
Normalization (the V2 novelty), stage dims (96, 192, 384, 768) for tiny —
laid out NHWC so XLA maps the convs onto the MXU.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class GRN(nn.Module):
    """Global Response Normalization (ConvNeXt-V2)."""

    dim: int

    @nn.compact
    def __call__(self, x):  # x: (N, H, W, C)
        gamma = self.param("gamma", nn.initializers.zeros, (1, 1, 1, self.dim))
        beta = self.param("beta", nn.initializers.zeros, (1, 1, 1, self.dim))
        gx = jnp.sqrt(jnp.sum(x * x, axis=(1, 2), keepdims=True) + 1e-12)
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        return gamma * (x * nx) + beta + x


class Block(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        inp = x
        x = nn.Conv(
            self.dim,
            kernel_size=(7, 7),
            padding=3,
            feature_group_count=self.dim,
            kernel_init=nn.initializers.truncated_normal(0.02),
            name="dwconv",
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(
            4 * self.dim,
            kernel_init=nn.initializers.truncated_normal(0.02),
            name="pwconv1",
        )(x)
        x = nn.gelu(x, approximate=False)
        x = GRN(4 * self.dim, name="grn")(x)
        x = nn.Dense(
            self.dim,
            kernel_init=nn.initializers.truncated_normal(0.02),
            name="pwconv2",
        )(x)
        return inp + x


class ConvNeXtV2(nn.Module):
    """NHWC ConvNeXt-V2; ``__call__`` returns (N, num_classes) features."""

    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    num_classes: int = 1000
    head_init_scale: float = 0.001

    @nn.compact
    def __call__(self, x):  # (N, H, W, 3) in [0, 1]-ish
        x = nn.Conv(
            self.dims[0],
            kernel_size=(4, 4),
            strides=(4, 4),
            padding="VALID",
            kernel_init=nn.initializers.truncated_normal(0.02),
            name="stem_conv",
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, name="stem_norm")(x)
        for i, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if i > 0:
                x = nn.LayerNorm(epsilon=1e-6, name=f"downsample_norm{i}")(x)
                x = nn.Conv(
                    dim,
                    kernel_size=(2, 2),
                    strides=(2, 2),
                    padding="VALID",
                    kernel_init=nn.initializers.truncated_normal(0.02),
                    name=f"downsample_conv{i}",
                )(x)
            for j in range(depth):
                x = Block(dim, name=f"stage{i}_block{j}")(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        x = nn.LayerNorm(epsilon=1e-6, name="head_norm")(x)
        x = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.truncated_normal(
                0.02 * self.head_init_scale
            ),
            name="head",
        )(x)
        return x


def convnextv2_atto(**kw):
    return ConvNeXtV2(depths=(2, 2, 6, 2), dims=(40, 80, 160, 320), **kw)


def convnextv2_femto(**kw):
    return ConvNeXtV2(depths=(2, 2, 6, 2), dims=(48, 96, 192, 384), **kw)


def convnextv2_pico(**kw):
    return ConvNeXtV2(depths=(2, 2, 6, 2), dims=(64, 128, 256, 512), **kw)


def convnextv2_nano(**kw):
    return ConvNeXtV2(depths=(2, 2, 8, 2), dims=(80, 160, 320, 640), **kw)


def convnextv2_tiny(**kw):
    return ConvNeXtV2(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768), **kw)


def convnextv2_base(**kw):
    return ConvNeXtV2(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024), **kw)


def _resnet50(**kw):
    from .resnet import resnet50

    return resnet50(**kw)


def _resnet101(**kw):
    from .resnet import resnet101

    return resnet101(**kw)


MODELS = {
    "convnextv2_atto": convnextv2_atto,
    "convnextv2_femto": convnextv2_femto,
    "convnextv2_pico": convnextv2_pico,
    "convnextv2_nano": convnextv2_nano,
    "convnextv2_tiny": convnextv2_tiny,
    "convnextv2_base": convnextv2_base,
    # ≙ --resnet50/--resnet101 (train_regression.py:279-282,563-565)
    "resnet50": _resnet50,
    "resnet101": _resnet101,
}
