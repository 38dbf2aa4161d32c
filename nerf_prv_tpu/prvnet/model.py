"""PVBNet / PVBPretrain — the view-budget regression heads.

≙ ``PRVNet/train_regression.py:50-98``: a shared ConvNeXt-V2 encoder applied
to K input views; PVBNet pools by concat(mean, variance) over the view axis
(unbiased variance, matching ``torch.var``) into a 2000-d vector followed by
five activation-free Linear layers down to one logit; PVBPretrain is the
single-view variant.  The logit maps to the view budget through
``min + (max-min) * sigmoid`` (≙ ``infer_server.py:92-94``).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .convnextv2 import ConvNeXtV2, convnextv2_tiny


class PVBNet(nn.Module):
    """K-view budget regressor (≙ train_regression.py:68-98)."""

    encoder: nn.Module
    fc_dims: Sequence[int] = (1000, 500, 250, 100, 1)

    @nn.compact
    def __call__(self, views):  # (N, K, H, W, 3)
        n, k = views.shape[0], views.shape[1]
        flat = views.reshape((n * k,) + views.shape[2:])
        enc = self.encoder(flat).reshape(n, k, -1)
        mean = jnp.mean(enc, axis=1)
        var = jnp.var(enc, axis=1, ddof=1)  # unbiased, ≙ torch.var
        x = jnp.concatenate([mean, var], axis=-1)
        x = nn.Dense(self.fc_dims[0], name="fc0")(x)
        for i, d in enumerate(self.fc_dims[1:], start=1):
            x = nn.Dense(d, name=f"fc{i}")(x)  # no activations (reference)
        return x[..., 0]


class PVBPretrain(nn.Module):
    """Single-view variant (≙ train_regression.py:50-65)."""

    encoder: nn.Module
    fc_dims: Sequence[int] = (1000, 500, 250, 100, 1)

    @nn.compact
    def __call__(self, views):  # (N, H, W, 3)
        x = self.encoder(views)
        for i, d in enumerate(self.fc_dims[1:], start=1):
            x = nn.Dense(d, name=f"fc{i}")(x)
        return x[..., 0]


def make_pvbnet(arch: str = "convnextv2_tiny", num_classes: int = 1000) -> PVBNet:
    from .convnextv2 import MODELS

    return PVBNet(encoder=MODELS[arch](num_classes=num_classes))


def make_pvbpretrain(
    arch: str = "convnextv2_tiny", num_classes: int = 1000
) -> PVBPretrain:
    """Single-view pretrain model (≙ ``--pre_train``,
    train_regression.py:50-65,578-581)."""
    from .convnextv2 import MODELS

    return PVBPretrain(encoder=MODELS[arch](num_classes=num_classes))


def logits_to_budget(logits, min_label: int = 13, max_label: int = 58):
    """Sigmoid-rescaled prediction (≙ infer_server.py:92-94,
    train_regression.py:452-455)."""
    p = jnp.asarray(logits)
    pred = min_label + (max_label - min_label) * nn.sigmoid(p)
    return pred


IMG_PATTERN = [
    [1],
    [0, 1],
    [0, 1, 3],
    [0, 1, 2, 3],
    [0, 1, 2, 3, 4],
]  # ≙ train_regression.py:41-47 / infer_server.py:39-45
