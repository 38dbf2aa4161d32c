"""ResNet-50/101 encoders in Flax — the reference's alternative backbones.

≙ ``--resnet50`` / ``--resnet101`` (``train_regression.py:279-282,563-565``):
torchvision bottleneck ResNets used as drop-in PVBNet/PVBPretrain encoders
(1000-d ImageNet head).  Layout mirrors torchvision exactly so pretrained
checkpoints convert key-for-key (``convert_resnet_state_dict``).

BatchNorm note: torchvision trains BN in batch-stats mode; here BN runs as a
frozen affine map (scale * (x - mean) / sqrt(var + eps) + bias) whose
mean/var initialize from the checkpoint's running statistics and then
fine-tune as plain parameters.  This keeps the whole encoder a single param
tree (no mutable batch_stats collection threading through the trainer) and
is the standard small-dataset fine-tuning regime; mathematically it spans
the same function class as affine BN at inference.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class FrozenBN(nn.Module):
    """BatchNorm as a learnable affine over checkpoint running stats."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        mean = self.param("mean", nn.initializers.zeros, (self.dim,))
        var = self.param("var", nn.initializers.ones, (self.dim,))
        inv = scale / jnp.sqrt(var + self.eps)
        return x * inv + (bias - mean * inv)


class Bottleneck(nn.Module):
    """torchvision Bottleneck (expansion 4)."""

    width: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        out = nn.Conv(self.width, (1, 1), use_bias=False, name="conv1")(x)
        out = FrozenBN(self.width, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.width, (3, 3), strides=self.stride, padding=1,
            use_bias=False, name="conv2",
        )(out)
        out = FrozenBN(self.width, name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.width * 4, (1, 1), use_bias=False, name="conv3")(out)
        out = FrozenBN(self.width * 4, name="bn3")(out)
        if self.downsample:
            x = nn.Conv(
                self.width * 4, (1, 1), strides=self.stride,
                use_bias=False, name="down_conv",
            )(x)
            x = FrozenBN(self.width * 4, name="down_bn")(x)
        return nn.relu(out + x)


class ResNet(nn.Module):
    """torchvision-layout bottleneck ResNet, NHWC."""

    depths: Sequence[int] = (3, 4, 6, 3)
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x):  # (N, H, W, 3)
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False, name="conv1")(x)
        x = FrozenBN(64, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        width = 64
        for i, depth in enumerate(self.depths):
            for j in range(depth):
                stride = 2 if (i > 0 and j == 0) else 1
                down = j == 0  # first block always projects (channel change)
                x = Bottleneck(
                    width, stride=stride, downsample=down,
                    name=f"layer{i + 1}_block{j}",
                )(x)
            width *= 2
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        return nn.Dense(self.num_classes, name="fc")(x)


def resnet50(**kw):
    return ResNet(depths=(3, 4, 6, 3), **kw)


def resnet101(**kw):
    return ResNet(depths=(3, 4, 23, 3), **kw)


def convert_resnet_state_dict(state_dict) -> dict:
    """torchvision resnet50/101 state dict -> this module's param tree.

    Conv OIHW -> HWIO; bn running_mean/running_var land in the FrozenBN
    mean/var params; ``num_batches_tracked`` entries are dropped.
    """
    import re

    import numpy as np

    def to_np(v):
        try:
            return v.detach().cpu().numpy()
        except AttributeError:
            return np.asarray(v)

    out: dict = {}

    def put(path, v):
        node = out
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v

    def bn_leaf(wb):
        return {
            "weight": "scale", "bias": "bias",
            "running_mean": "mean", "running_var": "var",
        }[wb]

    for k, v in state_dict.items():
        if k.endswith("num_batches_tracked"):
            continue
        v = to_np(v)
        m = re.match(r"conv1\.weight$", k)
        if m:
            put(("conv1", "kernel"), v.transpose(2, 3, 1, 0))
            continue
        m = re.match(r"bn1\.(\w+)$", k)
        if m:
            put(("bn1", bn_leaf(m.group(1))), v)
            continue
        m = re.match(r"layer(\d)\.(\d+)\.conv(\d)\.weight$", k)
        if m:
            put(
                (f"layer{m.group(1)}_block{m.group(2)}", f"conv{m.group(3)}", "kernel"),
                v.transpose(2, 3, 1, 0),
            )
            continue
        m = re.match(r"layer(\d)\.(\d+)\.bn(\d)\.(\w+)$", k)
        if m:
            put(
                (f"layer{m.group(1)}_block{m.group(2)}", f"bn{m.group(3)}",
                 bn_leaf(m.group(4))),
                v,
            )
            continue
        m = re.match(r"layer(\d)\.(\d+)\.downsample\.0\.weight$", k)
        if m:
            put(
                (f"layer{m.group(1)}_block{m.group(2)}", "down_conv", "kernel"),
                v.transpose(2, 3, 1, 0),
            )
            continue
        m = re.match(r"layer(\d)\.(\d+)\.downsample\.1\.(\w+)$", k)
        if m:
            put(
                (f"layer{m.group(1)}_block{m.group(2)}", "down_bn",
                 bn_leaf(m.group(3))),
                v,
            )
            continue
        if k == "fc.weight":
            put(("fc", "kernel"), v.T)
        elif k == "fc.bias":
            put(("fc", "bias"), v)
    return out
