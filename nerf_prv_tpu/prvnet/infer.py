"""PRVNet inference: view-budget prediction.

≙ ``PRVNet/infer_server.py:39-100``: load the best checkpoint, read the
pattern-[0,1,3] images, forward, ``round(13 + 45 * sigmoid(logit))``.  The
polling file-IPC daemon equivalent lives in ``servers/infer_server.py``; this
module is the in-process call the pipeline uses directly.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .data import center_crop, load_rgb
from .model import IMG_PATTERN, logits_to_budget, make_pvbnet
from .train import TrainConfig, load_checkpoint


class BudgetPredictor:
    """Loads a checkpoint once and predicts integer view budgets."""

    def __init__(
        self,
        checkpoint_path: Optional[str] = None,
        params=None,
        arch: str = "convnextv2_tiny",
        min_label: int = 13,
        max_label: int = 58,
        pattern: Sequence[int] = tuple(IMG_PATTERN[2]),
        crop: int = 720,
    ):
        if params is None:
            if checkpoint_path is None or not os.path.exists(checkpoint_path):
                raise FileNotFoundError(f"PRVNet checkpoint missing: {checkpoint_path}")
            params, _ = load_checkpoint(checkpoint_path)
        self.params = params
        self.model = make_pvbnet(arch)
        self.min_label = min_label
        self.max_label = max_label
        self.pattern = list(pattern)
        self.crop = crop
        self._apply = jax.jit(
            lambda p, v: logits_to_budget(
                self.model.apply({"params": p}, v), min_label, max_label
            )
        )

    def predict_from_arrays(self, views: np.ndarray) -> int:
        """views: (K, H, W, 3) float [0,1]; duplicate single views
        (≙ infer_server.py:84-87)."""
        if views.shape[0] == 1:
            views = np.concatenate([views, views], axis=0)
        pred = self._apply(self.params, jnp.asarray(views)[None])
        return int(np.round(float(pred[0])))

    def predict_from_dir(self, images_dir: str) -> int:
        """Read ``<dir>/<idx>.png`` per the inference pattern
        (≙ infer_server.py:80-88)."""
        views = np.stack(
            [
                load_rgb(os.path.join(images_dir, f"{idx}.png"), self.crop)
                for idx in self.pattern
            ]
        )
        return self.predict_from_arrays(views)

    def predict_from_coverage(self, coverage_dir: str, view_ids: Sequence[int]) -> int:
        """Read ``rgbaClip_<id>.png`` from a coverage directory (the pipeline's
        init views, ≙ main.cpp:2167-2173)."""
        views = np.stack(
            [
                load_rgb(os.path.join(coverage_dir, f"rgbaClip_{i}.png"), self.crop)
                for i in view_ids
            ]
        )
        return self.predict_from_arrays(views)


def _to_np(v):
    try:
        return v.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(v)


def convert_torch_checkpoint(state_dict) -> dict:
    """Best-effort mapping of the reference's PyTorch ``best_checkpoint.pth``
    (``model_state_dict`` with ``module.`` prefixes, ≙ infer_server.py:64-69)
    into this package's Flax param tree.  Requires torch tensors or numpy
    arrays as values."""
    sd = {k[7:] if k.startswith("module.") else k: _to_np(v) for k, v in state_dict.items()}
    params: dict = {"encoder": {}}

    def put(tree, path, value):
        node = tree
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = value

    for k, v in sd.items():
        if k.startswith("fc_layer."):
            i = int(k.split(".")[1])
            name = ("kernel", v.T) if k.endswith("weight") else ("bias", v)
            put(params, (f"fc{i}", name[0]), name[1])
            continue
        if not k.startswith("encoder."):
            continue
        _convert_encoder_key(params["encoder"], k[len("encoder.") :], v)
    return params


def convert_encoder_state_dict(state_dict) -> dict:
    """Torch *encoder-only* state dict (plain keys, e.g. an ImageNet
    checkpoint's ``checkpoint['model']``) -> Flax encoder subtree.

    Dispatches on the key layout: ConvNeXt-V2 checkpoints carry
    ``downsample_layers.*`` keys, torchvision ResNets carry ``layer1.*``
    (≙ the reference's convnext vs --resnet50/--resnet101 paths).
    """
    if any(k.startswith("layer1.") for k in state_dict):
        from .resnet import convert_resnet_state_dict

        return convert_resnet_state_dict(state_dict)
    enc: dict = {}
    for k, v in state_dict.items():
        _convert_encoder_key(enc, k, _to_np(v))
    return enc


def load_pretrained_encoder(params: dict, checkpoint, imagenet: bool) -> dict:
    """Initialize ``params['encoder']`` from a torch checkpoint — the
    reference's pre-training handoff (≙ ``train_regression.py:617-630``,
    ``--premodel_file`` / ``--ImageNet``).

    ``imagenet=True``: the checkpoint's ``model`` entry holds plain
    ConvNeXt-V2 keys (an official ImageNet checkpoint) and loads directly
    into the encoder.  ``imagenet=False``: the checkpoint is a PVBPretrain
    state dict whose encoder keys carry ``module.encoder.`` / ``encoder.``
    prefixes; only those keys are taken, prefix-stripped (≙ the key[15:] /
    key[8:] slicing at train_regression.py:623-630, generalized to any
    prefix depth).

    Strict like ``load_state_dict``: the converted tree must cover the
    model's encoder leaves exactly, with matching shapes.
    """
    import jax

    sd = checkpoint.get("model", checkpoint) if isinstance(checkpoint, dict) else checkpoint
    if not imagenet:
        stripped = {}
        for k, v in sd.items():
            at = k.find("encoder.")
            if at >= 0:
                stripped[k[at + len("encoder.") :]] = v
        sd = stripped
    enc = convert_encoder_state_dict(sd)

    want = params["encoder"]
    want_leaves = {p: l for p, l in _flatten(want)}
    got_leaves = {p: l for p, l in _flatten(enc)}
    missing = sorted(set(want_leaves) - set(got_leaves))
    unexpected = sorted(set(got_leaves) - set(want_leaves))
    if missing or unexpected:
        raise ValueError(
            f"encoder checkpoint mismatch: missing={missing[:5]}"
            f"{'...' if len(missing) > 5 else ''} "
            f"unexpected={unexpected[:5]}{'...' if len(unexpected) > 5 else ''}"
        )
    for p, l in want_leaves.items():
        if tuple(np.shape(got_leaves[p])) != tuple(np.shape(l)):
            raise ValueError(
                f"encoder param {'/'.join(p)}: checkpoint shape "
                f"{np.shape(got_leaves[p])} != model shape {np.shape(l)}"
            )
    out = dict(params)
    out["encoder"] = jax.tree.map(jnp.asarray, enc)
    return out


def load_flax_encoder(params: dict, pretrain_params: dict) -> dict:
    """Copy the encoder subtree from a Flax PVBPretrain checkpoint into a
    PVBNet param tree (both name the shared submodule ``encoder``)."""
    out = dict(params)
    out["encoder"] = pretrain_params["encoder"]
    return out


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,))
    else:
        yield prefix, tree


def _convert_encoder_key(enc: dict, k: str, v) -> None:
    """Map one prefix-stripped torch ConvNeXt-V2 key into the Flax encoder
    subtree (torch OIHW conv -> flax HWIO, Linear weight -> transposed
    kernel, norm weight/bias -> scale/bias)."""
    import re

    def put(tree, path, value):
        node = tree
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = value

    m = re.match(r"downsample_layers\.0\.(\d)\.(weight|bias)", k)
    if m:
        layer, wb = int(m.group(1)), m.group(2)
        if layer == 0:  # stem conv: torch OIHW -> flax HWIO
            put(enc, ("stem_conv", "kernel" if wb == "weight" else "bias"),
                v.transpose(2, 3, 1, 0) if wb == "weight" else v)
        else:
            put(enc, ("stem_norm", "scale" if wb == "weight" else "bias"), v)
        return
    m = re.match(r"downsample_layers\.(\d)\.(\d)\.(weight|bias)", k)
    if m:
        stage, layer, wb = int(m.group(1)), int(m.group(2)), m.group(3)
        if layer == 0:
            put(enc, (f"downsample_norm{stage}", "scale" if wb == "weight" else "bias"), v)
        else:
            put(enc, (f"downsample_conv{stage}", "kernel" if wb == "weight" else "bias"),
                v.transpose(2, 3, 1, 0) if wb == "weight" else v)
        return
    m = re.match(r"stages\.(\d)\.(\d+)\.(.+)", k)
    if m:
        stage, block, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        prefix = f"stage{stage}_block{block}"
        if rest == "dwconv.weight":
            put(enc, (prefix, "dwconv", "kernel"), v.transpose(2, 3, 1, 0))
        elif rest == "dwconv.bias":
            put(enc, (prefix, "dwconv", "bias"), v)
        elif rest == "norm.weight":
            put(enc, (prefix, "norm", "scale"), v)
        elif rest == "norm.bias":
            put(enc, (prefix, "norm", "bias"), v)
        elif rest == "pwconv1.weight":
            put(enc, (prefix, "pwconv1", "kernel"), v.T)
        elif rest == "pwconv1.bias":
            put(enc, (prefix, "pwconv1", "bias"), v)
        elif rest == "pwconv2.weight":
            put(enc, (prefix, "pwconv2", "kernel"), v.T)
        elif rest == "pwconv2.bias":
            put(enc, (prefix, "pwconv2", "bias"), v)
        elif rest == "grn.gamma":
            put(enc, (prefix, "grn", "gamma"), v.reshape(1, 1, 1, -1))
        elif rest == "grn.beta":
            put(enc, (prefix, "grn", "beta"), v.reshape(1, 1, 1, -1))
        return
    if k == "norm.weight":
        put(enc, ("head_norm", "scale"), v)
    elif k == "norm.bias":
        put(enc, ("head_norm", "bias"), v)
    elif k == "head.weight":
        put(enc, ("head", "kernel"), v.T)
    elif k == "head.bias":
        put(enc, ("head", "bias"), v)
