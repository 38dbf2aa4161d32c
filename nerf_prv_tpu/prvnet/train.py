"""PRVNet training: AdamW + L1 on sigmoid-rescaled budgets, dp-sharded.

≙ ``train_regression.py:248-695``: AdamW with base lr 1.5e-4 scaled by
batch/256, weight decay skipped for biases/norms (the reference's
``add_weight_decay``), L1 (or MSE) between the [13,58]-rescaled sigmoid
prediction and the label, per-epoch validation reporting exact-match accuracy
and L1 distance ± std, best checkpoint kept.  torch DataParallel
(``train_regression.py:636``) becomes a ``dp`` mesh: the batch axis is
sharded over every device and XLA all-reduces the grads over ICI.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from ..parallel.mesh import batch_sharding, make_mesh, pad_to_multiple, replicated
from .data import PVBDataset
from .model import PVBNet, logits_to_budget, make_pvbnet


@dataclass
class TrainConfig:
    arch: str = "convnextv2_tiny"
    batch_size: int = 64
    blr: float = 1.5e-4
    weight_decay: float = 0.05
    epochs: int = 800
    loss_type: str = "L1"       # ≙ --loss_type L1 default path
    warmup_epochs: int = 40     # ≙ --warmup_epochs
    min_lr: float = 0.0         # ≙ --min_lr default (train_regression.py:446)
    # the reference DEFINES a warmup+cosine schedule but the per-step
    # adjust_learning_rate call is commented out (train_regression.py:449)
    # — it actually trains at constant args.lr; keep that behavior by
    # default and offer the schedule as an opt-in improvement
    use_schedule: bool = False
    min_label: int = 13
    max_label: int = 58
    seed: int = 0
    image_size: int = 720
    # gradient accumulation: the optimizer applies once per `accum_steps`
    # micro-batches of size batch_size/accum_steps, so the EFFECTIVE batch
    # (and the blr scaling below) is batch_size.  The reference config —
    # tiny@720 batch 64 (train_regression.py:258-260,497-500) — needs this
    # on the tunneled v5e: batch >= 16 fails remote compile
    # (artifacts/tiny720.json), micro-batch 8 x 8 is the measured-safe route
    accum_steps: int = 1
    # device-resident data path: upload the whole split ONCE as uint8 and
    # gather/normalize per micro-batch on device (train epochs become pure
    # device compute).  On the axon-tunneled chip the streaming path ships
    # ~250 MB of float32 pixels per effective tiny@720 batch and syncs a
    # loss readback every micro-step — the tunnel sets the epoch time
    # (~2 min/epoch for ONE optimizer application, round-4 session 3); the
    # resident path runs the same epoch in seconds.  Auto-falls back to
    # streaming when the split exceeds PRV_RESIDENT_MB (default 8192) or
    # micro_batch doesn't divide the mesh.
    device_data: bool = True

    @property
    def lr(self) -> float:
        return self.blr * self.batch_size / 256.0  # ≙ train_regression.py:607

    @property
    def micro_batch(self) -> int:
        if self.batch_size % self.accum_steps:
            raise ValueError(
                f"batch_size {self.batch_size} not divisible by "
                f"accum_steps {self.accum_steps}"
            )
        return self.batch_size // self.accum_steps


def _train_micro_batches(ds, cfg: TrainConfig, rng):
    """Micro-batches for one training epoch, accumulation-correct.

    With ``accum_steps`` k > 1, ``optax.MultiSteps`` weights every
    micro-gradient 1/k, so correctness of the "effective batch =
    batch_size" claim needs (a) every micro-batch full (a partial tail
    would give its few samples a full 1/k group weight) and (b) the number
    of micro-steps per epoch divisible by k (otherwise applications drift
    across epoch boundaries and the final partial group is silently
    dropped at training end).  This yields ``drop_last`` full micro-batches
    truncated to a multiple of k; the per-epoch reshuffle makes the
    dropped tail a different random subset each epoch (unbiased in
    expectation — standard grad-accumulation practice).
    """
    k = cfg.accum_steps
    if k <= 1:
        yield from ds.batches(cfg.micro_batch, rng=rng)
        return
    n_micro = len(ds) // cfg.micro_batch
    n_keep = (n_micro // k) * k
    if n_keep == 0:
        raise ValueError(
            f"dataset of {len(ds)} samples cannot fill one effective batch "
            f"({k} x micro {cfg.micro_batch}); lower batch_size/accum_steps"
        )
    for i, batch in enumerate(ds.batches(cfg.micro_batch, rng=rng, drop_last=True)):
        if i >= n_keep:
            break
        yield batch


def _wd_mask(params):
    """No weight decay on biases and 1-d params (≙ add_weight_decay)."""

    def mask(p):
        return jax.tree.map(lambda x: x.ndim > 1, p)

    return mask(params)


def make_optimizer(
    cfg: TrainConfig, params, steps_per_epoch: Optional[int] = None
) -> optax.GradientTransformation:
    """AdamW at constant lr by default — matching the reference's *actual*
    behavior: its warmup+cosine ``adjust_learning_rate`` call is commented
    out (train_regression.py:449), so it trains at constant args.lr.
    ``cfg.use_schedule`` opts into the (dormant) warmup+cosine schedule the
    reference defines but never runs; it needs ``steps_per_epoch``."""
    if cfg.use_schedule and steps_per_epoch:
        total = max(cfg.epochs * steps_per_epoch, 2)
        # the cosine segment (decay_steps - warmup_steps) must be non-empty
        warmup = min(cfg.warmup_epochs * steps_per_epoch, total - 1)
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=cfg.lr,
            warmup_steps=max(warmup, 1),
            decay_steps=total,
            end_value=cfg.min_lr,
        )
    else:
        lr = cfg.lr
    return optax.adamw(
        lr,
        b1=0.9,
        b2=0.999,
        weight_decay=cfg.weight_decay,
        mask=_wd_mask(params),
    )


def init_model(cfg: TrainConfig, n_views: int, image_size: Optional[int] = None):
    model = make_pvbnet(cfg.arch)
    size = image_size or cfg.image_size
    dummy = jnp.zeros((1, n_views, size, size, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(cfg.seed), dummy)["params"]
    return model, params


def loss_fn(model: PVBNet, params, views, labels, cfg: TrainConfig):
    logits = model.apply({"params": params}, views)
    pred = logits_to_budget(logits, cfg.min_label, cfg.max_label)
    if cfg.loss_type == "MSE":
        return jnp.mean((pred - labels) ** 2)
    return jnp.mean(jnp.abs(pred - labels))


def make_train_step(model: PVBNet, cfg: TrainConfig, optimizer, mesh):
    bs = batch_sharding(mesh)
    rep = replicated(mesh)

    @partial(
        jax.jit,
        in_shardings=(rep, rep, bs, bs),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0, 1),
    )
    def step(params, opt_state, views, labels):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(model, p, views, labels, cfg)
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_eval_step(model: PVBNet, cfg: TrainConfig, mesh):
    bs = batch_sharding(mesh)
    rep = replicated(mesh)

    @partial(jax.jit, in_shardings=(rep, bs), out_shardings=bs)
    def predict(params, views):
        logits = model.apply({"params": params}, views)
        return logits_to_budget(logits, cfg.min_label, cfg.max_label)

    return predict


def _use_resident(cfg: TrainConfig, ds, n_views: int, mesh) -> bool:
    """Device-resident eligibility: split fits the HBM budget and the
    micro-batch splits evenly over the mesh."""
    if not cfg.device_data:
        return False
    budget_mb = float(os.environ.get("PRV_RESIDENT_MB", "8192"))
    nbytes = len(ds) * n_views * cfg.image_size * cfg.image_size * 3
    return (
        nbytes <= budget_mb * 2**20
        and cfg.micro_batch % mesh.devices.size == 0
    )


def make_resident_epoch(model, cfg: TrainConfig, optimizer, mesh):
    """One-dispatch-per-effective-batch trainer over device-resident data.

    ``run(params, opt_state, imgs_u8, labels, idx)`` scans the
    ``(accum_steps, micro_batch)`` index rows: each row gathers its
    micro-batch from the resident uint8 stack, normalizes on device
    (/255, ≙ the torchvision ToTensor scaling the streaming path does on
    host), and applies the (MultiSteps-wrapped) optimizer.  idx shards
    over ``dp`` so the grads all-reduce over ICI exactly like
    make_train_step; the resident stacks are replicated."""
    from jax.sharding import NamedSharding, PartitionSpec

    rep = replicated(mesh)
    idx_sh = NamedSharding(mesh, PartitionSpec(None, "dp"))

    @partial(
        jax.jit,
        in_shardings=(rep, rep, rep, rep, idx_sh),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0, 1),
    )
    def run(params, opt_state, imgs_u8, labels, idx):
        def micro(carry, row):
            p, s = carry
            views = jnp.take(imgs_u8, row, axis=0).astype(jnp.float32) / 255.0
            y = jnp.take(labels, row, axis=0)
            loss, grads = jax.value_and_grad(
                lambda pp: loss_fn(model, pp, views, y, cfg)
            )(p)
            updates, s = optimizer.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s), loss

        (params, opt_state), losses = jax.lax.scan(
            micro, (params, opt_state), idx
        )
        return params, opt_state, losses

    return run


def make_resident_predict(model, cfg: TrainConfig, mesh):
    rep = replicated(mesh)
    bs = batch_sharding(mesh)

    @partial(jax.jit, in_shardings=(rep, rep, bs), out_shardings=bs)
    def run(params, imgs_u8, idx):
        views = jnp.take(imgs_u8, idx, axis=0).astype(jnp.float32) / 255.0
        logits = model.apply({"params": params}, views)
        return logits_to_budget(logits, cfg.min_label, cfg.max_label)

    return run


def _resident_metrics(
    predict_idx, params, imgs_dev, labels: np.ndarray, micro: int
) -> Dict[str, float]:
    """check_accuracy over a device-resident val split (same metrics)."""
    n = len(labels)
    preds = []
    for s in range(0, n, micro):
        idx = np.arange(s, min(s + micro, n))
        n_real = len(idx)
        if n_real < micro:  # pad with index 0, trim after
            idx = np.concatenate([idx, np.zeros(micro - n_real, np.int64)])
        p = predict_idx(params, imgs_dev, jnp.asarray(idx, jnp.int32))
        preds.extend(np.asarray(p)[:n_real].tolist())
    preds = np.asarray(preds)
    dists = np.abs(preds - labels)
    return {
        "accuracy": float((np.round(preds) == labels).mean()) if n else 0.0,
        "l1_mean": float(dists.mean()) if n else 0.0,
        "l1_std": float(dists.std()) if n else 0.0,
    }


def _resident_epoch_indices(
    n: int, cfg: TrainConfig, rng: np.random.Generator
) -> np.ndarray:
    """Shuffled (n_groups, accum_steps, micro_batch) index tensor — the
    same full-micro-batches-truncated-to-a-multiple-of-k semantics as
    _train_micro_batches."""
    k = cfg.accum_steps
    micro = cfg.micro_batch
    n_micro = n // micro
    n_keep = (n_micro // k) * k if k > 1 else n_micro
    if n_keep == 0:
        raise ValueError(
            f"dataset of {n} samples cannot fill one effective batch "
            f"({k} x micro {micro}); lower batch_size/accum_steps"
        )
    order = rng.permutation(n)[: n_keep * micro]
    return order.reshape(n_keep // k if k > 1 else n_keep, max(k, 1), micro)


def check_accuracy(
    predict, params, dataset: PVBDataset, cfg: TrainConfig, mesh
) -> Dict[str, float]:
    """≙ check_accuracy (train_regression.py:340-432): exact rounded-match
    accuracy plus L1 distance mean ± std."""
    n_dev = mesh.devices.size
    dists, correct, total = [], 0, 0
    # micro_batch: the eval forward has the same per-step HBM footprint as
    # a training micro-step, so accumulation configs eval at micro size too
    for views, labels in dataset.batches(cfg.micro_batch):
        views, n_real = pad_to_multiple(views, n_dev)
        pred = np.asarray(predict(params, views))[:n_real]
        rounded = np.round(pred)
        correct += int((rounded == labels).sum())
        total += len(labels)
        dists.extend(np.abs(pred - labels).tolist())
    dists = np.asarray(dists) if dists else np.zeros(1)
    return {
        "accuracy": correct / max(total, 1),
        "l1_mean": float(dists.mean()),
        "l1_std": float(dists.std()),
    }


def save_checkpoint(path: str, params, meta: Optional[dict] = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    blob = serialization.msgpack_serialize(
        {
            "params": jax.tree.map(np.asarray, params),
            "meta": meta or {},
        }
    )
    with open(path, "wb") as f:
        f.write(blob)


def load_checkpoint(path: str):
    with open(path, "rb") as f:
        obj = serialization.msgpack_restore(f.read())
    return obj["params"], obj.get("meta", {})


def train_regression(
    dataset_root: str,
    train_split: str,
    val_split: str,
    cfg: Optional[TrainConfig] = None,
    pattern=None,
    checkpoint_dir: str = "checkpoints",
    log_every: int = 10,
    mesh=None,
    premodel_file: Optional[str] = None,
    imagenet: bool = False,
) -> Tuple[dict, Dict[str, float]]:
    """Full trainer (≙ main(), train_regression.py:478-683).

    Returns (best params, best val metrics).  ``checkpoint_dir`` receives
    ``best_checkpoint.msgpack`` plus periodic epoch checkpoints; an existing
    best checkpoint is auto-resumed (≙ --auto_resume).

    ``premodel_file`` initializes the encoder before training
    (≙ ``--premodel_file``/``--ImageNet``, train_regression.py:617-630):
    a ``.msgpack`` path loads a Flax :func:`pretrain` checkpoint's encoder;
    anything else is torch-loaded and converted — ``imagenet=True`` for an
    official ImageNet ConvNeXt-V2 checkpoint (plain keys), ``False`` for an
    ``encoder.``-prefixed PVB checkpoint.
    """
    from .model import IMG_PATTERN

    cfg = cfg or TrainConfig()
    pattern = pattern if pattern is not None else IMG_PATTERN[4]
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size

    train_ds = PVBDataset(dataset_root, train_split, pattern, crop=cfg.image_size)
    val_ds = PVBDataset(dataset_root, val_split, pattern, crop=cfg.image_size)

    model, params = init_model(cfg, len(pattern))
    best_path = os.path.join(checkpoint_dir, "best_checkpoint.msgpack")
    best = {"accuracy": -1.0, "l1_mean": float("inf")}
    if os.path.exists(best_path):  # auto-resume (≙ utils.auto_load_model)
        params, meta = load_checkpoint(best_path)
        best = meta.get("val", best)
    elif premodel_file:
        from .infer import load_flax_encoder, load_pretrained_encoder

        if premodel_file.endswith(".msgpack"):
            pre_params, _ = load_checkpoint(premodel_file)
            params = load_flax_encoder(params, pre_params)
        else:
            import torch

            ckpt = torch.load(premodel_file, map_location="cpu", weights_only=False)
            params = load_pretrained_encoder(params, ckpt, imagenet)

    steps_per_epoch = max(-(-len(train_ds.names) // cfg.batch_size), 1)
    optimizer = make_optimizer(cfg, params, steps_per_epoch)
    if cfg.accum_steps > 1:
        # the inner optimizer (and any schedule) advances once per
        # accumulated application, i.e. per EFFECTIVE batch
        optimizer = optax.MultiSteps(optimizer, every_k_schedule=cfg.accum_steps)
    opt_state = optimizer.init(params)

    resident = _use_resident(cfg, train_ds, len(pattern), mesh)
    if resident:
        from .data import resident_arrays

        rep = replicated(mesh)
        t_imgs, t_labels = resident_arrays(train_ds)
        t_imgs = jax.device_put(t_imgs, rep)
        t_labels = jax.device_put(t_labels, rep)
        v_imgs, v_labels = resident_arrays(val_ds)
        v_imgs = jax.device_put(v_imgs, rep)
        epoch_fn = make_resident_epoch(model, cfg, optimizer, mesh)
        predict_idx = make_resident_predict(model, cfg, mesh)
    else:
        step = make_train_step(model, cfg, optimizer, mesh)
        predict = make_eval_step(model, cfg, mesh)

    rng = np.random.default_rng(cfg.seed)
    os.makedirs(checkpoint_dir, exist_ok=True)
    log_path = os.path.join(checkpoint_dir, "log.jsonl")  # ≙ tensorboardX scalars
    for epoch in range(cfg.epochs):
        if resident:
            loss_parts = []
            for grp in _resident_epoch_indices(len(train_ds), cfg, rng):
                params, opt_state, l = epoch_fn(
                    params, opt_state, t_imgs, t_labels,
                    jnp.asarray(grp, jnp.int32),
                )
                loss_parts.append(l)
            losses = np.concatenate([np.asarray(l) for l in loss_parts])
            metrics = _resident_metrics(
                predict_idx, params, v_imgs, v_labels, cfg.micro_batch
            )
        else:
            losses = []
            for views, labels in _train_micro_batches(train_ds, cfg, rng):
                views, n_real = pad_to_multiple(views, n_dev)
                labels, _ = pad_to_multiple(labels, n_dev)
                params, opt_state, loss = step(params, opt_state, views, labels)
                losses.append(float(loss))
            metrics = check_accuracy(predict, params, val_ds, cfg, mesh)
        import json

        with open(log_path, "a") as f:
            f.write(
                json.dumps(
                    {"epoch": epoch, "train_loss": float(np.mean(losses)), **metrics}
                )
                + "\n"
            )
        if epoch % log_every == 0 or epoch == cfg.epochs - 1:
            print(
                f"epoch {epoch}: loss {np.mean(losses):.4f} "
                f"val acc {metrics['accuracy']:.3f} "
                f"l1 {metrics['l1_mean']:.3f}±{metrics['l1_std']:.3f}"
            )
        # min-delta 0.01: a best-checkpoint save ships ~112 MB (tiny)
        # through the tunnel; do not resave for float-noise improvements
        if metrics["l1_mean"] < best.get("l1_mean", float("inf")) - 0.01:
            best = metrics
            save_checkpoint(best_path, params, {"val": metrics, "epoch": epoch})
    return params, best


def pretrain(
    dataset_root: str,
    train_split: str,
    val_split: Optional[str] = None,
    cfg: Optional[TrainConfig] = None,
    checkpoint_dir: str = "checkpoints",
    log_every: int = 10,
    mesh=None,
    viewspace_size: int = 64,
) -> Tuple[dict, Dict[str, float]]:
    """Single-view PVBPretrain stage (≙ ``--pre_train``,
    train_regression.py:23,50-65,101-167,578-581): every one of the 64
    coverage views is an independent (image, budget) sample; the loss is the
    same sigmoid-rescaled [13,58] regression as the K-view trainer.  The
    resulting checkpoint's ``encoder`` subtree seeds PVBNet training via
    :func:`..prvnet.infer.load_flax_encoder`.

    Writes ``best_pretrain_checkpoint.msgpack``; returns (best params,
    best val metrics) — val falls back to train-split metrics when no
    ``val_split`` is given.
    """
    import json

    from .data import PVBPretrainDataset
    from .model import make_pvbpretrain

    cfg = cfg or TrainConfig()
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size

    train_ds = PVBPretrainDataset(
        dataset_root, train_split, viewspace_size=viewspace_size, crop=cfg.image_size
    )
    val_ds = (
        PVBPretrainDataset(
            dataset_root, val_split, viewspace_size=viewspace_size, crop=cfg.image_size
        )
        if val_split
        else train_ds
    )

    model = make_pvbpretrain(cfg.arch)
    dummy = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(cfg.seed), dummy)["params"]

    best_path = os.path.join(checkpoint_dir, "best_pretrain_checkpoint.msgpack")
    best = {"accuracy": -1.0, "l1_mean": float("inf")}
    if os.path.exists(best_path):  # auto-resume (≙ utils.auto_load_model)
        params, meta = load_checkpoint(best_path)
        best = meta.get("val", best)

    steps_per_epoch = max(-(-len(train_ds) // cfg.batch_size), 1)
    optimizer = make_optimizer(cfg, params, steps_per_epoch)
    if cfg.accum_steps > 1:
        optimizer = optax.MultiSteps(optimizer, every_k_schedule=cfg.accum_steps)
    opt_state = optimizer.init(params)

    resident = _use_resident(cfg, train_ds, 1, mesh)
    if resident:
        from .data import resident_arrays

        rep = replicated(mesh)
        t_imgs, t_labels = resident_arrays(train_ds)
        t_imgs = jax.device_put(t_imgs, rep)
        t_labels = jax.device_put(t_labels, rep)
        if val_ds is train_ds:
            v_imgs, v_labels = t_imgs, np.asarray(t_labels)
        else:
            v_imgs, v_labels = resident_arrays(val_ds)
            v_imgs = jax.device_put(v_imgs, rep)
        epoch_fn = make_resident_epoch(model, cfg, optimizer, mesh)
        predict_idx = make_resident_predict(model, cfg, mesh)
    else:
        step = make_train_step(model, cfg, optimizer, mesh)
        predict = make_eval_step(model, cfg, mesh)

    rng = np.random.default_rng(cfg.seed)
    os.makedirs(checkpoint_dir, exist_ok=True)
    log_path = os.path.join(checkpoint_dir, "pretrain_log.jsonl")
    for epoch in range(cfg.epochs):
        if resident:
            loss_parts = []
            for grp in _resident_epoch_indices(len(train_ds), cfg, rng):
                params, opt_state, l = epoch_fn(
                    params, opt_state, t_imgs, t_labels,
                    jnp.asarray(grp, jnp.int32),
                )
                loss_parts.append(l)
            losses = np.concatenate([np.asarray(l) for l in loss_parts])
            metrics = _resident_metrics(
                predict_idx, params, v_imgs, v_labels, cfg.micro_batch
            )
        else:
            losses = []
            for imgs, labels in _train_micro_batches(train_ds, cfg, rng):
                imgs, n_real = pad_to_multiple(imgs, n_dev)
                labels, _ = pad_to_multiple(labels, n_dev)
                params, opt_state, loss = step(params, opt_state, imgs, labels)
                losses.append(float(loss))
            metrics = check_accuracy(predict, params, val_ds, cfg, mesh)
        with open(log_path, "a") as f:
            f.write(
                json.dumps(
                    {"epoch": epoch, "train_loss": float(np.mean(losses)), **metrics}
                )
                + "\n"
            )
        if epoch % log_every == 0 or epoch == cfg.epochs - 1:
            print(
                f"pretrain epoch {epoch}: loss {np.mean(losses):.4f} "
                f"val acc {metrics['accuracy']:.3f} "
                f"l1 {metrics['l1_mean']:.3f}±{metrics['l1_std']:.3f}"
            )
        # min-delta 0.01: a best-checkpoint save ships ~112 MB (tiny)
        # through the tunnel; do not resave for float-noise improvements
        if metrics["l1_mean"] < best.get("l1_mean", float("inf")) - 0.01:
            best = metrics
            save_checkpoint(best_path, params, {"val": metrics, "epoch": epoch})
    return params, best
