import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from nerf_prv_tpu.prvnet import (
    IMG_PATTERN,
    BudgetPredictor,
    PVBDataset,
    PVBNet,
    TrainConfig,
    center_crop,
    convert_torch_checkpoint,
    load_checkpoint,
    logits_to_budget,
    make_pvbnet,
    save_checkpoint,
    train_regression,
)
from nerf_prv_tpu.prvnet.convnextv2 import GRN, convnextv2_atto
from nerf_prv_tpu.prvnet.train import init_model


SMALL = TrainConfig(arch="convnextv2_atto", batch_size=4, epochs=2, image_size=64)


def test_grn_is_identity_at_init():
    grn = GRN(8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 8))
    params = grn.init(jax.random.PRNGKey(1), x)
    y = grn.apply(params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_convnext_atto_shapes():
    model = convnextv2_atto(num_classes=1000)
    x = jnp.zeros((2, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (2, 1000)


def test_pvbnet_variance_pooling():
    model, params = init_model(SMALL, n_views=3, image_size=64)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 64, 64, 3))
    out = model.apply({"params": params}, x)
    assert out.shape == (2,)
    # identical views -> zero variance branch; still finite output
    same = jnp.broadcast_to(x[:, :1], x.shape)
    out2 = model.apply({"params": params}, same)
    assert np.isfinite(np.asarray(out2)).all()


def test_logits_to_budget_range():
    p = logits_to_budget(jnp.array([-100.0, 0.0, 100.0]))
    np.testing.assert_allclose(np.asarray(p), [13.0, 35.5, 58.0], atol=1e-3)


def _write_fake_dataset(root, names, budgets, n_imgs=5, size=64):
    rng = np.random.default_rng(0)
    for name, b in zip(names, budgets):
        d = os.path.join(root, name)
        os.makedirs(d, exist_ok=True)
        for j in range(n_imgs):
            # brightness correlates with budget so the model can learn
            base = np.full((size, size, 3), int(b * 4), np.uint8)
            noise = rng.integers(0, 20, (size, size, 3), dtype=np.uint8)
            Image.fromarray(base + noise, "RGB").save(
                os.path.join(d, f"rgbaClip_{j}.png")
            )
        with open(os.path.join(d, "view_budget.txt"), "w") as f:
            f.write(str(b))


def test_dataset_and_center_crop(tmp_path):
    _write_fake_dataset(str(tmp_path), ["obj0", "obj1"], [20, 40])
    split = tmp_path / "split.txt"
    split.write_text("obj0\nobj1\n")
    ds = PVBDataset(str(tmp_path), str(split), pattern=IMG_PATTERN[2], crop=48)
    views, label = ds[0]
    assert views.shape == (3, 48, 48, 3)
    assert label == 20
    batches = list(ds.batches(2))
    assert batches[0][0].shape == (2, 3, 48, 48, 3)
    # crop with pad
    img = np.ones((30, 30, 3))
    out = center_crop(img, 48)
    assert out.shape == (48, 48, 3)


def test_train_and_predict_roundtrip(tmp_path):
    names = [f"obj{i}" for i in range(8)]
    budgets = [15, 20, 25, 30, 35, 40, 45, 50]
    root = str(tmp_path / "ds")
    _write_fake_dataset(root, names, budgets)
    (tmp_path / "train.txt").write_text("\n".join(names[:6]))
    (tmp_path / "val.txt").write_text("\n".join(names[6:]))
    params, best = train_regression(
        root,
        str(tmp_path / "train.txt"),
        str(tmp_path / "val.txt"),
        cfg=SMALL,
        pattern=IMG_PATTERN[2],
        checkpoint_dir=str(tmp_path / "ckpt"),
        log_every=100,
    )
    assert best["l1_mean"] < 30  # sane range
    ckpt = str(tmp_path / "ckpt" / "best_checkpoint.msgpack")
    assert os.path.exists(ckpt)
    pred = BudgetPredictor(
        ckpt, arch="convnextv2_atto", pattern=IMG_PATTERN[2], crop=64
    )
    b = pred.predict_from_coverage(os.path.join(root, "obj0"), IMG_PATTERN[2])
    assert 13 <= b <= 58


def test_checkpoint_roundtrip(tmp_path):
    _, params = init_model(SMALL, n_views=2, image_size=64)
    p = str(tmp_path / "c.msgpack")
    save_checkpoint(p, params, {"val": {"l1_mean": 1.0}})
    params2, meta = load_checkpoint(p)
    assert meta["val"]["l1_mean"] == 1.0
    chex_equal = jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)), params, params2
    )
    assert all(jax.tree.leaves(chex_equal))


def test_torch_checkpoint_converter_structure():
    model, params = init_model(SMALL, n_views=2, image_size=64)

    # build a torch-style state dict with matching shapes from our tree
    sd = {}
    enc = params["encoder"]
    sd["encoder.downsample_layers.0.0.weight"] = np.moveaxis(
        np.asarray(enc["stem_conv"]["kernel"]), (0, 1, 2, 3), (2, 3, 1, 0)
    )
    sd["encoder.downsample_layers.0.0.bias"] = np.asarray(enc["stem_conv"]["bias"])
    sd["encoder.downsample_layers.0.1.weight"] = np.asarray(enc["stem_norm"]["scale"])
    sd["encoder.downsample_layers.0.1.bias"] = np.asarray(enc["stem_norm"]["bias"])
    conv = convert_torch_checkpoint(sd)
    np.testing.assert_allclose(
        conv["encoder"]["stem_conv"]["kernel"], np.asarray(enc["stem_conv"]["kernel"])
    )
    np.testing.assert_allclose(
        conv["encoder"]["stem_norm"]["scale"], np.asarray(enc["stem_norm"]["scale"])
    )


def test_optimizer_schedule_warmup_cosine():
    """make_optimizer with steps_per_epoch builds warmup->peak->cosine->min_lr
    (≙ the reference's timm cosine_scheduler)."""
    import optax

    from nerf_prv_tpu.prvnet.train import TrainConfig, make_optimizer

    cfg = TrainConfig(arch="convnextv2_atto", epochs=10, warmup_epochs=2,
                      batch_size=4, blr=1e-2, image_size=32)
    # rebuild the schedule the optimizer uses and check its shape
    spe = 5
    total = cfg.epochs * spe
    warm = cfg.warmup_epochs * spe
    sched = optax.warmup_cosine_decay_schedule(
        0.0, cfg.lr, warm, total, cfg.min_lr
    )
    vals = [float(sched(s)) for s in (0, warm, total)]
    assert vals[0] == 0.0
    assert vals[1] == pytest.approx(cfg.lr, rel=1e-5)
    assert vals[2] == pytest.approx(cfg.min_lr, rel=1e-2)
    # and the optimizer construction itself accepts steps_per_epoch,
    # including the epochs <= warmup_epochs edge (non-empty cosine segment)
    import jax
    import jax.numpy as jnp

    params = {"w": jnp.ones((3, 3)), "b": jnp.zeros((3,))}
    for epochs in (10, 1):
        c = TrainConfig(arch="convnextv2_atto", epochs=epochs, warmup_epochs=40,
                        batch_size=4, image_size=32)
        opt = make_optimizer(c, params, steps_per_epoch=spe)
        state = opt.init(params)
        g = jax.tree.map(jnp.ones_like, params)
        updates, _ = opt.update(g, state, params)
        assert jnp.isfinite(updates["w"]).all()
