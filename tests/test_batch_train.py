import numpy as np
import pytest

import jax

from nerf_prv_tpu.nerf import HashGridConfig, NerfConfig, eval_nerf, load_dataset
from nerf_prv_tpu.nerf.batch_train import slice_params, stack_datasets, train_batch
from nerf_prv_tpu.parallel import make_mesh

from synthetic import write_scene

TINY = NerfConfig(
    grid=HashGridConfig(levels=4, features=2, log2_table=12, n_min=8, n_max=64),
    voxel_grid_size=20,
    voxel_features=4,
    hidden=48,
    n_samples=32,
    train_rays=512,
    n_steps=200,
)


def test_stack_datasets_pads_frames(tmp_path):
    t1, _, _, _ = write_scene(str(tmp_path / "a"), n_train=5, n_test=2, seed=1)
    t2, _, _, _ = write_scene(str(tmp_path / "b"), n_train=8, n_test=2, seed=2)
    ds = [load_dataset(t1), load_dataset(t2)]
    pixels, rot, org, n_frames = stack_datasets(ds)
    assert pixels.shape[:2] == (2, 8)
    assert list(n_frames) == [5, 8]


@pytest.mark.slow
def test_train_batch_two_objects_sharded(tmp_path):
    t1, test1, _, _ = write_scene(str(tmp_path / "a"), n_train=8, n_test=2, seed=1)
    t2, test2, _, _ = write_scene(str(tmp_path / "b"), n_train=8, n_test=2, seed=7)
    datasets = [load_dataset(t1), load_dataset(t2)]
    mesh = make_mesh(("dp",), devices=jax.devices()[:2])
    params, losses = train_batch(datasets, TINY, seed=0, mesh=mesh)
    assert losses.shape == (TINY.n_steps, 2)
    # both objects learned: end loss well below start loss
    start = losses[:20].mean(axis=0)
    end = losses[-20:].mean(axis=0)
    assert (end < start * 0.7).all(), (start, end)
    # per-object params evaluate independently
    m1 = eval_nerf(slice_params(params, 0), test1, TINY)
    m2 = eval_nerf(slice_params(params, 1), test2, TINY)
    assert m1["PSNR"] > 14 and m2["PSNR"] > 14
