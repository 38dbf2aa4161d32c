import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_prv_tpu.nerf.hashgrid import HashGridConfig, encode, init_table
from nerf_prv_tpu.ops import encode_sorted, hash_encode_pallas, segmented_scatter_add

CFG = HashGridConfig(levels=4, features=2, log2_table=12, n_min=4, n_max=64)


def test_segmented_scatter_add_matches_dense():
    rng = np.random.default_rng(0)
    m, rows, f = 5000, 64, 2
    idx = jnp.asarray(rng.integers(0, rows, m), jnp.int32)
    upd = jnp.asarray(rng.normal(size=(m, f)), jnp.float32)
    got = segmented_scatter_add(idx, upd, rows)
    want = jnp.zeros((rows, f)).at[idx].add(upd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_segmented_scatter_add_empty_rows():
    idx = jnp.asarray([3, 3, 3], jnp.int32)
    upd = jnp.ones((3, 1), jnp.float32)
    got = segmented_scatter_add(idx, upd, 8)
    want = np.zeros((8, 1))
    want[3] = 3.0
    np.testing.assert_allclose(np.asarray(got), want)


def test_encode_sorted_grad_matches_autodiff():
    table = init_table(jax.random.PRNGKey(0), CFG, scale=1.0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (256, 3))
    target = jax.random.normal(jax.random.PRNGKey(2), (256, CFG.out_dim))

    def loss_auto(t):
        return jnp.sum((encode(t, x, CFG) - target) ** 2)

    def loss_sorted(t):
        return jnp.sum((encode_sorted(t, x, CFG) - target) ** 2)

    np.testing.assert_allclose(
        float(loss_auto(table)), float(loss_sorted(table)), rtol=1e-6
    )
    g_auto = jax.grad(loss_auto)(table)
    g_sorted = jax.grad(loss_sorted)(table)
    np.testing.assert_allclose(
        np.asarray(g_sorted), np.asarray(g_auto), rtol=2e-3, atol=2e-4
    )


def test_pallas_encode_interpret_matches_reference():
    # hash-only config: resolutions dense-indexed in the pure path must be
    # avoided for exact parity, so use resolutions big enough to hash
    cfg = HashGridConfig(levels=3, features=2, log2_table=10, n_min=16, n_max=64)
    table = init_table(jax.random.PRNGKey(0), cfg, scale=1.0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (200, 3))
    got = hash_encode_pallas(table, x, cfg, block=64, interpret=True)
    want = encode(table, x, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_pallas_encode_padding():
    cfg = HashGridConfig(levels=2, features=2, log2_table=10, n_min=16, n_max=32)
    table = init_table(jax.random.PRNGKey(0), cfg, scale=1.0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (33, 3))  # not block-aligned
    got = hash_encode_pallas(table, x, cfg, block=32, interpret=True)
    assert got.shape == (33, cfg.out_dim)
    want = encode(table, x, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
