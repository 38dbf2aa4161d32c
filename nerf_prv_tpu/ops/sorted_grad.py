"""Sort-based hash-table gradient: scatter-add with unique indices.

The natural VJP of the hash-grid gather is a scatter-add of N*8*levels
updates with heavily duplicated indices; XLA's TPU lowering of
duplicate-index scatter serializes and dominates the train step.  This
custom VJP reorganizes the backward pass as

    sort updates by table index  ->  segmented sums (cumsum + run bounds)
    ->  scatter of per-run totals at unique positions,

turning the reduction into sort + cumsum + a scatter whose indices are
provably unique (duplicates are routed to a dummy row), which XLA can
execute fully in parallel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..nerf.hashgrid import HashGridConfig, _CORNERS, _corner_indices, encode


def _levelwise_indices_weights(x: jnp.ndarray, cfg: HashGridConfig):
    """All (index, trilinear weight) pairs: (levels, N, 8) each, with the
    per-level table offset folded into the index."""
    corners = jnp.asarray(_CORNERS)
    idx_all, w_all = [], []
    for level, res in enumerate(cfg.resolutions()):
        pos = x * res
        # same boundary clamp as hashgrid.encode — keeps backward indices
        # identical to the forward gather's
        cell = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, int(res) - 1)
        frac = pos - cell
        cpos = cell[:, None, :] + corners[None, :, :]
        idx = _corner_indices(cpos, int(res), cfg.table_size) + level * cfg.table_size
        w = jnp.where(corners[None, :, :] == 1, frac[:, None, :], 1.0 - frac[:, None, :])
        w = w[..., 0] * w[..., 1] * w[..., 2]
        idx_all.append(idx)
        w_all.append(w)
    return jnp.stack(idx_all), jnp.stack(w_all)


def segmented_scatter_add(indices: jnp.ndarray, updates: jnp.ndarray, n_rows: int):
    """Equivalent of ``zeros((n_rows, F)).at[indices].add(updates)`` via
    sort + segmented sums + unique-index scatter.

    indices: (M,) int32, updates: (M, F) float32.
    """
    m, f = updates.shape
    order = jnp.argsort(indices)
    sidx = indices[order]
    svals = updates[order]
    csum = jnp.cumsum(svals, axis=0)
    pos = jnp.arange(m, dtype=jnp.int32)
    is_last = jnp.concatenate([sidx[1:] != sidx[:-1], jnp.array([True])])
    # index of the previous run's last element (or -1)
    last_marks = jnp.where(is_last, pos, -1)
    prev_last = jnp.concatenate(
        [jnp.array([-1], jnp.int32), jax.lax.cummax(last_marks)[:-1]]
    )
    prev_csum = jnp.where(
        (prev_last >= 0)[:, None], csum[jnp.maximum(prev_last, 0)], 0.0
    )
    run_totals = csum - prev_csum
    # duplicates scatter OUT of bounds and are dropped, so every index that
    # actually writes is unique — the same pattern as train.build_hit_pool's
    # iota scatter.  An earlier version kept the sentinel row IN bounds at
    # ``n_rows`` in a (n_rows+1, f) output with ``indices_are_sorted=True``
    # as well — both promises were false (sentinels repeat and interleave
    # among the sorted run-ends), which is undefined behavior for the XLA
    # scatter lowering.  (The round-3 hash train crash initially blamed on
    # this turned out to be the axon execution watchdog — see
    # experiments/exp_exec_watchdog.py — but the UB stays fixed.)
    scatter_idx = jnp.where(is_last, sidx, n_rows)
    out = jnp.zeros((n_rows, f), updates.dtype)
    out = out.at[scatter_idx].add(
        jnp.where(is_last[:, None], run_totals, 0.0),
        unique_indices=True,
        mode="drop",
    )
    return out


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def encode_sorted(table: jnp.ndarray, x: jnp.ndarray, cfg: HashGridConfig):
    """Hash encoding whose backward uses the sorted unique scatter.

    Positions are treated as non-differentiable (the pipeline never
    backpropagates into camera geometry)."""
    return encode(table, x, cfg)


def _fwd(table, x, cfg):
    return encode(table, x, cfg), x


def _bwd(cfg, x, g):
    # g: (N, levels*features)
    n = x.shape[0]
    f = cfg.features
    idx_all, w_all = _levelwise_indices_weights(x, cfg)  # (L, N, 8)
    g_lvl = g.reshape(n, cfg.levels, f).transpose(1, 0, 2)  # (L, N, F)
    updates = w_all[..., None] * g_lvl[:, :, None, :]  # (L, N, 8, F)
    flat_idx = idx_all.reshape(-1).astype(jnp.int32)
    flat_upd = updates.reshape(-1, f)
    d_table = segmented_scatter_add(flat_idx, flat_upd, cfg.levels * cfg.table_size)
    return d_table, jnp.zeros_like(x)


encode_sorted.defvjp(_fwd, _bwd)
