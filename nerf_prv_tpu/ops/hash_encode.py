"""Pallas TPU kernel: fused multiresolution hash encoding.

The XLA gather path materializes per-level corner tensors
((N, 8, F) values + (N, 8) indices + weights x 16 levels) in HBM — measured
at ~7-25 KB of temp per sample, which caps the train batch well below
instant-ngp's scale.  This kernel fuses index hashing, the 8-corner gather
and the trilinear blend per (level, sample-block) grid cell: one level's
table (4 MB) sits in VMEM while sample blocks stream through, and nothing
but the (N, F) per-level output ever hits HBM.

Gathers use ``jnp.take`` on the VMEM-resident table, which Mosaic lowers to
the TPU dynamic-gather path.  Falls back to the pure-JAX encode when the
kernel cannot be used (CPU tests run it with ``interpret=True``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..nerf.hashgrid import _PRIMES, HashGridConfig

_CORNER_OFFSETS = [(i, j, k) for i in (0, 1) for j in (0, 1) for k in (0, 1)]


def _encode_kernel(res_ref, x_ref, table_ref, out_ref, *, table_size: int, features: int):
    level = pl.program_id(0)
    res = res_ref[level]
    res_f = res.astype(jnp.float32)
    # dense indexing for levels whose full grid fits the table, hash beyond
    # (matching ``hashgrid._corner_indices``); the choice is data-independent
    # per level so the select is uniform across the block
    dense = ((res + 1) * (res + 1) * (res + 1)) <= table_size
    x = x_ref[...]  # (B, 3)
    pos = x * res_f
    # boundary clamp (see hashgrid.encode): without it a sample at x == 1.0
    # makes corner index res+1 — OOB for dense levels; Mosaic's dynamic
    # take has no XLA-style clamping, so the read is undefined
    cell_i = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, res - 1)
    frac = pos - cell_i.astype(jnp.float32)
    cell = cell_i.astype(jnp.uint32)
    table = table_ref[0]  # (T, F) in VMEM
    res1 = (res + 1).astype(jnp.uint32)

    acc = jnp.zeros((x.shape[0], features), jnp.float32)
    for di, dj, dk in _CORNER_OFFSETS:
        cx = cell[:, 0] + jnp.uint32(di)
        cy = cell[:, 1] + jnp.uint32(dj)
        cz = cell[:, 2] + jnp.uint32(dk)
        hash_idx = (
            cx * jnp.uint32(_PRIMES[0])
            ^ cy * jnp.uint32(_PRIMES[1])
            ^ cz * jnp.uint32(_PRIMES[2])
        ) & jnp.uint32(table_size - 1)
        dense_idx = cx + cy * res1 + cz * res1 * res1
        idx = jnp.where(dense, dense_idx, hash_idx)
        vals = jnp.take(table, idx.astype(jnp.int32), axis=0)  # (B, F)
        wx = jnp.where(di == 1, frac[:, 0], 1.0 - frac[:, 0])
        wy = jnp.where(dj == 1, frac[:, 1], 1.0 - frac[:, 1])
        wz = jnp.where(dk == 1, frac[:, 2], 1.0 - frac[:, 2])
        acc = acc + vals * (wx * wy * wz)[:, None]
    out_ref[0] = acc


@partial(jax.jit, static_argnames=("cfg", "block", "interpret"))
def hash_encode_pallas(
    table: jnp.ndarray,
    x: jnp.ndarray,
    cfg: HashGridConfig,
    block: int = 4096,
    interpret: bool = False,
) -> jnp.ndarray:
    """x (N, 3) in [0,1]^3 -> features (N, levels*features).

    Indexing matches :func:`nerf_prv_tpu.nerf.hashgrid.encode` exactly
    (dense for levels whose grid fits the table, spatial hash beyond).
    """
    n = x.shape[0]
    t, f = cfg.table_size, cfg.features
    levels = cfg.levels
    pad = (-n) % block
    x_pad = jnp.pad(x, ((0, pad), (0, 0)))
    n_blocks = (n + pad) // block
    resolutions = jnp.asarray(cfg.resolutions(), jnp.int32)
    table3 = table.reshape(levels, t, f)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(levels, n_blocks),
        in_specs=[
            pl.BlockSpec((block, 3), lambda l, b, res: (b, 0)),
            pl.BlockSpec((1, t, f), lambda l, b, res: (l, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block, f), lambda l, b, res: (l, b, 0)),
    )
    out = pl.pallas_call(
        partial(_encode_kernel, table_size=t, features=f),
        out_shape=jax.ShapeDtypeStruct((levels, n + pad, f), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(resolutions, x_pad, table3)
    # (L, N, F) -> (N, L*F)
    out = jnp.moveaxis(out[:, :n], 0, 1).reshape(n, levels * f)
    return out
