"""Fused encode: Pallas forward + sorted unique-scatter backward."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..nerf.hashgrid import HashGridConfig
from .hash_encode import hash_encode_pallas
from .sorted_grad import _bwd as _sorted_bwd


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def encode_fused(table: jnp.ndarray, x: jnp.ndarray, cfg: HashGridConfig):
    """Hash encoding with the Pallas fused gather forward and the sort-based
    table gradient; positions are non-differentiable."""
    return hash_encode_pallas(table, x, cfg)


def _fwd(table, x, cfg):
    return hash_encode_pallas(table, x, cfg), x


encode_fused.defvjp(_fwd, _sorted_bwd)
