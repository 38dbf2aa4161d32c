#!/usr/bin/env python3
"""Minimal chip repro for the hash-field TPU worker crash (round 3).

exp_hashgrid_r3 faulted the TPU worker on the hash field's FIRST train
chunk (voxel trained fine).  Hypothesis: ``segmented_scatter_add`` in
ops/sorted_grad.py promises ``indices_are_sorted=True, unique_indices=True``
to XLA while its scatter indices are neither — the dummy row ``n_rows`` is
IN-bounds in the ``(n_rows+1, F)`` output, appears once per duplicate, and
interleaves among the sorted real indices.  That is undefined behavior in
the TPU scatter lowering.  (The codebase's proven-safe pattern —
build_hit_pool, render partition — differs exactly there: its dummy index
is OUT of bounds and dropped.)

Stages, each isolated so the log shows which one faults:
  1. encode_sorted forward only (gathers)            -> expected OK
  2. grad of encode_sorted (the suspect scatter)     -> expected CRASH
Run nohup'd; one TPU process at a time (see PERF.md / memory).

  nohup python -u experiments/exp_hash_crash_repro.py > /tmp/hash_repro2.log 2>&1 &
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from nerf_prv_tpu.nerf.hashgrid import HashGridConfig, init_table
from nerf_prv_tpu.ops.sorted_grad import encode_sorted


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = HashGridConfig()
    key = jax.random.PRNGKey(0)
    kx, kt = jax.random.split(key)
    # sample count matching a tight train step: 4096 rays x 64 samples
    x = jax.random.uniform(kx, (4096 * 64, 3))
    table = init_table(kt, cfg)

    y = jax.jit(lambda t: encode_sorted(t, x, cfg).sum())(table)
    print("stage1 forward ok:", float(y), flush=True)

    g = jax.jit(jax.grad(lambda t: encode_sorted(t, x, cfg).sum()))(table)
    print("stage2 grad ok:", float(g.sum()), flush=True)
    print("REPRO_DONE", flush=True)


if __name__ == "__main__":
    main()
