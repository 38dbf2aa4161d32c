#!/usr/bin/env python3
"""Can a Pallas kernel with the voxel grid resident in VMEM beat XLA's
~250M rows/s gather / ~60M rows/s scatter?  Plus XLA gather rate vs row
width, dtype, and table size (is it latency-per-row or bandwidth bound?).

  nohup python -u experiments/exp_vmem_gather.py > /tmp/exp_vmem.log 2>&1 &
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("device:", jax.devices()[0], flush=True)

    N = 4096 * 96
    K = 50
    rng = np.random.default_rng(0)

    def sync(x):
        return float(np.asarray(jnp.sum(x)))

    def timeit(name, fn, *args, k=K):
        try:
            sync(fn(*args, k=k))
            t0 = time.perf_counter()
            sync(fn(*args, k=k))
            el = (time.perf_counter() - t0) / k
            print(f"{name:36s} {el*1e3:8.3f} ms  ({N/el/1e6:7.1f} M rows/s)", flush=True)
            return el
        except Exception as e:
            msg = str(e).split("\n")[0][:140]
            print(f"{name:36s} FAILED: {type(e).__name__}: {msg}", flush=True)
            return None

    # ---- XLA gather rate vs (rows, width, dtype) ---------------------------
    @partial(jax.jit, static_argnames=("k",))
    def g_loop(table, idx, k):
        r = table.shape[0]
        def body(c, i):
            return c + jnp.sum(table[(idx + i) % r]) * 1e-30, None
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(k, dtype=jnp.int32))
        return c

    for rows in (4096, 64000, 512000):
        for width, dt in ((64, np.float32), (64, np.dtype(jnp.bfloat16)), (8, np.float32), (128, np.float32)):
            table = jnp.asarray(rng.normal(size=(rows, width)).astype(np.float32))
            if dt != np.float32:
                table = table.astype(jnp.bfloat16)
            idx = jnp.asarray(rng.integers(0, rows, N).astype(np.int32))
            timeit(f"xla gather r{rows} w{width} {np.dtype(dt).name}", g_loop, table, idx)

    # ---- Pallas VMEM gather ------------------------------------------------
    R, F = 64000, 64
    BLK = 8192
    table_np = rng.normal(size=(R, F)).astype(np.float32)
    idx_np = rng.integers(0, R, N).astype(np.int32)
    table = jnp.asarray(table_np)
    idx = jnp.asarray(idx_np)

    def make_gather(dtype, rows):
        def kernel(idx_ref, table_ref, out_ref):
            def body(i, _):
                out_ref[i, :] = table_ref[idx_ref[i], :]
                return 0
            jax.lax.fori_loop(0, BLK, body, 0)

        def run(table, idx):
            return pl.pallas_call(
                kernel,
                grid=(N // BLK,),
                in_specs=[
                    pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.SMEM),
                    pl.BlockSpec((rows, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BLK, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N, F), dtype),
            )(idx, table)
        return run

    pg = make_gather(jnp.float32, R)

    @partial(jax.jit, static_argnames=("k",))
    def pallas_g_loop(table, idx, k):
        def body(c, i):
            return c + jnp.sum(pg(table, (idx + i) % R)) * 1e-30, None
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(k, dtype=jnp.int32))
        return c

    # correctness
    try:
        got = np.asarray(pg(table, idx)[:100])
        ref = table_np[idx_np[:100]]
        print("pallas gather max err:", np.abs(got - ref).max(), flush=True)
    except Exception as e:
        print("pallas gather corr FAILED:", str(e).split('\n')[0][:140], flush=True)
    timeit("pallas vmem gather f32", pallas_g_loop, table, idx, k=10)

    tb16 = table.astype(jnp.bfloat16)
    pg16 = make_gather(jnp.bfloat16, R)

    @partial(jax.jit, static_argnames=("k",))
    def pallas_g16_loop(table, idx, k):
        def body(c, i):
            return c + jnp.sum(pg16(table, (idx + i) % R).astype(jnp.float32)) * 1e-30, None
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(k, dtype=jnp.int32))
        return c

    timeit("pallas vmem gather bf16", pallas_g16_loop, tb16, idx, k=10)

    # ---- Pallas VMEM scatter (unroll=1) ------------------------------------
    upd = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))

    def scatter_kernel(idx_ref, upd_ref, out_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        def body(i, _):
            r = idx_ref[i]
            out_ref[pl.ds(r, 1), :] += upd_ref[i, :][None, :]
            return 0

        jax.lax.fori_loop(0, BLK, body, 0)

    def pallas_scatter(idx, upd):
        return pl.pallas_call(
            scatter_kernel,
            grid=(N // BLK,),
            in_specs=[
                pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.SMEM),
                pl.BlockSpec((BLK, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, F), jnp.float32),
        )(idx, upd)

    @partial(jax.jit, static_argnames=("k",))
    def pallas_s_loop(idx, upd, k):
        def body(c, i):
            out = pallas_scatter(idx, upd + c)
            return c + out[0, 0] * 1e-30, None
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(k))
        return c

    try:
        ref = np.zeros((R, F), np.float32)
        np.add.at(ref, idx_np, np.asarray(upd))
        got = np.asarray(pallas_scatter(idx, upd))
        print("pallas scatter max err:", np.abs(got - ref).max(), flush=True)
    except Exception as e:
        print("pallas scatter corr FAILED:", str(e).split('\n')[0][:140], flush=True)
    timeit("pallas vmem scatter f32", pallas_s_loop, idx, upd, k=10)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
