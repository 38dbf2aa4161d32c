#!/usr/bin/env python3
"""Does a multi-bank VMEM accumulator pipeline the per-row scatter loop?

Hypothesis: the ~16 ns/row scatter floor is read-modify-write latency on
a single accumulator; K banks with iteration i -> bank i%K break the
dependence chain (requires a final K-way add).

  nohup python -u experiments/exp_scatter_banks.py > /tmp/exp_banks.log 2>&1 &
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
    N = 4096 * 32          # tight-step production update count
    R = 40 * 40 * 40
    F = 64
    BLK = 8192
    rng = np.random.default_rng(0)
    idx_np = rng.integers(0, R, N).astype(np.int32)
    idx = jnp.asarray(idx_np)
    upd = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))

    def sync(x):
        return float(np.asarray(jnp.sum(x)))

    def timeit(name, fn, *args, k=20):
        try:
            sync(fn(*args, k=k))
            t0 = time.perf_counter()
            sync(fn(*args, k=k))
            el = (time.perf_counter() - t0) / k
            print(f"{name:28s} {el*1e3:8.3f} ms  ({N/el/1e6:6.1f} M rows/s)", flush=True)
        except Exception as e:
            print(f"{name:28s} FAILED: {str(e).splitlines()[0][:120]}", flush=True)

    @partial(jax.jit, static_argnames=("k",))
    def xla_ref(idx, upd, k):
        def body(c, i):
            out = jnp.zeros((R, F), jnp.float32).at[idx].add(upd + c)
            return c + out[0, 0] * 1e-30, None
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(k))
        return c

    timeit("xla_f32 (131k rows)", xla_ref, idx, upd)

    def make_banked(n_banks):
        def kernel(idx_ref, upd_ref, out_ref, acc_ref):
            step = pl.program_id(0)

            @pl.when(step == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)

            def body(i, _):
                b = i % n_banks
                r = idx_ref[i]
                acc_ref[pl.ds(b * R + r, 1), :] += upd_ref[i, :][None, :]
                return 0

            jax.lax.fori_loop(0, BLK, body, 0)

            @pl.when(step == pl.num_programs(0) - 1)
            def _():
                total = acc_ref[pl.ds(0, R), :]
                for b in range(1, n_banks):
                    total = total + acc_ref[pl.ds(b * R, R), :]
                out_ref[:] = total

        def run(idx, upd):
            return pl.pallas_call(
                kernel,
                grid=(N // BLK,),
                in_specs=[
                    pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.SMEM),
                    pl.BlockSpec((BLK, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((R, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((R, F), jnp.float32),
                scratch_shapes=[pltpu.VMEM((n_banks * R, F), jnp.float32)],
            )(idx, upd)
        return run

    for nb in (1, 2, 4):
        run = make_banked(nb)

        @partial(jax.jit, static_argnames=("k",))
        def loop(idx, upd, k, run=run):
            def body(c, i):
                out = run(idx, upd + c)
                return c + out[0, 0] * 1e-30, None
            c, _ = jax.lax.scan(body, 0.0, jnp.arange(k))
            return c

        try:
            ref = np.zeros((R, F), np.float32)
            np.add.at(ref, idx_np, np.asarray(upd))
            got = np.asarray(run(idx, upd))
            err = float(np.abs(got - ref).max())
            print(f"banks={nb} max err {err:.2e}", flush=True)
        except Exception as e:
            print(f"banks={nb} corr FAILED: {str(e).splitlines()[0][:120]}", flush=True)
            continue
        timeit(f"pallas banks={nb}", loop, idx, upd, k=10)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
