#!/usr/bin/env python3
"""Probe the axon tunnel's single-execution wall-time limit.

Repro stage 4 (exp_hash_crash_repro3.py) showed the hash train crash is
independent of the backward implementation: encode_impl="xla" (plain
autodiff) crashes at a 125-step warmup scan exactly like the sorted path,
while 10-step chunks pass.  Per-step hash warmup cost is ~0.5-1 s (25.2M
gather rows/step), so warmup-125 is a 60-120 s SINGLE XLA execution —
every workload that ever succeeded on this chip (voxel 500-step chunks,
render groups, PRVNet steps) keeps single invocations under ~3 s.
Hypothesis: the tunnel kills the worker when one execution exceeds a
wall-time watchdog.

One jitted program with a TRACED fori_loop trip count (no recompile per
duration): calibrate ms/iter, then sweep execution durations upward until
the worker dies.  The last survivor brackets the threshold.

  nohup python -u experiments/exp_exec_watchdog.py > /tmp/watchdog.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)
    k = jax.random.PRNGKey(0)
    w = jax.random.normal(k, (2048, 2048), jnp.bfloat16) * 0.01
    x = jax.random.normal(jax.random.fold_in(k, 1), (2048, 2048), jnp.bfloat16)

    @jax.jit
    def burn(n, x):
        def body(i, acc):
            return jnp.tanh(acc @ w)
        return jnp.float32(jax.lax.fori_loop(0, n, body, x).sum())

    # calibrate
    float(burn(jnp.int32(10), x))  # compile
    t0 = time.perf_counter()
    float(burn(jnp.int32(2000), x))
    per_iter = (time.perf_counter() - t0) / 2000
    print(f"calibrated {per_iter * 1e3:.3f} ms/iter", flush=True)

    for target_s in (5, 10, 20, 40, 60, 90, 120, 180, 300):
        n = max(1, int(target_s / per_iter))
        t0 = time.perf_counter()
        v = float(burn(jnp.int32(n), x))
        dt = time.perf_counter() - t0
        print(f"exec {target_s:4d}s target ({n} iters): OK in {dt:.1f}s "
              f"(val {v:.3f})", flush=True)
    print("WATCHDOG_NONE (all durations survived)", flush=True)


if __name__ == "__main__":
    main()
