#!/usr/bin/env python
"""Measure the per-dispatch + scalar-fetch floor of this backend (the axon
tunnel adds real latency to every host-visible result), and the same
program timed with an IN-JIT lax.scan repeat — the difference calibrates
every small-program number in tools/bench_*.py.

The chained-accumulator pattern (bench.py _timed) pays ~one tunnel
round-trip per measurement batch; with n outer iterations the reported
per-iteration time carries +RTT/n. Programs in the 10-20 ms range need
either large n or the scan-in-jit repeat below.

Run from the repo root:  python tools/bench_overhead.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    from mpiflow_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    x = jnp.asarray(np.random.RandomState(0).rand(8, 128).astype(np.float32))
    tiny = jax.jit(lambda x: jnp.sum(x * 1.000001))

    # ---- chained-accumulator floor at several n -------------------------
    for n in (1, 3, 10, 30, 100):
        acc = tiny(x)
        float(acc)
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        for _ in range(n):
            acc = acc + tiny(x + acc * 1e-20)
        float(acc)
        dt = (time.perf_counter() - t0) / n
        print(f"tiny-op chained n={n:3d}: {dt * 1e3:8.3f} ms/iter", flush=True)

    # ---- in-jit scan repeat ---------------------------------------------
    @jax.jit
    def rep(x):
        def body(acc, _):
            return acc + jnp.sum(x * 1.000001 + acc * 1e-20), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=100)
        return acc

    acc = rep(x)
    float(acc)
    t0 = time.perf_counter()
    float(rep(x))
    dt = time.perf_counter() - t0
    print(f"tiny-op scan(100) in one dispatch: {dt * 1e3:8.3f} ms total "
          f"= {dt * 10:8.3f} us/iter", flush=True)

    # the matmul from bench_conv_tricks c5, timed both ways ---------------
    a = jnp.asarray(np.random.RandomState(1).rand(491520, 1152), jnp.bfloat16)
    wm = jnp.asarray(np.random.RandomState(2).rand(1152, 128), jnp.bfloat16)

    mm = jax.jit(lambda aa: jnp.sum(jax.lax.dot_general(
        aa, wm, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)))
    for n in (3, 30):
        acc = mm(a)
        float(acc)
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        for _ in range(n):
            acc = acc + mm(a + acc * 1e-20)
        float(acc)
        dt = (time.perf_counter() - t0) / n
        tf = 2 * 491520 * 1152 * 128 / 1e12 / dt
        print(f"matmul chained n={n:3d}: {dt * 1e3:8.2f} ms/iter "
              f"({tf:6.1f} TF/s, {100 * tf / 197:5.1f}% peak)", flush=True)

    @jax.jit
    def mm_rep(aa):
        def body(acc, _):
            # perturb the SMALL operand to defeat CSE -- perturbing `aa`
            # would add a 1.1 GB elementwise pass per iteration
            y = jax.lax.dot_general(aa, wm + acc * 1e-20,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return acc + jnp.sum(y), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=10)
        return acc

    acc = mm_rep(a)
    float(acc)
    t0 = time.perf_counter()
    float(mm_rep(a))
    dt = (time.perf_counter() - t0) / 10
    tf = 2 * 491520 * 1152 * 128 / 1e12 / dt
    print(f"matmul scan(10) in one dispatch: {dt * 1e3:8.2f} ms/iter "
          f"({tf:6.1f} TF/s, {100 * tf / 197:5.1f}% peak)", flush=True)


if __name__ == "__main__":
    main()
