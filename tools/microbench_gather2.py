"""Gather micro-bench v2: table-size sweep, row-width sweep, and a VALID
dense-matmul measurement (v1's dense/control numbers were hoisted: a
full-size dynamic_slice start clamps to 0 and constant-folds, making the
op loop-invariant — v2 threads the dependence through the VALUES).

All arrays are generated ON DEVICE (jax.random) — tunnel transfers for
GB-scale operands dominate wall time otherwise.
"""
import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def timed_pair(fn, args, k_lo=2, k_hi=6, repeats=3):
    @functools.partial(jax.jit, static_argnums=0)
    def loop(iters, *a):
        def body(i, c):
            return fn(c, *a)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    def measure(k):
        float(loop(k, *args))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(loop(k, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    return (measure(k_hi) - measure(k_lo)) / (k_hi - k_lo)


def dep(c):
    return (c * 0).astype(jnp.int32)


res = {}


def run(name, fn, args, rows):
    dt = timed_pair(fn, args)
    res[name] = dt
    print(f"{name:32s} {dt*1e3:9.2f} ms  ({dt/rows*1e9:7.3f} ns/row)",
          flush=True)


def main():
    E = 8_000_000
    key = jax.random.PRNGKey(0)

    def gsum(c, xx, jj):
        return xx[jj + dep(c)].sum() * 1e-30

    # 1) table-size sweep at F=128 f32
    for n in (32_768, 65_536, 131_072, 262_144, 524_288, 1_048_576):
        k1, k2, key = jax.random.split(key, 3)
        x = jax.random.normal(k1, (n, 128), jnp.float32)
        j = jax.random.randint(k2, (E,), 0, n, jnp.int32)
        run(f"gather_table_{n//1024}k_F128", gsum, (x, j), E)
        del x, j

    # 2) row-width sweep, 1M-row table
    N = 1_048_576
    k2, key = jax.random.split(key)
    j = jax.random.randint(k2, (E,), 0, N, jnp.int32)
    for F, dt_ in ((64, jnp.float32), (96, jnp.float32), (128, jnp.bfloat16),
                   (256, jnp.float32)):
        k1, key = jax.random.split(key)
        x = jax.random.normal(k1, (N, F), dt_)
        run(f"gather_F{F}_{dt_.__name__}", gsum, (x, j), E)
        del x

    # 2b) src-bucketing feasibility: gather from a 32k-row slice of the
    # 1M-row table, slice start data-dependent (forces a per-iteration
    # copy, ~16 MB).  If this matches the standalone 32k table, bucketed
    # plans get the small-table rate at the cost of one 512 MB copy/step.
    k1, k2, key = jax.random.split(key, 3)
    xbig = jax.random.normal(k1, (N, 128), jnp.float32)
    jsm = jax.random.randint(k2, (E,), 0, 32_768, jnp.int32)

    def gslice(c, xx, jj):
        xs = jax.lax.dynamic_slice(xx, (dep(c), 0), (32_768, 128))
        return xs[jj + dep(c)].sum() * 1e-30
    run("gather_sliced_32k_of_1M_F128", gslice, (xbig, jsm), E)
    del xbig, jsm

    # 3) dense C @ x with value-threaded dependence + its add-only control
    k1, k3, key = jax.random.split(key, 3)
    C = (jax.random.uniform(k1, (1280, N)) < 0.01).astype(jnp.bfloat16)
    xb = jax.random.normal(k3, (N, 128), jnp.bfloat16)

    def add_only(c, xx):
        return (xx + (c * 0).astype(jnp.bfloat16)).sum().astype(jnp.float32) * 1e-30

    def dmm(c, CC, xx):
        y = xx + (c * 0).astype(jnp.bfloat16)
        return jnp.dot(CC, y, preferred_element_type=jnp.float32
                       ).sum() * 1e-30
    run("control_add_sum_x_bf16", add_only, (xb,), N)
    run("dense_C1280xN_bf16_matmul", dmm, (C, xb), 1280)

    # f32x2 variant (two passes, f32 features)
    k1, key = jax.random.split(key)
    xf = jax.random.normal(k1, (N, 128), jnp.float32)

    def dmm2(c, CC, xx):
        y = xx + c * 0
        hi = y.astype(jnp.bfloat16)
        lo = (y - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return (jnp.dot(CC, hi, preferred_element_type=jnp.float32)
                + jnp.dot(CC, lo, preferred_element_type=jnp.float32)
                ).sum() * 1e-30
    run("dense_C1280xN_f32x2_matmul", dmm2, (C, xf), 1280)

    print(json.dumps({k: round(v * 1e3, 3) for k, v in res.items()}))


if __name__ == "__main__":
    main()
