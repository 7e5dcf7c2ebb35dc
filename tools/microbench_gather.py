"""Gather-engine hypothesis tests (run on real TPU).

KERNELS.md records the central measured fact: random row gathers cost
~7.3 ns/row, issue-rate-bound, independent of row bytes.  Every gspmm
design decision hinges on whether that bound moves with:
  * index locality (sorted / banded vs random)  -> would reward reorder_graph
  * table size (hot 32k-row region vs 1M rows)  -> would reward src-bucketing
  * row width (128 B / 512 B / 2 KB)            -> flat = issue-bound confirmed
  * op-level concurrency (two independent half gathers)
Plus a dense-matmul roofline check for the hybrid dense-hub plan:
C (1024, N) bf16 @ x (N, 128).

Methodology: jitted fori_loop chaining k iterations, two k values, take the
difference (dispatch/compile/readback cancel — per CLAUDE.md the tunnel
makes single-call timing useless).  Every measured op is made loop-carried
via a zero-valued data dependence so XLA cannot hoist it.  Arrays are
created per-experiment and freed after (HBM is 16 GB), and always passed
as jit arguments (never closed over: HTTP 413).
"""
import functools
import gc
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
        float(loop(k, *args))  # compile + warm
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(loop(k, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    return (measure(k_hi) - measure(k_lo)) / (k_hi - k_lo)


def dep(c):
    # int32 scalar, always 0, but data-dependent on the loop carry
    return (c * 0).astype(jnp.int32)


N = 1_000_000
E = 8_000_000
res = {}


def run(name, fn, args, rows):
    dt = timed_pair(fn, args)
    res[name] = dt
    print(f"{name:28s} {dt*1e3:9.2f} ms  ({dt/rows*1e9:6.3f} ns/row)",
          flush=True)
    del args
    gc.collect()


def main():
    rng = np.random.default_rng(0)
    idx_rand = rng.integers(0, N, size=E).astype(np.int32)

    def gsum(c, xx, jj):
        return xx[jj + dep(c)].sum() * 1e-30

    x = jnp.asarray(rng.normal(size=(N, 128)).astype(np.float32))
    j = jnp.asarray(idx_rand)

    # control: stream-read (E, 128) and sum, loop-carried via dynamic_slice
    big = jnp.asarray(rng.normal(size=(E // 2, 128)).astype(np.float32))
    run("control_sum_E/2xF128",
        lambda c, b: jax.lax.dynamic_slice(
            b, (dep(c), 0), (E // 2, 128)).sum() * 1e-30,
        (big,), E // 2)
    del big; gc.collect()

    run("gather_rand_F128", gsum, (x, j), E)
    run("gather_sorted_F128", gsum, (x, jnp.sort(j)), E)

    # banded: 2048-edge runs confined to random 32k-row bands
    runs_n = -(-E // 2048)
    band = rng.integers(0, N // 32768, size=runs_n).astype(np.int64) * 32768
    idx_band = (np.repeat(band, 2048)[:E]
                + rng.integers(0, 32768, size=E)).astype(np.int32)
    run("gather_band_F128", gsum, (x, jnp.asarray(idx_band)), E)

    xs = jnp.asarray(rng.normal(size=(32768, 128)).astype(np.float32))
    run("gather_small_table_F128", gsum, (xs, j % 32768), E)
    del xs; gc.collect()

    x32 = jnp.asarray(rng.normal(size=(N, 32)).astype(np.float32))
    run("gather_rand_F32", gsum, (x32, j), E)
    del x32; gc.collect()

    x512 = jnp.asarray(rng.normal(size=(N, 512)).astype(np.float32))
    j2 = j[:E // 4]
    run("gather_rand_F512", gsum, (x512, j2), E // 4)
    del x512, j2; gc.collect()

    def two_half(c, xx, jj):
        h = E // 2
        y1 = xx[jax.lax.dynamic_slice(jj, (0,), (h,)) + dep(c)]
        y2 = xx[jax.lax.dynamic_slice(jj, (h,), (h,)) + dep(c)]
        return y1.sum() * 1e-30 + y2.sum() * 1e-30
    run("gather_two_halves_F128", two_half, (x, j), E)

    run("gather_rand_int32",
        lambda c, jj: jj[jj + dep(c)].astype(jnp.float32).sum() * 1e-30,
        (j,), E)

    # dense-hub roofline: (1024, N) bf16 @ (N, 128) bf16 -> f32
    C = jnp.asarray((rng.random((1024, N)) < 0.01).astype(np.float32)
                    ).astype(jnp.bfloat16)
    xb = x.astype(jnp.bfloat16)

    def dmm(c, CC, xx):
        y = jax.lax.dynamic_slice(xx, (dep(c), 0), (N, 128))
        return jnp.dot(CC, y, preferred_element_type=jnp.float32
                       ).sum() * 1e-30
    run("dense_C1024xN_bf16_matmul", dmm, (C, xb), 1024)
    del C, xb; gc.collect()

    print(json.dumps({k: round(v * 1e3, 3) for k, v in res.items()}))


if __name__ == "__main__":
    main()
