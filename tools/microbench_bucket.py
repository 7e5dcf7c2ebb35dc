"""Src-bucketed gather feasibility (round 3).

Round-2 sweep facts: random row gather at F=128 f32 runs 4.68 ns/row
from a >=128 MB table but 1.80-2.07 ns/row when the physical table is
<=64 MB (32k-128k rows at 512 B).  The open questions this bench
answers:

1. Does a dynamic_slice view of a big table get the small-table rate
   (XLA may fuse the slice INTO the gather -> big-table rate), and does
   an optimization_barrier'd (materialised) slice?
2. Is the boundary BYTES (~64-128 MB) or ROWS?  (F=512 tables at 32k
   rows = 64 MB vs 64k rows = 128 MB.)
3. End-to-end bucketed pass: K sequential slice+gather rounds covering
   E total slots vs one big gather.
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
            return fn(c, *a).astype(jnp.float32)
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
    res[name] = dt / rows * 1e9
    print(f"{name:40s} {dt*1e3:9.2f} ms  ({dt/rows*1e9:7.3f} ns/row)",
          flush=True)


def main():
    E = 8_000_000
    key = jax.random.PRNGKey(0)

    def gsum(c, xx, jj):
        return xx[jj + dep(c)].sum() * 1e-30

    N = 1_048_576
    B = 131_072                     # bucket rows (64 MB at F=128 f32)
    k1, k2, k3, key = jax.random.split(key, 4)
    xbig = jax.random.normal(k1, (N, 128), jnp.float32)
    jbig = jax.random.randint(k2, (E,), 0, N, jnp.int32)
    jsm = jax.random.randint(k3, (E,), 0, B, jnp.int32)

    # 0) baselines
    run("gather_1M_F128", gsum, (xbig, jbig), E)

    # 1) dynamic_slice view, no barrier (XLA may fuse slice into gather)
    def gslice(c, xx, jj):
        xs = jax.lax.dynamic_slice(xx, (dep(c), 0), (B, 128))
        return xs[jj + dep(c)].sum() * 1e-30
    run("gather_slice128k_nobar", gslice, (xbig, jsm), E)

    # 2) dynamic_slice + optimization_barrier (forced materialisation)
    def gslice_bar(c, xx, jj):
        xs = jax.lax.dynamic_slice(xx, (dep(c), 0), (B, 128))
        xs = jax.lax.optimization_barrier(xs)
        return xs[jj + dep(c)].sum() * 1e-30
    run("gather_slice128k_barrier", gslice_bar, (xbig, jsm), E)

    # 3) full bucketed pass: K=8 sequential (slice+barrier+gather E/K)
    K = 8
    jkb = jax.random.randint(key, (K, E // K), 0, B, jnp.int32)

    def gbucket(c, xx, jj):
        def body(b, acc):
            xs = jax.lax.dynamic_slice(xx, (b * B, 0), (B, 128))
            xs = jax.lax.optimization_barrier(xs)
            return acc + xs[jj[b] + dep(acc)].sum() * 1e-30
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0) + c * 0)
    run("gather_bucketed_8x128k", gbucket, (xbig, jkb), E)

    del jbig, jsm, jkb

    # 4) bytes-vs-rows at F=512 (2 KB rows): 32k rows = 64 MB,
    #    64k rows = 128 MB; big-table baseline was 11.45 ns/row
    for n, tag in ((32_768, "64MB"), (65_536, "128MB")):
        k1, k2, key = jax.random.split(key, 3)
        x = jax.random.normal(k1, (n, 512), jnp.float32)
        j = jax.random.randint(k2, (E // 2,), 0, n, jnp.int32)
        run(f"gather_F512_{n//1024}k_{tag}", gsum, (x, j), E // 2)
        del x, j

    # 5) packed-u32 rows (bf16 pack halves lanes): 128k x 64 u32 = 32 MB
    k1, k2, key = jax.random.split(key, 3)
    xp = jax.random.randint(k1, (B, 64), 0, 2**31 - 1, jnp.uint32)
    j = jax.random.randint(k2, (E,), 0, B, jnp.int32)

    def gsum_u(c, xx, jj):
        return (xx[jj + dep(c)] >> 16).sum().astype(jnp.float32) * 0.0
    run("gather_u32x64_128k_32MB", gsum_u, (xp, j), E)
    del xp

    # 6) 64k and 32k F=128 direct (ladder fill)
    for n in (32_768, 65_536):
        k1, key = jax.random.split(key)
        x = jax.random.normal(k1, (n, 128), jnp.float32)
        jn = j % n
        run(f"gather_table_{n//1024}k_F128", gsum, (x, jn), E)
        del x

    print(json.dumps({k: round(v, 3) for k, v in res.items()}))


if __name__ == "__main__":
    main()
