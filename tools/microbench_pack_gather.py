"""Measure the bf16-packed row gather: gather cost scales with LANE
count (KERNELS.md width law), so viewing a bf16 row as half as many
uint32 lanes should ~halve the dominant z-gather in fused GAT.

Rows: W=528 f32 (the GAT z row at H=8, D=64, padded even) vs the same
payload packed bf16->uint32 (264 lanes), plus the unpack cost.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N, E, W = 1_000_000, 400_000, 528


def timed(fn, args, k_lo=1, k_hi=3, repeats=2):
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


def main():
    key = jax.random.PRNGKey(0)
    z = jax.random.normal(key, (N, W), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (E,), 0, N, jnp.int32)

    zb = z.astype(jnp.bfloat16)
    zp = jax.lax.bitcast_convert_type(
        zb.reshape(N, W // 2, 2), jnp.uint32)         # (N, W/2) uint32

    def g_f32(c, zz, ii):
        i2 = ii + (c * 0).astype(jnp.int32)
        return zz[i2].sum() * 1e-30 + c * 0

    def g_packed_only(c, zz, ii):
        i2 = ii + (c * 0).astype(jnp.int32)
        g = zz[i2]
        # consume without unpack (sum of uint32 as float)
        return g.astype(jnp.float32).sum() * 1e-30 + c * 0

    def g_packed_unpack(c, zz, ii):
        i2 = ii + (c * 0).astype(jnp.int32)
        g = zz[i2]                                     # (E, W/2) uint32
        gb = jax.lax.bitcast_convert_type(g, jnp.bfloat16)  # (E, W/2, 2)
        return gb.astype(jnp.float32).sum() * 1e-30 + c * 0

    for name, fn, args in [
            ("f32 gather W=528", g_f32, (z, idx)),
            ("packed u32 gather W=264", g_packed_only, (zp, idx)),
            ("packed + unpack to f32", g_packed_unpack, (zp, idx)),
    ]:
        dt = timed(fn, args)
        print(f"{name:34s} {dt*1e3:8.2f} ms  {dt/E*1e9:6.2f} ns/row",
              flush=True)


if __name__ == "__main__":
    main()
