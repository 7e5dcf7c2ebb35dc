"""Break down the hybrid gspmm at bench scale on TPU: dense part,
remainder part, full op, and a raw dense-dot roofline reference."""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

import dgl_hack_tpu as dgl
from dgl_hack_tpu.data import random_power_law_graph
from dgl_hack_tpu.ops.pallas import spmm_kernel as sk

N, F = 1_000_000, 128


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


def main():
    t0 = time.perf_counter()
    g = random_power_law_graph(N, avg_degree=16.0, alpha=2.1, seed=0)
    print(f"graph built {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    g = dgl.prepare_spmm(g, te=256, weighted=False)
    print(f"prepare_spmm {time.perf_counter()-t0:.1f}s", flush=True)
    meta_f, meta_r = g.spmm_hybrid_meta
    arrays = g.spmm_hybrid_arrays
    C, rows = arrays[-2], arrays[-1]
    rem_fwd = arrays[:sk.N_PLAN_ARRAYS]
    print("dense rows:", rows.shape, "C:", C.shape,
          "rem chunks:", meta_f[4], "rem slots/chunk:",
          rem_fwd[0].shape, flush=True)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, F), jnp.float32)

    def dep(c):
        return (c * 0).astype(jnp.int32)

    def full(c, xx, *arrs):
        y = xx + c * 0
        return sk._gspmm_hybrid(meta_f, meta_r, "f32x2", y, *arrs)[0, 0] * 1e-30

    def dense_only(c, xx, CC):
        y = xx + c * 0
        return sk._dense_matmul(CC, y, "f32x2")[0, 0] * 1e-30

    def dense_fast(c, xx, CC):
        y = xx + c * 0
        return sk._dense_matmul(CC, y, "fast")[0, 0] * 1e-30

    def rem_only(c, xx, *arrs):
        y = xx + c * 0
        return sk._run_direction(arrs, meta_f, y, None, 0, "f32x2")[0, 0] * 1e-30

    def raw_dot(c, xx, CC):
        y = (xx + c * 0).astype(jnp.bfloat16)
        return jnp.dot(CC, y, preferred_element_type=jnp.float32
                       )[0, 0] * 1e-30

    for name, fn, args in (
            ("full_hybrid", full, (x,) + tuple(arrays)),
            ("dense_only_f32x2", dense_only, (x, C)),
            ("dense_only_fast", dense_fast, (x, C)),
            ("raw_dot_bf16", raw_dot, (x, C)),
            ("remainder_only", rem_only, (x,) + tuple(rem_fwd)),
    ):
        dt = timed_pair(fn, args)
        print(f"{name:20s} {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
