"""Gather cost vs table row width / alignment (TPU, smoke_gat indices).

Is the 21 ns/slot z-gather (520 f32 lanes) an alignment artifact?
Sweep widths around it on the same index distribution.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

import dgl_hack_tpu as dgl
from dgl_hack_tpu.data import random_power_law_graph

N, AVG_DEG = 100_000, 16.0


def timed(fn, k_lo=2, k_hi=8):
    def run(k):
        float(fn(k))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(k))
            best = min(best, time.perf_counter() - t0)
        return best
    return (run(k_hi) - run(k_lo)) / (k_hi - k_lo)


def main():
    print("backend:", jax.default_backend(), jax.devices()[0])
    g = random_power_law_graph(N, avg_degree=AVG_DEG, alpha=2.1, seed=0)
    gp = dgl.prepare_spmm(g, te=1024, flat_width=4096, weighted=True,
                          dense_hub=False)
    gidx = gp.spmm_plan_arrays[0].reshape(-1)
    S = gidx.size
    rng = np.random.default_rng(0)

    @functools.partial(jax.jit, static_argnums=2)
    def gather_loop(tbl, idx, iters):
        def body(i, s):
            return s + tbl[idx + (s.astype(jnp.int32) & 1)].sum()
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    for w, dt_name in [(128, "f32"), (512, "f32"), (520, "f32"),
                       (640, "f32"), (512, "bf16"), (520, "bf16"),
                       (640, "bf16"), (1024, "bf16")]:
        dtype = jnp.float32 if dt_name == "f32" else jnp.bfloat16
        tbl = jnp.asarray(rng.normal(size=(N, w)).astype(np.float32)
                          ).astype(dtype)
        dt = timed(lambda k: gather_loop(tbl, gidx, k))
        by = w * (4 if dt_name == "f32" else 2)
        print(f"  width {w:5d} {dt_name}: {dt*1e3:7.2f} ms  "
              f"{dt/S*1e9:5.2f} ns/slot  ({by} B/row, "
              f"{by*S/dt/1e9:.0f} GB/s)")




def extra():
    """Wide-row gather as concat of per-128-lane slice gathers."""
    import jax, jax.numpy as jnp, numpy as np, functools, time
    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.data import random_power_law_graph
    g = random_power_law_graph(N, avg_degree=AVG_DEG, alpha=2.1, seed=0)
    gp = dgl.prepare_spmm(g, te=1024, flat_width=4096, weighted=True,
                          dense_hub=False)
    gidx = gp.spmm_plan_arrays[0].reshape(-1)
    S = gidx.size
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.normal(size=(N, 512)).astype(np.float32))

    @functools.partial(jax.jit, static_argnums=2)
    def tiled(tbl, idx, iters):
        def body(i, s):
            ix = idx + (s.astype(jnp.int32) & 1)
            parts = [tbl[:, t*128:(t+1)*128][ix] for t in range(4)]
            return s + jnp.concatenate(parts, 1).sum()
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    dt = timed(lambda k: tiled(tbl, gidx, k))
    print(f"  tiled 4x128 gather of 512 f32: {dt*1e3:7.2f} ms  "
          f"{dt/S*1e9:5.2f} ns/slot")



def extra2():
    import functools
    g = random_power_law_graph(N, avg_degree=AVG_DEG, alpha=2.1, seed=0)
    gp = dgl.prepare_spmm(g, te=1024, flat_width=4096, weighted=True,
                          dense_hub=False)
    gidx = gp.spmm_plan_arrays[0].reshape(-1)
    S = gidx.size
    rng = np.random.default_rng(0)
    tbls = tuple(jnp.asarray(rng.normal(size=(N, 128)).astype(np.float32))
                 for _ in range(4))

    @functools.partial(jax.jit, static_argnums=2)
    def tiled_pre(tbls, idx, iters):
        def body(i, s):
            ix = idx + (s.astype(jnp.int32) & 1)
            parts = [t[ix] for t in tbls]
            return s + jnp.concatenate(parts, 1).sum()
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    dt = timed(lambda k: tiled_pre(tbls, gidx, k))
    print(f"  4 separate (N,128) tables:     {dt*1e3:7.2f} ms  "
          f"{dt/S*1e9:5.2f} ns/slot")

    big = jnp.asarray(rng.normal(size=(4 * N, 128)).astype(np.float32))
    idx4 = jnp.concatenate([gidx + t * N for t in range(4)])

    @functools.partial(jax.jit, static_argnums=2)
    def onebig(tbl, idx, iters):
        def body(i, s):
            return s + tbl[idx + (s.astype(jnp.int32) & 1)].sum()
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    dt = timed(lambda k: onebig(big, idx4, k))
    print(f"  one (4N,128) table, 4x idx:    {dt*1e3:7.2f} ms  "
          f"{dt/S*1e9:5.2f} ns/slot (per ORIGINAL slot)")


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices()[0])
    extra()
    extra2()
