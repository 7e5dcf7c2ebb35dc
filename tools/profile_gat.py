"""Component profile of the fused-GAT path on TPU: where do the 77 ms go?

Experiments (smoke_gat shapes: N=100k, E=1.6M, H=8, D=64 -> z width 520):
  gather_f32   raw z-row gather at the plan's slot indices (f32, 2080 B)
  gather_bf16  same gather from a bf16 z copy (1040 B rows)
  kernel_only  the pallas chunk calls on PRE-gathered zg (no gather)
  full[te]     the full fused forward at several plan densities

Run alone (one TPU process at a time).
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

import dgl_hack_tpu as dgl
from dgl_hack_tpu.data import random_power_law_graph
from dgl_hack_tpu.ops.gat import gat_attention

N, AVG_DEG, H, D = 100_000, 16.0, 8, 64
HD = H * D


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
    E = g.num_edges()
    rng = np.random.default_rng(0)
    fsrc = jnp.asarray(rng.normal(size=(N, H, D)).astype(np.float32))
    el = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    er = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    z = jnp.concatenate([fsrc.reshape(N, HD), el], axis=1)  # (N, 520)

    for te in (1024, 512, 256):
        gp = dgl.prepare_spmm(g, te=te, flat_width=HD + 2 * H,
                              weighted=True, dense_hub=False)
        meta = gp.spmm_plan_meta[0]
        slots = gp.spmm_plan_arrays[0].size
        print(f"te={te}: C={meta[4]} flat={meta[5]} slots={slots} "
              f"({slots / E:.2f}x edges)")

        gidx = gp.spmm_plan_arrays[0].reshape(-1)

        @functools.partial(jax.jit, static_argnums=2)
        def gather_loop(tbl, idx, iters):
            def body(i, s):
                return s + tbl[idx + (s.astype(jnp.int32) & 1)].sum()
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        dt = timed(lambda k: gather_loop(z, gidx, k))
        print(f"  gather_f32:  {dt*1e3:7.2f} ms  "
              f"{dt/slots*1e9:5.2f} ns/slot")
        zb = z.astype(jnp.bfloat16)
        dt = timed(lambda k: gather_loop(zb, gidx, k))
        print(f"  gather_bf16: {dt*1e3:7.2f} ms  "
              f"{dt/slots*1e9:5.2f} ns/slot")

        @functools.partial(jax.jit, static_argnums=(2,))
        def full_loop(graph, feats, iters):
            f, e_l, e_r = feats
            def body(i, s):
                out = gat_attention(graph, f * (1 + s * 1e-30), e_l, e_r,
                                    0.2)
                return out[0, 0, 0] * 1e-30
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        dt = timed(lambda k: full_loop(gp, (fsrc, el, er), k))
        print(f"  full fused:  {dt*1e3:7.2f} ms  "
              f"{dt/E*1e9:5.2f} ns/edge")


if __name__ == "__main__":
    main()
