"""Fused-GAT backward shape sweep (round 5): the 67/66 ns/edge train
number was measured at one shape (H=8, D=64).  This sweeps H/D at the
train-default config (mixed plans, fused backward + plan-driven der) to
show the win is not shape-cherry-picked, A/B'd against the round-4
compact backward at each shape."""
import functools
import gc
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timed_loop(fn, args, k_lo=2, k_hi=6, reps=3):
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=0)
    def loop(iters, *a):
        def body(i, c):
            return fn(c, *a)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    def measure(k):
        float(loop(k, *args))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(loop(k, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    return (measure(k_hi) - measure(k_lo)) / (k_hi - k_lo)


def main():
    import jax
    import jax.numpy as jnp
    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.data import random_power_law_graph
    from dgl_hack_tpu.ops.gat import gat_attention

    N = 100_000
    g0 = random_power_law_graph(N, avg_degree=16.0, alpha=2.1, seed=0)
    E = g0.num_edges()
    key = jax.random.PRNGKey(0)

    for H, D in ((4, 32), (8, 32), (16, 32), (8, 64), (4, 128)):
        ZW = H * D + 2 * H
        # flat="auto" (the shipped default): at narrow z the flat
        # single-kernel plan fits and beats forced-chunked by ~1.5x
        # (54.6 vs 83.1 at H=8/D=32 — the first sweep's flat=False was
        # the anomaly, not the shape)
        g = dgl.prepare_spmm(g0, te=256, flat="auto", dense_hub=False,
                             sddmm=False, flat_width=ZW,
                             bucket_rows="auto", bucket_rows_rev=None)
        k1, k2, k3 = jax.random.split(key, 3)
        fsrc = jax.random.normal(k1, (N, H, D), jnp.float32)
        el = jax.random.normal(k2, (N, H), jnp.float32)
        er = jax.random.normal(k3, (N, H), jnp.float32)
        row = {"H": H, "D": D, "E": int(E)}
        for bwd in ("compact", "fused"):
            os.environ["DGL_TPU_GAT_BWD_FUSED"] = \
                "0" if bwd == "compact" else "1"

            def step(c, f, l, r):
                def loss(f_, l_, r_):
                    o = gat_attention(g, f_, l_, r_)
                    return (o * o).sum()
                v, (gf, gl, gr) = jax.value_and_grad(
                    loss, argnums=(0, 1, 2))(f + c * 0, l, r)
                return (v * 1e-20 + gf[0, 0, 0] * 1e-20
                        + gl[0, 0] * 1e-20 + gr[0, 0] * 1e-20 + c * 0)
            dt = timed_loop(step, (fsrc, el, er))
            row[f"fwdbwd_{bwd}_ns_per_edge"] = round(dt / E * 1e9, 2)
        row["speedup"] = round(row["fwdbwd_compact_ns_per_edge"]
                               / row["fwdbwd_fused_ns_per_edge"], 2)
        print(json.dumps(row), flush=True)
        del g
        gc.collect()


if __name__ == "__main__":
    main()
