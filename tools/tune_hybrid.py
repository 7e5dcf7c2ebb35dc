"""Sweep the dense-hub window selection (threshold, budget) on the
headline bench graph.

Motivation (KERNELS.md): select_dense_windows' default breakeven assumes
2 HBM passes over C and 7.3 ns/row gathers; the production _dense_matmul
reads C ONCE (hi||lo concat) and the clean gather rate is 4.68 ns/row,
and remainder slots carry padding — so the true per-densified-edge saving
differs.  Measure, don't model.
"""
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import dgl_hack_tpu as dgl
from dgl_hack_tpu.data import random_power_law_graph
from dgl_hack_tpu.ops.pallas import spmm_kernel as sk

N, F, TE = 1_000_000, 128, 256


def timed_pair(loop, args, k_lo=2, k_hi=10, repeats=3):
    def measure(k):
        float(loop(args, k))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(loop(args, k))
            best = min(best, time.perf_counter() - t0)
        return best
    return (measure(k_hi) - measure(k_lo)) / (k_hi - k_lo)


def main():
    g0 = random_power_law_graph(N, avg_degree=16.0, alpha=2.1, seed=0)
    E = g0.num_edges()
    x = jax.random.normal(jax.random.PRNGKey(0), (N, F), jnp.float32)

    cnt_by_win = None
    indptr = g0.host("csc_indptr")
    W = -(-N // 128)
    bounds = np.minimum(np.arange(W + 1) * 128, N)
    cnt_by_win = (indptr[bounds[1:]] - indptr[bounds[:-1]]).astype(np.int64)

    @functools.partial(jax.jit, static_argnums=1)
    def loop(graph_x, iters):
        graph, feat = graph_x
        def body(i, h):
            return dgl.gspmm(graph, "copy_lhs", "sum", h) * 1e-3
        return jax.lax.fori_loop(0, iters, body, feat)[0, 0]

    for thr, budget_gb in [(None, 3), (66_000, 3), (66_000, 6),
                           (45_000, 6), (33_000, 8), (25_000, 10)]:
        wins = sk.select_dense_windows(indptr, N, N, 128,
                                       threshold=thr,
                                       budget_bytes=budget_gb << 30)
        dense_edges = int(cnt_by_win[wins].sum()) if len(wins) else 0
        g = dgl.prepare_spmm(g0, te=TE, weighted=False,
                             dense_threshold=thr,
                             dense_budget=budget_gb << 30)
        dt = timed_pair(loop, (g, x))
        print(json.dumps({
            "thr": thr, "budget_gb": budget_gb, "wins": len(wins),
            "dense_edges_M": round(dense_edges / 1e6, 2),
            "ms": round(dt * 1e3, 2),
            "Medges_per_s": round(E / dt / 1e6, 1)}), flush=True)
        # free device plan arrays before the next config
        del g
        import gc; gc.collect()


if __name__ == "__main__":
    main()
