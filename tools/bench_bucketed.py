"""On-chip A/B of src-bucketed plans (round 3).

Cases (headline graph N=1M, E=16M, alpha=2.1 unless noted):
  1. copy_u hybrid (the headline): remainder flat (round-2 champion) vs
     remainder BUCKETED chunked.
  2. u_mul_e F=128 full sparse plan: unbucketed vs bucketed.
  3. u_mul_e F=512 (the wide-feature tail, round-2: 58 ns/edge):
     unbucketed chunked vs bucketed chunked (bucket 32k rows = 64 MB).
Prints one JSON line per case.
"""
import functools
import json
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

    N, F = 1_000_000, 128
    g0 = random_power_law_graph(N, avg_degree=16.0, alpha=2.1, seed=0)
    E = g0.num_edges()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))

    def run(name, gp, op, w=None, edges=E):
        if op == "copy":
            def f(c, gg, xx):
                return dgl.gspmm(gg, "copy_lhs", "sum",
                                 xx + c * 0)[0, 0] * 1e-20 + c * 0
            dt = timed_loop(f, (gp, x))
        else:
            def f(c, gg, xx, ww):
                return dgl.gspmm(gg, "mul", "sum", xx + c * 0, ww,
                                 "u", "e")[0, 0] * 1e-20 + c * 0
            dt = timed_loop(f, (gp, x, w))
        r = {"case": name, "ms_per_iter": round(dt * 1e3, 2),
             "edges_per_s": round(edges / dt),
             "ns_per_edge": round(dt / edges * 1e9, 3)}
        print(json.dumps(r), flush=True)
        return r

    # 1) headline copy_u hybrid: flat remainder vs bucketed remainder
    g_flat = dgl.prepare_spmm(g0, te=64, weighted=False, bucket_rows=None)
    run("hybrid_flat_remainder_te64", g_flat, "copy")
    del g_flat
    g_b = dgl.prepare_spmm(g0, te=64, weighted=False, flat=False,
                           bucket_rows=131072)
    mt = g_b.spmm_hybrid_meta or g_b.spmm_plan_meta
    print(json.dumps({"note": "bucketed remainder meta",
                      "gather_rows": mt[0][6], "chunks": mt[0][4]}))
    run("hybrid_bucketed_remainder_te64", g_b, "copy")
    del g_b
    # te sweep for the bucketed remainder
    for te in (32, 128):
        g_t = dgl.prepare_spmm(g0, te=te, weighted=False, flat=False,
                               bucket_rows=131072)
        run(f"hybrid_bucketed_remainder_te{te}", g_t, "copy")
        del g_t

    # 2) u_mul_e F=128 full sparse plan
    w1 = jnp.asarray(rng.normal(size=(E,)).astype(np.float32))
    g_u = dgl.prepare_spmm(g0, te=256, dense_hub=False, bucket_rows=None)
    run("u_mul_e_F128_unbucketed", g_u, "mul", w1)
    del g_u
    g_ub = dgl.prepare_spmm(g0, te=256, dense_hub=False, flat=False,
                            bucket_rows=131072)
    mt = g_ub.spmm_plan_meta
    print(json.dumps({"note": "bucketed u_mul_e meta",
                      "gather_rows": mt[0][6], "chunks": mt[0][4]}))
    run("u_mul_e_F128_bucketed", g_ub, "mul", w1)
    del g_ub

    # 3) wide-feature tail: F=512
    F2 = 512
    x2 = jnp.asarray(rng.normal(size=(N, F2)).astype(np.float32))
    x = x2  # reuse closure var in run()
    g_w = dgl.prepare_spmm(g0, te=256, dense_hub=False, flat=False,
                           flat_width=F2, bucket_rows=None)
    run("u_mul_e_F512_unbucketed", g_w, "mul", w1)
    del g_w
    g_wb = dgl.prepare_spmm(g0, te=256, dense_hub=False, flat=False,
                            flat_width=F2, bucket_rows=32768)
    run("u_mul_e_F512_bucketed32k", g_wb, "mul", w1)
    del g_wb


if __name__ == "__main__":
    main()
