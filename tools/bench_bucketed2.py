"""Round-3 bench, part 2: flat-bucketed remainder + dense-threshold
retune + weighted flat-bucketed + wide-F retry.

With the cheaper bucketed gather (2.07 vs 4.68 ns/row) the dense-hub
breakeven shifts ~2.2x higher — fewer dense windows, less C-read
traffic.  Sweep dense_threshold alongside the flat-bucketed remainder.
"""
import functools
import gc
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
    key = jax.random.PRNGKey(0)
    k1, k2, k3, key = jax.random.split(key, 4)
    x = jax.random.normal(k1, (N, F), jnp.float32)
    w1 = jax.random.normal(k2, (E,), jnp.float32)

    def run(name, gp, op, xx, w=None, edges=E):
        if op == "copy":
            def f(c, gg, q):
                return dgl.gspmm(gg, "copy_lhs", "sum",
                                 q + c * 0)[0, 0] * 1e-20 + c * 0
            dt = timed_loop(f, (gp, xx))
        else:
            def f(c, gg, q, ww):
                return dgl.gspmm(gg, "mul", "sum", q + c * 0, ww,
                                 "u", "e")[0, 0] * 1e-20 + c * 0
            dt = timed_loop(f, (gp, xx, w))
        r = {"case": name, "ms_per_iter": round(dt * 1e3, 2),
             "edges_per_s": round(edges / dt),
             "ns_per_edge": round(dt / edges * 1e9, 3)}
        print(json.dumps(r), flush=True)
        return r

    # 1) flat-bucketed remainder at default dense threshold
    for thr in (None, 90_000, 150_000, 250_000):
        g_fb = dgl.prepare_spmm(g0, te=64, weighted=False, sddmm=False,
                                dense_threshold=thr, bucket_rows=131072)
        mt = g_fb.spmm_hybrid_meta or g_fb.spmm_plan_meta
        tag = thr or "auto"
        print(json.dumps({
            "note": f"flatbucket thr={tag}",
            "flat": bool(mt[0][5]), "gather_rows": mt[0][6],
            "bucketed_flat": mt[0][7] is not None,
            "blocks": int(np.asarray(
                (g_fb.spmm_hybrid_arrays or g_fb.spmm_plan_arrays)[3]
            ).shape[1])}), flush=True)
        run(f"hybrid_flatbucket_thr{tag}", g_fb, "copy", x)
        del g_fb
        gc.collect()

    # 2) weighted u_mul_e flat-bucketed (F=128)
    g_ub = dgl.prepare_spmm(g0, te=64, dense_hub=False, sddmm=False,
                            bucket_rows=131072)
    mt = g_ub.spmm_plan_meta
    print(json.dumps({"note": "u_mul_e flatbucket", "flat": bool(mt[0][5]),
                      "bucketed_flat": mt[0][7] is not None}), flush=True)
    run("u_mul_e_F128_flatbucket_te64", g_ub, "mul", x, w1)
    del g_ub
    gc.collect()

    # 3) wide-F retry: F=512 chunked-bucketed (32k buckets)
    del x
    x2 = jax.random.normal(k3, (N, 512), jnp.float32)
    g_wb = dgl.prepare_spmm(g0, te=256, dense_hub=False, flat=False,
                            sddmm=False, flat_width=512,
                            bucket_rows=32768)
    run("u_mul_e_F512_bucketed32k", g_wb, "mul", x2, w1)
    del g_wb
    gc.collect()
    # bf16 features (the round-2 58 ns/edge case was bf16-packed)
    xb = x2.astype(jnp.bfloat16)
    g_wb2 = dgl.prepare_spmm(g0, te=256, dense_hub=False, flat=False,
                             sddmm=False, flat_width=512,
                             bucket_rows=65536)
    run("u_mul_e_F512bf16_bucketed64k", g_wb2, "mul", xb, w1)
    del g_wb2


if __name__ == "__main__":
    main()
