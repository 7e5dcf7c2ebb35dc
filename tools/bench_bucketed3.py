"""Round-3 bench, part 3: int8 dense C + budget sweep + chunked-bucketed
remainder (the measured-best remainder layout).

Findings so far: flat-bucketed's window-major m reads regress (random
32 KB tiles); chunked-bucketed remainder = 737 M edges/s at the bf16-C
default (12-window budget cap).  int8 C halves the per-window read AND
doubles the windows per budget byte — the dense path was budget-capped
all along.
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
    k1, _ = jax.random.split(key)
    x = jax.random.normal(k1, (N, F), jnp.float32)

    def run(name, gp):
        def f(c, gg, q):
            return dgl.gspmm(gg, "copy_lhs", "sum",
                             q + c * 0)[0, 0] * 1e-20 + c * 0
        dt = timed_loop(f, (gp, x))
        r = {"case": name, "ms_per_iter": round(dt * 1e3, 2),
             "edges_per_s": round(E / dt),
             "ns_per_edge": round(dt / E * 1e9, 3)}
        print(json.dumps(r), flush=True)

    # bf16 C (int8 storage REFUTED: int8->bf16 convert into the dot
    # hangs the TPU compile — KERNELS.md round 3)
    cases = [
        ("bf16_b6G_thr35k_bkt192k", 6 << 30, 35_000, 196608, False),
        ("bf16_b6G_thr35k_te96", 6 << 30, 35_000, 131072, False),
    ]
    for name, budget, thr, bkt, flat in cases:
        te = 96 if name.endswith("te96") else 64
        gp = dgl.prepare_spmm(g0, te=te, weighted=False, sddmm=False,
                              dense_threshold=thr, dense_budget=budget,
                              bucket_rows=bkt, flat=flat)
        C = gp.spmm_hybrid_arrays[-2] if gp.spmm_hybrid_arrays else None
        print(json.dumps({"note": name,
                          "dense_rows": 0 if C is None else int(C.shape[0]),
                          "C_dtype": "none" if C is None else str(C.dtype)}),
              flush=True)
        run(name, gp)
        del gp, C
        gc.collect()


if __name__ == "__main__":
    main()
