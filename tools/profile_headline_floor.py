"""Headline floor accounting (VERDICT r3 #2): decompose the copy_u-sum
hybrid bench into measured parts that SUM to the total, the way
profile_gat_floor did for fused GAT.

Components (scalar-carry convention, same as the sweep harnesses):
  dense_matmul      C @ x for the dense-hub windows (bf16 C read-bound)
  dense_scatter     zeros.at[rows].add(d) — dense rows into the output
  remainder         full _run_direction over the chunked-bucketed plan
  rem_gather        per-chunk dynamic_slice + row gather only (the
                    engine-rate term + the m-buffer write)
  index_read        reading the plan's gather_idx/perm arrays
  headline_scalar   whole hybrid op, scalar carry (the 766-convention)
  headline_carry    whole hybrid op, FULL (N, F) feature carry — the
                    bench.py convention: each iteration aggregates the
                    previous iteration's output, like a real layer stack

Also prints the host-side plan stats (dense/remainder edge split, slot
padding) the accounting needs.  Reference role: the NbAccess study
(src/kernel/cuda/binary_reduce_impl.cu:445-778).
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
    from dgl_hack_tpu.ops.pallas.spmm_kernel import (
        N_PLAN_ARRAYS, _dense_matmul, _run_direction)

    N, F = 1_000_000, 128
    g0 = random_power_law_graph(N, avg_degree=16.0, alpha=2.1, seed=0)
    E = g0.num_edges()
    g = dgl.prepare_spmm(g0, te=64, weighted=False, flat=False,
                         dense_threshold=35_000, dense_budget=6 << 30,
                         bucket_rows=131072, sddmm=False)
    arrays = g.spmm_hybrid_arrays
    meta = g.spmm_hybrid_meta
    rem_fwd = arrays[:N_PLAN_ARRAYS]
    C, rows = arrays[2 * N_PLAN_ARRAYS], arrays[2 * N_PLAN_ARRAYS + 1]
    meta_fwd = meta[0]
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, F), jnp.float32)

    # ---- host-side stats the accounting needs
    csc = g0.host("csc_indptr")
    indeg = np.diff(csc).astype(np.int64)
    rows_np = np.asarray(rows)
    dense_edges = int(indeg[rows_np].sum())
    rem_edges = E - dense_edges
    C_chunks = meta_fwd[4]
    bc = np.asarray(rem_fwd[3]).shape[1]
    te = meta_fwd[2]
    slots = C_chunks * bc * te
    gather_rows = meta_fwd[6]
    stats = {
        "E": E, "dense_windows": len(rows_np) // 128,
        "dense_edges": dense_edges,
        "dense_frac": round(dense_edges / E, 4),
        "rem_edges": rem_edges, "rem_slots": slots,
        "rem_pad_factor": round(slots / max(rem_edges, 1), 3),
        "chunks": int(C_chunks), "bc": int(bc), "te": int(te),
        "gather_rows": int(gather_rows),
        "C_bytes": int(np.asarray(C).size * 2),
    }
    print(json.dumps({"stats": stats}), flush=True)

    results = {}

    def run(name, fn, args, denom=E):
        dt = timed_loop(fn, args)
        results[name] = dt
        print(json.dumps({
            "case": name, "ms_per_iter": round(dt * 1e3, 3),
            "ns_per_edge_of_total_E": round(dt / E * 1e9, 3),
        }), flush=True)
        return dt

    # whole op, scalar carry (sweep convention)
    run("headline_scalar",
        lambda c, gg, q: dgl.gspmm(gg, "copy_lhs", "sum",
                                   q + c * 0)[0, 0] * 1e-20 + c * 0,
        (g, x))

    # whole op, full feature carry (bench.py convention)
    @functools.partial(jax.jit, static_argnums=2)
    def loop_carry(graph, feat, iters):
        def body(i, h):
            return dgl.gspmm(graph, "copy_lhs", "sum", h) * 1e-3
        return jax.lax.fori_loop(0, iters, body, feat)[0, 0]

    def timed_carry(k):
        float(loop_carry(g, x, k))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop_carry(g, x, k))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (timed_carry(12) - timed_carry(2)) / 10
    results["headline_carry"] = dt
    print(json.dumps({"case": "headline_carry",
                      "ms_per_iter": round(dt * 1e3, 3),
                      "edges_per_s": round(E / dt)}), flush=True)

    # dense matmul alone
    run("dense_matmul",
        lambda c, Cm, q: _dense_matmul(Cm, q + c * 0,
                                       "f32x2")[0, 0] * 1e-20 + c * 0,
        (C, x))

    # dense scatter of the window rows into a fresh output
    d0 = _dense_matmul(C, x, "f32x2")

    def scatter_fn(c, d, r):
        out = jnp.zeros((N, F), jnp.float32).at[r].add(d + c * 0)
        return out[0, 0] * 1e-20 + c * 0
    run("dense_scatter", scatter_fn, (d0, rows))

    # remainder plan alone
    run("remainder",
        lambda c, q, *arr: _run_direction(arr, meta_fwd, q + c * 0, None,
                                          0)[0, 0] * 1e-20 + c * 0,
        (x,) + tuple(rem_fwd))

    # remainder gathers only (slice + row gather + m write, no kernel)
    gidx_s, grow0_s = rem_fwd[0], rem_fwd[6]

    def gather_fn(c, q, gidx_all, grow0_all):
        def body(carry, xs):
            gidx, grow0 = xs
            tbl = jax.lax.dynamic_slice(
                q, (grow0, 0), (min(gather_rows, N), F))
            m = tbl[gidx]
            return carry + m[0, 0] * 1e-20, None
        out, _ = jax.lax.scan(body, c * 0.0, (gidx_all, grow0_all))
        return out + c * 0
    run("rem_gather", gather_fn, (x, gidx_s, grow0_s))

    # plan index reads only
    def idx_fn(c, gidx_all, perm_all):
        return (gidx_all.sum() + perm_all.sum()).astype(jnp.float32) \
            * 1e-20 + c * 0
    run("index_read", idx_fn, (rem_fwd[0], rem_fwd[1]))

    # ---- accounting summary
    parts = {k: results[k] for k in
             ("dense_matmul", "dense_scatter", "remainder")}
    print(json.dumps({
        "sum_of_parts_ms": round(sum(parts.values()) * 1e3, 3),
        "headline_scalar_ms": round(results["headline_scalar"] * 1e3, 3),
        "headline_carry_ms": round(results["headline_carry"] * 1e3, 3),
        "carry_minus_scalar_ms": round(
            (results["headline_carry"] - results["headline_scalar"])
            * 1e3, 3),
        "rem_kernel_ms": round(
            (results["remainder"] - results["rem_gather"]) * 1e3, 3),
        "rem_gather_ns_per_slot": round(
            results["rem_gather"] / max(stats["rem_slots"], 1) * 1e9, 3),
    }), flush=True)

    del g, arrays, C, rows, d0
    gc.collect()


if __name__ == "__main__":
    main()
