"""Fused-GAT forward+backward (VJP) on-chip benchmark (VERDICT r3 #4b).

Round 3 measured the fused forward at 17.1 ns/edge (bucketed+packed) but
never the coupled VJP; a fwd win that vanishes in the train step is not
a win.  This tool measures, at the floor-accounting shape (N=100k,
E=1.6M, H=8, D=64):

  * fwd and fwd+bwd ns/edge for: composed XLA, fused (chunked-acc),
    fused + src-bucketed plans, fused + bucketed + packed-z;
  * the bwd components so the accounting sums: the reverse-plan reduce
    at combined (HD+H) width, the two dense edge gathers (zsrc/zdst),
    and the der segment-sum;
  * Cora-dims 200-epoch training rows (the KERNELS.md:23 table refresh)
    are bench_train_tpu.py's job — run it after this.

Reference: the fork's explicit backward kernels
(src/kernel/cuda/binary_reduce_impl.cu:124-309).
"""
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

    N, H, D = 100_000, 8, 64
    ZW = H * D + 2 * H
    g0 = random_power_law_graph(N, avg_degree=16.0, alpha=2.1, seed=0)
    E = g0.num_edges()
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    fsrc = jax.random.normal(k1, (N, H, D), jnp.float32)
    el = jax.random.normal(k2, (N, H), jnp.float32)
    er = jax.random.normal(k3, (N, H), jnp.float32)

    def run(name, g, packed, bwd="fused"):
        # bwd impl rides the jit static args (resolved per trace in
        # gat_attention_pallas), so toggling between runs is safe
        os.environ["DGL_TPU_GAT_PACKED"] = "1" if packed else "0"
        os.environ["DGL_TPU_GAT_BWD_FUSED"] = "0" if bwd == "compact" else "1"

        def fwd(c, f, l, r):
            o = gat_attention(g, f + c * 0, l, r)
            return o[0, 0, 0] * 1e-20 + c * 0
        dt_f = timed_loop(fwd, (fsrc, el, er))

        def step(c, f, l, r):
            def loss(f_, l_, r_):
                o = gat_attention(g, f_, l_, r_)
                return (o * o).sum()
            v, (gf, gl, gr) = jax.value_and_grad(loss, argnums=(0, 1, 2))(
                f + c * 0, l, r)
            return (v * 1e-20 + gf[0, 0, 0] * 1e-20 + gl[0, 0] * 1e-20
                    + gr[0, 0] * 1e-20 + c * 0)
        dt_s = timed_loop(step, (fsrc, el, er))
        print(json.dumps({
            "case": name + ("" if bwd == "fused" else f"_{bwd}"),
            "fwd_ms": round(dt_f * 1e3, 2),
            "fwd_ns_per_edge": round(dt_f / E * 1e9, 2),
            "fwdbwd_ms": round(dt_s * 1e3, 2),
            "fwdbwd_ns_per_edge": round(dt_s / E * 1e9, 2),
            "bwd_ns_per_edge": round((dt_s - dt_f) / E * 1e9, 2),
        }), flush=True)
        return dt_f, dt_s

    only = os.environ.get("BENCH_ONLY", "")

    if not only or "composed" in only:
        run("composed", g0, False, bwd="compact")

    if not only or "chunked" in only:
        # fused, chunked-acc (round-2 config); A/B the round-5 in-kernel
        # aw/draw backward against the round-4 compact head-weight one
        g_c = dgl.prepare_spmm(g0, te=256, flat=False, dense_hub=False,
                               sddmm=False, flat_width=ZW, bucket_rows=None)
        run("fused_chunked", g_c, False, bwd="compact")
        run("fused_chunked", g_c, False, bwd="fused")
        del g_c
        gc.collect()

    if not only or "bucketed" in only:
        # fused + bucketed (+ packed) — the round-3 champion config
        g_b = dgl.prepare_spmm(g0, te=256, flat=False, dense_hub=False,
                               sddmm=False, flat_width=ZW,
                               bucket_rows="auto")
        print(json.dumps({"bucketed_meta": {
            "gather_rows": g_b.spmm_plan_meta[0][6],
            "chunks": g_b.spmm_plan_meta[0][4],
            "rev_chunks": g_b.spmm_plan_meta[1][4]}}), flush=True)
        run("fused_bucketed", g_b, False, bwd="compact")
        run("fused_bucketed_packed", g_b, True, bwd="compact")
        del g_b
        gc.collect()

    if not only or "mixed" in only:
        # mixed: fwd bucketed, rev chunked (bucket_rows_rev=None) — the
        # TRAIN config
        g_m = dgl.prepare_spmm(g0, te=256, flat=False, dense_hub=False,
                               sddmm=False, flat_width=ZW,
                               bucket_rows="auto", bucket_rows_rev=None)
        run("fused_mixed", g_m, False, bwd="compact")
        run("fused_mixed", g_m, False, bwd="fused")
        run("fused_mixed_packed", g_m, True, bwd="compact")
        run("fused_mixed_packed", g_m, True, bwd="fused")
        del g_m
        gc.collect()

    if only and "components" not in only:
        return
    g_b = dgl.prepare_spmm(g0, te=256, flat=False, dense_hub=False,
                           sddmm=False, flat_width=ZW,
                           bucket_rows="auto")

    # ---- bwd components (bucketed config)
    from dgl_hack_tpu.ops.pallas.spmm_kernel import (
        N_PLAN_ARRAYS, _run_direction)
    rev_arrays = g_b.spmm_plan_arrays[N_PLAN_ARRAYS:2 * N_PLAN_ARRAYS]
    meta_rev = g_b.spmm_plan_meta[1]
    node_rev = jax.random.normal(k1, (N, H * D + H), jnp.float32)

    # unweighted 520-wide rev reduce (the full-width weighted variant
    # OOMs: (E,520) w + the pre-multiplied message buffer > 16 GB; the
    # real bwd pays that traffic via w_rev — this measures the FLOOR)
    def rev_reduce(c, nv, *arrs):
        o = _run_direction(arrs, meta_rev, nv + c * 0, None, E)
        return o[0, 0] * 1e-20 + c * 0
    dt = timed_loop(rev_reduce, (node_rev,) + tuple(rev_arrays))
    print(json.dumps({"bwd_component": "rev_plan_reduce_HDpH",
                      "ms": round(dt * 1e3, 2),
                      "ns_per_edge": round(dt / E * 1e9, 2)}), flush=True)

    z = jax.random.normal(k1, (N, ZW), jnp.float32)

    def edge_gather(c, q, srcv):
        m = (q + c * 0)[srcv]
        return m[0, 0] * 1e-20 + c * 0
    dt = timed_loop(edge_gather, (z, g_b.src))
    print(json.dumps({"bwd_component": "zsrc_edge_gather",
                      "ms": round(dt * 1e3, 2),
                      "ns_per_edge": round(dt / E * 1e9, 2)}), flush=True)

    draw = jax.random.normal(k3, (E, H), jnp.float32)

    def der_seg(c, dr, dstv):
        o = jax.ops.segment_sum(dr + c * 0, dstv, N,
                                indices_are_sorted=True)
        return o[0, 0] * 1e-20 + c * 0
    dt = timed_loop(der_seg, (draw, g_b.dst))
    print(json.dumps({"bwd_component": "der_segment_sum",
                      "ms": round(dt * 1e3, 2),
                      "ns_per_edge": round(dt / E * 1e9, 2)}), flush=True)


if __name__ == "__main__":
    main()
