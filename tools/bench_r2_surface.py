"""Round-2 perf surface measurement: where do the VERDICT-flagged paths
stand on the real chip?

Covers: copy_u sum/max/min (hybrid vs composed), u_mul_e wide-F chunked,
u_add_v / u_dot_v gsddmm composed, fused GAT ns/edge.  One process, one
JSON line per case.
"""
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, k_lo=2, k_hi=8, reps=3):
    import jax

    @functools.partial(jax.jit, static_argnums=0)
    def loop(iters, *a):
        def body(i, h):
            return fn(h, *a[1:]) * 1e-6
        return jax.lax.fori_loop(0, iters, body, a[0]).ravel()[0]

    def t(k):
        float(loop(k, *args))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(loop(k, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(k_hi) - t(k_lo)) / (k_hi - k_lo)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", required=True,
                    choices=["hybrid", "max", "sum_xla", "u_add_v",
                             "u_dot_v", "u_add_v_plan", "u_dot_v_plan",
                             "copy_v_plan", "wide", "gat"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.data import random_power_law_graph

    N, F = 1_000_000, 128
    if args.case in ("u_add_v", "u_dot_v", "u_add_v_plan", "u_dot_v_plan",
                     "copy_v_plan"):
        # per-edge (E, F) outputs double-buffer at 8 GB each for E=16M —
        # the edge-output cases run at half scale to fit HBM
        N = 500_000
    g0 = random_power_law_graph(N, avg_degree=16.0, alpha=2.1, seed=0)
    E = g0.num_edges()

    def report(name, dt, edges=E):
        print(json.dumps({"case": name, "ms": round(dt * 1e3, 2),
                          "ns_per_edge": round(dt * 1e9 / edges, 2),
                          "medges_per_s": round(edges / dt / 1e6, 1)}))

    if args.case in ("hybrid", "max", "sum_xla", "u_add_v", "u_dot_v",
                     "u_add_v_plan", "u_dot_v_plan", "copy_v_plan"):
        # device-side generation: the tunnel moves 100 MB-scale host
        # arrays at single-digit MB/s (CLAUDE.md)
        x = jax.random.normal(jax.random.PRNGKey(0), (N, F), jnp.float32)
    if args.case == "hybrid":
        gp = dgl.prepare_spmm(g0, te=64, weighted=False)
        report("copy_u_sum_hybrid",
               timed(lambda h: dgl.gspmm(gp, "copy_lhs", "sum", h), x))
    elif args.case == "max":
        report("copy_u_max_composed",
               timed(lambda h: dgl.gspmm(g0, "copy_lhs", "max", h), x))
    elif args.case == "sum_xla":
        report("copy_u_sum_composed",
               timed(lambda h: dgl.gspmm(g0, "copy_lhs", "sum", h), x))
    elif args.case == "u_add_v":
        from dgl_hack_tpu.ops.sddmm import gsddmm
        report("u_add_v_composed",
               timed(lambda h: gsddmm(g0, "add", h, h, "u", "v")[:N], x))
    elif args.case == "u_dot_v":
        from dgl_hack_tpu.ops.sddmm import gsddmm
        report("u_dot_v_composed",
               timed(lambda h: jnp.broadcast_to(
                   gsddmm(g0, "dot", h, h, "u", "v")[:N], h.shape), x))
    elif args.case in ("u_add_v_plan", "u_dot_v_plan", "copy_v_plan"):
        from dgl_hack_tpu.ops.sddmm import gsddmm
        gp = dgl.prepare_spmm(g0, te=64)   # weighted plan => sddmm plan too
        assert gp.sddmm_plan_arrays is not None
        if args.case == "u_add_v_plan":
            report("u_add_v_plan",
                   timed(lambda h: gsddmm(gp, "add", h, h, "u", "v")[:N], x))
        elif args.case == "u_dot_v_plan":
            report("u_dot_v_plan",
                   timed(lambda h: jnp.broadcast_to(
                       gsddmm(gp, "dot", h, h, "u", "v")[:N], h.shape), x))
        else:
            report("copy_v_plan",
                   timed(lambda h: gsddmm(gp, "copy_rhs", None, h,
                                          "u", "v")[:N], x))
    elif args.case == "wide":
        F2 = 512
        xw = jax.random.normal(jax.random.PRNGKey(1), (N, F2),
                               jnp.float32).astype(jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(2), (E, 1), jnp.float32)
        gpw = dgl.prepare_spmm(g0, te=256, weighted=True, flat_width=F2)
        report("u_mul_e_f512_bf16_plan",
               timed(lambda h: dgl.gspmm(gpw, "mul", "sum", h, w, "u", "e")
                     .astype(jnp.bfloat16), xw))
    elif args.case == "gat":
        N3, H, D = 500_000, 8, 64
        g3 = random_power_law_graph(N3, avg_degree=16.0, alpha=2.1, seed=1)
        E3 = g3.num_edges()
        g3p = dgl.prepare_spmm(g3, te=256, weighted=False)
        from dgl_hack_tpu.ops.gat import gat_attention
        kk = jax.random.split(jax.random.PRNGKey(3), 3)
        fsrc = jax.random.normal(kk[0], (N3, H, D), jnp.float32)
        el = jax.random.normal(kk[1], (N3, H), jnp.float32)
        er = jax.random.normal(kk[2], (N3, H), jnp.float32)

        dt = timed(lambda f: gat_attention(g3p, f, el, er, 0.2), fsrc)
        print(json.dumps({"case": "fused_gat_fwd",
                          "ms": round(dt * 1e3, 2),
                          "ns_per_edge": round(dt * 1e9 / E3, 2),
                          "E": E3}))


if __name__ == "__main__":
    main()
