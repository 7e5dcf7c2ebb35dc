"""Spatial GAT per-device step on-chip (round 5): the partition-local
fused GAT edge phase — forward and fwd+bwd — with the mask-aware plans
attach_spmm_plans ships and the round-5 in-kernel backward, measured on
part 0..P-1 of the N=1M power-law graph (one chip; the halo all_to_all
itself cannot run single-chip but its volume is printed from the plan —
bench_spatial_dense_tpu measures that path's collective budget).

This is the multi-chip GAT evidence at device speed: the SCALING_CPU
gat rows run the same code on the interpret-mode CPU mesh (~100x tax),
this measures the real kernels.  Reference: the fork's single-GPU GAT
kernels serving the distributed path through the same dispatch
(contrib/dis_kvstore.py:670).
"""
import functools
import gc
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

_loops = {}


def timed_loop(fn, args, k_lo=2, k_hi=6, reps=3):
    import jax
    import jax.numpy as jnp

    if id(fn) not in _loops:
        @functools.partial(jax.jit, static_argnums=0)
        def loop(iters, *a):
            def body(i, c):
                return fn(c, *a)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        _loops[id(fn)] = loop
    loop = _loops[id(fn)]

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
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", type=int, default=2,
                    help="how many partitions to measure (sequentially)")
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--graph", default="powerlaw",
                    choices=["powerlaw", "clustered"],
                    help="clustered = planted_partition(100k): low-cut "
                         "regime where partition quality shrinks the "
                         "ext table below the row-count gather cliff")
    ap.add_argument("--method", default="fennel",
                    help="partition method (e.g. multilevel)")
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp
    import dgl_hack_tpu as dgl  # noqa: F401
    from dgl_hack_tpu.data import random_power_law_graph
    from dgl_hack_tpu.ops.gat import gat_attention
    from dgl_hack_tpu.parallel import attach_spmm_plans, build_spatial_plan
    from dgl_hack_tpu.parallel.halo import local_graph

    P = 8
    H, D = args.heads, args.dim
    ZW = H * D + 2 * H
    if args.graph == "clustered":
        from dgl_hack_tpu.data import planted_partition
        ds = planted_partition(100_000, 8, 8, avg_degree=12.0,
                               homophily=0.9, seed=0, train_per_class=8)
        g0 = ds.graph
        N = g0.num_nodes()
    else:
        N = 1_000_000
        g0 = random_power_law_graph(N, avg_degree=16.0, alpha=2.1, seed=0)
    E = g0.num_edges()
    t0 = time.perf_counter()
    plan = build_spatial_plan(g0, P, method=args.method, seed=0,
                              hub_k=64 if args.graph == "powerlaw" else 0)
    plan = attach_spmm_plans(plan, te=256, flat_width=ZW,
                             which=("graph",))
    st = plan.stats()
    print(json.dumps({
        "build_s": round(time.perf_counter() - t0, 1),
        "edges_padded_per_part": st["edges_padded"] // P,
        "halo_rows_padded": st["halo_rows_padded"],
        "cut_fraction": round(st["cut_fraction"], 4),
        "halo_mb_per_part_bf16": round(
            st["halo_rows_padded"] / P * H * D * 2 / 2**20, 1),
        "num_src_ext": plan.num_src_ext,
    }), flush=True)
    dev = plan.device_arrays()
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    n_ext = plan.num_src_ext
    n_own = plan.n_owned_max
    fsrc = jax.random.normal(k1, (n_ext, H, D), jnp.float32)
    el = jax.random.normal(k2, (n_ext, H), jnp.float32)
    er = jax.random.normal(k3, (n_own, H), jnp.float32)
    e_pad = st["edges_padded"] // P

    def fwd(c, gl, f, l, r):
        o = gat_attention(gl, f + c * 0, l, r)
        return o[0, 0, 0] * 1e-20 + c * 0

    def step(c, gl, f, l, r):
        def loss(f_, l_, r_):
            o = gat_attention(gl, f_, l_, r_)
            return (o * o).sum()
        v, (gf, glg, grg) = jax.value_and_grad(
            loss, argnums=(0, 1, 2))(f + c * 0, l, r)
        return (v * 1e-20 + gf[0, 0, 0] * 1e-20 + glg[0, 0] * 1e-20
                + grg[0, 0] * 1e-20 + c * 0)

    steps = []
    for p0 in range(min(args.parts, P)):
        dev1 = {k: v[p0] for k, v in dev.items()}
        gl = local_graph(plan, dev1)
        dt_f = timed_loop(fwd, (gl, fsrc, el, er))
        dt_s = timed_loop(step, (gl, fsrc, el, er))
        steps.append(dt_s)
        print(json.dumps({
            "part": p0,
            "fwd_ms": round(dt_f * 1e3, 2),
            "fwd_ns_per_edge": round(dt_f / e_pad * 1e9, 2),
            "fwdbwd_ms": round(dt_s * 1e3, 2),
            "fwdbwd_ns_per_edge": round(dt_s / e_pad * 1e9, 2),
        }), flush=True)
        gc.collect()
    t_max = max(steps)
    print(json.dumps({
        "implied_aggregate_train_edges_per_s": round(E / t_max),
        "note": f"compute-only; halo all_to_all volume printed above "
                f"rides ICI (~0.1 ms/layer on v5p at bf16)"}), flush=True)


if __name__ == "__main__":
    main()
