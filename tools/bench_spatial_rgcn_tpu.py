"""Spatial RGCN per-device step on-chip (round 5): the partition-local
(dst,etype)-pair plan — prepare_rgcn runs unchanged on the mask-aware
local partition graph (padded edges excluded from the pair relabeling),
so each device gets its own two-level fast path.  Companion to
bench_spatial_gat_tpu; the halo all_to_all volume is the same plan's
(printed there).  Reference: distributed RGCN through KVStore pulls
served by the same kernels as single-GPU (contrib/dis_kvstore.py:670,
RgcnLayer*KernelImpl src/kernel/cuda/binary_reduce_impl.cu:914)."""
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
    ap.add_argument("--parts", type=int, default=3)
    ap.add_argument("--rels", type=int, default=45)
    ap.add_argument("--bases", type=int, default=8)
    ap.add_argument("--feats", type=int, default=64)
    ap.add_argument("--graph", default="powerlaw",
                    choices=["powerlaw", "clustered"])
    ap.add_argument("--method", default="fennel")
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp
    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.data import random_power_law_graph
    from dgl_hack_tpu.nn import RelGraphConv
    from dgl_hack_tpu.parallel import build_spatial_plan
    from dgl_hack_tpu.parallel.halo import local_graph, shard_edata

    P = 8
    R, B, F = args.rels, args.bases, args.feats
    if args.graph == "clustered":
        from dgl_hack_tpu.data import planted_partition
        dsx = planted_partition(100_000, 8, 8, avg_degree=12.0,
                                homophily=0.9, seed=0, train_per_class=8)
        g0 = dsx.graph
        N = g0.num_nodes()
    else:
        N = 1_000_000
        g0 = random_power_law_graph(N, avg_degree=16.0, alpha=2.1, seed=0)
    E = g0.num_edges()
    rng = np.random.default_rng(0)
    dst_user = np.asarray(g0.host_edges()[1], np.int64)
    base = (dst_user * 2654435761) % R
    et = ((base + rng.integers(0, 4, E)) % R).astype(np.int32)

    t0 = time.perf_counter()
    plan = build_spatial_plan(g0, P, method=args.method, seed=0,
                              hub_k=64 if args.graph == "powerlaw" else 0)
    ets = shard_edata(plan, et, layout="graph")
    dev = plan.device_arrays()
    print(json.dumps({"build_s": round(time.perf_counter() - t0, 1),
                      "edges_padded_per_part": plan.e_max}), flush=True)

    layer = RelGraphConv(out_feats=F, num_rels=R, num_bases=B)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (plan.num_src_ext, F), jnp.float32)

    steps = []
    for p0 in range(min(args.parts, P)):
        dev1 = {k: v[p0] for k, v in dev.items()}
        gl = local_graph(plan, dev1)
        et_p = jnp.asarray(ets[p0])
        rplan = dgl.prepare_rgcn(gl, np.asarray(ets[p0]), R, te=64)
        params = layer.init(jax.random.PRNGKey(1), gl, x, et_p,
                            plan=rplan)

        def step(c, prm, g_, q, e_, rp):
            def loss(p_, q_):
                h = layer.apply(p_, g_, q_, e_, plan=rp)
                return (h * h).sum()
            v, (gp, gq) = jax.value_and_grad(loss, argnums=(0, 1))(
                prm, q + c * 0)
            acc = v * 1e-20 + gq[0, 0] * 1e-20
            for leaf in jax.tree.leaves(gp):
                acc = acc + leaf.reshape(-1)[0] * 1e-20
            return acc + c * 0

        dt = timed_loop(step, (params, gl, x, et_p, rplan))
        steps.append(dt)
        print(json.dumps({
            "part": p0, "pairs": int(rplan.num_pairs),
            "fwdbwd_ms": round(dt * 1e3, 2),
            "fwdbwd_ns_per_edge": round(dt / plan.e_max * 1e9, 2),
        }), flush=True)
        del gl, rplan, params
        gc.collect()
    print(json.dumps({
        "implied_aggregate_train_edges_per_s": round(E / max(steps)),
        "note": "compute-only per-part pair-plan RGCN fwd+bwd"}),
        flush=True)


if __name__ == "__main__":
    main()
