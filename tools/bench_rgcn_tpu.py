"""On-chip RGCN benchmark (VERDICT r3 #3): composed per-edge basis path
vs the two-level (dst,etype)-pair plan path (ops/rgcn.py), fwd and
fwd+bwd, at AIFB-like and 1M-node scales.

The pair count M (and with it the fast path's win) depends on how
etypes correlate with destinations:
  * 'skewed'  — each dst draws from ~4 relations (knowledge graphs:
    AIFB/AM dsts see few predicate types) -> M << E;
  * 'random'  — etypes i.i.d. uniform -> M approaches E at R >> deg
    (worst case for pair compression; the narrow-gather win remains).

Reference: RgcnLayer0/1KernelImpl over etype-sorted CSR
(src/kernel/cuda/binary_reduce_impl.cu:914, GetCsrSortedByEdgeType).
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


def bench_case(name, N, E_target, R, B, in_f, out_f, etype_mode,
               seed=0):
    import jax
    import jax.numpy as jnp
    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.data import random_power_law_graph
    from dgl_hack_tpu.nn import RelGraphConv

    g = random_power_law_graph(N, avg_degree=E_target / N, alpha=2.1,
                               seed=seed)
    E = g.num_edges()
    rng = np.random.default_rng(seed)
    dst_user = np.asarray(g.host_edges()[1], np.int64)
    if etype_mode == "skewed":
        # each dst samples among 4 dst-specific relations
        base = (dst_user * 2654435761) % R
        et = ((base + rng.integers(0, 4, E)) % R).astype(np.int32)
    else:
        et = rng.integers(0, R, E).astype(np.int32)
    plan = dgl.prepare_rgcn(g, et, R, te=64)
    M = plan.num_pairs
    key = jax.random.PRNGKey(seed)
    x = jax.random.normal(key, (N, in_f), jnp.float32)
    etd = jnp.asarray(et)
    layer = RelGraphConv(out_feats=out_f, num_rels=R, num_bases=B)
    # init through the plan path — the composed trace materialises the
    # (E, B, out) gather and OOMs at 16M edges before any timing runs
    params = layer.init(jax.random.PRNGKey(0), g, x, etd, plan=plan)

    out = {"case": name, "N": N, "E": E, "R": R, "B": B,
           "in": in_f, "out": out_f, "etypes": etype_mode,
           "pairs": int(M), "pair_compression": round(E / max(M, 1), 2)}

    for pathname, pl in (("composed", None), ("pair_plan", plan)):
        # graph AND plan ride as jit ARGUMENTS — closing over them
        # serializes the plan arrays as constants into the remote
        # compile request (HTTP 413 at 1M scale, CLAUDE.md)
        def fwd(c, p, gg, q, et, *pl_a):
            o = layer.apply(p, gg, q + c * 0, et,
                            plan=pl_a[0] if pl_a else None)
            return o[0, 0] * 1e-20 + c * 0

        def step(c, p, gg, q, et, *pl_a):
            def loss(pp, qq):
                o = layer.apply(pp, gg, qq, et,
                                plan=pl_a[0] if pl_a else None)
                return (o * o).sum()
            l, (gp, gq) = jax.value_and_grad(loss, argnums=(0, 1))(p, q + c * 0)
            acc = l * 1e-20
            for leaf in jax.tree.leaves(gp):
                acc = acc + leaf.reshape(-1)[0] * 1e-20
            return acc + gq[0, 0] * 1e-20 + c * 0

        extra = (pl,) if pl is not None else ()
        for tag, fn in (("fwd", fwd), ("fwdbwd", step)):
            try:
                dt = timed_loop(fn, (params, g, x, etd) + extra)
                out[f"{tag}_{pathname}_ms"] = round(dt * 1e3, 2)
                out[f"{tag}_{pathname}_ns_per_edge"] = round(
                    dt / E * 1e9, 2)
            except Exception as ex:                      # noqa: BLE001
                # the composed basis path materialises the (E, B, out)
                # gather with (8,128)-tile padding — 8x at out=16 — and
                # OOMs at E-millions scale; record it, keep going
                out[f"{tag}_{pathname}_ms"] = (
                    "OOM" if "exceed memory" in str(ex) else "ERROR")
                if out[f"{tag}_{pathname}_ms"] == "ERROR":
                    out[f"{tag}_{pathname}_err"] = str(ex)[:400]
    print(json.dumps(out), flush=True)
    del g, plan, x, params
    gc.collect()


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()
    cases = {
        # AIFB-like: 8k entities, 66k triples, 90 rels, full-rank bases
        "aifb_like": (8285, 66371, 90, None, 16, 16, "skewed"),
        # AM-like scale with basis compression
        "am_like": (300_000, 2_400_000, 90, 20, 16, 16, "skewed"),
        # 1M-node synthetic, both etype regimes
        "synth1m_skewed": (1_000_000, 16_000_000, 45, 8, 64, 64,
                           "skewed"),
        "synth1m_random": (1_000_000, 16_000_000, 45, 8, 64, 64,
                           "random"),
    }
    for name, cfg in cases.items():
        if args.only and name not in args.only:
            continue
        bench_case(name, *cfg)


if __name__ == "__main__":
    main()
