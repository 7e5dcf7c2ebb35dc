"""RGCN pair-plan BACKWARD component accounting (VERDICT r4 weak #5).

The round-4 table shows random-etype fwd+bwd at 29.8 ns/edge vs 14.7
skewed at identical scale (N=1M, E=16M, R=45, B=8) with fwd nearly equal
(7.7 vs 7.4) — the 3x backward gap is unexplained.  This tool times the
three pair-path stages separately, fwd and fwd+bwd, for both etype
modes, so the parts must sum to the measured whole
(profile_headline_floor discipline):

  L1  rgcn_aggregate_pairs  — pair-graph copy_u-sum (plan fwd + rev)
  L2  rgcn_basis_message    — MXU basis projection at M pair rows
  L3  rgcn_reduce_pairs     — dst segment-sum over pair rows

Plans ride as jit ARGUMENTS (CLAUDE.md).
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


def bench_mode(etype_mode, N=1_000_000, E_target=16_000_000, R=45, B=8,
               in_f=64, out_f=64, seed=0):
    import jax
    import jax.numpy as jnp
    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.data import random_power_law_graph
    from dgl_hack_tpu.ops.rgcn import (rgcn_aggregate_pairs,
                                       rgcn_basis_message,
                                       rgcn_reduce_pairs)

    g = random_power_law_graph(N, avg_degree=E_target / N, alpha=2.1,
                               seed=seed)
    E = g.num_edges()
    rng = np.random.default_rng(seed)
    dst_user = np.asarray(g.host_edges()[1], np.int64)
    if etype_mode == "skewed":
        base = (dst_user * 2654435761) % R
        et = ((base + rng.integers(0, 4, E)) % R).astype(np.int32)
    else:
        et = rng.integers(0, R, E).astype(np.int32)
    plan = dgl.prepare_rgcn(g, et, R, te=64)
    M = plan.num_pairs
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (N, in_f), jnp.float32)
    weight = jax.random.normal(k2, (B, in_f, out_f), jnp.float32) * 0.05
    w_comp = jax.random.normal(k3, (R, B), jnp.float32) * 0.3
    agg = jax.random.normal(k1, (max(M, 1), in_f), jnp.float32)
    msg = jax.random.normal(k2, (max(M, 1), out_f), jnp.float32)

    out = {"mode": etype_mode, "N": N, "E": int(E), "M": int(M),
           "pair_compression": round(E / max(M, 1), 2)}

    def rec(tag, dt):
        out[f"{tag}_ms"] = round(dt * 1e3, 2)
        out[f"{tag}_ns_per_edge"] = round(dt / E * 1e9, 2)

    # L1: pair-graph copy_u-sum, fwd and coupled vjp
    def l1_fwd(c, pl, q):
        o = rgcn_aggregate_pairs(pl, q + c * 0)
        return o[0, 0] * 1e-20 + c * 0
    rec("L1_fwd", timed_loop(l1_fwd, (plan, x)))

    def l1_step(c, pl, q):
        def loss(qq):
            return (rgcn_aggregate_pairs(pl, qq) ** 2).sum()
        v, gq = jax.value_and_grad(loss)(q + c * 0)
        return v * 1e-20 + gq[0, 0] * 1e-20 + c * 0
    rec("L1_fwdbwd", timed_loop(l1_step, (plan, x)))

    # L2: basis projection at M rows (grads wrt agg AND weights)
    def l2_fwd(c, pl, a, w, wc):
        o = rgcn_basis_message(pl, a + c * 0, w, wc)
        return o[0, 0] * 1e-20 + c * 0
    rec("L2_fwd", timed_loop(l2_fwd, (plan, agg, weight, w_comp)))

    def l2_step(c, pl, a, w, wc):
        def loss(aa, ww, wcc):
            return (rgcn_basis_message(pl, aa, ww, wcc) ** 2).sum()
        v, (ga, gw, gwc) = jax.value_and_grad(loss, argnums=(0, 1, 2))(
            a + c * 0, w, wc)
        return (v * 1e-20 + ga[0, 0] * 1e-20 + gw[0, 0, 0] * 1e-20
                + gwc[0, 0] * 1e-20 + c * 0)
    rec("L2_fwdbwd", timed_loop(l2_step, (plan, agg, weight, w_comp)))

    # L3: pair -> dst segment sum
    def l3_fwd(c, pl, m_):
        o = rgcn_reduce_pairs(pl, m_ + c * 0, N)
        return o[0, 0] * 1e-20 + c * 0
    rec("L3_fwd", timed_loop(l3_fwd, (plan, msg)))

    def l3_step(c, pl, m_):
        def loss(mm):
            return (rgcn_reduce_pairs(pl, mm, N) ** 2).sum()
        v, gm = jax.value_and_grad(loss)(m_ + c * 0)
        return v * 1e-20 + gm[0, 0] * 1e-20 + c * 0
    rec("L3_fwdbwd", timed_loop(l3_step, (plan, msg)))

    print(json.dumps(out), flush=True)
    del g, plan, x
    gc.collect()


def main():
    for mode in ("skewed", "random"):
        bench_mode(mode)


if __name__ == "__main__":
    main()
