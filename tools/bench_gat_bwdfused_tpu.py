"""Component accounting for the round-5 in-kernel fused GAT backward.

The first on-chip A/B (bench_gat_vjp_tpu) measured the fused backward
SLOWER than the round-4 compact path (126 vs 104 ns/edge bwd at the
floor-accounting shape).  This tool decomposes the fused driver so the
regression has a named cause before the design is kept, fixed, or
refuted:

  * full        — kernel + per-slot edge emission + edge-order scatter
  * noscatter   — kernel + emission, scatter skipped
  * noemit      — kernel only (no second output)
  * compact_ref — the round-4 rev reduce (w_kind='head') at the same
                  plan, the direct like-for-like kernel comparison

Parts must explain full - compact_ref or the accounting is wrong
(profile_headline_floor discipline).  Plans ride as jit ARGUMENTS
(CLAUDE.md: closing over them serializes into the remote compile).
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
    from dgl_hack_tpu.ops.pallas.spmm_kernel import (
        N_PLAN_ARRAYS, _run_direction)
    from dgl_hack_tpu.ops.pallas.gat_kernel import _run_gat_bwd_fused

    N, H, D = 100_000, 8, 64
    HD = H * D
    ZW = HD + 2 * H
    g0 = random_power_law_graph(N, avg_degree=16.0, alpha=2.1, seed=0)
    E = g0.num_edges()
    g_c = dgl.prepare_spmm(g0, te=256, flat=False, dense_hub=False,
                           sddmm=False, flat_width=ZW, bucket_rows=None)
    meta_rev = g_c.spmm_plan_meta[1]
    rev = tuple(g_c.spmm_plan_arrays[N_PLAN_ARRAYS:2 * N_PLAN_ARRAYS])
    print(json.dumps({"shape": {"N": N, "E": int(E), "H": H, "D": D},
                      "rev_chunks": meta_rev[4],
                      "rev_bc": int(rev[3].shape[1])}), flush=True)

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    node_rev = jax.random.normal(k1, (N, HD + 4 * H), jnp.float32)
    z = jax.random.normal(k2, (N, HD + H), jnp.float32)

    inv = g_c.spmm_plan_arrays[2 * N_PLAN_ARRAYS]
    for variant, use_inv in (("noemit", False), ("noscatter", False),
                             ("full_scatter", False), ("full_gather", True)):
        def f(c, nr, zz, iv, *arrs, _v=variant, _ui=use_inv):
            dz, dr, dw = _run_gat_bwd_fused(
                arrs, meta_rev, nr + c * 0, zz, None, E, 0.2, "f32x2",
                H, D, variant=_v.replace("_scatter", "").replace(
                    "_gather", ""), rev_inv=iv if _ui else None)
            return dz[0, 0] * 1e-20 + dr[0, 0] * 1e-20 + c * 0
        dt = timed_loop(f, (node_rev, z, inv) + rev)
        print(json.dumps({"component": f"fused_bwd_{variant}",
                          "ms": round(dt * 1e3, 2),
                          "ns_per_edge": round(dt / E * 1e9, 2)}),
              flush=True)

    # round-4 compact reference at the same plan: [dout||1] reduce with
    # compact (E, 2H) head weights
    nrv = jax.random.normal(k1, (N, HD + H), jnp.float32)
    w2 = jax.random.normal(k2, (E, 2 * H), jnp.float32)

    def f2(c, nv, ww, *arrs):
        o = _run_direction(arrs, meta_rev, nv + c * 0, ww, E, "f32x2",
                           w_head=(H, D))
        return o[0, 0] * 1e-20 + c * 0
    dt = timed_loop(f2, (nrv, w2) + rev)
    print(json.dumps({"component": "compact_rev_reduce_ref",
                      "ms": round(dt * 1e3, 2),
                      "ns_per_edge": round(dt / E * 1e9, 2)}), flush=True)


if __name__ == "__main__":
    main()
