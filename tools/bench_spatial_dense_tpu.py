"""Distributed dense-hub single-partition measurement (the round-4
spatial headline): part 0 of the N=1M/P=8 power-law graph with hub dst
rows on the column-sliced C matmul + psum_scatter path and the reduced
exchange for the rest.

One chip cannot run the psum_scatter itself, but the collective moves
only ~R*F*4 bytes (printed); everything else is per-device compute and
IS measured here: the C[:, own] @ x_own partial, the reduced local and
remote plan reduces.  C is rebuilt on-device from the edge list (a
600 MB f16 host array would crawl through the tunnel).

Context numbers: the NON-dense part0 step measured 22.5 ms
(bench_spatial_tpu), the single-chip hybrid headline 17.0 ms for the
whole graph."""
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
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=int, default=2000)
    ap.add_argument("--budget-mb", type=int, default=600)
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp
    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.data import random_power_law_graph
    from dgl_hack_tpu.ops.pallas.spmm_kernel import (dense_count_matmul,
                                                     gspmm_pallas)
    from dgl_hack_tpu.parallel import attach_spmm_plans, build_spatial_plan

    N, F, P = 1_000_000, 128, 8
    g0 = random_power_law_graph(N, avg_degree=16.0, alpha=2.1, seed=0)
    E = g0.num_edges()
    t0 = time.perf_counter()
    plan = build_spatial_plan(g0, P, method="fennel", seed=0, hub_k=64,
                              dense_threshold=args.threshold,
                              dense_budget=args.budget_mb << 20)
    plan = attach_spmm_plans(plan, te=64, which=("local", "remote"))
    st = plan.stats()
    print(json.dumps({
        "build_s": round(time.perf_counter() - t0, 1),
        "stats": {k: (round(v, 4) if isinstance(v, float) else v)
                  for k, v in st.items()},
        "R_max": plan.dense_R_max,
        "psum_bytes_per_step": plan.num_parts * plan.dense_R_max * F * 4,
        "C_mb_per_device": round(
            plan.num_parts * plan.dense_R_max * plan.n_owned_max * 2
            / 2**20, 1),
    }), flush=True)

    rp = plan.reduced
    p0 = 0
    d = {}
    for kname in ("lsrc", "ldst", "lmask", "rsrc", "rdst", "rmask"):
        d[kname] = jnp.asarray(getattr(rp, kname)[p0])
    arrs_l = tuple(jnp.asarray(a[p0]) for a in rp.spmm_local)
    arrs_r = tuple(jnp.asarray(a[p0]) for a in rp.spmm_remote)
    el_real = int(rp.lmask[p0].sum())
    er_real = int(rp.rmask[p0].sum())
    # C0 on DEVICE from the dense edge list (host f16 slab would crawl
    # through the tunnel): rows/cols as int32, chunked scatter-add
    C_np = plan.dense_C[p0]
    rows_u, cols_u = np.nonzero(C_np)
    vals = C_np[rows_u, cols_u].astype(np.float32)
    R_pad, n_own = C_np.shape
    dense_edges_p0 = int(vals.sum())
    print(json.dumps({"part0_reduced_local": el_real,
                      "part0_reduced_remote": er_real,
                      "part0_dense_edges": dense_edges_p0,
                      "C_nnz": len(vals)}), flush=True)

    @jax.jit
    def build_C(r, c, v):
        C = jnp.zeros((R_pad, n_own), jnp.float32)
        return C.at[r, c].add(v).astype(jnp.bfloat16)

    C0 = build_C(jnp.asarray(rows_u.astype(np.int32)),
                 jnp.asarray(cols_u.astype(np.int32)), jnp.asarray(vals))
    jax.block_until_ready(C0)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (rp.n_owned_max, F), jnp.float32)
    halo = jax.random.normal(
        k2, (max(rp.halo_max + P * rp.hk_max, 1), F), jnp.float32)

    results = {}

    def run(name, fn, args, denom):
        dt = timed_loop(fn, args)
        results[name] = dt
        print(json.dumps({"case": name,
                          "ms_per_iter": round(dt * 1e3, 3),
                          "ns_per_edge": round(dt / max(denom, 1) * 1e9,
                                               3)}), flush=True)

    def dense_part(c, Cd, q):
        o = dense_count_matmul("f32x2", Cd, q + c * 0)
        return o[0, 0] * 1e-20 + c * 0
    run("part0_dense_matmul", dense_part, (C0, x), dense_edges_p0)

    nl = len(arrs_l)

    def full_step(c, Cd, q, h, dd, *arrs):
        a = gspmm_pallas(rp.spmm_meta_local, arrs[:nl], dd["lsrc"],
                         dd["ldst"], q + c * 0, None, "sum", None)
        b = gspmm_pallas(rp.spmm_meta_remote, arrs[nl:], dd["rsrc"],
                         dd["rdst"], h, None, "sum", None)
        p_ = dense_count_matmul("f32x2", Cd, q + c * 0)
        return (a + b)[0, 0] * 1e-20 + p_[0, 0] * 1e-20 + c * 0
    run("part0_dense_step", full_step,
        (C0, x, halo, d) + arrs_l + arrs_r,
        el_real + er_real + dense_edges_p0)

    # segment-path variant for the tiny reduced splits (the non-dense
    # bench measured composed BEATING plans on the local half — small
    # fragmented splits favour XLA's fused gather+scatter)
    from dgl_hack_tpu.ops import segment as seg

    def full_step_seg(c, Cd, q, h, dd):
        a = seg.segment_reduce("sum", (q + c * 0)[dd["lsrc"]],
                               dd["ldst"], rp.n_owned_max,
                               indices_are_sorted=True, mask=dd["lmask"])
        b = seg.segment_reduce("sum", h[dd["rsrc"]], dd["rdst"],
                               rp.n_owned_max, indices_are_sorted=True,
                               mask=dd["rmask"])
        p_ = dense_count_matmul("f32x2", Cd, q + c * 0)
        return (a + b)[0, 0] * 1e-20 + p_[0, 0] * 1e-20 + c * 0
    run("part0_dense_step_segment", full_step_seg, (C0, x, halo, d),
        el_real + er_real + dense_edges_p0)

    # fwd+bwd (training) through the dense path: the C^T transpose
    # matmul (dense_count_matmul custom VJP) + the reverse plan reduces
    def train_step(c, Cd, q, h, dd, *arrs):
        def loss(q_, h_):
            a = gspmm_pallas(rp.spmm_meta_local, arrs[:nl], dd["lsrc"],
                             dd["ldst"], q_, None, "sum", None)
            b = gspmm_pallas(rp.spmm_meta_remote, arrs[nl:], dd["rsrc"],
                             dd["rdst"], h_, None, "sum", None)
            p_ = dense_count_matmul("f32x2", Cd, q_)
            out = a + b
            out = out.at[:p_.shape[0] // P].add(p_[:p_.shape[0] // P])
            return (out * out).sum()
        v, (gq, gh) = jax.value_and_grad(loss, argnums=(0, 1))(
            q + c * 0, h)
        return v * 1e-20 + gq[0, 0] * 1e-20 + gh[0, 0] * 1e-20 + c * 0
    run("part0_dense_step_fwdbwd", train_step,
        (C0, x, halo, d) + arrs_l + arrs_r,
        el_real + er_real + dense_edges_p0)

    print(json.dumps({
        "per_device_step_ms": round(results["part0_dense_step"] * 1e3, 3),
        "implied_all_device_edges_per_s": round(
            E / results["part0_dense_step"]),
        "vs_nondense_step_ms": 22.513,
        "vs_single_chip_ms": 17.0,
    }), flush=True)
    gc.collect()


if __name__ == "__main__":
    main()
