"""Single-chip measurement of ONE partition's local step at P=8 shapes
cut from the N=1M headline graph (VERDICT r3 #1 'done' criterion).

With one physical chip the collective cannot run, but the per-partition
COMPUTE can: this benchmark times part 0's local-src and remote-src
reduces (the two halves of make_halo_gspmm's overlap split) through the
attached Pallas plans vs the composed XLA segment path, and prints
ns/edge against the unpartitioned headline remainder for context.

The partition feature table is N/P rows and the halo buffer ~P*s_max
rows — both inside the <=64 MB fast-gather regime by construction at
P=8/F=128 (the operand-size law, KERNELS.md round 3)."""
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
    from dgl_hack_tpu.ops import segment as seg
    from dgl_hack_tpu.ops.pallas.spmm_kernel import gspmm_pallas
    from dgl_hack_tpu.parallel import attach_spmm_plans, build_spatial_plan

    N, F, P = 1_000_000, 128, 8
    g0 = random_power_law_graph(N, avg_degree=16.0, alpha=2.1, seed=0)
    E = g0.num_edges()
    t0 = time.perf_counter()
    plan = build_spatial_plan(g0, P, method="fennel", seed=0, hub_k=64)
    t1 = time.perf_counter()
    plan = attach_spmm_plans(plan, te=64, which=("local", "remote"))
    t2 = time.perf_counter()
    st = plan.stats()
    print(json.dumps({
        "stats": {k: (round(v, 4) if isinstance(v, float) else v)
                  for k, v in st.items()},
        "spatial_build_s": round(t1 - t0, 2),
        "plan_attach_s": round(t2 - t1, 2),
        "n_owned_max": plan.n_owned_max,
        "halo_rows": plan.halo_max + P * plan.hk_max,
        "own_table_mb": round(plan.n_owned_max * F * 4 / 2**20, 1),
        "halo_table_mb": round((plan.halo_max + P * plan.hk_max) * F * 4
                               / 2**20, 1),
    }), flush=True)

    p0 = 0
    d = {}
    for kname in ("lsrc", "ldst", "lmask", "rsrc", "rdst", "rmask"):
        d[kname] = jnp.asarray(getattr(plan, kname)[p0])
    arrs_l = tuple(jnp.asarray(a[p0]) for a in plan.spmm_local)
    arrs_r = tuple(jnp.asarray(a[p0]) for a in plan.spmm_remote)
    el_real = int(plan.lmask[p0].sum())
    er_real = int(plan.rmask[p0].sum())
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (plan.n_owned_max, F), jnp.float32)
    halo = jax.random.normal(
        k2, (plan.halo_max + P * plan.hk_max, F), jnp.float32)
    print(json.dumps({"part0_local_edges": el_real,
                      "part0_remote_edges": er_real}), flush=True)

    results = {}

    def run(name, fn, args, denom):
        dt = timed_loop(fn, args)
        results[name] = dt
        print(json.dumps({"case": name,
                          "ms_per_iter": round(dt * 1e3, 3),
                          "ns_per_edge": round(dt / denom * 1e9, 3)}),
              flush=True)

    # plan arrays + index arrays ride as jit ARGUMENTS (closing over
    # them serializes into the remote compile request — HTTP 413)
    def local_plan(c, q, dd, *arrs):
        o = gspmm_pallas(plan.spmm_meta_local, arrs, dd["lsrc"],
                         dd["ldst"], q + c * 0, None, "sum", None)
        return o[0, 0] * 1e-20 + c * 0

    def remote_plan(c, q, dd, *arrs):
        o = gspmm_pallas(plan.spmm_meta_remote, arrs, dd["rsrc"],
                         dd["rdst"], q + c * 0, None, "sum", None)
        return o[0, 0] * 1e-20 + c * 0

    def local_seg(c, q, dd):
        o = seg.segment_reduce("sum", (q + c * 0)[dd["lsrc"]], dd["ldst"],
                               plan.n_owned_max, indices_are_sorted=True,
                               mask=dd["lmask"])
        return o[0, 0] * 1e-20 + c * 0

    def remote_seg(c, q, dd):
        o = seg.segment_reduce("sum", (q + c * 0)[dd["rsrc"]], dd["rdst"],
                               plan.n_owned_max, indices_are_sorted=True,
                               mask=dd["rmask"])
        return o[0, 0] * 1e-20 + c * 0

    run("part0_local_plan", local_plan, (x, d) + arrs_l, el_real)
    run("part0_local_composed", local_seg, (x, d), el_real)
    run("part0_remote_plan", remote_plan, (halo, d) + arrs_r, er_real)
    run("part0_remote_composed", remote_seg, (halo, d), er_real)

    # whole-part step (both halves, plan path) — the number the ICI
    # projection model uses as the per-device compute term
    nl = len(arrs_l)

    def part_step(c, q, h, dd, *arrs):
        a = gspmm_pallas(plan.spmm_meta_local, arrs[:nl], dd["lsrc"],
                         dd["ldst"], q + c * 0, None, "sum", None)
        b = gspmm_pallas(plan.spmm_meta_remote, arrs[nl:], dd["rsrc"],
                         dd["rdst"], h, None, "sum", None)
        return (a + b)[0, 0] * 1e-20 + c * 0
    run("part0_step_plan", part_step, (x, halo, d) + arrs_l + arrs_r,
        el_real + er_real)

    print(json.dumps({
        "speedup_local": round(results["part0_local_composed"]
                               / results["part0_local_plan"], 2),
        "speedup_remote": round(results["part0_remote_composed"]
                                / results["part0_remote_plan"], 2),
        "per_device_step_ms": round(results["part0_step_plan"] * 1e3, 3),
        "implied_all_device_edges_per_s": round(
            E / results["part0_step_plan"]),
    }), flush=True)
    gc.collect()


if __name__ == "__main__":
    main()
