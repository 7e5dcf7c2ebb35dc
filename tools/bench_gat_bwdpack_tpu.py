"""A/B: DGL_TPU_GAT_BWD_PACK on the fused-GAT train step (on-chip).

The round-4 bwd accounting (KERNELS.md) left the two wide per-edge
gathers (zsrc 9.1 + zdst ~9.1 ns/edge) unpacked while the forward's
width law says gather cost scales with LANE count.  BWD_PACK bf16-packs
the HD feature lanes of both backward gathers (520 -> 292 and
544 -> 288 lanes at H=8/D=64; logits/softmax stats stay exact f32).
This measures the train-default config (mixed fwd-bucketed/rev-chunked,
packed-z forward) with the flag off vs on.

Reference: the fork's explicit backward kernels
(src/kernel/cuda/binary_reduce_impl.cu:124-309).
"""
import functools
import json
import os
import sys
import time

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

    g_m = dgl.prepare_spmm(g0, te=256, flat=False, dense_hub=False,
                           sddmm=False, flat_width=ZW,
                           bucket_rows="auto", bucket_rows_rev=None)

    # NB (advisor round 4): step() closes over the plan-carrying graph,
    # so plan arrays serialize as constants into the remote compile
    # request.  Safe at THIS scale (N=100k plans ~ 26 MB < the HTTP
    # limit; this bench ran fine in round 4) — at larger E pass the
    # plans through timed_loop args like the library benches do.
    def run(name, g, bwd_pack):
        os.environ["DGL_TPU_GAT_PACKED"] = "1"
        os.environ["DGL_TPU_GAT_BWD_PACK"] = "1" if bwd_pack else "0"
        jax.clear_caches()      # round-4 note; bwd impl is now a static
        # jit arg resolved per trace (round 5), so this is belt+braces

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
            "case": name,
            "fwdbwd_ms": round(dt_s * 1e3, 2),
            "fwdbwd_ns_per_edge": round(dt_s / E * 1e9, 2),
        }), flush=True)
        return dt_s

    a = run("mixed_packed", g_m, False)
    b = run("mixed_packed_bwdpack", g_m, True)
    print(json.dumps({"bwdpack_speedup": round(a / b, 3)}), flush=True)


if __name__ == "__main__":
    main()
