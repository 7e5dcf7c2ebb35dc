"""Fused-GAT cost accounting + bucketed-plan A/B (round 3, VERDICT #2).

Round-2 measured 28.3 ns/edge for the fused GAT forward (N=100k,
E=1.6M, H=8, D=64, chunked-acc auto plan) doing ONE ~wide-row gather
per edge; this tool decomposes the number:

  a) copy_u-sum through the SAME plan machinery at the z width
     (HD+H = 520 lanes) = gather + one-hot reduce + accumulator cost,
     no GAT math;
  b) copy_u-sum at F=128 = plan/accumulator floor at narrow width;
  c) fused GAT fwd (shift softmax) = a) + logit/exp/select math;
  d) c) with DGL_TPU_GAT_PACKED=1 (half the z gather lanes);
  e) c)/d) with SRC-BUCKETED plans (z table sliced to <=64 MB buckets —
     the table at 520 f32 lanes is 208 MB, deep in the slow-gather
     regime; packed 264-lane is 105 MB, still slow).

All operands generated on device; one JSON line per case.
"""
import functools
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
    HD = H * D
    ZW = HD + H
    g0 = random_power_law_graph(N, avg_degree=16.0, alpha=2.1, seed=0)
    E = g0.num_edges()
    key = jax.random.PRNGKey(0)
    k1, k2, k3, key = jax.random.split(key, 4)
    feat = jax.random.normal(k1, (N, HD), jnp.float32) * 0.1
    el = jax.random.normal(k2, (N, H), jnp.float32) * 0.1
    er = jax.random.normal(k3, (N, H), jnp.float32) * 0.1
    xz = jnp.concatenate([feat, el], axis=1)          # (N, 520)
    x128 = feat[:, :128]

    def run(name, fn, args):
        dt = timed_loop(fn, args)
        print(json.dumps({"case": name, "ms": round(dt * 1e3, 2),
                          "ns_per_edge": round(dt / E * 1e9, 3)}),
              flush=True)

    def copy_u(c, gg, q):
        return dgl.gspmm(gg, "copy_lhs", "sum",
                         q + c * 0)[0, 0] * 1e-20 + c * 0

    def gat_fwd(c, gg, f_, el_, er_):
        rst = gat_attention(gg, f_ + c * 0, el_, er_, 0.2)
        return rst[0, 0, 0] * 1e-20 + c * 0

    for tag, bkt in (("", None), ("_bucketed", (64 << 20) // (ZW * 4))):
        gp = dgl.prepare_spmm(g0, te=256, dense_hub=False, sddmm=False,
                              flat=False, flat_width=ZW, bucket_rows=bkt)
        meta = gp.spmm_plan_meta[0]
        print(json.dumps({"note": f"plan{tag}", "chunks": meta[4],
                          "gather_rows": meta[6]}), flush=True)
        run(f"copy_u_F520{tag}", copy_u, (gp, xz))
        if not tag:
            run("copy_u_F128", copy_u, (gp, x128))
        feat3 = feat.reshape(N, H, D)
        run(f"gat_fwd_shift{tag}", gat_fwd, (gp, feat3, el, er))
        os.environ["DGL_TPU_GAT_PACKED"] = "1"
        run(f"gat_fwd_shift_packed{tag}", gat_fwd, (gp, feat3, el, er))
        del os.environ["DGL_TPU_GAT_PACKED"]
        del gp


if __name__ == "__main__":
    main()
