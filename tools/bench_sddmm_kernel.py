"""Fused-sddmm kernel vs composed, at a scale where the kernel is
actually ELIGIBLE (the earlier surface run silently fell back: at E=8M
the (nb*te, F) message buffer is 4.3 GB > the 2 GB dispatch budget and
plan == composed to three digits).  N=200k/E=3.2M keeps the buffer at
1.6 GB; the script asserts the dispatch path per case."""
import functools
import json
import os
import sys
import time

os.environ["DGL_TPU_SDDMM_KERNEL"] = "1"   # opt into the kernel path

import numpy as np

sys.path.insert(0, ".")


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
    import jax
    import jax.numpy as jnp
    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.data import random_power_law_graph
    from dgl_hack_tpu.ops.sddmm import gsddmm, _pallas_sddmm_eligible

    N, F = 200_000, 128
    g0 = random_power_law_graph(N, avg_degree=16.0, alpha=2.1, seed=0)
    E = g0.num_edges()
    gp = dgl.prepare_spmm(g0, te=64)
    x = jax.random.normal(jax.random.PRNGKey(0), (N, F), jnp.float32)

    assert _pallas_sddmm_eligible(gp, "add", x, x, "u"), "kernel ineligible"
    assert not _pallas_sddmm_eligible(g0, "add", x, x, "u")

    def report(name, dt):
        print(json.dumps({"case": name, "ms": round(dt * 1e3, 2),
                          "ns_per_edge": round(dt * 1e9 / E, 2)}),
              flush=True)

    report("u_add_v_plan",
           timed(lambda h: gsddmm(gp, "add", h, h, "u", "v")[:N], x))
    report("u_add_v_composed",
           timed(lambda h: gsddmm(g0, "add", h, h, "u", "v")[:N], x))
    report("u_dot_v_plan",
           timed(lambda h: jnp.broadcast_to(
               gsddmm(gp, "dot", h, h, "u", "v")[:N], h.shape), x))
    report("u_dot_v_composed",
           timed(lambda h: jnp.broadcast_to(
               gsddmm(g0, "dot", h, h, "u", "v")[:N], h.shape), x))
    report("copy_v_plan",
           timed(lambda h: gsddmm(gp, "copy_rhs", None, h, "u", "v")[:N],
                 x))
    report("copy_v_composed",
           timed(lambda h: gsddmm(g0, "copy_rhs", None, h, "u", "v")[:N],
                 x))


if __name__ == "__main__":
    main()
