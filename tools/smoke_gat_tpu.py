"""TPU smoke test for the fused GAT kernel: compile, correctness vs the
composed XLA path, and timing.  Run alone (one TPU process at a time)."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import dgl_hack_tpu as dgl
from dgl_hack_tpu.data import random_power_law_graph
from dgl_hack_tpu.ops.gat import gat_attention

N, AVG_DEG, H, D = 100_000, 16.0, 8, 64


def main():
    print("backend:", jax.default_backend(), jax.devices()[0])
    g = random_power_law_graph(N, avg_degree=AVG_DEG, alpha=2.1, seed=0)
    # flat_width: the fused-GAT kernel gathers (H*D + 2H)-wide rows; size
    # the flat-plan budget to that so auto-flat stays within HBM
    # te=256 chunked-acc measured best for fused GAT (45.3 vs 62.1 ms
    # at te=1024; KERNELS.md)
    gp = dgl.prepare_spmm(g, te=256, flat_width=H * D + 2 * H)
    E = g.num_edges()
    rng = np.random.default_rng(0)
    fsrc = jnp.asarray(rng.normal(size=(N, H, D)).astype(np.float32))
    el = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    er = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))

    # correctness (forward)
    out = jax.jit(lambda gg, a, b, c: gat_attention(gg, a, b, c))(
        gp, fsrc, el, er)
    ref = jax.jit(lambda gg, a, b, c: gat_attention(gg, a, b, c))(
        g, fsrc, el, er)
    err = float(jnp.abs(out - ref).max() / (jnp.abs(ref).max() + 1e-9))
    print(f"fwd rel err: {err:.2e}  E={E}")

    # correctness (grads)
    def loss(gg, a, b, c):
        return (gat_attention(gg, a, b, c) ** 2).sum()
    gf = jax.jit(jax.grad(loss, argnums=(1, 2, 3)))(gp, fsrc, el, er)
    gr = jax.jit(jax.grad(loss, argnums=(1, 2, 3)))(g, fsrc, el, er)
    for a, b, name in zip(gf, gr, ("dfsrc", "del", "der")):
        e = float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))
        print(f"{name} rel err: {e:.2e}")

    # timing: chained fori_loop difference (see bench.py methodology)
    @functools.partial(jax.jit, static_argnums=(0, 2))
    def loop(fused, graph_feats, iters):
        graph, a, b, c = graph_feats

        def body(i, a):
            return gat_attention(graph, a, b, c) * 1e-2
        return jax.lax.fori_loop(0, iters, body, a)[0, 0, 0]

    for name, graph in (("fused", gp), ("xla", g)):
        args = (graph, fsrc, el, er)

        def timed(k):
            float(loop(name == "fused", args, k))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(loop(name == "fused", args, k))
                best = min(best, time.perf_counter() - t0)
            return best

        dt = (timed(10) - timed(2)) / 8
        print(f"{name}: {dt * 1e3:.2f} ms/iter  "
              f"{E / dt / 1e6:.0f} M edges/s  "
              f"{dt / E * 1e9:.2f} ns/edge")


if __name__ == "__main__":
    main()
