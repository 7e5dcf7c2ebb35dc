"""Round-4 headline confirmation + endgame probes around the new
champion (thr=28k, FLAT remainder, 974 scalar / 891 full-carry):
re-measure the champion twice (variance check — the first sweep's
thr35k_flat read 22.4 ms vs neighbours at 16.4/17.1), then probe lower
thresholds at a larger dense budget (more dense windows are now
cheaper than ANY remainder edge) and te=32/128 for the flat remainder."""
import functools
import gc
import json
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

    N, F = 1_000_000, 128
    g0 = random_power_law_graph(N, avg_degree=16.0, alpha=2.1, seed=0)
    E = g0.num_edges()
    x = jax.random.normal(jax.random.PRNGKey(0), (N, F), jnp.float32)

    def run(name, thr, budget, te):
        g = dgl.prepare_spmm(g0, te=te, weighted=False, flat=True,
                             dense_threshold=thr, dense_budget=budget,
                             bucket_rows=None, sddmm=False)
        rows = g.spmm_hybrid_arrays[-1]

        def f(c, gg, q):
            return dgl.gspmm(gg, "copy_lhs", "sum",
                             q + c * 0)[0, 0] * 1e-20 + c * 0
        dt = timed_loop(f, (g, x))
        print(json.dumps({
            "case": name, "ms": round(dt * 1e3, 2),
            "edges_per_s": round(E / dt),
            "dense_windows": int(rows.shape[0]) // 128,
        }), flush=True)
        del g
        gc.collect()
        return dt

    run("thr28k_flat_te64_rerun1", 28_000, 6 << 30, 64)
    run("thr28k_flat_te64_rerun2", 28_000, 6 << 30, 64)
    run("thr20k_flat_8G", 20_000, 8 << 30, 64)
    run("thr24k_flat_8G", 24_000, 8 << 30, 64)
    run("thr28k_flat_te32", 28_000, 6 << 30, 32)
    run("thr28k_flat_te128", 28_000, 6 << 30, 128)


if __name__ == "__main__":
    main()
