"""Hybrid remainder deep-dive: where do 20 ns/slot go?

Phases timed separately (all consumed through scatters or pallas so XLA
cannot dead-code-narrow them):
  * rem gather-only   — the per-chunk x[gidx] gathers alone
  * rem pallas-only   — kernel + overlap-add on pre-gathered messages
  * rem full          — the real thing, at several (te, bc, wc) plans
  * dense-only        — C @ x consumed via the output scatter
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

import dgl_hack_tpu as dgl
from dgl_hack_tpu.data import random_power_law_graph
from dgl_hack_tpu.ops.pallas import spmm_kernel as sk

N, F = 1_000_000, 128


def timed_pair(fn, args, k_lo=2, k_hi=6, repeats=3):
    @functools.partial(jax.jit, static_argnums=0)
    def loop(iters, *a):
        def body(i, c):
            return fn(c, *a)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    def measure(k):
        float(loop(k, *args))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(loop(k, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    return (measure(k_hi) - measure(k_lo)) / (k_hi - k_lo)


def main():
    g = random_power_law_graph(N, avg_degree=16.0, alpha=2.1, seed=0)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, F), jnp.float32)

    wins = sk.select_dense_windows(g.host("csc_indptr"), N, N, 128,
                                   threshold=66_000, budget_bytes=3 << 30)
    print("dense wins:", len(wins), flush=True)

    def run(name, fn, args):
        dt = timed_pair(fn, args)
        print(f"{name:36s} {dt*1e3:8.2f} ms", flush=True)

    # dense C with scatter-consumed output (cannot be narrowed)
    C, rows = sk._build_dense_C(g, wins, 128)

    def dense_scatter(c, xx, CC, rr):
        y = xx + c * 0
        d = sk._dense_matmul(CC, y, "f32x2")
        out = jnp.zeros((N, F), jnp.float32).at[rr].add(d)
        return out[0, 0] * 1e-30
    run("dense_f32x2_concat_scatter", dense_scatter, (x, C, rows))

    for te, bc, wc in ((256, 512, 512), (256, 1024, 2048),
                       (128, 1024, 2048), (128, 2048, 4096)):
        fwd, _rev = sk.build_hybrid_plan(g, wins, 128, te, bc, wc)
        arrs = fwd.device_arrays()
        slots = fwd.gather_idx.size
        print(f"plan te={te} bc={bc} wc={wc}: chunks={fwd.num_chunks} "
              f"slots={slots/1e6:.2f}M", flush=True)

        def rem_full(c, xx, *a):
            y = xx + c * 0
            return sk._run_direction(a, fwd.static_meta, y, None, 0,
                                     "f32x2")[0, 0] * 1e-30
        run(f"rem_full_te{te}_bc{bc}", rem_full, (x,) + tuple(arrs))

        if te == 256 and bc == 512:
            gidx = arrs[0]

            def gather_only(c, xx, gi):
                def body(acc, idx):
                    return acc + xx[idx + (acc * 0).astype(jnp.int32)
                                    ].sum() * 1e-30, None
                acc, _ = jax.lax.scan(body, c * 0.0, gi)
                return acc
            run("rem_gather_only", gather_only, (x, gidx))

            # pallas + overlap-add on fixed pre-gathered messages
            m_all = x[gidx]                      # (C, bc*te, F) fixed

            def pallas_only(c, mm, lr_s, win_s, row0_s, cover_s):
                meta = fwd.static_meta
                num_rows, tr, te_, wc_, C_ = meta
                out_len = wc_ * tr
                pad_rows = ((num_rows + tr - 1) // tr) * tr + out_len
                init = jnp.zeros((pad_rows, F), jnp.float32)

                def body(acc, xs):
                    mg, lr, win, row0, cover = xs
                    mg = mg + c * 0
                    out = sk._reduce_call(mg, lr, win, None, "none",
                                          tr=tr, te=te_, num_windows=wc_,
                                          num_blocks=win_s.shape[1],
                                          mode="f32x2")
                    rowmask = jnp.repeat(cover, tr,
                                         total_repeat_length=out_len)
                    out = jnp.where(rowmask[:, None], out, 0.0)
                    cur = jax.lax.dynamic_slice(acc, (row0, 0),
                                                (out_len, F))
                    return jax.lax.dynamic_update_slice(
                        acc, cur + out, (row0, 0)), None
                acc, _ = jax.lax.scan(
                    body, init, (mm, lr_s, win_s, row0_s, cover_s))
                return acc[0, 0] * 1e-30
            run("rem_pallas_only", pallas_only,
                (m_all, arrs[2], arrs[3], arrs[4], arrs[5]))


if __name__ == "__main__":
    main()
