"""Recurrent Relational Network on Sudoku (reference:
examples/pytorch/rrn — Palm et al.'s RRN solving Sudoku as iterated
relational message passing on the row/column/box constraint graph).

TPU-native shape: the constraint graph is static; each of T steps runs
an edge-UDF message MLP over ``apply_edges`` + copy_e/sum ``update_all``
and a GRU node update — all inside one jitted ``lax.scan``.  Offline
the dataset is generated 4x4 Sudoku (digit permutations + band/stack
shuffles of a base solution, cells masked at random) — the same task
shape at a size that trains in seconds.
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def sudoku4_batch(rng, batch, mask_lo=6, mask_hi=10):
    """(B, 16) puzzles (0 = blank) + (B, 16) solutions, 4x4 Sudoku."""
    import numpy as np
    base = np.array([[1, 2, 3, 4],
                     [3, 4, 1, 2],
                     [2, 1, 4, 3],
                     [4, 3, 2, 1]])
    sols = np.empty((batch, 4, 4), np.int32)
    for b in range(batch):
        g = base.copy()
        perm = rng.permutation(4) + 1
        g = perm[g - 1]
        # swap rows within each band, columns within each stack
        for band in (0, 2):
            if rng.random() < 0.5:
                g[[band, band + 1]] = g[[band + 1, band]]
            if rng.random() < 0.5:
                g[:, [band, band + 1]] = g[:, [band + 1, band]]
        if rng.random() < 0.5:
            g = g.T
        sols[b] = g
    sols = sols.reshape(batch, 16)
    n_mask = rng.integers(mask_lo, mask_hi + 1, batch)
    puzzles = sols.copy()
    for b in range(batch):
        puzzles[b, rng.choice(16, n_mask[b], replace=False)] = 0
    return puzzles, sols


def constraint_graph(B):
    """Batched 4x4 Sudoku constraint graph (row/col/box peers)."""
    import numpy as np
    import dgl_hack_tpu as dgl
    cells = np.arange(16).reshape(4, 4)
    pairs = set()
    for i in range(4):
        for j in range(4):
            u = cells[i, j]
            peers = set(cells[i, :]) | set(cells[:, j]) | \
                set(cells[2 * (i // 2):2 * (i // 2) + 2,
                          2 * (j // 2):2 * (j // 2) + 2].ravel())
            for v in peers - {u}:
                pairs.add((u, v))
    src1 = np.array([p[0] for p in sorted(pairs)])
    dst1 = np.array([p[1] for p in sorted(pairs)])
    src = np.concatenate([src1 + 16 * b for b in range(B)]).astype(np.int32)
    dst = np.concatenate([dst1 + 16 * b for b in range(B)]).astype(np.int32)
    return dgl.graph((src, dst), num_nodes=16 * B)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--lr", type=float, default=2e-3)
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax
    from dgl_hack_tpu import fn

    B, Dm, T = args.batch, args.hidden, args.steps
    g = constraint_graph(B)
    rng = np.random.default_rng(0)

    def dense(shape):
        return jnp.asarray(
            (rng.normal(size=shape) * (2.0 / sum(shape[-2:])) ** 0.5
             ).astype(np.float32))

    params = {
        "emb": dense((5, Dm)),          # digits 0..4 (0 = blank)
        "pos": dense((16, Dm)),
        "m1": dense((2 * Dm, Dm)), "m2": dense((Dm, Dm)),
        # GRU
        "wz": dense((2 * Dm, Dm)), "wr": dense((2 * Dm, Dm)),
        "wh": dense((2 * Dm, Dm)),
        "out": dense((Dm, 4)),
    }

    pos = jnp.tile(jnp.arange(16), B)

    def rrn_forward(prm, puzzles):
        x0 = prm["emb"][puzzles.reshape(-1)] + prm["pos"][pos]

        def step(h, _):
            # edge message MLP over concatenated endpoints (the RRN
            # message function) via the edge-UDF path
            g.ndata["h"] = h
            g.apply_edges(lambda e: {"m": jax.nn.relu(
                jnp.concatenate([e.src["h"], e.dst["h"]], -1)
                @ prm["m1"]) @ prm["m2"]})
            g.update_all(fn.copy_e("m", "m"), fn.sum("m", "agg"))
            agg = g.ndata.pop("agg")
            # GRU(h, [agg || x0])
            inp = jnp.concatenate([agg + x0, h], -1)
            z = jax.nn.sigmoid(inp @ prm["wz"])
            r = jax.nn.sigmoid(inp @ prm["wr"])
            cand = jnp.tanh(jnp.concatenate([agg + x0, r * h], -1)
                            @ prm["wh"])
            h = (1 - z) * h + z * cand
            return h, h @ prm["out"]

        _, logits_t = jax.lax.scan(step, x0, None, length=T)
        return logits_t                      # (T, B*16, 4)

    def loss_fn(prm, puzzles, sols):
        logits_t = rrn_forward(prm, puzzles)
        tgt = (sols.reshape(-1) - 1).astype(jnp.int32)
        logp = jax.nn.log_softmax(logits_t)
        # per-step loss like the paper (forces fast convergence)
        nll = -jnp.take_along_axis(
            logp, jnp.broadcast_to(tgt[None, :, None],
                                   (T, tgt.shape[0], 1)), -1)
        acc = (logits_t[-1].argmax(-1) == tgt).mean()
        return nll.mean(), acc

    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def train_step(prm, opt, puzzles, sols):
        (loss, acc), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(prm, puzzles, sols)
        up, opt = tx.update(grads, opt, prm)
        return optax.apply_updates(prm, up), opt, loss, acc

    t0 = time.perf_counter()
    acc = 0.0
    for ep in range(args.epochs):
        puz, sol = sudoku4_batch(rng, B)
        params, opt, loss, acc = train_step(params, opt, jnp.asarray(puz),
                                            jnp.asarray(sol))
        if (ep + 1) % 100 == 0:
            print(f"epoch {ep+1:4d} loss {float(loss):.4f} "
                  f"cell_acc {float(acc):.3f}", flush=True)
    # held-out eval
    puz, sol = sudoku4_batch(np.random.default_rng(123), B)
    _, test_acc = loss_fn(params, jnp.asarray(puz), jnp.asarray(sol))
    print(json.dumps({"dataset": "sudoku4-synth", "model": "rrn",
                      "cell_acc": round(float(test_acc), 4),
                      "train_time_s": round(time.perf_counter() - t0, 2)}))


if __name__ == "__main__":
    main()
