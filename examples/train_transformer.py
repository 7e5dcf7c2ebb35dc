"""Transformer as graph message passing (reference:
examples/pytorch/transformer/ — attention expressed with DGL graphs and
trained on synthetic copy/sort tasks, translation_train.py).

TPU-native shape: one static batched graph carries all three attention
patterns — encoder self-attention (complete), decoder self-attention
(causal), cross-attention (complete bipartite) — and every attention is
the library's fused edge pipeline: multi-head `u_dot_v` gsddmm ->
edge_softmax -> `u_mul_e` gspmm.  Trains an encoder-decoder on the
`copy` task (the reference's synthetic dataset) with teacher forcing.
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def build_graphs(B, L):
    """Batched attention graphs over B sequences of length L.
    Node spaces: encoder nodes (B*L) and decoder nodes (B*L)."""
    import numpy as np
    import dgl_hack_tpu as dgl

    def batched(src1, dst1, n1):
        src = np.concatenate([src1 + b * n1 for b in range(B)])
        dst = np.concatenate([dst1 + b * n1 for b in range(B)])
        return src.astype(np.int32), dst.astype(np.int32)

    ar = np.arange(L)
    full = np.repeat(ar, L), np.tile(ar, L)                  # complete
    causal_pairs = [(i, j) for j in range(L) for i in range(j + 1)]
    csrc = np.array([p[0] for p in causal_pairs])
    cdst = np.array([p[1] for p in causal_pairs])

    es, ed = batched(*full, L)
    g_enc = dgl.graph((es, ed), num_nodes=B * L)
    ss, sd = batched(csrc, cdst, L)
    g_dec = dgl.graph((ss, sd), num_nodes=B * L)
    # cross: decoder position attends to every encoder position
    xs, xd = batched(*full, L)
    g_x = dgl.block((xs, xd), num_src=B * L, num_dst=B * L)
    return g_enc, g_dec, g_x


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--seq-len", type=int, default=10)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--vocab", type=int, default=16)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--lr", type=float, default=3e-3)
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.ops.edge_softmax import edge_softmax

    B, L, V, Dm, H = (args.batch, args.seq_len, args.vocab, args.dim,
                      args.heads)
    Dh = Dm // H
    g_enc, g_dec, g_x = build_graphs(B, L)

    rng = np.random.default_rng(0)

    def dense(key, shape, scale=None):
        scale = scale or (2.0 / sum(shape[-2:])) ** 0.5
        return jnp.asarray(rng.normal(0, scale, shape).astype(np.float32))

    def attn_params(key):
        return {k: dense(None, (Dm, Dm)) for k in ("q", "k", "v", "o")}

    params = {
        "emb": dense(None, (V + 1, Dm), 0.1),     # +1: BOS token
        "pos": dense(None, (L, Dm), 0.1),
        "enc0": attn_params(None), "enc1": attn_params(None),
        "dec0": attn_params(None), "dec1": attn_params(None),
        "x0": attn_params(None), "x1": attn_params(None),
        "f1": dense(None, (Dm, 2 * Dm)), "f2": dense(None, (2 * Dm, Dm)),
        "out": dense(None, (Dm, V)),
    }

    def graph_attention(g, pa, hq, hkv):
        """Multi-head attention over graph g: q from dst nodes, k/v from
        src nodes — the fused u_dot_v/edge_softmax/u_mul_e pipeline."""
        q = (hq @ pa["q"]).reshape(-1, H, Dh)
        k = (hkv @ pa["k"]).reshape(-1, H, Dh)
        v = (hkv @ pa["v"]).reshape(-1, H, Dh)
        logits = dgl.gsddmm(g, "dot", k, q, "u", "v") / Dh ** 0.5
        a = edge_softmax(g, logits)                      # (E, H, 1)
        out = dgl.gspmm(g, "mul", "sum", v, a, "u", "e")
        return out.reshape(-1, Dm) @ pa["o"]

    def ln(h):
        mu = h.mean(-1, keepdims=True)
        s = ((h - mu) ** 2).mean(-1, keepdims=True)
        return (h - mu) * jax.lax.rsqrt(s + 1e-6)

    def forward(prm, src_tok, tgt_in):
        pos = jnp.tile(prm["pos"], (B, 1))
        he = ln(prm["emb"][src_tok.reshape(-1)] + pos)
        for lyr in ("enc0", "enc1"):
            he = ln(he + graph_attention(g_enc, prm[lyr], he, he))
        hd = ln(prm["emb"][tgt_in.reshape(-1)] + pos)
        for slyr, xlyr in (("dec0", "x0"), ("dec1", "x1")):
            hd = ln(hd + graph_attention(g_dec, prm[slyr], hd, hd))
            hd = ln(hd + graph_attention(g_x, prm[xlyr], hd, he))
        hd = ln(hd + jax.nn.relu(hd @ prm["f1"]) @ prm["f2"])
        return (hd @ prm["out"]).reshape(B, L, V)

    def loss_fn(prm, src_tok, tgt):
        bos = jnp.full((B, 1), V, jnp.int32)
        tgt_in = jnp.concatenate([bos, tgt[:, :-1]], axis=1)
        logits = forward(prm, src_tok, tgt_in)
        logp = jax.nn.log_softmax(logits)
        nll = -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
        return nll.mean(), logits

    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(prm, opt, src_tok, tgt):
        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(prm, src_tok, tgt)
        up, opt = tx.update(grads, opt, prm)
        acc = (logits.argmax(-1) == tgt).mean()
        return optax.apply_updates(prm, up), opt, loss, acc

    t0 = time.perf_counter()
    acc = 0.0
    for ep in range(args.epochs):
        seq = rng.integers(0, V, (B, L)).astype(np.int32)
        src_tok = jnp.asarray(seq)
        tgt = src_tok                     # copy task (reference dataset)
        params, opt, loss, acc = step(params, opt, src_tok, tgt)
        if (ep + 1) % 50 == 0:
            print(f"epoch {ep+1:4d} loss {float(loss):.4f} "
                  f"tok_acc {float(acc):.3f}", flush=True)
    print(json.dumps({"dataset": "copy", "model": "graph-transformer",
                      "token_acc": round(float(acc), 4),
                      "train_time_s": round(time.perf_counter() - t0, 2)}))


if __name__ == "__main__":
    main()
