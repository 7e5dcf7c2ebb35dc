"""GraphWriter-lite: knowledge-graph -> text generation (reference:
examples/pytorch/graphwriter/ — a graph-transformer encoder over an
entity/relation graph feeding an attentional decoder, trained on AGENDA).

The reference's full pipeline needs the AGENDA corpus, BPE vocab and
beam search; this zero-egress mirror keeps the MODEL shape — a
multi-head graph-transformer encoder where attention logits are
``u_dot_v`` gsddmm + per-relation bias, normalised with edge_softmax and
aggregated with ``u_mul_e`` gspmm (exactly graphwriter's encoder math,
modules.py GraphTrans) — and a GRU decoder with cross-attention over
entity states.  Task: verbalise synthetic KGs (each triple (h, r, t)
must be emitted as [type_h, REL_r, type_t] in canonical order), so the
decoder can only succeed by READING the graph.  Metric: teacher-forced
next-token accuracy on held-out graphs.
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")

NE = 8          # entities per KG (tree-shaped: NE-1 triples)
NT = 20         # entity type vocab
NR = 6          # relation vocab


def make_kgs(n, seed=0):
    """n synthetic KGs: random tree over NE entities, random types/rels.
    Target = BOS + [type_h, REL_r, type_t] per triple (edge order) + EOS.
    Token space: 0..NT-1 types, NT..NT+NR-1 relations, BOS=NT+NR,
    EOS=NT+NR+1."""
    import numpy as np
    rng = np.random.default_rng(seed)
    BOS, EOS = NT + NR, NT + NR + 1
    srcs, dsts, rels, types, targets = [], [], [], [], []
    for i in range(n):
        parent = np.array([rng.integers(0, max(k, 1)) for k in range(NE)])
        src = parent[1:].astype(np.int32)          # triple heads
        dst = np.arange(1, NE, dtype=np.int32)     # tails
        rel = rng.integers(0, NR, NE - 1).astype(np.int32)
        typ = rng.integers(0, NT, NE).astype(np.int32)
        seq = [BOS]
        for e in range(NE - 1):
            seq += [typ[src[e]], NT + rel[e], typ[dst[e]]]
        seq.append(EOS)
        srcs.append(src); dsts.append(dst); rels.append(rel)
        types.append(typ); targets.append(seq)
    return (np.stack(srcs), np.stack(dsts), np.stack(rels),
            np.stack(types), np.asarray(targets, np.int32))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--train", type=int, default=512)
    p.add_argument("--test", type=int, default=128)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.ops.edge_softmax import edge_softmax
    from dgl_hack_tpu.ops.sddmm import gsddmm
    from dgl_hack_tpu.ops.spmm import gspmm

    D, H = args.dim, args.heads
    Dh = D // H
    VOCAB = NT + NR + 2

    def batch_graph(src, dst):
        """(B, NE-1) edges -> one batched bidirected graph + self loops."""
        B = src.shape[0]
        off = (np.arange(B, dtype=np.int32) * NE)[:, None]
        s = (src + off).reshape(-1)
        d = (dst + off).reshape(-1)
        loops = np.arange(B * NE, dtype=np.int32)
        return dgl.graph((np.concatenate([s, d, loops]),
                          np.concatenate([d, s, loops])),
                         num_nodes=B * NE)

    str_, dtr, rtr, ttr, ytr = make_kgs(args.train, seed=args.seed)
    ste, dte, rte, tte, yte = make_kgs(args.test, seed=args.seed + 1)
    g_tr = batch_graph(str_, dtr)
    g_te = batch_graph(ste, dte)

    def edge_rels(rel):
        """Per-edge relation ids in USER order: fwd rels, reversed rels
        (own ids), self-loop marker."""
        B = rel.shape[0]
        fwd = rel.reshape(-1)
        return np.concatenate([fwd, fwd + NR,
                               np.full(B * NE, 2 * NR, np.int32)])

    rel_tr = jnp.asarray(edge_rels(rtr))
    rel_te = jnp.asarray(edge_rels(rte))

    def init_params(key):
        ks = jax.random.split(key, 12)
        gl = jax.nn.initializers.glorot_uniform()
        prm = {
            "emb_type": jax.random.normal(ks[0], (NT, D)) * 0.1,
            # entity position ids (AGENDA entities are ordered too):
            # without them the decoder cannot follow the canonical
            # triple order on UNSEEN graphs and memorises instead
            "emb_pos": jax.random.normal(
                jax.random.fold_in(ks[0], 7), (NE, D)) * 0.1,
            "emb_tok": jax.random.normal(ks[1], (VOCAB, D)) * 0.1,
            # decoder timestep embedding: step t belongs to triple
            # (t-1)//3, which names entity position t//3+1 — lets the
            # cross-attention key on position instead of recurrent count
            "emb_step": jax.random.normal(
                jax.random.fold_in(ks[1], 3), (3 * (NE - 1) + 2, D)) * 0.1,
            "rel_bias": jnp.zeros((2 * NR + 1, H)),
            "gru": {
                "Wz": gl(ks[8], (2 * D, D)), "Wr": gl(ks[9], (2 * D, D)),
                "Wh": gl(ks[10], (2 * D, D)),
            },
            "out": gl(ks[11], (2 * D, VOCAB)),
        }
        for li in range(2):
            prm[f"enc{li}"] = {
                "Wq": gl(ks[2 + 3 * li], (D, D)),
                "Wk": gl(ks[3 + 3 * li], (D, D)),
                "Wv": gl(ks[4 + 3 * li], (D, D)),
                "Wo": gl(jax.random.fold_in(ks[2], li), (D, D)),
                "Wf": gl(jax.random.fold_in(ks[3], li), (D, 2 * D)),
                "Wf2": gl(jax.random.fold_in(ks[4], li), (2 * D, D)),
            }
        return prm

    def encoder_layer(p, g, rel, h):
        q = (h @ p["Wq"]).reshape(-1, H, Dh)
        k = (h @ p["Wk"]).reshape(-1, H, Dh)
        v = (h @ p["Wv"]).reshape(-1, H, Dh)
        return_bias = None
        logits = gsddmm(g, "dot", k, q, "u", "v") / np.sqrt(Dh)  # (E,H,1)
        return logits, v

    def encode(prm, g, rel, types):
        B = types.shape[0] // NE
        h = prm["emb_type"][types] + jnp.tile(prm["emb_pos"], (B, 1))
        for li in range(2):
            p = prm[f"enc{li}"]
            logits, v = encoder_layer(p, g, rel, h)
            logits = logits + prm["rel_bias"][rel][:, :, None]
            a = edge_softmax(g, logits)                          # (E,H,1)
            agg = gspmm(g, "mul", "sum", v, a, "u", "e")         # (N,H,Dh)
            h = h + agg.reshape(-1, D) @ p["Wo"]
            h = h + jax.nn.relu(h @ p["Wf"]) @ p["Wf2"]
        return h

    def decode(prm, enc_states, tokens):
        """Teacher-forced GRU with dense cross-attention over this
        sample's NE entity states.  enc_states (B, NE, D); tokens
        (B, L).  Returns logits (B, L-1, VOCAB)."""
        B, L = tokens.shape
        emb = prm["emb_tok"][tokens] + prm["emb_step"][None, :L]

        def gru_cell(state, x):
            cat = jnp.concatenate([state, x], axis=-1)
            z = jax.nn.sigmoid(cat @ prm["gru"]["Wz"])
            r = jax.nn.sigmoid(cat @ prm["gru"]["Wr"])
            cat2 = jnp.concatenate([r * state, x], axis=-1)
            hh = jnp.tanh(cat2 @ prm["gru"]["Wh"])
            return (1 - z) * state + z * hh

        def step(state, x):
            state = gru_cell(state, x)
            att = jnp.einsum("bd,bnd->bn", state, enc_states)
            att = jax.nn.softmax(att / np.sqrt(D), axis=-1)
            ctx = jnp.einsum("bn,bnd->bd", att, enc_states)
            out = jnp.concatenate([state, ctx], axis=-1) @ prm["out"]
            return state, out

        init = jnp.zeros((B, D))
        _, outs = jax.lax.scan(step, init, jnp.swapaxes(emb[:, :-1], 0, 1))
        return jnp.swapaxes(outs, 0, 1)                          # (B,L-1,V)

    def loss_fn(prm, g, rel, types, tokens):
        enc = encode(prm, g, rel, jnp.asarray(types.reshape(-1)))
        enc = enc.reshape(-1, NE, D)
        logits = decode(prm, enc, jnp.asarray(tokens))
        logp = jax.nn.log_softmax(logits)
        tgt = tokens[:, 1:]
        nll = -jnp.take_along_axis(
            logp, jnp.asarray(tgt)[..., None], axis=-1)[..., 0]
        acc = (logits.argmax(-1) == tgt).mean()
        return nll.mean(), acc

    prm = init_params(jax.random.PRNGKey(args.seed))
    tx = optax.adam(args.lr)
    opt = tx.init(prm)

    @jax.jit
    def train_step(prm, opt, rel, types, tokens):
        (l, acc), grads = jax.value_and_grad(
            lambda p: loss_fn(p, g_tr, rel, types, tokens),
            has_aux=True)(prm)
        updates, opt = tx.update(grads, opt, prm)
        return optax.apply_updates(prm, updates), opt, l, acc

    t0 = time.time()
    l = acc = None
    for ep in range(args.epochs):
        prm, opt, l, acc = train_step(prm, opt, rel_tr, ttr, ytr)
    test_l, test_acc = jax.jit(
        lambda p: loss_fn(p, g_te, rel_te, tte, yte))(prm)
    print(json.dumps({
        "example": "graphwriter", "epochs": args.epochs,
        "train_loss": round(float(l), 4),
        "train_token_acc": round(float(acc), 4),
        "test_token_acc": round(float(test_acc), 4),
        "train_s": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
