"""HAN — heterogeneous attention network over metapaths
(reference: examples/pytorch/han): per-metapath GAT over
metapath_reachable_graph + semantic attention across metapaths.

Synthetic ACM-style world: papers belong to latent areas; authors and
fields connect papers of the same area, so the PAP/PFP metapath graphs
carry the label signal.
Usage: python examples/train_han.py --epochs 40
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--papers", type=int, default=300)
    p.add_argument("--hidden", type=int, default=16)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--classes", type=int, default=3)
    p.add_argument("--lr", type=float, default=5e-3)
    args = p.parse_args()

    import numpy as np
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import optax

    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.nn import GATConv

    rng = np.random.default_rng(0)
    NP, NA, NF = args.papers, args.papers // 3, 3 * args.classes
    area = rng.integers(0, args.classes, NP)

    def affil(n_other, per, noise=0.1):
        # each 'other' node links papers, mostly within one area
        own = rng.integers(0, args.classes, n_other)
        src, dst = [], []
        for o in range(n_other):
            pool = np.nonzero(area == own[o])[0]
            k = min(per, len(pool))
            papers = rng.choice(pool, size=k, replace=False)
            flip = rng.random(k) < noise
            papers[flip] = rng.integers(0, NP, int(flip.sum()))
            src.extend([o] * k)
            dst.extend(papers.tolist())
        return np.asarray(src, np.int32), np.asarray(dst, np.int32)

    asrc, adst = affil(NA, 9)
    fsrc, fdst = affil(NF, 60, noise=0.25)
    hg = dgl.heterograph({
        ("author", "writes", "paper"): (asrc, adst),
        ("paper", "written-by", "author"): (adst, asrc),
        ("field", "has", "paper"): (fsrc, fdst),
        ("paper", "in", "field"): (fdst, fsrc),
    }, num_nodes_dict={"paper": NP, "author": NA, "field": NF})

    metapaths = [["written-by", "writes"], ["in", "has"]]
    mp_graphs = [dgl.add_self_loop(
        dgl.metapath_reachable_graph(hg, mp)) for mp in metapaths]

    feats = jnp.asarray(
        (np.eye(args.classes)[area]
         + 0.5 * rng.normal(size=(NP, args.classes))).astype(np.float32))
    labels = jnp.asarray(area)
    train_mask = rng.random(NP) < 0.4

    class HANLayer(nn.Module):
        out_feats: int
        num_heads: int

        @nn.compact
        def __call__(self, graphs, h):
            # per-metapath GAT, then semantic attention (reference:
            # han/model.py SemanticAttention)
            zs = []
            for g in graphs:
                z = GATConv(self.out_feats, self.num_heads)(g, h)
                zs.append(z.reshape(h.shape[0], -1))
            z = jnp.stack(zs, axis=1)                 # (N, M, H*D)
            w = nn.Dense(1)(jnp.tanh(nn.Dense(64)(z)))  # (N, M, 1)
            beta = jax.nn.softmax(w.mean(0), axis=0)    # (M, 1)
            return (z * beta[None]).sum(1)

    class HAN(nn.Module):
        @nn.compact
        def __call__(self, graphs, h):
            h = HANLayer(args.hidden, args.heads)(graphs, h)
            return nn.Dense(args.classes)(nn.elu(h))

    model = HAN()
    params = model.init(jax.random.PRNGKey(0), mp_graphs, feats)
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, graphs, x, y, m):
        def loss_fn(p):
            logp = jax.nn.log_softmax(model.apply(p, graphs, x))
            nll = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
            return jnp.where(m, nll, 0.0).sum() / m.sum()
        loss, grads = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(grads, o)
        return optax.apply_updates(p, up), o, loss

    mk = jnp.asarray(train_mask)
    t0 = time.perf_counter()
    for ep in range(args.epochs):
        params, opt, loss = step(params, opt, mp_graphs, feats, labels, mk)
    train_time = time.perf_counter() - t0
    pred = model.apply(params, mp_graphs, feats).argmax(-1)
    acc = float((np.asarray(pred) == np.asarray(labels))[~train_mask].mean())
    print(json.dumps({"model": "HAN", "epochs": args.epochs,
                      "test_acc": round(acc, 4),
                      "train_time_s": round(train_time, 2)}))


if __name__ == "__main__":
    main()
