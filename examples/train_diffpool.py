"""DiffPool graph classification (reference: examples/pytorch/diffpool —
dense hierarchical pooling: assignment matrix S from a GNN, coarsened
X' = S^T Z, A' = S^T A S, with link-prediction + entropy auxiliaries).

TPU shape: after one message-passing stage on the sparse batched graph,
graphs are densified to (B, maxN, ·) padded tensors — pooling becomes
pure batched MXU matmuls.
Usage: python examples/train_diffpool.py --epochs 25
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=25)
    p.add_argument("--graphs", type=int, default=120)
    p.add_argument("--hidden", type=int, default=32)
    p.add_argument("--clusters", type=int, default=6)
    p.add_argument("--batch_size", type=int, default=24)
    p.add_argument("--lr", type=float, default=5e-3)
    args = p.parse_args()

    import numpy as np
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import optax

    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.data import sbm_mixture
    from dgl_hack_tpu.nn import GraphConv, DenseSAGEConv

    ds = sbm_mixture(num_graphs=args.graphs, nodes_per_graph=24,
                     communities=(1, 4), p_in=0.6, p_out=0.05, seed=0)
    n_train = int(0.8 * args.graphs)
    maxN = 24

    def densify(bg, x):
        """(batched graph, node feats) -> dense (B, maxN, F+1), (B, maxN,
        maxN) adj, (B, maxN) mask.  Degree joins the features: the mean
        aggregation below is degree-normalized, so density information
        must enter through X (reference diffpool uses assign_dim and
        concat feats similarly)."""
        deg = np.asarray(bg.in_degrees(), np.float32)[:, None] / 10.0
        x = np.concatenate([np.asarray(x), deg], axis=1)
        B = len(bg.batch_num_nodes)
        F = x.shape[1]
        offs = np.concatenate([[0], np.cumsum(bg.batch_num_nodes)])
        s, d = bg.host_edges()
        Xd = np.zeros((B, maxN, F), np.float32)
        Ad = np.zeros((B, maxN, maxN), np.float32)
        M = np.zeros((B, maxN), np.float32)
        xh = np.asarray(x)
        gi = np.searchsorted(offs[1:], s, side="right")
        for b in range(B):
            n = bg.batch_num_nodes[b]
            Xd[b, :n] = xh[offs[b]:offs[b + 1]]
            M[b, :n] = 1
        Ad[gi, s - offs[gi], d - offs[gi]] = 1.0
        return jnp.asarray(Xd), jnp.asarray(Ad), jnp.asarray(M)

    batches = []
    for i in range(0, args.graphs - args.batch_size + 1, args.batch_size):
        bg = dgl.batch(ds.graphs[i:i + args.batch_size])
        x = jnp.asarray(np.concatenate(ds.features[i:i + args.batch_size]))
        y = jnp.asarray(ds.labels[i:i + args.batch_size])
        batches.append((densify(bg, x), y))

    class DiffPool(nn.Module):
        @nn.compact
        def __call__(self, X, A, M):
            # stage 1: dense SAGE on the original graphs
            Z = nn.relu(DenseSAGEConv(args.hidden)(A, X))
            S = nn.Dense(args.clusters)(Z)
            S = jax.nn.softmax(
                jnp.where(M[:, :, None] > 0, S, -1e9), axis=-1)
            Xp = jnp.einsum("bnk,bnf->bkf", S, Z)
            Ap = jnp.einsum("bnk,bnm,bml->bkl", S, A, S)
            # auxiliaries (reference: diffpool link-pred + entropy loss)
            lp = ((A - jnp.einsum("bnk,bmk->bnm", S, S)) ** 2).mean()
            ent = (-S * jnp.log(S + 1e-9)).sum(-1)
            ent = (ent * M).sum() / jnp.maximum(M.sum(), 1.0)
            # stage 2 on the coarse graph, then readout
            Z2 = nn.relu(DenseSAGEConv(args.hidden)(Ap, Xp))
            hg = Z2.mean(1)
            return nn.Dense(ds.num_classes)(hg), lp, ent

    model = DiffPool()
    (X0, A0, M0), _ = batches[0]
    params = model.init(jax.random.PRNGKey(0), X0, A0, M0)
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, X, A, M, y):
        def loss_fn(p):
            logits, lp, ent = model.apply(p, X, A, M)
            logp = jax.nn.log_softmax(logits)
            nll = -jnp.take_along_axis(logp, y[:, None], 1).mean()
            return nll + 0.01 * lp + 0.01 * ent
        loss, grads = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(grads, o)
        return optax.apply_updates(p, up), o, loss

    nb_train = n_train // args.batch_size
    t0 = time.perf_counter()
    for ep in range(args.epochs):
        for (Xb, Ab, Mb), yb in batches[:nb_train]:
            params, opt, loss = step(params, opt, Xb, Ab, Mb, yb)
    train_time = time.perf_counter() - t0

    correct = tot = 0
    for (Xb, Ab, Mb), yb in batches[nb_train:]:
        logits, _, _ = model.apply(params, Xb, Ab, Mb)
        correct += int((logits.argmax(-1) == yb).sum())
        tot += len(yb)
    acc = correct / max(tot, 1)
    print(json.dumps({"model": "DiffPool", "epochs": args.epochs,
                      "test_acc": round(acc, 4),
                      "train_time_s": round(train_time, 2)}))


if __name__ == "__main__":
    main()
