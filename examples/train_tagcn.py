"""TAGCN node classification (reference: examples/pytorch/tagcn/train.py —
2-layer TAGConv on citation graphs).

Zero-egress: --dataset synth uses the deterministic planted-partition
stand-in; with raw planetoid files present, --dataset cora runs real data.
Prints one JSON line: {"dataset", "test_acc", "train_time_s"}.
"""
import argparse
import json
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="synth",
                   choices=["synth", "cora", "citeseer", "pubmed"])
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--hidden", type=int, default=16)
    p.add_argument("--k", type=int, default=2)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--dropout", type=float, default=0.5)
    p.add_argument("--weight-decay", type=float, default=5e-4)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    import numpy as np
    import optax
    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.nn import TAGConv
    from dgl_hack_tpu.data import (CoraGraphDataset, CiteseerGraphDataset,
                                   PubmedGraphDataset, planted_partition)

    if args.dataset == "synth":
        ds = planted_partition(2708, 7, 256, avg_degree=4.0, homophily=0.81,
                               feat_noise=2.0, seed=args.seed,
                               train_per_class=20, num_val=500,
                               num_test=1000)
    else:
        ds = {"cora": CoraGraphDataset, "citeseer": CiteseerGraphDataset,
              "pubmed": PubmedGraphDataset}[args.dataset]()
    g = ds.graph
    x = jnp.asarray(ds.features)
    y = jnp.asarray(ds.labels.astype(np.int32))

    class TAGCN(nn.Module):
        @nn.compact
        def __call__(self, g_, h, deterministic=True):
            h = TAGConv(args.hidden, k=args.k, activation=nn.relu)(g_, h)
            h = nn.Dropout(args.dropout, deterministic=deterministic)(h)
            return TAGConv(ds.num_classes, k=args.k)(g_, h)

    model = TAGCN()
    params = model.init(jax.random.PRNGKey(args.seed), g, x)
    tx = optax.adamw(args.lr, weight_decay=args.weight_decay)
    opt_state = tx.init(params)
    train_mask = jnp.asarray(ds.train_mask)

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            logits = model.apply(p, g, x, deterministic=False,
                                 rngs={"dropout": key})
            logp = jax.nn.log_softmax(logits)
            nll = -jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0]
            m = train_mask.astype(logits.dtype)
            return (nll * m).sum() / m.sum()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(args.seed)
    t0 = time.perf_counter()
    for e in range(args.epochs):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    logits = model.apply(params, g, x)
    pred = np.asarray(logits.argmax(-1))
    acc = float((pred[ds.test_mask] == np.asarray(ds.labels)[ds.test_mask])
                .mean())
    print(json.dumps({"dataset": ds.name, "test_acc": acc,
                      "train_time_s": dt, "epochs": args.epochs}))


if __name__ == "__main__":
    main()
