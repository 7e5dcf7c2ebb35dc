"""Minibatch GraphSAGE with neighbor sampling (reference:
examples/pytorch/graphsage/train_sampling.py)."""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="reddit-synth")
    p.add_argument("--reddit-scale", type=float, default=0.05)
    p.add_argument("--num-epochs", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--fan-out", default="10,25")
    p.add_argument("--num-hidden", type=int, default=16)
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--dropout", type=float, default=0.5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from dgl_hack_tpu import data
    from dgl_hack_tpu.models import GraphSAGE
    from dgl_hack_tpu.models.training import masked_cross_entropy
    from dgl_hack_tpu.sampling import MultiLayerNeighborSampler, NodeDataLoader

    ds = data.RedditDataset(scale=args.reddit_scale)
    g = ds.graph
    feats = jnp.asarray(ds.features)
    labels = jnp.asarray(ds.labels)
    fanouts = [int(f) for f in args.fan_out.split(",")]

    model = GraphSAGE(hidden_feats=args.num_hidden,
                      out_feats=ds.num_classes,
                      num_layers=len(fanouts), dropout=args.dropout)
    sampler = MultiLayerNeighborSampler(fanouts, replace=True, seed=0)
    train_nid = np.nonzero(ds.train_mask)[0]
    loader = NodeDataLoader(g, train_nid, sampler, args.batch_size,
                            drop_last=True, seed=0)

    tx = optax.adam(args.lr)
    params = None
    opt_state = None

    @jax.jit
    def step(params, opt_state, blocks, x, y, key):
        def loss_fn(p):
            logits = model.apply(p, blocks, x, deterministic=False,
                                 rngs={"dropout": key})
            return masked_cross_entropy(logits, y, jnp.ones(y.shape[0]))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(0)
    for epoch in range(args.num_epochs):
        t0 = time.perf_counter()
        nb = 0
        for input_nodes, seeds, blocks in loader:
            x = feats[jnp.asarray(input_nodes)]
            y = labels[jnp.asarray(seeds)]
            if params is None:
                params = model.init({"params": key, "dropout": key},
                                    blocks, x)
                opt_state = tx.init(params)
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, blocks, x, y,
                                           sub)
            nb += 1
        jax.block_until_ready(loss)
        dt = time.perf_counter() - t0
        print(f"epoch {epoch}: {nb} batches, {dt:.2f}s, "
              f"loss {float(loss):.4f}")

    # evaluate on test seeds (sampled inference like the reference)
    test_nid = np.nonzero(ds.test_mask)[0][:8192]
    eval_loader = NodeDataLoader(g, test_nid, sampler, args.batch_size,
                                 shuffle=False, seed=1)
    correct = total = 0
    for input_nodes, seeds, blocks in eval_loader:
        x = feats[jnp.asarray(input_nodes)]
        logits = model.apply(params, blocks, x)
        pred = np.asarray(logits.argmax(-1))
        take = min(len(seeds), len(test_nid) - total)
        correct += (pred[:take] == np.asarray(ds.labels)[seeds[:take]]).sum()
        total += take
    acc = correct / max(total, 1)
    print(json.dumps({"dataset": ds.name, "test_acc": float(acc)}))


if __name__ == "__main__":
    main()
