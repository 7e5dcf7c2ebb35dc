"""Cluster-GCN: partition-based minibatch full-neighborhood training
(reference: examples/pytorch/cluster_gcn — METIS clusters as batches).

TPU shape: metis_partition (Fennel) splits the graph; each step trains
on one cluster's induced subgraph.  Static shapes per cluster come from
the partitioner's balanced parts; one executable per distinct
(nodes, edges) bucket.
Usage: python examples/train_cluster_gcn.py --epochs 15 --parts 8
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--parts", type=int, default=8)
    p.add_argument("--hidden", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-2)
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.data import synthetic_cora
    from dgl_hack_tpu.models import GCN
    from dgl_hack_tpu.partition import metis_partition

    ds = synthetic_cora(seed=0)
    g, X = ds.graph, np.asarray(ds.features)
    y = np.asarray(ds.labels)
    train_mask = np.asarray(ds.train_mask)

    parts = metis_partition(g, args.parts, extra_cached_hops=0)
    batches = []
    for part in parts:
        nid = np.asarray(part.node_map)
        sub = dgl.add_self_loop(part.graph)
        batches.append((sub, jnp.asarray(X[nid]), jnp.asarray(y[nid]),
                        jnp.asarray(train_mask[nid])))

    model = GCN(hidden_feats=args.hidden, out_feats=ds.num_classes)
    params = model.init(jax.random.PRNGKey(0), batches[0][0], batches[0][1])
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, sub, x, yy, m):
        def loss_fn(p):
            logp = jax.nn.log_softmax(model.apply(p, sub, x))
            nll = -jnp.take_along_axis(logp, yy[:, None], axis=1)[:, 0]
            return jnp.where(m, nll, 0.0).sum() / jnp.maximum(m.sum(), 1)
        loss, grads = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(grads, o)
        return optax.apply_updates(p, up), o, loss

    t0 = time.perf_counter()
    for ep in range(args.epochs):
        for b in batches:
            params, opt, loss = step(params, opt, *b)
    train_time = time.perf_counter() - t0

    # full-graph eval
    logits = model.apply(params, dgl.add_self_loop(g), jnp.asarray(X))
    pred = np.asarray(logits.argmax(-1))
    test_mask = np.asarray(ds.test_mask)
    acc = float((pred == y)[test_mask].mean())
    print(json.dumps({"model": "ClusterGCN", "parts": args.parts,
                      "epochs": args.epochs, "test_acc": round(acc, 4),
                      "train_time_s": round(train_time, 2)}))


if __name__ == "__main__":
    main()
