"""GGNN on a typed-edge reachability task (reference:
examples/pytorch/ggnn — gated graph nets on bAbI-style graph tasks; the
capability exercised is GatedGraphConv's per-etype messages + GRU steps,
nn/pytorch/conv/gatedgraphconv.py).

Task: random graphs with R edge types; node 0 is annotated; predict which
nodes are reachable from node 0 using ONLY type-0 edges — requires the
network to separate relation types and propagate n_steps hops.

Prints one JSON line: {"dataset", "test_acc", "epochs"}.
"""
import argparse
import json

import numpy as np


def make_task(num_graphs, n, etypes, steps, seed):
    import dgl_hack_tpu as dgl
    rng = np.random.default_rng(seed)
    graphs, labels, ets = [], [], []
    for _ in range(num_graphs):
        E = n * 3
        src = rng.integers(0, n, E).astype(np.int32)
        dst = rng.integers(0, n, E).astype(np.int32)
        et = rng.integers(0, etypes, E).astype(np.int32)
        g = dgl.graph((src, dst), num_nodes=n)
        # BFS over type-0 edges only, limited to `steps` hops
        reach = np.zeros(n, bool)
        reach[0] = True
        for _ in range(steps):
            m = reach[src] & (et == 0)
            nxt = reach.copy()
            nxt[dst[m]] = True
            if (nxt == reach).all():
                break
            reach = nxt
        graphs.append(g)
        ets.append(et)
        labels.append(reach)
    return graphs, ets, labels


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--graphs", type=int, default=60)
    p.add_argument("--nodes", type=int, default=24)
    p.add_argument("--etypes", type=int, default=3)
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--hidden", type=int, default=32)
    p.add_argument("--lr", type=float, default=5e-3)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    import optax
    from dgl_hack_tpu.nn import GatedGraphConv

    graphs, ets, labels = make_task(args.graphs, args.nodes, args.etypes,
                                    args.steps, args.seed)
    n_train = int(0.8 * args.graphs)

    class GGNN(nn.Module):
        @nn.compact
        def __call__(self, g, x, etypes):
            h = GatedGraphConv(args.hidden, n_steps=args.steps,
                               n_etypes=args.etypes)(g, x, etypes)
            return nn.Dense(1, kernel_init=nn.initializers.glorot_uniform()
                            )(h)[:, 0]

    model = GGNN()
    # annotation feature: one-hot "is start node"
    x0 = jnp.zeros((args.nodes, 2)).at[0, 0].set(1.0)
    params = model.init(jax.random.PRNGKey(args.seed), graphs[0], x0,
                        jnp.asarray(ets[0]))
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, g, et, y):
        def loss_fn(p):
            logit = model.apply(p, g, x0, et)
            return optax.sigmoid_binary_cross_entropy(
                logit, y.astype(jnp.float32)).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(args.epochs):
        for i in range(n_train):
            params, opt_state, loss = step(
                params, opt_state, graphs[i], jnp.asarray(ets[i]),
                jnp.asarray(labels[i]))

    @jax.jit
    def infer(params, g, et):
        return model.apply(params, g, x0, et)

    correct = total = 0
    for i in range(n_train, args.graphs):
        pred = np.asarray(infer(params, graphs[i],
                                jnp.asarray(ets[i]))) > 0
        correct += (pred == labels[i]).sum()
        total += args.nodes
    acc = correct / total
    print(json.dumps({"dataset": "reachability-synth",
                      "test_acc": float(acc), "epochs": args.epochs,
                      "loss": float(loss)}))


if __name__ == "__main__":
    main()
