"""LGNN community detection with line-graph convolutions
(reference: examples/pytorch/line_graph — alternating message passing on
the graph and its line graph, coupled by incidence operators, trained
with a permutation-invariant community loss on SBM graphs).

Usage: python examples/train_lgnn.py --epochs 40
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--graphs", type=int, default=40)
    p.add_argument("--nodes", type=int, default=24)
    p.add_argument("--hidden", type=int, default=16)
    p.add_argument("--layers", type=int, default=3)
    p.add_argument("--lr", type=float, default=5e-3)
    args = p.parse_args()

    import numpy as np
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import optax

    import dgl_hack_tpu as dgl

    rng = np.random.default_rng(0)
    K = 2

    def make_sbm():
        n = args.nodes
        comm = rng.permutation(np.repeat(np.arange(K), n // K))
        prob = np.where(comm[:, None] == comm[None, :], 0.6, 0.08)
        a = (rng.random((n, n)) < prob) & ~np.eye(n, dtype=bool)
        a = np.triu(a) | np.triu(a).T
        s, d = np.nonzero(a)
        g = dgl.graph((s.astype(np.int32), d.astype(np.int32)),
                      num_nodes=n)
        lg = dgl.line_graph(g, backtracking=False)
        # incidence transfer (node <-> edge spaces): Pm[v, e] = 1 iff v
        # is an endpoint of e (reference: line_graph/gnn.py Pm/Pd)
        E = g.num_edges()
        pm = np.zeros((n, E), np.float32)
        pm[s, np.arange(E)] = 1
        pm[d, np.arange(E)] = 1
        deg = np.asarray(g.in_degrees()).astype(np.float32)
        return (g, lg, jnp.asarray(pm), jnp.asarray(deg[:, None]),
                jnp.asarray(comm))

    data = [make_sbm() for _ in range(args.graphs)]
    n_train = int(0.8 * args.graphs)

    class LGNNLayer(nn.Module):
        out: int

        @nn.compact
        def __call__(self, g, lg, x, y, pm):
            # operator family {I, A, A^2, Pm y} per the paper; LayerNorm
            # + half-linear/half-relu channels stabilize training
            ax = dgl.gspmm(g, "copy_lhs", "sum", x)
            a2x = dgl.gspmm(g, "copy_lhs", "sum", ax)
            xn = nn.Dense(self.out)(x) + nn.Dense(self.out)(ax) \
                + nn.Dense(self.out)(a2x) + nn.Dense(self.out)(pm @ y)
            xn = nn.LayerNorm()(xn)
            by = dgl.gspmm(lg, "copy_lhs", "sum", y)
            yn = nn.Dense(self.out)(y) + nn.Dense(self.out)(by) \
                + nn.Dense(self.out)(pm.T @ x)
            yn = nn.LayerNorm()(yn)
            h = self.out // 2
            xn = jnp.concatenate([nn.relu(xn[:, :h]), xn[:, h:]], 1)
            yn = jnp.concatenate([nn.relu(yn[:, :h]), yn[:, h:]], 1)
            return xn, yn

        # pm maps edge-space to node-space and back

    class LGNN(nn.Module):
        @nn.compact
        def __call__(self, g, lg, deg, pm):
            x = deg
            y = jnp.ones((lg.num_nodes(), 1), jnp.float32)
            for _ in range(args.layers):
                x, y = LGNNLayer(args.hidden)(g, lg, x, y, pm)
            return nn.Dense(K)(x)

    model = LGNN()
    g0, lg0, pm0, deg0, _ = data[0]
    params = model.init(jax.random.PRNGKey(0), g0, lg0, deg0, pm0)
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    def perm_inv_loss(logits, comm):
        """Community labels are defined up to permutation (reference:
        line_graph train.py)."""
        logp = jax.nn.log_softmax(logits)
        l1 = -jnp.take_along_axis(logp, comm[:, None], 1).mean()
        l2 = -jnp.take_along_axis(logp, (1 - comm)[:, None], 1).mean()
        return jnp.minimum(l1, l2)

    @jax.jit
    def step(p, o, g, lg, deg, pm, comm):
        def loss_fn(p):
            return perm_inv_loss(model.apply(p, g, lg, deg, pm), comm)
        loss, grads = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(grads, o)
        return optax.apply_updates(p, up), o, loss

    t0 = time.perf_counter()
    for ep in range(args.epochs):
        for g, lg, pm, deg, comm in data[:n_train]:
            params, opt, loss = step(params, opt, g, lg, deg, pm, comm)
    train_time = time.perf_counter() - t0

    accs = []
    for g, lg, pm, deg, comm in data[n_train:]:
        pred = np.asarray(model.apply(params, g, lg, deg, pm).argmax(-1))
        c = np.asarray(comm)
        accs.append(max((pred == c).mean(), (pred == 1 - c).mean()))
    print(json.dumps({"model": "LGNN", "epochs": args.epochs,
                      "test_acc": round(float(np.mean(accs)), 4),
                      "train_time_s": round(train_time, 2)}))


if __name__ == "__main__":
    main()
