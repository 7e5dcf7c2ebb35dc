"""MoNet (GMMConv) node classification with degree pseudo-coordinates
(reference: examples/pytorch/monet/citation.py — pseudo = [1/sqrt(deg_u),
1/sqrt(deg_v)] per edge, two GMM layers).

Usage: python examples/train_monet.py --epochs 60
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--hidden", type=int, default=16)
    p.add_argument("--kernels", type=int, default=3)
    p.add_argument("--lr", type=float, default=1e-2)
    args = p.parse_args()

    import numpy as np
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import optax

    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.data import synthetic_cora
    from dgl_hack_tpu.nn import GMMConv

    ds = synthetic_cora(seed=0)
    g = dgl.add_self_loop(ds.graph)
    X = jnp.asarray(ds.features)
    y = jnp.asarray(ds.labels)

    # pseudo-coordinates from endpoint degrees (reference: monet
    # citation.py us/vs construction)
    s, d = g.host_edges()
    deg = np.asarray(g.in_degrees()).astype(np.float64)
    pseudo = np.stack([1.0 / np.sqrt(np.maximum(deg[s], 1)),
                       1.0 / np.sqrt(np.maximum(deg[d], 1))],
                      axis=1).astype(np.float32)
    pseudo = jnp.asarray(pseudo)

    class MoNet(nn.Module):
        @nn.compact
        def __call__(self, g, x, pseudo):
            h = nn.relu(GMMConv(args.hidden, dim=2,
                                n_kernels=args.kernels)(g, x, pseudo))
            return GMMConv(ds.num_classes, dim=2,
                           n_kernels=args.kernels)(g, h, pseudo)

    model = MoNet()
    params = model.init(jax.random.PRNGKey(0), g, X, pseudo)
    tx = optax.adam(args.lr)
    opt = tx.init(params)
    tr = jnp.asarray(np.asarray(ds.train_mask))
    te = np.asarray(ds.test_mask)

    @jax.jit
    def step(p, o):
        def loss_fn(p):
            logp = jax.nn.log_softmax(model.apply(p, g, X, pseudo))
            nll = -jnp.take_along_axis(logp, y[:, None], 1)[:, 0]
            return jnp.where(tr, nll, 0.0).sum() / tr.sum()
        loss, grads = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(grads, o)
        return optax.apply_updates(p, up), o, loss

    t0 = time.perf_counter()
    for ep in range(args.epochs):
        params, opt, loss = step(params, opt)
    train_time = time.perf_counter() - t0
    pred = np.asarray(model.apply(params, g, X, pseudo).argmax(-1))
    acc = float((pred == np.asarray(y))[te].mean())
    print(json.dumps({"model": "MoNet", "epochs": args.epochs,
                      "test_acc": round(acc, 4),
                      "train_time_s": round(train_time, 2)}))


if __name__ == "__main__":
    main()
