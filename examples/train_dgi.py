"""Deep Graph Infomax: self-supervised GCN pretraining + linear probe
(reference: examples/pytorch/dgi — encoder vs corrupted-feature
negatives with a bilinear discriminator against the graph summary).

Usage: python examples/train_dgi.py --epochs 60
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--lr", type=float, default=5e-3)
    p.add_argument("--probe_epochs", type=int, default=100)
    args = p.parse_args()

    import numpy as np
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import optax

    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.data import synthetic_cora
    from dgl_hack_tpu.nn import GraphConv

    ds = synthetic_cora(seed=0)
    g = dgl.add_self_loop(ds.graph)
    X = jnp.asarray(ds.features)
    y = np.asarray(ds.labels)

    class Encoder(nn.Module):
        @nn.compact
        def __call__(self, g, x):
            h = nn.PReLU()(GraphConv(args.hidden)(g, x))
            return h

    class DGI(nn.Module):
        @nn.compact
        def __call__(self, g, x, x_corrupt):
            enc = Encoder()
            h_pos = enc(g, x)
            h_neg = enc(g, x_corrupt)
            s = jax.nn.sigmoid(h_pos.mean(0))            # graph summary
            W = self.param("disc", nn.initializers.glorot_uniform(),
                           (args.hidden, args.hidden))
            d_pos = (h_pos @ W) @ s
            d_neg = (h_neg @ W) @ s
            loss = -(jax.nn.log_sigmoid(d_pos).mean()
                     + jax.nn.log_sigmoid(-d_neg).mean())
            return loss, h_pos

    model = DGI()
    rngk = jax.random.PRNGKey(0)
    perm0 = jax.random.permutation(rngk, X.shape[0])
    params = model.init(rngk, g, X, X[perm0])
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, perm):
        def loss_fn(p):
            loss, _ = model.apply(p, g, X, X[perm])
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(grads, o)
        return optax.apply_updates(p, up), o, loss

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    for ep in range(args.epochs):
        perm = jnp.asarray(rng.permutation(X.shape[0]))
        params, opt, loss = step(params, opt, perm)
    train_time = time.perf_counter() - t0

    _, H = model.apply(params, g, X, X)
    H = np.asarray(H)

    # linear probe on frozen embeddings (reference: dgi classifier stage)
    tr = np.asarray(ds.train_mask)
    te = np.asarray(ds.test_mask)
    W = jnp.zeros((args.hidden, ds.num_classes))
    b = jnp.zeros((ds.num_classes,))
    ptx = optax.adam(1e-2)
    pst = ptx.init((W, b))
    Htr, ytr = jnp.asarray(H[tr]), jnp.asarray(y[tr])

    @jax.jit
    def pstep(Wb, o):
        def loss_fn(Wb):
            W, b = Wb
            logp = jax.nn.log_softmax(Htr @ W + b)
            return -jnp.take_along_axis(logp, ytr[:, None], 1).mean()
        loss, grads = jax.value_and_grad(loss_fn)(Wb)
        up, o = ptx.update(grads, o)
        return optax.apply_updates(Wb, up), o

    Wb = (W, b)
    for _ in range(args.probe_epochs):
        Wb, pst = pstep(Wb, pst)
    pred = np.asarray(jnp.argmax(jnp.asarray(H) @ Wb[0] + Wb[1], 1))
    acc = float((pred == y)[te].mean())
    print(json.dumps({"model": "DGI", "epochs": args.epochs,
                      "probe_test_acc": round(acc, 4),
                      "train_time_s": round(train_time, 2)}))


if __name__ == "__main__":
    main()
