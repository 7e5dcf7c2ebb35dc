"""Capsule network with dynamic routing as graph message passing
(reference: examples/pytorch/capsule/ — DGLRoutingLayer expresses
Hinton's routing-by-agreement over a complete bipartite capsule graph).

TPU-native shape: the routing loop is a `lax.fori_loop` over the SAME
static bipartite graph; each iteration is the library's edge pipeline —
coupling logits b live on edges, c = softmax_i(b) (the reference
normalises over each input capsule's OUT edges, a dense (in, out)
softmax), s = gspmm copy_e-sum of c*u_hat, squash on nodes, and the
agreement update b += <u_hat, v[dst]> is an e-dot-v gsddmm.  Trains on a
deterministic synthetic digit set (zero egress) with margin loss.
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def synthetic_digits(n, noise=0.15, seed=0):
    """Procedural 8x8 'digit' templates (10 classes) + bit-flip noise."""
    import numpy as np
    rng = np.random.default_rng(seed)
    base = np.zeros((10, 8, 8), np.float32)
    for c in range(10):
        r = np.random.default_rng(1000 + c)
        base[c] = (r.random((8, 8)) < 0.4).astype(np.float32)
    y = rng.integers(0, 10, n).astype(np.int32)
    x = base[y].copy()
    flips = rng.random((n, 8, 8)) < noise
    x[flips] = 1.0 - x[flips]
    return x.reshape(n, 64), y


def margin_loss(lengths, labels, m_pos=0.9, m_neg=0.1, lam=0.5):
    import jax.numpy as jnp
    import jax
    t = jax.nn.one_hot(labels, lengths.shape[1])
    pos = jnp.maximum(0.0, m_pos - lengths) ** 2
    neg = jnp.maximum(0.0, lengths - m_neg) ** 2
    return (t * pos + lam * (1 - t) * neg).sum(axis=1).mean()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--train", type=int, default=1024)
    p.add_argument("--test", type=int, default=256)
    p.add_argument("--in-caps", type=int, default=16)
    p.add_argument("--out-caps", type=int, default=10)
    p.add_argument("--in-dim", type=int, default=8)
    p.add_argument("--out-dim", type=int, default=16)
    p.add_argument("--routing", type=int, default=3)
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.ops.sddmm import gsddmm
    from dgl_hack_tpu.ops.spmm import gspmm

    IC, OC, ID, OD = args.in_caps, args.out_caps, args.in_dim, args.out_dim
    # complete bipartite routing graph: in capsule i -> out capsule j
    src = np.repeat(np.arange(IC), OC).astype(np.int32)
    dst = np.tile(np.arange(OC), IC).astype(np.int32)
    g = dgl.block((src, dst), num_src=IC, num_dst=OC)
    E = g.num_edges()
    # edge ids in internal order for reshaping b -> (IC, OC)
    s_int, d_int = g.edges(order="internal")
    pair = np.asarray(s_int) * OC + np.asarray(d_int)

    xtr, ytr = synthetic_digits(args.train, seed=args.seed)
    xte, yte = synthetic_digits(args.test, seed=args.seed + 1)
    xtr, ytr = jnp.asarray(xtr), jnp.asarray(ytr)
    xte, yte = jnp.asarray(xte), jnp.asarray(yte)

    def squash(s, axis=-1):
        sq = (s ** 2).sum(axis=axis, keepdims=True)
        return (sq / (1.0 + sq)) * s / jnp.sqrt(sq + 1e-9)

    def init_params(key):
        k1, k2 = jax.random.split(key)
        return {
            "primary": jax.random.normal(k1, (64, IC * ID)) * 0.1,
            # per-edge-pair transform W_{ij}: (IC, OC, ID, OD)
            "W": jax.random.normal(k2, (IC, OC, ID, OD)) * 0.1,
        }

    def forward(params, x):
        B = x.shape[0]
        prim = squash(jnp.tanh(x @ params["primary"]).reshape(B, IC, ID))
        # u_hat per edge pair, then scatter into internal edge order
        u_hat_pair = jnp.einsum("bif,ijfo->ijbo", prim, params["W"])
        u_hat = u_hat_pair.reshape(IC * OC, B, OD)[pair]      # (E, B, OD)

        def routing_iter(r, b):
            c = jax.nn.softmax(b.reshape(IC, OC), axis=1).reshape(E, 1, 1)
            s = gspmm(g, "copy_rhs", "sum", None, c * u_hat,
                      "u", "e")                                # (OC, B, OD)
            v = squash(s)
            # agreement: <u_hat_e, v[dst_e]> summed over the capsule dim
            agree = gsddmm(g, "dot", u_hat, v, "e", "v")       # (E, B, 1)
            return b + agree.mean(axis=1)[:, 0]
        b = jax.lax.fori_loop(0, args.routing, routing_iter,
                              jnp.zeros((E,), jnp.float32))
        c = jax.nn.softmax(b.reshape(IC, OC), axis=1).reshape(E, 1, 1)
        v = squash(gspmm(g, "copy_rhs", "sum", None, c * u_hat, "u", "e"))
        lengths = jnp.sqrt((v ** 2).sum(-1) + 1e-9)            # (OC, B)
        return lengths.T                                       # (B, OC)

    params = init_params(jax.random.PRNGKey(args.seed))
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, x, y):
        def loss_fn(p):
            return margin_loss(forward(p, x), y)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    @jax.jit
    def accuracy(params, x, y):
        return (forward(params, x).argmax(1) == y).mean()

    t0 = time.time()
    loss = None
    for ep in range(args.epochs):
        params, opt, loss = step(params, opt, xtr, ytr)
    train_s = time.time() - t0
    acc = float(accuracy(params, xte, yte))
    print(json.dumps({
        "example": "capsule", "epochs": args.epochs,
        "loss": round(float(loss), 4), "test_acc": round(acc, 4),
        "train_s": round(train_s, 1),
    }))


if __name__ == "__main__":
    main()
