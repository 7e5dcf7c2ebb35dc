"""GIN graph classification (reference: examples/pytorch/gin/main.py).

Usage: python examples/train_gin.py --dataset synth --epochs 40
Offline container: SBM-mixture stand-in for the TU/GIN datasets.
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="synth")
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--hidden", type=int, default=32)
    p.add_argument("--num_layers", type=int, default=3)
    p.add_argument("--lr", type=float, default=5e-3)
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from dgl_hack_tpu.core import batch as B
    from dgl_hack_tpu.data import sbm_mixture
    from dgl_hack_tpu.models import GIN

    ds = sbm_mixture(num_graphs=200, nodes_per_graph=24,
                     communities=(1, 4), p_in=0.6, p_out=0.05, seed=0)
    n_train = int(0.8 * len(ds.graphs))
    model = GIN(hidden_feats=args.hidden, out_feats=ds.num_classes,
                num_layers=args.num_layers)

    bs = args.batch_size
    def make_batches(lo, hi):
        out = []
        for i in range(lo, hi - bs + 1, bs):
            bg = B.batch(ds.graphs[i:i + bs])
            x = jnp.asarray(np.concatenate(ds.features[i:i + bs]))
            y = jnp.asarray(ds.labels[i:i + bs])
            out.append((bg, x, y))
        return out

    train_b = make_batches(0, n_train)
    test_b = make_batches(n_train, len(ds.graphs))

    params = model.init(jax.random.PRNGKey(0), *train_b[0][:2])
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, o, bg, x, y):
        def loss_fn(p):
            logp = jax.nn.log_softmax(model.apply(p, bg, x))
            return -jnp.take_along_axis(logp, y[:, None], axis=-1).mean()
        loss, grads = jax.value_and_grad(loss_fn)(p)
        upd, o = tx.update(grads, o, p)
        return optax.apply_updates(p, upd), o, loss

    @jax.jit
    def acc(p, bg, x, y):
        return (model.apply(p, bg, x).argmax(-1) == y).mean()

    t0 = time.perf_counter()
    for ep in range(args.epochs):
        for bg, x, y in train_b:
            params, opt_state, loss = step(params, opt_state, bg, x, y)
    train_time = time.perf_counter() - t0
    test_acc = float(np.mean([float(acc(params, *b)) for b in test_b]))
    print(json.dumps({"dataset": "SBM-mixture", "model": "GIN",
                      "epochs": args.epochs, "test_acc": test_acc,
                      "train_time_s": round(train_time, 2)}))


if __name__ == "__main__":
    main()
