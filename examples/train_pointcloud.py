"""DGCNN-style point-cloud classification with kNN graphs + EdgeConv
(reference: examples/pytorch/pointcloud — ModelNet40 there; synthetic
shape classes (sphere / cube-surface / two-cluster) offline).

Usage: python examples/train_pointcloud.py --epochs 20
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--clouds", type=int, default=90)
    p.add_argument("--points", type=int, default=64)
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--hidden", type=int, default=32)
    p.add_argument("--lr", type=float, default=5e-3)
    args = p.parse_args()

    import numpy as np
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import optax

    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.nn import EdgeConv

    rng = np.random.default_rng(0)
    NP = args.points

    def cloud(label):
        if label == 0:        # sphere shell
            x = rng.normal(size=(NP, 3))
            x /= np.linalg.norm(x, axis=1, keepdims=True)
        elif label == 1:      # cube surface
            x = rng.uniform(-1, 1, (NP, 3))
            ax = rng.integers(0, 3, NP)
            x[np.arange(NP), ax] = np.sign(x[np.arange(NP), ax])
        else:                 # two gaussian clusters
            c = rng.integers(0, 2, NP)[:, None] * 2.0 - 1.0
            x = c * np.array([1.0, 0, 0]) + 0.3 * rng.normal(size=(NP, 3))
        return x.astype(np.float32)

    data = []
    for i in range(args.clouds):
        lbl = i % 3
        x = cloud(lbl)
        g = dgl.knn_graph(x, args.k)
        data.append((g, jnp.asarray(x), lbl))
    n_train = int(0.8 * args.clouds)

    class DGCNN(nn.Module):
        @nn.compact
        def __call__(self, g, x):
            h = nn.relu(EdgeConv(args.hidden)(g, x))
            h = nn.relu(EdgeConv(args.hidden)(g, h))
            hg = jnp.concatenate([h.max(0), h.mean(0)])
            return nn.Dense(3)(nn.relu(nn.Dense(args.hidden)(hg)))

    model = DGCNN()
    params = model.init(jax.random.PRNGKey(0), data[0][0], data[0][1])
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, g, x, y):
        def loss_fn(p):
            return -jax.nn.log_softmax(model.apply(p, g, x))[y]
        loss, grads = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(grads, o)
        return optax.apply_updates(p, up), o, loss

    t0 = time.perf_counter()
    for ep in range(args.epochs):
        for g, x, y in data[:n_train]:
            params, opt, loss = step(params, opt, g, x, y)
    train_time = time.perf_counter() - t0

    correct = 0
    for g, x, y in data[n_train:]:
        correct += int(model.apply(params, g, x).argmax()) == y
    acc = correct / max(1, len(data) - n_train)
    print(json.dumps({"model": "DGCNN", "epochs": args.epochs,
                      "test_acc": round(acc, 4),
                      "train_time_s": round(train_time, 2)}))


if __name__ == "__main__":
    main()
