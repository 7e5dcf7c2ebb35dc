"""metapath2vec: skip-gram over metapath random walks
(reference: examples/pytorch/metapath2vec — walks on a user-item style
heterograph, skip-gram with negative sampling on the trace windows).

TPU shape: walks are host-side (sampling/randomwalk.py); the skip-gram
update over (center, context, negatives) batches is one jitted step.
Usage: python examples/train_metapath2vec.py --epochs 5
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--users", type=int, default=60)
    p.add_argument("--items", type=int, default=40)
    p.add_argument("--dim", type=int, default=32)
    p.add_argument("--walk_length", type=int, default=4)
    p.add_argument("--walks_per_node", type=int, default=10)
    p.add_argument("--window", type=int, default=2)
    p.add_argument("--negatives", type=int, default=5)
    p.add_argument("--lr", type=float, default=0.05)
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.sampling import metapath_random_walk, pack_traces

    rng = np.random.default_rng(0)
    NU, NI, C = args.users, args.items, 3
    area_u = rng.integers(0, C, NU)
    area_i = rng.integers(0, C, NI)
    # users interact mostly with same-area items
    src, dst = [], []
    for u in range(NU):
        pool = np.nonzero(area_i == area_u[u])[0]
        k = min(5, len(pool))
        for it in rng.choice(pool, size=k, replace=False):
            src.append(u)
            dst.append(int(it))
        if rng.random() < 0.3:
            src.append(u)
            dst.append(int(rng.integers(0, NI)))
    src, dst = np.asarray(src, np.int32), np.asarray(dst, np.int32)
    hg = dgl.heterograph({
        ("user", "ui", "item"): (src, dst),
        ("item", "iu", "user"): (dst, src),
    }, num_nodes_dict={"user": NU, "item": NI})

    # global id space: users then items (the reference keeps one vocab)
    def walk_batch():
        traces, types = metapath_random_walk(
            hg, ["ui", "iu"] * args.walk_length,
            np.tile(np.arange(NU), args.walks_per_node), rng=rng)
        # offset item ids into the shared vocab
        it_type = list(hg.ntypes).index("item")
        glob = traces + np.where(types == it_type, NU, 0)[None, :]
        glob = np.where(traces < 0, -1, glob)
        return glob

    Nv = NU + NI
    pairs = []
    for row in walk_batch():
        valid = row[row >= 0]
        for i in range(len(valid)):
            for j in range(max(0, i - args.window),
                           min(len(valid), i + args.window + 1)):
                if i != j:
                    pairs.append((valid[i], valid[j]))
    pairs = np.asarray(pairs, np.int32)

    params = {
        "center": jax.random.normal(jax.random.PRNGKey(0),
                                    (Nv, args.dim)) * 0.1,
        "context": jax.random.normal(jax.random.PRNGKey(1),
                                     (Nv, args.dim)) * 0.1,
    }
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, c, ctx, neg):
        def loss_fn(p):
            zc = p["center"][c]
            zp = p["context"][ctx]
            zn = p["context"][neg]
            pos = jax.nn.log_sigmoid((zc * zp).sum(-1))
            negl = jax.nn.log_sigmoid(-(zc[:, None, :] * zn).sum(-1)).sum(-1)
            return -(pos + negl).mean()
        loss, grads = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(grads, o)
        return optax.apply_updates(p, up), o, loss

    t0 = time.perf_counter()
    B = 1024
    for ep in range(args.epochs):
        perm = rng.permutation(len(pairs))
        for i in range(0, len(pairs) - B + 1, B):
            batch = pairs[perm[i:i + B]]
            neg = rng.integers(0, Nv, (B, args.negatives)).astype(np.int32)
            params, opt, loss = step(params, opt, jnp.asarray(batch[:, 0]),
                                     jnp.asarray(batch[:, 1]),
                                     jnp.asarray(neg))
    train_time = time.perf_counter() - t0

    # eval: do same-area users sit closer than cross-area users?
    z = np.asarray(params["center"][:NU])
    z = z / (np.linalg.norm(z, axis=1, keepdims=True) + 1e-9)
    sims = z @ z.T
    same = area_u[:, None] == area_u[None, :]
    np.fill_diagonal(sims, np.nan)
    intra = np.nanmean(np.where(same, sims, np.nan))
    inter = np.nanmean(np.where(~same, sims, np.nan))
    print(json.dumps({"model": "metapath2vec", "epochs": args.epochs,
                      "intra_sim": round(float(intra), 4),
                      "inter_sim": round(float(inter), 4),
                      "separation": round(float(intra - inter), 4),
                      "train_time_s": round(train_time, 2)}))


if __name__ == "__main__":
    main()
