"""PinSAGE item recommendation (reference:
examples/pytorch/recommendation/main.py — PinSage over MovieLens with
BPR/hinge loss and sampled negatives).

TPU-native shape: the PinSAGESampler builds a static item-item graph
(random-walk visit counts as edge weights — sampling/pinsage.py mirrors
python/dgl/sampling/pinsage.py); two weighted-mean PinSAGE layers run
through the plan-kernel gspmm; users are represented by the mean of
their interacted items' embeddings; BPR loss over uniform negatives;
eval = HITS@10 / MRR against 100 sampled negatives per held-out pair.
Offline the dataset is a deterministic latent-factor MovieLens stand-in.
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def synth_movielens(num_users=600, num_items=500, rank=8, per_user=12,
                    seed=0):
    """Latent-factor interactions: each user 'watches' their top-scored
    items (plus noise) — recommendation signal a factor model can learn."""
    import numpy as np
    rng = np.random.default_rng(seed)
    U = rng.normal(size=(num_users, rank)) / rank ** 0.25
    V = rng.normal(size=(num_items, rank)) / rank ** 0.25
    scores = U @ V.T + 0.3 * rng.normal(size=(num_users, num_items))
    top = np.argsort(-scores, axis=1)[:, :per_user]
    users = np.repeat(np.arange(num_users), per_user)
    items = top.reshape(-1)
    # leave-one-out split per user
    test_sel = np.arange(num_users) * per_user + rng.integers(
        0, per_user, num_users)
    mask = np.zeros(len(users), bool)
    mask[test_sel] = True
    return (users[~mask].astype(np.int32), items[~mask].astype(np.int32),
            users[mask].astype(np.int32), items[mask].astype(np.int32),
            num_users, num_items)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--num-neighbors", type=int, default=8)
    p.add_argument("--num-walks", type=int, default=20)
    p.add_argument("--lr", type=float, default=3e-2)
    p.add_argument("--num-negs", type=int, default=4)
    p.add_argument("--eval-negs", type=int, default=100)
    p.add_argument("--users", type=int, default=600)
    p.add_argument("--items", type=int, default=500)
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.sampling import PinSAGESampler

    tr_u, tr_i, te_u, te_i, NU, NI = synth_movielens(args.users, args.items)

    # bidirectional bipartite heterograph, as the reference builds from
    # the ratings table (rec/datasets/movielens.py)
    G = dgl.heterograph({
        ("user", "watched", "item"): (tr_u, tr_i),
        ("item", "watched-by", "user"): (tr_i, tr_u),
    }, num_nodes_dict={"user": NU, "item": NI})

    # PinSAGE neighborhood: item-item graph from user-mediated walks;
    # edge 'weights' = visit counts (static per epoch — TPU-friendly)
    sampler = PinSAGESampler(G, "item", "user", random_walk_length=2,
                             random_walk_restart_prob=0.2,
                             num_random_walks=args.num_walks,
                             num_neighbors=args.num_neighbors, seed=0)
    gi = sampler(np.arange(NI, dtype=np.int64))
    w = np.asarray(gi.edata["weights"], np.float32)
    gi = dgl.prepare_spmm(gi, te=64, dense_hub=False)
    wn = jnp.asarray(w / np.maximum(w.sum(), 1.0) * len(w))

    # user -> interacted items (padded fixed degree for static shapes)
    deg = np.bincount(tr_u, minlength=NU)
    cap = int(deg.max())
    u_items = np.zeros((NU, cap), np.int32)
    u_mask = np.zeros((NU, cap), np.float32)
    pos = np.zeros(NU, np.int64)
    for u, i in zip(tr_u, tr_i):
        u_items[u, pos[u]] = i
        u_mask[u, pos[u]] = 1.0
        pos[u] += 1
    u_items = jnp.asarray(u_items)
    u_mask = jnp.asarray(u_mask)

    def item_embs(params):
        """Two PinSAGE layers: weighted-mean aggregate + dense + relu."""
        h = params["emb"]
        for k in ("W1", "W2"):
            agg = dgl.gspmm(gi, "mul", "sum", h, wn[:, None], "u", "e")
            norm = dgl.gspmm(gi, "copy_rhs", "sum", None, wn[:, None],
                             "u", "e")
            agg = agg / jnp.maximum(norm, 1e-6)
            h = jax.nn.relu(jnp.concatenate([h, agg], 1) @ params[k])
            h = h / jnp.maximum(jnp.linalg.norm(h, axis=1, keepdims=True),
                                1e-6)
        return h

    def user_embs(items_h):
        ue = (items_h[u_items] * u_mask[..., None]).sum(1)
        return ue / jnp.maximum(u_mask.sum(1, keepdims=True), 1.0)

    def loss_fn(params, key):
        h = item_embs(params)
        ue = user_embs(h)
        negs = jax.random.randint(key, (len(tr_u), args.num_negs), 0, NI)
        pos_s = (ue[tr_u] * h[tr_i]).sum(-1, keepdims=True)
        neg_s = jnp.einsum("ud,und->un", ue[tr_u], h[negs])
        # BPR: -log sigmoid(pos - neg)
        return -jax.nn.log_sigmoid(pos_s - neg_s).mean()

    rng0 = np.random.default_rng(1)
    D = args.hidden
    params = {
        "emb": jnp.asarray(rng0.normal(0, 0.1, (NI, D)).astype(np.float32)),
        "W1": jnp.asarray((rng0.normal(size=(2 * D, D))
                           * (2.0 / (3 * D)) ** 0.5).astype(np.float32)),
        "W2": jnp.asarray((rng0.normal(size=(2 * D, D))
                           * (2.0 / (3 * D)) ** 0.5).astype(np.float32)),
    }
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, key)
        up, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, up), opt, loss

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    for ep in range(args.epochs):
        key, k1 = jax.random.split(key)
        params, opt, loss = step(params, opt, k1)
        if (ep + 1) % 20 == 0:
            print(f"epoch {ep+1:4d} loss {float(loss):.4f}", flush=True)
    train_s = time.perf_counter() - t0

    # eval: rank the held-out item among eval_negs sampled negatives
    h = item_embs(params)
    ue = user_embs(h)
    rnge = np.random.default_rng(2)
    negs = rnge.integers(0, NI, (len(te_u), args.eval_negs))
    pos_s = np.asarray((ue[te_u] * h[te_i]).sum(-1))
    neg_s = np.asarray(jnp.einsum("ud,und->un", ue[te_u],
                                  h[jnp.asarray(negs)]))
    rank = 1 + (neg_s >= pos_s[:, None]).sum(1)
    hits10 = float((rank <= 10).mean())
    mrr = float((1.0 / rank).mean())
    print(json.dumps({"dataset": "movielens-synth", "model": "pinsage",
                      "hits10": round(hits10, 4), "mrr": round(mrr, 4),
                      "train_time_s": round(train_s, 2)}))


if __name__ == "__main__":
    main()
