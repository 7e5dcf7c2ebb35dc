"""GCMC-style rating prediction on a bipartite user-item graph
(reference: examples/pytorch/gcmc — graph convolutional matrix
completion: one relation per rating level, HeteroGraphConv encoder,
bilinear decoder over rating classes).

Synthetic MovieLens-like world: latent user/item factors generate
ratings 1..R; train on observed edges, predict held-out ones.
Usage: python examples/train_gcmc.py --epochs 60
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--users", type=int, default=120)
    p.add_argument("--items", type=int, default=80)
    p.add_argument("--ratings", type=int, default=3)
    p.add_argument("--hidden", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-2)
    args = p.parse_args()

    import numpy as np
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import optax

    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.nn import GraphConv, HeteroGraphConv

    rng = np.random.default_rng(0)
    NU, NI, R = args.users, args.items, args.ratings
    zu = rng.normal(size=(NU, 4))
    zi = rng.normal(size=(NI, 4))
    score = zu @ zi.T
    qs = np.quantile(score, np.linspace(0, 1, R + 1)[1:-1])
    rating = np.digitize(score, qs)           # (NU, NI) in [0, R)
    obs = rng.random((NU, NI)) < 0.25
    u_obs, i_obs = np.nonzero(obs)
    r_obs = rating[u_obs, i_obs]
    n = len(u_obs)
    perm = rng.permutation(n)
    tr, te = perm[:int(0.8 * n)], perm[int(0.8 * n):]

    # one relation pair per rating level (reference: gcmc data pipeline)
    data = {}
    for r in range(R):
        m = r_obs[tr] == r
        data[("user", f"rate{r}", "item")] = (u_obs[tr][m], i_obs[tr][m])
        data[("item", f"rev{r}", "user")] = (i_obs[tr][m], u_obs[tr][m])
    hg = dgl.heterograph(data, num_nodes_dict={"user": NU, "item": NI})

    # one-hot node identities (the reference uses identity features)
    ufeat = jnp.asarray(np.eye(NU, dtype=np.float32))
    ifeat = jnp.asarray(np.eye(NI, dtype=np.float32))

    class Encoder(nn.Module):
        @nn.compact
        def __call__(self, hg, feats):
            conv = HeteroGraphConv(
                {f"rate{r}": GraphConv(args.hidden, norm="right")
                 for r in range(R)} |
                {f"rev{r}": GraphConv(args.hidden, norm="right")
                 for r in range(R)}, aggregate="sum")
            h = conv(hg, feats)
            return {k: nn.relu(v) for k, v in h.items()}

    class Decoder(nn.Module):
        @nn.compact
        def __call__(self, hu, hi, u, i):
            # bilinear per rating class (reference: gcmc BiDecoder)
            Q = self.param("Q", nn.initializers.glorot_uniform(),
                           (R, args.hidden, args.hidden))
            logits = jnp.einsum("bh,rhk,bk->br", hu[u], Q, hi[i])
            return logits

    class GCMC(nn.Module):
        @nn.compact
        def __call__(self, hg, feats, u, i):
            h = Encoder()(hg, feats)
            return Decoder()(h["user"], h["item"], u, i)

    model = GCMC()
    feats = {"user": ufeat, "item": ifeat}
    utr = jnp.asarray(u_obs[tr])
    itr = jnp.asarray(i_obs[tr])
    rtr = jnp.asarray(r_obs[tr])
    params = model.init(jax.random.PRNGKey(0), hg, feats, utr, itr)
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        def loss_fn(p):
            logits = model.apply(p, hg, feats, utr, itr)
            logp = jax.nn.log_softmax(logits)
            return -jnp.take_along_axis(logp, rtr[:, None], 1).mean()
        loss, grads = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(grads, o)
        return optax.apply_updates(p, up), o, loss

    t0 = time.perf_counter()
    for ep in range(args.epochs):
        params, opt, loss = step(params, opt)
    train_time = time.perf_counter() - t0

    logits = model.apply(params, hg, feats, jnp.asarray(u_obs[te]),
                         jnp.asarray(i_obs[te]))
    pred = np.asarray(logits.argmax(-1))
    probs = np.asarray(jax.nn.softmax(logits))
    exp_rating = (probs * np.arange(R)).sum(-1)
    rmse = float(np.sqrt(((exp_rating - r_obs[te]) ** 2).mean()))
    acc = float((pred == r_obs[te]).mean())
    print(json.dumps({"model": "GCMC", "epochs": args.epochs,
                      "test_acc": round(acc, 4),
                      "test_rmse": round(rmse, 4),
                      "train_time_s": round(train_time, 2)}))


if __name__ == "__main__":
    main()
