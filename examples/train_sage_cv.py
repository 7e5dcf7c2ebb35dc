"""GraphSAGE with control-variate (history) sampling — VR-GCN-style
variance reduction (reference: examples/pytorch/graphsage/train_cv.py:
SAGEConvWithCV + per-layer history columns + exact history aggregation
over the full in-neighborhood).

Per layer l the estimator is
    h_neigh = AGG_full(hist_l) + AGG_sampled(h - hist_l)
so only the *delta* from the running history is sampled; the history mean
is exact (computed host-side over the full CSC in-neighborhood — cheap
numpy segment means, no device gather of the big graph).  After each
step the dst nodes' new activations refresh the history.

Zero-egress: synthetic planted-partition stand-in for Reddit.
Prints one JSON line: {"dataset", "test_acc", "epochs"}.
"""
import argparse
import json

import numpy as np


class CVSampler:
    """sample_blocks returning per-layer blocks AND per-layer dst node
    ids (needed for history refresh), with static padded shapes
    (reference: train_cv.py NeighborSampler.sample_blocks, which also
    builds the exact in_subgraph hist blocks — here the exact history
    mean is a host numpy segment mean instead)."""

    def __init__(self, fanouts, seed=0):
        self.fanouts = list(fanouts)
        self.rng = np.random.default_rng(seed)

    def sample(self, g, seeds):
        from dgl_hack_tpu.sampling.neighbor import (_round_up_pow2,
                                                    sample_neighbors)
        from dgl_hack_tpu.core.transform import to_block
        blocks, layer_dst, layer_src = [], [], []
        cur = np.asarray(seeds, np.int32)
        for fanout in reversed(self.fanouts):
            frontier, _ = sample_neighbors(g, cur, fanout, replace=True,
                                           rng=self.rng)
            cap = len(cur) * fanout
            blk, src_ids, dst_ids = to_block(
                frontier, cur, pad_num_src=_round_up_pow2(len(cur) + cap),
                pad_num_edges=cap)
            blocks.insert(0, blk)
            layer_dst.insert(0, dst_ids)
            layer_src.insert(0, src_ids)
            cur = src_ids
        return blocks, layer_src, layer_dst


def exact_hist_mean(g, seeds, hist):
    """Exact mean of ``hist`` over the FULL in-neighborhood of ``seeds``
    (the reference's hist_block update_all(copy_u, mean))."""
    indptr = np.asarray(g.host("csc_indptr"))
    src = np.asarray(g.host("src"))
    out = np.zeros((len(seeds), hist.shape[1]), hist.dtype)
    for i, v in enumerate(np.asarray(seeds)):
        lo, hi = indptr[v], indptr[v + 1]
        if hi > lo:
            out[i] = hist[src[lo:hi]].mean(0)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--nodes", type=int, default=2000)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--fan-out", default="2,2")
    p.add_argument("--hidden", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    import optax
    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.data import planted_partition

    ds = planted_partition(args.nodes, 5, 32, avg_degree=10.0,
                           homophily=0.85, feat_noise=1.5, seed=args.seed,
                           train_per_class=60, num_val=100, num_test=400)
    g = ds.graph
    feats = ds.features.astype(np.float32)
    fanouts = [int(f) for f in args.fan_out.split(",")]
    n_layers = len(fanouts)
    dims = [feats.shape[1]] + [args.hidden] * (n_layers - 1) \
        + [ds.num_classes]

    class SAGEConvWithCV(nn.Module):
        out_feats: int
        activation: bool

        @nn.compact
        def __call__(self, blk, h_src, h_dst, hist_src, agg_hist_dst):
            from dgl_hack_tpu.ops.spmm import gspmm
            delta = h_src - hist_src
            h_neigh = agg_hist_dst + gspmm(blk, "copy_lhs", "mean", delta)
            h = nn.Dense(self.out_feats,
                         kernel_init=nn.initializers.glorot_uniform())(
                jnp.concatenate([h_dst, h_neigh], axis=1))
            return nn.relu(h) if self.activation else h

    class SAGECV(nn.Module):
        @nn.compact
        def __call__(self, blocks, x, hist_srcs, agg_hists):
            h = x
            new_hists = []
            for l in range(n_layers):
                blk = blocks[l]
                h_dst = h[:blk.num_dst_nodes]
                h = SAGEConvWithCV(dims[l + 1],
                                   activation=(l < n_layers - 1))(
                    blk, h, h_dst, hist_srcs[l], agg_hists[l])
                new_hists.append(h)
            return h, new_hists

    model = SAGECV()
    sampler = CVSampler(fanouts, seed=args.seed)
    train_nid = np.nonzero(ds.train_mask)[0]

    # per-layer history columns: hist[0] = raw features (never updated),
    # hist[l>=1] = layer l's activations (reference init_history runs full
    # inference; zero init converges the same way and is cheaper)
    hists = [feats] + [np.zeros((args.nodes, dims[l + 1]), np.float32)
                       for l in range(n_layers - 1)]

    blocks0, srcs0, dsts0 = sampler.sample(g, train_nid[:args.batch_size])
    x0 = jnp.asarray(feats[srcs0[0]])
    hs0 = [jnp.asarray(hists[l][srcs0[l]]) for l in range(n_layers)]
    ah0 = [jnp.asarray(exact_hist_mean(g, dsts0[l], hists[l]))
           for l in range(n_layers)]
    params = model.init(jax.random.PRNGKey(args.seed), blocks0, x0, hs0,
                        ah0)
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, blocks, x, hist_srcs, agg_hists, y):
        def loss_fn(p):
            logits, new_hists = model.apply(p, blocks, x, hist_srcs,
                                            agg_hists)
            logp = jax.nn.log_softmax(logits)
            nll = -jnp.take_along_axis(logp, y[:, None], axis=-1).mean()
            return nll, new_hists
        (loss, new_hists), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, \
            new_hists

    rng = np.random.default_rng(args.seed)
    for epoch in range(args.epochs):
        order = rng.permutation(len(train_nid))
        for i in range(0, len(order) - args.batch_size + 1,
                       args.batch_size):
            seeds = train_nid[order[i:i + args.batch_size]]
            blocks, srcs, dsts = sampler.sample(g, seeds)
            x = jnp.asarray(feats[srcs[0]])
            hs = [jnp.asarray(hists[l][srcs[l]]) for l in range(n_layers)]
            ah = [jnp.asarray(exact_hist_mean(g, dsts[l], hists[l]))
                  for l in range(n_layers)]
            y = jnp.asarray(ds.labels[seeds].astype(np.int32))
            params, opt_state, loss, new_hists = step(
                params, opt_state, blocks, x, hs, ah, y)
            # refresh the history of this batch's dst nodes (reference:
            # update_history) — hidden layers only
            for l in range(n_layers - 1):
                hists[l + 1][dsts[l]] = np.asarray(new_hists[l])

    # full-graph exact inference for eval (reference SAGE.inference):
    # h_neigh = exact mean aggregation, same Dense params per layer
    h = jnp.asarray(feats)
    flat = params["params"]
    for l in range(n_layers):
        h_neigh = dgl.gspmm(g, "copy_lhs", "mean", h)
        name = "SAGEConvWithCV_%d" % l
        W = flat[name]["Dense_0"]["kernel"]
        b = flat[name]["Dense_0"]["bias"]
        h = jnp.concatenate([h, h_neigh], axis=1) @ W + b
        if l < n_layers - 1:
            h = jax.nn.relu(h)
    pred = np.asarray(h.argmax(-1))
    test_acc = float((pred[ds.test_mask] ==
                      ds.labels[ds.test_mask]).mean())
    print(json.dumps({"dataset": ds.name, "test_acc": test_acc,
                      "epochs": args.epochs, "loss": float(loss)}))


if __name__ == "__main__":
    main()
