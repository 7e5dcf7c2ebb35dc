"""Adaptive/importance layer sampling GCN (reference:
examples/pytorch/adaptive_sampling/adaptive_sampling.py — layer-wise
sampled GCN with importance reweighting on Cora).

TPU-native shape: each layer samples a FIXED-size node set (static
shapes for one jit), drawn with degree-proportional importance q, and
messages are reweighted by 1/(S * q_norm(u)) so the aggregation is an
unbiased estimator of the full-graph layer (the FastGCN/AS-GCN
estimator the reference's learned sampler generalises).  Evaluation
runs the same weights on the full graph.
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--layer-size", type=int, default=256)
    p.add_argument("--hidden", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-2)
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.data import synthetic_cora

    ds = synthetic_cora()
    g = ds.graph
    n = g.num_nodes()
    feats = np.asarray(ds.features, np.float32)
    labels = np.asarray(ds.labels, np.int32)
    F_in, C = feats.shape[1], ds.num_classes
    csc_indptr = np.asarray(g.host("csc_indptr"), np.int64)
    src_by_dst = np.asarray(g.host("src"), np.int64)
    deg = np.maximum(np.diff(csc_indptr), 1).astype(np.float64)
    rng = np.random.default_rng(0)
    train_ids = np.nonzero(np.asarray(ds.train_mask))[0]

    B, S = args.batch_size, args.layer_size

    def sample_layer(seeds):
        """Importance-sample S sources for the seeds' in-edges; returns
        (padded src ids (S,), per-seed padded edge lists).  q ∝ degree
        over the candidate set; message weight 1/(S * q_norm)."""
        pos = np.concatenate([np.arange(csc_indptr[v], csc_indptr[v + 1])
                              for v in seeds])
        cand = np.unique(src_by_dst[pos])
        q = deg[cand] / deg[cand].sum()
        take = min(S, len(cand))
        sel = rng.choice(len(cand), size=take, replace=False,
                         p=q)
        chosen = cand[sel]
        w_node = 1.0 / (take * q[sel])          # importance weights
        lut = np.full(n, -1, np.int64)
        lut[chosen] = np.arange(take)
        keep = lut[src_by_dst[pos]] >= 0
        pos_k = pos[keep]
        dst_k = np.repeat(seeds, np.diff(csc_indptr)[seeds])[keep]
        src_loc = lut[src_by_dst[pos_k]]
        # per-edge weight = importance weight of its (sampled) source,
        # normalised by the seed's true degree (mean aggregation)
        w_edge = (w_node[src_loc] / deg[dst_k]).astype(np.float32)
        # pad to fixed E cap for static shapes
        e_cap = B * 32
        e = len(pos_k)
        if e > e_cap:
            sel_e = rng.choice(e, e_cap, replace=False)
            pos_k, dst_k = pos_k[sel_e], dst_k[sel_e]
            src_loc, w_edge = src_loc[sel_e], w_edge[sel_e]
            e = e_cap
        src_pad = np.zeros(e_cap, np.int32)
        dst_pad = np.zeros(e_cap, np.int32)
        w_pad = np.zeros(e_cap, np.float32)
        src_pad[:e] = src_loc
        # dst local = position within the seed batch
        dlut = np.full(n, 0, np.int64)
        dlut[seeds] = np.arange(len(seeds))
        dst_pad[:e] = dlut[dst_k]
        w_pad[:e] = w_edge
        chosen_pad = np.zeros(S, np.int64)
        chosen_pad[:take] = chosen
        return chosen_pad, src_pad, dst_pad, w_pad

    def agg(h_src, src, dst, w, num_dst):
        """Weighted-mean estimator via segment ops."""
        from dgl_hack_tpu.ops import segment
        msg = h_src[src] * w[:, None]
        return segment.segment_reduce("sum", msg, dst, num_dst)

    def init_dense(shape):
        return jnp.asarray((rng.normal(size=shape)
                            * (2.0 / sum(shape)) ** 0.5).astype(np.float32))

    params = {"W1": init_dense((F_in, args.hidden)),
              "W2": init_dense((args.hidden, C))}

    @jax.jit
    def train_step(prm, opt, x2, s2, d2, w2, x1s, s1, d1, w1, y):
        def loss_fn(prm):
            h1 = jax.nn.relu(agg(x2 @ prm["W1"], s2, d2, w2, S))
            logits = agg(h1, s1, d1, w1, B) @ prm["W2"]
            logp = jax.nn.log_softmax(logits)
            return -jnp.take_along_axis(logp, y[:, None], -1).mean()
        loss, grads = jax.value_and_grad(loss_fn)(prm)
        up, opt = tx.update(grads, opt, prm)
        return optax.apply_updates(prm, up), opt, loss

    tx = optax.adam(args.lr)
    opt = tx.init(params)
    t0 = time.perf_counter()
    for ep in range(args.epochs):
        seeds = rng.choice(train_ids, B, replace=len(train_ids) < B)
        l1_nodes, s1, d1, w1 = sample_layer(seeds)          # layer 2->out
        l2_nodes, s2, d2, w2 = sample_layer(l1_nodes)       # input->layer
        params, opt, loss = train_step(
            params, opt,
            jnp.asarray(feats[l2_nodes]), jnp.asarray(s2), jnp.asarray(d2),
            jnp.asarray(w2),
            jnp.asarray(feats[l1_nodes]), jnp.asarray(s1), jnp.asarray(d1),
            jnp.asarray(w1), jnp.asarray(labels[seeds]))
        if (ep + 1) % 50 == 0:
            print(f"epoch {ep+1:4d} loss {float(loss):.4f}", flush=True)
    train_s = time.perf_counter() - t0

    # full-graph eval with the same weights (mean aggregation)
    x = jnp.asarray(feats)
    h1 = jax.nn.relu(dgl.gspmm(g, "copy_lhs", "mean", x @ params["W1"]))
    logits = dgl.gspmm(g, "copy_lhs", "mean", h1) @ params["W2"]
    pred = np.asarray(logits.argmax(-1))
    mask = np.asarray(ds.test_mask)
    acc = float((pred[mask] == labels[mask]).mean())
    print(json.dumps({"dataset": ds.name, "model": "adaptive-sampling-gcn",
                      "test_acc": round(acc, 4),
                      "train_time_s": round(train_s, 2)}))


if __name__ == "__main__":
    main()
