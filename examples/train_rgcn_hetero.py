"""Heterograph R-GCN entity classification — the multi-ntype RGCN
(reference: examples/pytorch/rgcn-hetero/entity_classify.py + model.py:
RelGraphConvLayer over HeteroGraphConv/multi_update_all, RelGraphEmbed
featureless inputs, predict on one category ntype).

The layer here drives ``HeteroGraph.multi_update_all`` directly — the
end-to-end model-scale stress of the per-etype message + cross-type
reduction path (reference: python/dgl/heterograph.py:3570).  Weights are
basis-decomposed across relations (WeightBasis, reference:
nn/pytorch/utils.py:220).

Zero-egress: trains on a deterministic synthetic academic heterograph
(paper/author/subject; relations carry the class signal) standing in for
the RDF datasets.  With raw AIFB/AM npz present, tools/validate_real.py
covers the homogeneous-etype variant.

Prints one JSON line: {"dataset", "test_acc", "epochs"}.
"""
import argparse
import json
from typing import Dict, Tuple

import numpy as np


def synthetic_academic(num_papers=400, num_authors=200, num_subjects=12,
                       num_classes=4, seed=0):
    """Papers have classes; authors specialise; subjects align with
    classes; citations are homophilous."""
    rng = np.random.default_rng(seed)
    pc = rng.integers(0, num_classes, num_papers)       # paper class
    ac = rng.integers(0, num_classes, num_authors)      # author specialty
    sc = np.arange(num_subjects) % num_classes          # subject class

    # author writes papers of their specialty 85% of the time
    w_src, w_dst = [], []
    for a in range(num_authors):
        for _ in range(4):
            if rng.random() < 0.85:
                cand = np.nonzero(pc == ac[a])[0]
            else:
                cand = np.arange(num_papers)
            w_src.append(a)
            w_dst.append(int(cand[rng.integers(0, len(cand))]))
    # paper cites same-class papers 80% of the time
    c_src, c_dst = [], []
    for p in range(num_papers):
        for _ in range(3):
            if rng.random() < 0.8:
                cand = np.nonzero(pc == pc[p])[0]
            else:
                cand = np.arange(num_papers)
            c_src.append(p)
            c_dst.append(int(cand[rng.integers(0, len(cand))]))
    # paper has_topic subject of its class 90% of the time
    t_src, t_dst = [], []
    for p in range(num_papers):
        if rng.random() < 0.9:
            cand = np.nonzero(sc == pc[p])[0]
        else:
            cand = np.arange(num_subjects)
        t_src.append(p)
        t_dst.append(int(cand[rng.integers(0, len(cand))]))

    import dgl_hack_tpu as dgl
    hg = dgl.heterograph({
        ("author", "writes", "paper"): (w_src, w_dst),
        ("paper", "written_by", "author"): (w_dst, w_src),
        ("paper", "cites", "paper"): (c_src, c_dst),
        ("paper", "cited_by", "paper"): (c_dst, c_src),
        ("paper", "has_topic", "subject"): (t_src, t_dst),
        ("subject", "topic_of", "paper"): (t_dst, t_src),
    }, num_nodes_dict={"paper": num_papers, "author": num_authors,
                       "subject": num_subjects})
    order = rng.permutation(num_papers)
    n_train = int(0.6 * num_papers)
    n_test = int(0.3 * num_papers)
    return hg, pc.astype(np.int32), order[:n_train], order[-n_test:]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--hidden", type=int, default=24)
    p.add_argument("--embed", type=int, default=16)
    p.add_argument("--num-bases", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--papers", type=int, default=400)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    import optax
    import dgl_hack_tpu as dgl
    from dgl_hack_tpu import fn
    from dgl_hack_tpu.nn.utils import WeightBasis

    hg, labels, train_idx, test_idx = synthetic_academic(
        num_papers=args.papers, seed=args.seed)
    num_classes = int(labels.max()) + 1
    rel_names = tuple(et for _, et, _ in hg.canonical_etypes)

    class RelGraphConvLayer(nn.Module):
        """reference model.py RelGraphConvLayer: per-relation projected
        copy_u-mean messages through multi_update_all, cross-type sum,
        self-loop + bias + activation."""
        out_feats: int
        use_basis: bool
        activation: bool = False

        @nn.compact
        def __call__(self, hg_, inputs: Dict[str, jnp.ndarray]):
            in_f = {nt: x.shape[-1] for nt, x in inputs.items()}
            f0 = next(iter(in_f.values()))
            R = len(hg_.canonical_etypes)
            if self.use_basis and args.num_bases < R:
                W = WeightBasis((f0, self.out_feats), args.num_bases, R)()
            else:
                W = self.param("weight", nn.initializers.glorot_uniform(),
                               (R, f0, self.out_feats))
            loop_w = {nt: self.param(f"loop_{nt}",
                                     nn.initializers.glorot_uniform(),
                                     (in_f[nt], self.out_feats))
                      for nt in inputs}
            bias = self.param("h_bias", nn.initializers.zeros,
                              (self.out_feats,))

            local = hg_.local_var()
            etype_dict = {}
            for i, c in enumerate(local.canonical_etypes):
                st, et, dt = c
                if st not in inputs:
                    continue
                local.nodes_data(st)[f"h{i}"] = inputs[st] @ W[i]
                etype_dict[c] = (fn.copy_u(f"h{i}", f"m{i}"),
                                 fn.mean(f"m{i}", "agg"))
            local.multi_update_all(etype_dict, "sum")
            out = {}
            for nt in inputs:
                if "agg" in local.nodes_data(nt):
                    h = local.nodes_data(nt)["agg"]
                else:
                    h = jnp.zeros((local.num_nodes(nt), self.out_feats))
                h = h + inputs[nt] @ loop_w[nt] + bias
                out[nt] = nn.relu(h) if self.activation else h
            return out

    class EntityClassify(nn.Module):
        @nn.compact
        def __call__(self, hg_):
            # RelGraphEmbed: learned per-ntype inputs (featureless RDF)
            inputs = {
                nt: self.param(f"embed_{nt}",
                               nn.initializers.glorot_uniform(),
                               (hg_.num_nodes(nt), args.embed))
                for nt in hg_.ntypes}
            h = RelGraphConvLayer(args.hidden, use_basis=True,
                                  activation=True)(hg_, inputs)
            h = RelGraphConvLayer(num_classes, use_basis=True)(hg_, h)
            return h["paper"]

    model = EntityClassify()
    params = model.init(jax.random.PRNGKey(args.seed), hg)
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)
    y = jnp.asarray(labels)
    tr = jnp.asarray(train_idx)

    @jax.jit
    def step(params, opt_state, hg_):
        def loss_fn(p):
            logits = model.apply(p, hg_)
            logp = jax.nn.log_softmax(logits)
            return -jnp.take_along_axis(
                logp[tr], y[tr][:, None], axis=-1).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(args.epochs):
        params, opt_state, loss = step(params, opt_state, hg)

    logits = model.apply(params, hg)
    pred = np.asarray(logits.argmax(-1))
    test_acc = float((pred[test_idx] == labels[test_idx]).mean())
    print(json.dumps({"dataset": "academic-synth", "test_acc": test_acc,
                      "epochs": args.epochs, "loss": float(loss)}))


if __name__ == "__main__":
    main()
