"""R-GCN entity classification (reference:
examples/pytorch/rgcn/entity_classify.py on AIFB/MUTAG/BGS/AM)."""
import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="aifb-synth")
    p.add_argument("--scale", type=float, default=0.1,
                   help="synthetic stand-in size fraction (AM at full "
                        "stats is 1.67M nodes)")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--hidden", type=int, default=16)
    p.add_argument("--num-bases", type=int, default=-1)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--l2norm", type=float, default=5e-4)
    args = p.parse_args()

    import jax.numpy as jnp
    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.data.rdf import load_rdf_dataset
    from dgl_hack_tpu.models import RGCN
    from dgl_hack_tpu.models.training import train_node_classifier

    import jax
    ds = load_rdf_dataset(args.dataset, scale=args.scale)
    # two-level (dst,etype)-pair fast path (ops/rgcn.py): tuned default
    # for every RelGraphConv layer (KERNELS.md round-4 RGCN bench:
    # fwd+bwd 246 -> 19.3 ns/edge at AIFB shapes).  Off-TPU the Pallas
    # plans would run in interpret mode — keep the composed path there.
    plan = dgl.prepare_rgcn(ds.graph, ds.etypes, ds.num_rels, te=64) \
        if jax.default_backend() == "tpu" else None
    model = RGCN(num_nodes=ds.graph.num_nodes(), hidden_feats=args.hidden,
                 out_feats=ds.num_classes, num_rels=ds.num_rels,
                 num_bases=args.num_bases)
    res = train_node_classifier(
        model, ds.graph, None, ds.labels, ds.train_mask, ds.test_mask,
        ds.test_mask, num_epochs=args.epochs, lr=args.lr,
        weight_decay=args.l2norm,
        model_args=(jnp.asarray(ds.etypes),),
        model_kwargs={"plan": plan}, log_every=10)
    print(json.dumps({"dataset": ds.name, "test_acc": res["test_acc"]}))


if __name__ == "__main__":
    main()
