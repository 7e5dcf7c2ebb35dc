"""SGC node classification (reference: examples/pytorch/sgc/sgc.py):
a single SGConv layer — precomputed k-hop propagation + linear model.

Usage: python examples/train_sgc.py --dataset cora --epochs 150
"""
import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="cora",
                   choices=["cora", "citeseer", "pubmed", "synth"])
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--k", type=int, default=2)
    p.add_argument("--lr", type=float, default=0.2)
    p.add_argument("--weight-decay", type=float, default=5e-6)
    args = p.parse_args()

    import flax.linen as nn

    import dgl_hack_tpu as dgl
    from dgl_hack_tpu import data
    from dgl_hack_tpu.nn import SGConv
    from dgl_hack_tpu.models.training import train_node_classifier

    class SGC(nn.Module):
        out_feats: int
        k: int

        @nn.compact
        def __call__(self, g, x, deterministic: bool = True):
            return SGConv(out_feats=self.out_feats, k=self.k)(g, x)

    ds = {"cora": data.CoraGraphDataset,
          "citeseer": data.CiteseerGraphDataset,
          "pubmed": data.PubmedGraphDataset,
          "synth": data.synthetic_cora}[args.dataset]()
    g = dgl.add_self_loop(dgl.remove_self_loop(ds.graph))
    model = SGC(out_feats=ds.num_classes, k=args.k)
    res = train_node_classifier(
        model, g, ds.features, ds.labels, ds.train_mask, ds.val_mask,
        ds.test_mask, num_epochs=args.epochs, lr=args.lr,
        weight_decay=args.weight_decay, log_every=50)
    print(json.dumps({"dataset": ds.name, "model": "SGC",
                      "test_acc": res["test_acc"],
                      "train_time_s": res["train_time_s"]}))


if __name__ == "__main__":
    main()
