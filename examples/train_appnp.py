"""APPNP node classification (reference: examples/pytorch/appnp/appnp.py):
an MLP followed by K steps of personalized-PageRank propagation.

Usage: python examples/train_appnp.py --dataset cora --epochs 200
"""
import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="cora",
                   choices=["cora", "citeseer", "pubmed", "synth"])
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--alpha", type=float, default=0.1)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--dropout", type=float, default=0.5)
    p.add_argument("--weight-decay", type=float, default=5e-4)
    args = p.parse_args()

    import flax.linen as nn
    import jax

    import dgl_hack_tpu as dgl
    from dgl_hack_tpu import data
    from dgl_hack_tpu.nn import APPNPConv
    from dgl_hack_tpu.models.training import train_node_classifier

    class APPNP(nn.Module):
        hidden: int
        out_feats: int
        k: int
        alpha: float
        dropout: float

        @nn.compact
        def __call__(self, g, x, deterministic: bool = True):
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            x = jax.nn.relu(nn.Dense(self.hidden)(x))
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            x = nn.Dense(self.out_feats)(x)
            return APPNPConv(k=self.k, alpha=self.alpha)(g, x)

    ds = {"cora": data.CoraGraphDataset,
          "citeseer": data.CiteseerGraphDataset,
          "pubmed": data.PubmedGraphDataset,
          "synth": data.synthetic_cora}[args.dataset]()
    g = dgl.add_self_loop(dgl.remove_self_loop(ds.graph))
    model = APPNP(hidden=args.hidden, out_feats=ds.num_classes, k=args.k,
                  alpha=args.alpha, dropout=args.dropout)
    res = train_node_classifier(
        model, g, ds.features, ds.labels, ds.train_mask, ds.val_mask,
        ds.test_mask, num_epochs=args.epochs, lr=args.lr,
        weight_decay=args.weight_decay, log_every=50)
    print(json.dumps({"dataset": ds.name, "model": "APPNP",
                      "test_acc": res["test_acc"],
                      "train_time_s": res["train_time_s"]}))


if __name__ == "__main__":
    main()
