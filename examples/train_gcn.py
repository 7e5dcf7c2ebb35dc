"""Full-graph GCN training (reference: examples/pytorch/gcn/train.py).

Usage: python examples/train_gcn.py --dataset cora --epochs 200
Falls back to the synthetic Cora stand-in offline.
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
    p.add_argument("--hidden", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--dropout", type=float, default=0.5)
    p.add_argument("--weight-decay", type=float, default=5e-4)
    p.add_argument("--self-loop", action="store_true", default=True)
    p.add_argument("--pallas", action="store_true",
                   help="use the Pallas gspmm fast path")
    args = p.parse_args()

    import dgl_hack_tpu as dgl
    from dgl_hack_tpu import data
    from dgl_hack_tpu.models import GCN
    from dgl_hack_tpu.models.training import train_node_classifier

    ds = {"cora": data.CoraGraphDataset,
          "citeseer": data.CiteseerGraphDataset,
          "pubmed": data.PubmedGraphDataset,
          "synth": data.synthetic_cora}[args.dataset]()
    g = ds.graph
    if args.pallas:
        g = dgl.prepare_spmm(g)
    model = GCN(hidden_feats=args.hidden, out_feats=ds.num_classes,
                dropout=args.dropout)
    res = train_node_classifier(
        model, g, ds.features, ds.labels, ds.train_mask, ds.val_mask,
        ds.test_mask, num_epochs=args.epochs, lr=args.lr,
        weight_decay=args.weight_decay, log_every=20)
    print(json.dumps({"dataset": ds.name, "test_acc": res["test_acc"],
                      "train_time_s": res["train_time_s"],
                      "epochs_per_s": res["epochs_per_s"]}))


if __name__ == "__main__":
    main()
