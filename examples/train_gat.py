"""Full-graph GAT training (reference: examples/pytorch/gat/train.py)."""
import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="cora",
                   choices=["cora", "citeseer", "pubmed", "synth"])
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--num-hidden", type=int, default=8)
    p.add_argument("--num-heads", type=int, default=8)
    p.add_argument("--num-out-heads", type=int, default=1)
    p.add_argument("--lr", type=float, default=5e-3)
    p.add_argument("--in-drop", type=float, default=0.6)
    p.add_argument("--attn-drop", type=float, default=0.6)
    p.add_argument("--weight-decay", type=float, default=5e-4)
    args = p.parse_args()

    import jax
    import dgl_hack_tpu as dgl
    from dgl_hack_tpu import data
    from dgl_hack_tpu.models import GAT
    from dgl_hack_tpu.models.training import train_node_classifier

    ds = {"cora": data.CoraGraphDataset,
          "citeseer": data.CiteseerGraphDataset,
          "pubmed": data.PubmedGraphDataset,
          "synth": data.synthetic_cora}[args.dataset]()
    g = ds.graph
    if jax.default_backend() == "tpu":
        # fused-GAT plans; bucket/flat budgets sized at the z width
        # (H*D+2H — the KERNELS.md round-3 footgun rule).  TRAINING
        # config: MIXED direction bucketing — fwd bucketed (the 17.6
        # ns/edge forward), rev chunked (src-bucketed rev plans lose 2x
        # in the coupled VJP) — with the round-5 IN-KERNEL fused
        # backward (default): measured fwd+bwd 386 (composed) -> 67.8
        # ns/edge (KERNELS.md round-5 bench_gat_vjp).
        zw = args.num_hidden * args.num_heads + 2 * args.num_heads
        # flat="auto": the flat single-kernel plan wins wherever its
        # message buffer fits (round-5 sweep: 54.3 vs 83.1 ns/edge
        # fwd+bwd at z=272); it falls back to chunked at wide z / large E
        g = dgl.prepare_spmm(g, te=256, flat_width=zw, sddmm=False,
                             flat="auto", bucket_rows="auto",
                             bucket_rows_rev=None)
    model = GAT(hidden_feats=args.num_hidden, out_feats=ds.num_classes,
                heads=(args.num_heads, args.num_out_heads),
                feat_drop=args.in_drop, attn_drop=args.attn_drop)
    res = train_node_classifier(
        model, g, ds.features, ds.labels, ds.train_mask, ds.val_mask,
        ds.test_mask, num_epochs=args.epochs, lr=args.lr,
        weight_decay=args.weight_decay, log_every=20)
    print(json.dumps({"dataset": ds.name, "test_acc": res["test_acc"],
                      "train_time_s": res["train_time_s"]}))


if __name__ == "__main__":
    main()
