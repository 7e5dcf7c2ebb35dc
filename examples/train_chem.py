"""Molecular property prediction (reference: the chem model zoo's
example usage — model_zoo/chem classifiers on Tox21, SchNet/MGCN on
Alchemy).

Usage:
  python examples/train_chem.py --model gcn  --epochs 30   # Tox21 12-task
  python examples/train_chem.py --model attentivefp
  python examples/train_chem.py --model schnet             # Alchemy regr.
  python examples/train_chem.py --model mgcn
Offline container: deterministic synthetic molecules (data/chem.py).
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="gcn",
                   choices=["gcn", "gat", "attentivefp", "schnet", "mgcn",
                            "mpnn", "weave", "wln"])
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--n_mols", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=3e-3)
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.data.chem import TencentAlchemyDataset, Tox21
    from dgl_hack_tpu.models import chem

    regression = args.model in ("schnet", "mgcn", "mpnn")
    if regression:
        ds = TencentAlchemyDataset(n_mols=args.n_mols, seed=0)
        labels = (ds.labels - ds.mean) / ds.std
        mask = np.ones_like(labels)
    else:
        ds = Tox21(n_mols=args.n_mols, seed=0)
        labels, mask = ds.labels, ds.mask
    n_tasks = labels.shape[1]

    models = {
        "gcn": lambda: chem.GCNClassifier(n_tasks=n_tasks,
                                          gcn_hidden_feats=(32, 32)),
        "gat": lambda: chem.GATClassifier(n_tasks=n_tasks,
                                          gat_hidden_feats=(16, 16),
                                          num_heads=(4, 4)),
        "attentivefp": lambda: chem.AttentiveFP(
            num_layers=2, num_timesteps=2, graph_feat_size=32,
            output_size=n_tasks),
        "schnet": lambda: chem.SchNet(dim=32, n_conv=2, output_dim=n_tasks),
        "mgcn": lambda: chem.MGCN(dim=32, edge_dim=32, n_conv=2,
                                  output_dim=n_tasks),
        "mpnn": lambda: chem.MPNN(output_dim=n_tasks, node_hidden_dim=32,
                                  edge_hidden_dim=32,
                                  num_step_message_passing=3,
                                  num_step_set2set=3),
        "weave": lambda: chem.WeavePredictor(n_tasks=n_tasks,
                                             num_layers=2,
                                             hidden_feats=32),
        "wln": lambda: chem.WLNPredictor(n_tasks=n_tasks,
                                         node_out_feats=32, n_layers=2),
    }
    model = models[args.model]()

    def inputs(bg):
        if args.model in ("schnet", "mgcn"):
            return (bg, bg.ndata["atomic_number"],
                    bg.edata_internal["distance"])
        if args.model in ("weave", "wln"):
            # USER-order edge feats: the dgllife-parity layers convert
            # to internal order themselves (reference signature)
            return (bg, bg.ndata["h"], bg.edata["e"])
        if args.model in ("attentivefp", "mpnn"):
            return (bg, bg.ndata["h"], bg.edata_internal["e"])
        return (bg, bg.ndata["h"])

    bs = args.batch_size
    n_train = int(0.8 * len(ds.graphs))
    def make(lo, hi):
        out = []
        for i in range(lo, max(lo + 1, hi - bs + 1), bs):
            j = min(i + bs, hi)
            bg = dgl.batch(ds.graphs[i:j])
            out.append((bg, jnp.asarray(labels[i:j]),
                        jnp.asarray(mask[i:j])))
        return out
    train_b, test_b = make(0, n_train), make(n_train, len(ds.graphs))

    params = model.init(jax.random.PRNGKey(0), *inputs(train_b[0][0]))
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    def loss_of(p, bg, y, w):
        pred = model.apply(p, *inputs(bg))
        if regression:
            ls = (pred - y) ** 2
        else:
            ls = optax.sigmoid_binary_cross_entropy(pred, y)
        return (ls * w).sum() / jnp.maximum(w.sum(), 1.0)

    @jax.jit
    def step(p, o, bg, y, w):
        loss, grads = jax.value_and_grad(loss_of)(p, bg, y, w)
        upd, o = tx.update(grads, o, p)
        return optax.apply_updates(p, upd), o, loss

    t0 = time.perf_counter()
    for ep in range(args.epochs):
        for bg, y, w in train_b:
            params, opt_state, loss = step(params, opt_state, bg, y, w)
    train_time = time.perf_counter() - t0

    if regression:
        errs = [float(loss_of(params, *b)) for b in test_b]
        metric = {"test_mse": round(float(np.mean(errs)), 4)}
    else:
        correct = tot = 0.0
        for bg, y, w in test_b:
            pred = model.apply(params, *inputs(bg))
            hit = ((pred > 0) == (y > 0.5)) * np.asarray(w)
            correct += float(hit.sum()); tot += float(np.asarray(w).sum())
        metric = {"test_acc": round(correct / max(tot, 1.0), 4)}
    print(json.dumps({"dataset": "alchemy" if regression else "tox21",
                      "model": args.model, "epochs": args.epochs,
                      **metric, "train_time_s": round(train_time, 2)}))


if __name__ == "__main__":
    main()
