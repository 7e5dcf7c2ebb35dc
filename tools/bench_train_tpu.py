"""TPU full-training-loop benchmark at the reference's headline scale.

The reference's README microbenchmark (reference: README.md:107) reports
GCN/Cora 200 epochs in 0.666 s and GAT/Cora 200 epochs in 1.399 s on a
single GPU (per-epoch GAT 0.0113 s, examples/pytorch/gat/README.md:44).
Zero-egress container -> a planted-partition graph at exactly Cora's
dims (2708 nodes, ~10.5k edges, 1433 feats, 7 classes) stands in.

The whole 200-epoch loop (fwd + bwd + adam) runs inside ONE jit via
lax.scan — the TPU-native formulation of "200 epochs"; timing uses the
two-length difference so compile/dispatch cancel (CLAUDE.md).

Run alone (one TPU process at a time):
    PYTHONPATH="$PYTHONPATH:/root/repo" python tools/bench_train_tpu.py
"""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import optax

import dgl_hack_tpu as dgl
from dgl_hack_tpu.data import planted_partition
from dgl_hack_tpu.models import GCN, GAT
from dgl_hack_tpu.models.training import masked_cross_entropy

N, E_APPROX, F, C = 2708, 10556, 1433, 7
EPOCHS = 200


def bench_model(name, model, g, feats, labels, train_mask, lr, ref_s):
    tx = optax.adam(lr)
    params = model.init(jax.random.PRNGKey(0), g, feats)
    opt0 = tx.init(params)

    @functools.partial(jax.jit, static_argnums=(3,))
    def run(params, opt_state, graph, epochs):
        def step(carry, _):
            p, o = carry
            def loss_fn(p):
                logits = model.apply(p, graph, feats)
                return masked_cross_entropy(logits, labels, train_mask)
            loss, grads = jax.value_and_grad(loss_fn)(p)
            upd, o = tx.update(grads, o, p)
            return (optax.apply_updates(p, upd), o), loss
        (p, o), losses = jax.lax.scan(step, (params, opt_state), None,
                                      length=epochs)
        return losses[-1]

    def timed(k):
        float(run(params, opt0, g, k))       # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(params, opt0, g, k))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (timed(EPOCHS + 20) - timed(20)) / EPOCHS * EPOCHS
    final_loss = float(run(params, opt0, g, EPOCHS))
    print(json.dumps({
        "model": name, "epochs": EPOCHS, "time_s": round(dt, 4),
        "ref_gpu_s": ref_s, "speedup_vs_ref": round(ref_s / dt, 2),
        "final_loss": round(final_loss, 4)}))


def main():
    print("backend:", jax.default_backend(), jax.devices()[0])
    ds = planted_partition(N, C, F, avg_degree=E_APPROX / N * 2, seed=0,
                           train_per_class=20, num_val=500, num_test=1000)
    g = dgl.prepare_spmm(ds.graph, te=256)
    feats = jnp.asarray(ds.features)
    labels = jnp.asarray(ds.labels)
    train_mask = jnp.asarray(ds.train_mask)
    print(f"graph: {g.num_nodes()} nodes, {g.num_edges()} edges, F={F}")

    bench_model("GCN", GCN(hidden_feats=16, out_feats=C, dropout=0.0),
                g, feats, labels, train_mask, 1e-2, 0.666)
    bench_model("GAT",
                GAT(hidden_feats=8, out_feats=C, heads=(8, 1),
                    feat_drop=0.0, attn_drop=0.0),
                g, feats, labels, train_mask, 5e-3, 1.399)


if __name__ == "__main__":
    main()
