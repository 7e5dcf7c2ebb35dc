"""Multi-chip spatial (graph-partitioned) GCN training over a device mesh
with halo exchange (the distributed path; reference analogue:
apps/kg/distributed + contrib/graph_store.py workers).

On a CPU machine run with:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/train_spatial.py --parts 8
On a pod slice, jax.distributed picks up real chips (see
dgl_hack_tpu.distributed.initialize_from_env).
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--parts", type=int, default=8)
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--hidden", type=int, default=32)
    p.add_argument("--nodes", type=int, default=4000)
    p.add_argument("--method", default="fennel")
    p.add_argument("--lr", type=float, default=1e-2)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import Mesh

    from dgl_hack_tpu.data import planted_partition
    from dgl_hack_tpu.distributed import initialize_from_env
    from dgl_hack_tpu.parallel import (build_spatial_plan, shard_features,
                                       unshard_rows, make_spatial_gcn,
                                       spatial_train_step)

    initialize_from_env()
    devs = jax.devices()[:args.parts]
    mesh = Mesh(np.asarray(devs), ("node",))

    ds = planted_partition(args.nodes, 6, 64, avg_degree=8.0,
                           homophily=0.88, feat_noise=1.5, seed=0,
                           train_per_class=40, num_val=300, num_test=600)
    plan = build_spatial_plan(ds.graph, args.parts, method=args.method)
    dev = plan.device_arrays()
    init, forward = make_spatial_gcn(plan, mesh, hidden=args.hidden,
                                     out_feats=ds.num_classes)
    params = init(jax.random.PRNGKey(0), ds.features.shape[1])
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)
    step = spatial_train_step(forward, tx)

    xs = jnp.asarray(shard_features(plan, ds.features))
    labels = jnp.asarray(shard_features(plan, ds.labels))
    tmask = jnp.asarray(shard_features(plan, ds.train_mask))

    with mesh:
        t0 = time.perf_counter()
        for epoch in range(args.epochs):
            params, opt_state, loss = step(params, opt_state, xs, dev,
                                           labels, tmask)
        jax.block_until_ready(loss)
        dt = time.perf_counter() - t0
        logits = forward(params, xs, dev)
    out = unshard_rows(plan, np.asarray(logits), args.nodes)
    pred = out.argmax(-1)
    acc = float((pred[ds.test_mask] == ds.labels[ds.test_mask]).mean())
    print(json.dumps({"parts": args.parts, "test_acc": acc,
                      "train_time_s": dt, "loss": float(loss)}))


if __name__ == "__main__":
    main()
