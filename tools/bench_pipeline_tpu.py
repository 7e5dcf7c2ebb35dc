"""Sampled GraphSAGE end-to-end pipeline benchmark (VERDICT r3 #4c):
host neighbor sampler -> ThreadedPrefetcher (background thread + H2D
device_put) -> jitted train step, in edges/s END TO END (sampling +
transfer + compute), padded blocks so the step compiles once.

Reference: the sampling trainer + prefetching wrapper
(examples/pytorch/graphsage/train_sampling.py, contrib/sampling/
sampler.py:44-133)."""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=500_000)
    p.add_argument("--avg-degree", type=float, default=16.0)
    p.add_argument("--feats", type=int, default=128)
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--fan-out", default="10,25")
    p.add_argument("--iters", type=int, default=60)
    p.add_argument("--no-prefetch", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.data import random_power_law_graph
    from dgl_hack_tpu.distributed.prefetch import ThreadedPrefetcher
    from dgl_hack_tpu.models import GraphSAGE
    from dgl_hack_tpu.models.training import masked_cross_entropy
    from dgl_hack_tpu.sampling import (MultiLayerNeighborSampler,
                                       NodeDataLoader)

    N, F = args.nodes, args.feats
    g = random_power_law_graph(N, avg_degree=args.avg_degree, alpha=2.1,
                               seed=0)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 16, N).astype(np.int32))
    fanouts = [int(f) for f in args.fan_out.split(",")]

    model = GraphSAGE(hidden_feats=64, out_feats=16,
                      num_layers=len(fanouts), dropout=0.0)
    sampler = MultiLayerNeighborSampler(fanouts, replace=True, pad=True,
                                        seed=0)
    train_nid = rng.permutation(N)[:args.batch_size * (args.iters + 12)]
    loader = NodeDataLoader(g, train_nid, sampler, args.batch_size,
                            drop_last=True, seed=0)
    it = iter(loader) if args.no_prefetch \
        else iter(ThreadedPrefetcher(loader, capacity=3))

    tx = optax.adam(1e-3)

    @jax.jit
    def step(params, opt_state, blocks, x, y):
        def loss_fn(p):
            logits = model.apply(p, blocks, x)
            return masked_cross_entropy(logits, y, jnp.ones(y.shape[0]))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    params = opt_state = None
    edges = 0
    nb = 0
    t0 = None
    loss = None
    for input_nodes, seeds, blocks in it:
        x = feats[jnp.asarray(input_nodes)]
        y = labels[jnp.asarray(seeds)]
        if params is None:
            key = jax.random.PRNGKey(0)
            params = model.init({"params": key, "dropout": key}, blocks, x)
            opt_state = tx.init(params)
        params, opt_state, loss = step(params, opt_state, blocks, x, y)
        nb += 1
        if nb == 10:                       # warmup: compile + queue fill
            jax.block_until_ready(loss)
            t0 = time.perf_counter()
            edges = 0
        if nb >= 10:
            edges += sum(int(b.num_edges()) for b in blocks)
        if nb >= 10 + args.iters:
            break
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "pipeline": "sampled_sage",
        "prefetch": not args.no_prefetch,
        "iters": args.iters, "batch_size": args.batch_size,
        "fanouts": fanouts,
        "sampled_edges_per_s": round(edges / dt),
        "ms_per_iter": round(dt / args.iters * 1e3, 2),
        "loss": round(float(loss), 4),
    }), flush=True)


if __name__ == "__main__":
    main()
