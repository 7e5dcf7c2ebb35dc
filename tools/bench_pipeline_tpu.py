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
    p.add_argument("--pool", type=int, default=0,
                   help="feed from N SamplerPool workers (each with its "
                        "own seed shard + sampler) instead of one "
                        "prefetch thread")
    p.add_argument("--profile", action="store_true",
                   help="decompose one iteration: sample_neighbors / "
                        "to_block+pad / H2D / device step")
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

    if args.profile:
        _profile(args, g, train_nid, fanouts, feats, labels, model)
        return

    if args.pool:
        from dgl_hack_tpu.distributed.prefetch import PooledPrefetcher
        shards = np.array_split(train_nid, args.pool)

        def make_loader(i):
            return NodeDataLoader(
                g, shards[i],
                MultiLayerNeighborSampler(fanouts, replace=True, pad=True,
                                          seed=1000 + i),
                args.batch_size, drop_last=True, seed=i)

        it = iter(PooledPrefetcher(make_loader, num_workers=args.pool,
                                   capacity=4))
    elif args.no_prefetch:
        it = iter(loader)
    else:
        it = iter(ThreadedPrefetcher(loader, capacity=3))

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
        "pool_workers": args.pool,
        "iters": args.iters, "batch_size": args.batch_size,
        "fanouts": fanouts,
        "sampled_edges_per_s": round(edges / dt),
        "ms_per_iter": round(dt / args.iters * 1e3, 2),
        "loss": round(float(loss), 4),
    }), flush=True)


def _profile(args, g, train_nid, fanouts, feats, labels, model):
    """Stage decomposition of one pipeline iteration (VERDICT r4 #4):
    sample_neighbors chain / to_block+pad / H2D / device step, each
    timed over K batches.  Host stages run on the trainer thread; the
    end-to-end number overlaps them with the device step."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from dgl_hack_tpu.models.training import masked_cross_entropy
    from dgl_hack_tpu.sampling import MultiLayerNeighborSampler
    from dgl_hack_tpu.sampling.neighbor import sample_neighbors

    K = 20
    bs = args.batch_size
    rng = np.random.default_rng(1)
    batches = [train_nid[rng.integers(0, len(train_nid), bs)]
               for _ in range(K)]
    sampler = MultiLayerNeighborSampler(fanouts, replace=True, pad=True,
                                        seed=0)

    # stage 1: the raw neighbor-sampling chain (no to_block)
    srng = np.random.default_rng(0)
    t0 = time.perf_counter()
    for b in batches:
        cur = np.asarray(b, np.int32)
        for fanout in reversed(fanouts):
            frontier, eids = sample_neighbors(g, cur, fanout, replace=True,
                                              rng=srng)
            cur = np.unique(frontier.host("src"))  # stand-in frontier walk
    t_sample = (time.perf_counter() - t0) / K

    # stage 2: full sample_blocks (sampling + to_block + pad)
    t0 = time.perf_counter()
    samples = [sampler.sample_blocks(g, b) for b in batches]
    t_blocks = (time.perf_counter() - t0) / K

    # stage 3: H2D of one sample's arrays (block src/dst/mask + ids)
    def put(s):
        blocks, inp, seeds = s
        out = jax.tree_util.tree_map(
            lambda a: jax.device_put(a) if hasattr(a, "shape") else a,
            (blocks, inp, seeds))
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        return out
    put(samples[0])                                   # warm path
    t0 = time.perf_counter()
    dev_samples = [put(s) for s in samples]
    t_h2d = (time.perf_counter() - t0) / K

    # stage 4: device step on one cached batch (two-length loop diff)
    tx = optax.adam(1e-3)
    blocks, inp, seeds = dev_samples[0]
    x = feats[jnp.asarray(inp)]
    y = labels[jnp.asarray(seeds)]
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, blocks, x)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, blocks, x, y):
        def loss_fn(p):
            logits = model.apply(p, blocks, x)
            return masked_cross_entropy(logits, y, jnp.ones(y.shape[0]))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    def run_steps(k):
        p_, o_ = params, opt_state
        loss = None
        for _ in range(k):
            p_, o_, loss = step(p_, o_, blocks, x, y)
        jax.block_until_ready(loss)

    run_steps(2)                                      # compile + warm
    t0 = time.perf_counter()
    run_steps(2)
    t2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    run_steps(12)
    t12 = time.perf_counter() - t0
    t_step = (t12 - t2) / 10

    e_per = sum(int(b.num_edges()) for b in samples[0][0])
    print(json.dumps({
        "profile": "pipeline_stages", "batch_size": bs,
        "fanouts": fanouts, "edges_per_batch": e_per,
        "sample_neighbors_ms": round(t_sample * 1e3, 2),
        "sample_blocks_ms": round(t_blocks * 1e3, 2),
        "to_block_pad_ms": round((t_blocks - t_sample) * 1e3, 2),
        "h2d_ms": round(t_h2d * 1e3, 2),
        "device_step_ms": round(t_step * 1e3, 2),
        "host_total_ms": round((t_blocks + t_h2d) * 1e3, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
