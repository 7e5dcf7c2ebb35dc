"""Sampling tests (counterpart of reference tests/compute/test_sampling.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dgl_hack_tpu as dgl
from dgl_hack_tpu.sampling import (
    sample_neighbors, MultiLayerNeighborSampler, NodeDataLoader, random_walk,
    ChunkedNegativeSampler,
)


@pytest.fixture
def g(rng):
    src = rng.integers(0, 50, 400).astype(np.int32)
    dst = rng.integers(0, 50, 400).astype(np.int32)
    return dgl.graph((src, dst), num_nodes=50)


def test_sample_neighbors_all(g):
    frontier, eids = sample_neighbors(g, [3, 7], -1)
    s, d = (np.asarray(x) for x in frontier.edges(order="eid"))
    assert set(d.tolist()) <= {3, 7}
    deg = np.asarray(g.in_degrees())
    assert len(s) == deg[3] + deg[7]
    # sampled edges exist in the original graph
    gs, gd = (np.asarray(x) for x in g.edges(order="eid"))
    for e, (ss, dd) in zip(eids, zip(s, d)):
        assert gs[e] == ss and gd[e] == dd


@pytest.mark.parametrize("replace", [True, False])
def test_sample_neighbors_fanout(g, replace):
    frontier, eids = sample_neighbors(g, np.arange(10), 5, replace=replace)
    s, d = (np.asarray(x) for x in frontier.edges(order="eid"))
    deg = np.asarray(g.in_degrees())
    for v in range(10):
        cnt = (d == v).sum()
        if replace:
            assert cnt == (5 if deg[v] > 0 else 0)
        else:
            assert cnt == min(5, deg[v])


def test_multilayer_sampler(g):
    sampler = MultiLayerNeighborSampler([3, 3], replace=True, seed=0)
    seeds = np.array([0, 1, 2, 3], np.int32)
    blocks, input_nodes, out_seeds = sampler.sample_blocks(g, seeds)
    assert len(blocks) == 2
    # innermost block's dst are the seeds
    assert blocks[-1].num_dst_nodes == 4
    # static padded shapes
    assert blocks[-1].num_edges() == 4 * 3
    # chained: block0's dst count == block1's src size
    assert blocks[0].num_dst_nodes == blocks[1].num_src_nodes


def test_dataloader_end_to_end(g, rng):
    """Minibatch GraphSAGE forward through sampled blocks (the
    reference's train_sampling.py workflow)."""
    import dgl_hack_tpu.nn as gnn
    from dgl_hack_tpu.models import GraphSAGE
    feats = jnp.asarray(rng.normal(size=(50, 8)).astype(np.float32))
    sampler = MultiLayerNeighborSampler([4, 4], replace=True, seed=0)
    loader = NodeDataLoader(g, np.arange(50), sampler, batch_size=16,
                            seed=0)
    model = GraphSAGE(hidden_feats=16, out_feats=3)
    n_batches = 0
    params = None
    for input_nodes, seeds, blocks in loader:
        x = feats[jnp.asarray(input_nodes)]
        if params is None:
            params = model.init(jax.random.PRNGKey(0), blocks, x)
        out = model.apply(params, blocks, x)
        assert out.shape == (16, 3)
        n_batches += 1
    assert n_batches == len(loader) == 4


def test_random_walk(g):
    traces = random_walk(g, [0, 1, 2], length=5)
    assert traces.shape == (3, 6)
    s, d = (np.asarray(x) for x in g.edges(order="eid"))
    pairs = set(zip(s.tolist(), d.tolist()))
    for row in traces:
        for a, b in zip(row[:-1], row[1:]):
            if b < 0:
                break
            assert (a, b) in pairs


def test_negative_sampler():
    ns = ChunkedNegativeSampler(neg_sample_size=8, chunk_size=4, seed=0)
    neg = ns.sample(num_pos=10, num_nodes=100)
    assert neg.shape == (3, 8)
    assert neg.max() < 100


def test_nodeflow_compat(g, rng):
    """Legacy NodeFlow API over sampled blocks (reference:
    tests/compute/test_nodeflow.py patterns)."""
    from dgl_hack_tpu import fn
    from dgl_hack_tpu.sampling.nodeflow import NodeFlow
    sampler = MultiLayerNeighborSampler([3, 3], replace=True, pad=False,
                                        seed=0)
    nf = NodeFlow.from_sampler(g, np.arange(6), sampler)
    assert nf.num_blocks == 2
    assert nf.num_layers == 3
    assert nf.layer_size(2) == 6
    feats = rng.normal(size=(50, 4)).astype(np.float32)
    nf.copy_from_parent({"h": feats})
    nf.prop_flow(fn.copy_u("h", "m"), fn.sum("m", "h"))
    out = nf.layers(2)["h"]
    assert out.shape == (6, 4)
    assert np.all(np.isfinite(np.asarray(out)))

    # --- deep API surface (reference: nodeflow.py 237-1054) ---
    # local/parent id maps round-trip
    lid = nf.layer_nid(1)
    assert lid[0] == nf.layer_size(0)
    pn = nf.layer_parent_nid(1)
    np.testing.assert_array_equal(nf.map_to_parent_nid(lid), pn)
    back = nf.map_from_parent_nid(1, pn[:3])
    np.testing.assert_array_equal(back, lid[:3])
    # block structure queries
    assert nf.block_size(0) == nf.blocks[0].num_edges()
    bs, bd = nf.block_edges(0)
    assert len(np.asarray(bs)) == nf.blocks[0].num_edges()
    assert nf.block_parent_eid(0).shape[0] == nf.blocks[0].num_edges()
    assert nf.block_parent_eid(0).max() < g.num_edges()
    # apply_layer / apply_block
    nf.apply_layer(2, lambda b: {"h": b.data["h"] * 2.0})
    assert np.allclose(np.asarray(nf.layers(2)["h"]),
                       np.asarray(out) * 2.0)
    nf.apply_block(1, fn.copy_u("h", "m"))
    assert "m" in nf.blocks[1]._edge_frame
    # copy_to_parent writes the seed layer back at parent positions
    parent = {"h": np.zeros((50, 4), np.float32)}
    updated = nf.copy_to_parent(parent)
    got = np.asarray(updated["h"])[np.asarray(nf.layer_parent_nid(2))]
    np.testing.assert_allclose(got, np.asarray(nf.layers(2)["h"]))


def test_weighted_sampling_bias(g, rng):
    """prob-weighted sampling must prefer high-probability edges
    (reference: WeightedEdgeSampler semantics, src/graph/sampler.cc:1630)."""
    E = g.num_edges()
    s, d = g.host_edges()
    prob = np.where(s % 2 == 0, 10.0, 0.1).astype(np.float32)
    counts = np.zeros(2)
    for t in range(30):
        frontier, eids = sample_neighbors(
            g, np.arange(50), 2, replace=False, prob=prob,
            rng=np.random.default_rng(t))
        fs, _ = frontier.host_edges()
        counts[0] += (fs % 2 == 0).sum()
        counts[1] += (fs % 2 == 1).sum()
    assert counts[0] > 3 * counts[1], counts


def test_weighted_sampling_with_replacement(g, rng):
    """Weighted + replace path (inverse-CDF over per-seed weight prefix
    sums; reference: ArrayHeap sampling, src/graph/sampler.cc:28)."""
    s, d = g.host_edges()
    prob = np.where(s % 2 == 0, 10.0, 0.1).astype(np.float32)
    counts = np.zeros(2)
    for t in range(30):
        frontier, eids = sample_neighbors(
            g, np.arange(50), 3, replace=True, prob=prob,
            rng=np.random.default_rng(t))
        fs, fd = frontier.host_edges()
        counts[0] += (fs % 2 == 0).sum()
        counts[1] += (fs % 2 == 1).sum()
        # sampled edges must be real edges of g with matching endpoints
        assert np.all(s[eids] == fs) and np.all(d[eids] == fd)
    assert counts[0] > 3 * counts[1], counts


def test_graph_dataloader(rng):
    from dgl_hack_tpu.data import sbm_mixture
    from dgl_hack_tpu.sampling import GraphDataLoader
    ds = sbm_mixture(num_graphs=30, nodes_per_graph=10, seed=0)
    loader = GraphDataLoader(ds.graphs, ds.features, ds.labels,
                             batch_size=10, seed=0)
    n = 0
    for bg, x, y in loader:
        assert bg.batch_num_nodes == (10,) * 10
        assert x.shape[0] == 100
        assert y.shape == (10,)
        n += 1
    assert n == 3


def test_select_topk(g, rng):
    from dgl_hack_tpu.sampling import select_topk
    E = g.num_edges()
    w = rng.normal(size=E).astype(np.float32)
    frontier, eids = select_topk(g, 3, w)
    s, d = frontier.host_edges()
    gs, gd = g.host_edges()
    deg = np.asarray(g.in_degrees())
    for v in range(g.num_nodes()):
        cnt = (d == v).sum()
        assert cnt == min(3, deg[v])
        if deg[v] > 3:
            # kept weights are the top-3
            kept = np.sort(w[eids[d == v]])
            allw = np.sort(w[np.nonzero(gd == v)[0]])
            np.testing.assert_allclose(kept, allw[-3:], rtol=1e-6)


def test_layer_sampler(g, rng):
    from dgl_hack_tpu.sampling import sample_layer_neighbors
    frontier, eids = sample_layer_neighbors(
        g, np.arange(10), layer_size=8, rng=np.random.default_rng(0))
    s, d = frontier.host_edges()
    assert len(np.unique(s)) <= 8
    assert set(np.unique(d).tolist()) <= set(range(10))


def test_edge_sampler(g):
    from dgl_hack_tpu.sampling import EdgeSampler
    it = EdgeSampler(g, batch_size=64, neg_sample_size=8, chunk_size=16,
                     seed=0)
    batches = list(it)
    assert len(batches) == g.num_edges() // 64
    b = batches[0]
    assert b["src"].shape == (64,) and b["neg"].shape == (4, 8)
    gs, gd = g.host_edges()
    np.testing.assert_array_equal(gs[b["eid"]], b["src"])


def test_random_walk_with_restart(g, rng):
    from dgl_hack_tpu.sampling import random_walk_with_restart
    seeds = [0, 3, 5]
    traces = random_walk_with_restart(g, seeds, restart_prob=0.3,
                                      max_nodes_per_seed=6,
                                      rng=np.random.default_rng(0))
    assert len(traces) == 3
    src, dst = g.host_edges()
    adj = {}
    for s, d in zip(src, dst):
        adj.setdefault(int(s), set()).add(int(d))
    for seed, tr in zip(seeds, traces):
        assert tr[0] == seed
        assert len(set(tr.tolist())) == len(tr)      # distinct nodes
        assert len(tr) <= 6
        reach = set(tr.tolist()) - {seed}
        # every visited node reachable from the visited set
        allowed = set()
        for v in tr.tolist():
            allowed |= adj.get(v, set())
        assert reach <= allowed | {seed}


def test_metapath_random_walk_and_pack(rng):
    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.sampling import metapath_random_walk, pack_traces
    hg = dgl.heterograph({
        ("user", "view", "item"): ([0, 0, 1, 2, 3, 3], [0, 1, 1, 2, 2, 1]),
        ("item", "viewed-by", "user"): ([0, 1, 1, 2, 2, 1],
                                        [0, 0, 1, 2, 3, 3]),
    })
    traces, types = metapath_random_walk(
        hg, ["view", "viewed-by"] * 2, [0, 1, 2],
        rng=np.random.default_rng(0))
    assert traces.shape == (3, 5)
    # alternating types user(=index of 'user') item ...
    ntypes = list(hg.ntypes)
    assert types.tolist() == [ntypes.index("user"), ntypes.index("item"),
                              ntypes.index("user"), ntypes.index("item"),
                              ntypes.index("user")]
    assert (traces[:, 0] == [0, 1, 2]).all()
    vids, tys, lengths, offsets = pack_traces(traces, types)
    assert vids.shape == tys.shape
    assert lengths.sum() == len(vids)
    assert (vids >= 0).all()
    assert offsets[0] == 0 and (np.diff(offsets) == lengths[:-1]).all()


def test_pinsage_sampler(rng):
    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.sampling import PinSAGESampler
    nu, ni = 12, 8
    u = rng.integers(0, nu, 60).astype(np.int32)
    v = rng.integers(0, ni, 60).astype(np.int32)
    hg = dgl.heterograph({
        ("user", "likes", "item"): (u, v),
        ("item", "liked-by", "user"): (v, u),
    })
    sampler = PinSAGESampler(hg, "user", "item", random_walk_length=2,
                             random_walk_restart_prob=0.2,
                             num_random_walks=20, num_neighbors=3, seed=0)
    seeds = np.array([0, 1, 2])
    g = sampler(seeds)
    assert g.num_nodes() == nu
    s, d = (np.asarray(x) for x in g.edges(order="eid"))
    assert set(d.tolist()).issubset(set(seeds.tolist()))
    # each seed gets at most num_neighbors neighbors, weighted by visits
    for sd in seeds:
        assert (d == sd).sum() <= 3
    w = np.asarray(g.edata["weights"])
    assert (w >= 1).all()


def test_native_sampler_edge_cases():
    """Direct edge-case drive of the native OpenMP sampler
    (native/fastgraph.cpp rowwise_sample[_replace]) — zero-degree seeds,
    fanout far above max degree, fanout equal to degree, empty seed set
    (VERDICT r1: native kernels had no direct edge-case coverage)."""
    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.native import get_lib, rowwise_sample_native
    if get_lib() is None:
        pytest.skip("native lib unavailable")
    # graph: node 0 isolated; node 1 degree 1; node 2 degree 5
    src = np.array([3, 4, 5, 6, 7, 8], np.int32)
    dst = np.array([1, 2, 2, 2, 2, 2], np.int32)
    g = dgl.graph((src, dst), num_nodes=9)
    csc = g.host("csc_indptr")
    s_int = g.host("src")

    for replace in (False, True):
        for fanout in (1, 5, 100):
            res = rowwise_sample_native(csc, s_int,
                                        np.array([0, 1, 2], np.int64),
                                        fanout, replace, seed=7)
            assert res is not None
            pos, counts = res
            # zero-degree seed contributes nothing
            assert counts[0] == 0
            assert counts[1] == (1 if not replace else fanout)
            assert counts[2] == (min(fanout, 5) if not replace else fanout)
            assert pos.shape[0] == counts.sum()
            # positions are valid in-edge slots of the right dst
            dsts = np.repeat(np.array([0, 1, 2]), counts)
            assert np.all(pos >= csc[dsts]) and np.all(pos < csc[dsts + 1])
            if not replace and fanout >= 5:
                # without replacement at full degree: a permutation
                assert len(set(pos[counts[0] + counts[1]:].tolist())) == \
                    counts[2]

    # empty seed set
    res = rowwise_sample_native(csc, s_int, np.zeros(0, np.int64), 3,
                                False, seed=1)
    assert res is not None
    pos, counts = res
    assert pos.shape[0] == 0 and counts.shape[0] == 0


def test_native_sampler_matches_api_fallback():
    """sample_neighbors with the native path off vs on: same distribution
    support (every returned edge is a real in-edge of its seed)."""
    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.native import get_lib
    if get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(0)
    src = rng.integers(0, 100, 800).astype(np.int32)
    dst = rng.integers(0, 100, 800).astype(np.int32)
    g = dgl.graph((src, dst), num_nodes=100)
    s, d = g.host_edges()
    frontier, eids = sample_neighbors(g, np.arange(100), 4, replace=True,
                                      rng=np.random.default_rng(1))
    fs, fd = frontier.host_edges()
    assert np.all(s[eids] == fs) and np.all(d[eids] == fd)


def test_native_sampler_deterministic_per_row():
    """Same (graph, seeds, seed) => identical sample, independent of OpenMP
    scheduling: the native sampler draws from a counter-based stream keyed
    on (seed, row position), not per-thread streams (which made results
    depend on thread count/schedule and broke cross-process reproduction
    in the shared-graph sampler workers)."""
    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.native import get_lib, rowwise_sample_native
    if get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(3)
    src = rng.integers(0, 500, 8000).astype(np.int32)
    dst = rng.integers(0, 500, 8000).astype(np.int32)
    g = dgl.graph((src, dst), num_nodes=500)
    csc, s_int = g.host("csc_indptr"), g.host("src")
    seeds = np.arange(500, dtype=np.int64)
    for replace in (False, True):
        a = rowwise_sample_native(csc, s_int, seeds, 4, replace, seed=99)
        b = rowwise_sample_native(csc, s_int, seeds, 4, replace, seed=99)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])
        c = rowwise_sample_native(csc, s_int, seeds, 4, replace, seed=98)
        assert not np.array_equal(a[0], c[0])  # seed actually matters


def test_pooled_prefetcher(g, rng):
    """PooledPrefetcher merges N workers' loader shards into one stream:
    every seed's batch arrives exactly once, items are fully formed
    (blocks usable in a model forward), and worker errors propagate."""
    from dgl_hack_tpu.distributed.prefetch import PooledPrefetcher

    nids = np.arange(50)
    shards = np.array_split(nids, 3)

    def make_loader(i):
        return NodeDataLoader(
            g, shards[i],
            MultiLayerNeighborSampler([4], replace=True, seed=100 + i),
            batch_size=8, drop_last=False, seed=i)

    seen = []
    for input_nodes, seeds, blocks in PooledPrefetcher(
            make_loader, num_workers=3, capacity=2):
        assert blocks[0].num_dst_nodes == len(seeds)
        seen.append(np.asarray(seeds))
    # every shard's loader pads its final partial batch with repeats —
    # the UNION of seeds must cover all nids
    got = np.unique(np.concatenate(seen))
    assert np.array_equal(got, nids)

    def bad_loader(i):
        def gen():
            yield from make_loader(i)
            if i == 1:
                raise RuntimeError("worker boom")
        return gen()

    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="worker boom"):
        for _ in PooledPrefetcher(bad_loader, num_workers=3):
            pass
