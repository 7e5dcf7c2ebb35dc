"""Transform tests (counterpart of reference tests/compute/test_transform.py)."""
import numpy as np
import pytest

import dgl_hack_tpu as dgl


@pytest.fixture
def g(rng):
    src = np.array([0, 1, 2, 3, 3], np.int32)
    dst = np.array([1, 2, 3, 4, 0], np.int32)
    return dgl.graph((src, dst), num_nodes=5)


def test_khop(g):
    g2 = dgl.khop_graph(g, 2)
    s, d = (np.asarray(x) for x in g2.edges(order="eid"))
    pairs = set(zip(s.tolist(), d.tolist()))
    assert (0, 2) in pairs and (1, 3) in pairs
    assert (0, 1) not in pairs


def test_line_graph(g):
    lg = dgl.line_graph(g)
    assert lg.num_nodes() == g.num_edges()
    s, d = (np.asarray(x) for x in lg.edges(order="eid"))
    # edge0 (0->1) connects to edge1 (1->2)
    assert (0, 1) in set(zip(s.tolist(), d.tolist()))


def test_self_loops(g):
    g2 = dgl.add_self_loop(g)
    assert g2.num_edges() == g.num_edges() + 5
    g3 = dgl.remove_self_loop(g2)
    assert g3.num_edges() == g.num_edges()


def test_to_bidirected(g):
    bg = dgl.to_bidirected(g)
    din = np.asarray(bg.in_degrees())
    dout = np.asarray(bg.out_degrees())
    np.testing.assert_array_equal(din, dout)


def test_to_simple(rng):
    g = dgl.graph(([0, 0, 0, 1], [1, 1, 2, 2]), num_nodes=3)
    sg, counts = dgl.to_simple(g, return_counts=True)
    assert sg.num_edges() == 3
    assert sorted(counts.tolist()) == [1, 1, 2]


def test_remove_edges(g):
    g2 = dgl.remove_edges(g, [0, 2])
    assert g2.num_edges() == 3


def test_node_subgraph(g):
    sub, nodes, eids = dgl.node_subgraph(g, [0, 1, 2])
    assert sub.num_nodes() == 3
    assert sub.num_edges() == 2  # 0->1, 1->2


def test_in_out_subgraph(g):
    sub, _, eids = dgl.in_subgraph(g, [0])
    assert sub.num_edges() == 1
    sub, _, eids = dgl.out_subgraph(g, [3])
    assert sub.num_edges() == 2


def test_compact(rng):
    b = dgl.block(([5, 7], [0, 1]), num_src=10, num_dst=3)
    (cb,), src_ids, dst_ids = dgl.compact_graphs([b])
    assert cb.num_src_nodes == 2
    assert cb.num_dst_nodes <= 3
    np.testing.assert_array_equal(src_ids, [5, 7])


def test_to_block(rng):
    src = np.array([4, 5, 6, 4], np.int32)
    dst = np.array([0, 0, 1, 1], np.int32)
    frontier = dgl.graph((src, dst), num_nodes=10)
    blk, src_ids, dst_ids = dgl.to_block(frontier, np.array([0, 1]))
    assert blk.is_block
    assert blk.num_dst_nodes == 2
    # dst nodes first in src ordering (DGL convention)
    np.testing.assert_array_equal(src_ids[:2], [0, 1])
    assert set(src_ids.tolist()) == {0, 1, 4, 5, 6}


def test_to_block_padded(rng):
    src = np.array([4, 5], np.int32)
    dst = np.array([0, 1], np.int32)
    frontier = dgl.graph((src, dst), num_nodes=8)
    blk, src_ids, _ = dgl.to_block(frontier, np.array([0, 1]),
                                   pad_num_src=8, pad_num_edges=6)
    assert blk.num_src_nodes == 8
    assert blk.num_edges() == 6
    assert np.asarray(blk.edge_mask).sum() == 2


def test_knn(rng):
    x = rng.normal(size=(20, 3))
    g = dgl.knn_graph(x, 4)
    np.testing.assert_array_equal(np.asarray(g.in_degrees()), 4)


def test_reorder_graph(rng):
    src = rng.integers(0, 50, 300).astype(np.int32)
    dst = rng.integers(0, 50, 300).astype(np.int32)
    g = dgl.graph((src, dst), num_nodes=50)
    g2, ids = dgl.reorder_graph(g, "degree")
    deg = np.asarray(g2.in_degrees())
    assert (np.diff(deg) <= 0).all()
    import jax.numpy as jnp
    x = rng.normal(size=(50, 4)).astype(np.float32)
    out1 = np.asarray(dgl.gspmm(g, "copy_lhs", "sum", jnp.asarray(x)))
    out2 = np.asarray(dgl.gspmm(g2, "copy_lhs", "sum",
                                jnp.asarray(x[ids])))
    np.testing.assert_allclose(out2, out1[ids], rtol=1e-5)


def test_laplacian_lambda_max(g):
    vals = dgl.laplacian_lambda_max(dgl.to_bidirected(g))
    assert len(vals) == 1
    assert 0.0 < vals[0] <= 2.0 + 1e-5


def test_laplacian_lambda_max_batched():
    g1 = dgl.to_bidirected(dgl.graph(([0, 1], [1, 2]), num_nodes=3))
    g2 = dgl.to_bidirected(dgl.graph(([0, 1, 2, 3], [1, 2, 3, 0]),
                                     num_nodes=4))
    bg = dgl.batch([g1, g2])
    vals = dgl.laplacian_lambda_max(bg)
    singles = (dgl.laplacian_lambda_max(g1)[0],
               dgl.laplacian_lambda_max(g2)[0])
    assert np.allclose(vals, singles, atol=1e-4)


def test_networkx_roundtrip():
    import networkx as nx
    nxg = nx.DiGraph([(0, 1), (1, 2), (2, 0), (2, 3)])
    g = dgl.from_networkx(nxg)
    assert g.num_nodes() == 4 and g.num_edges() == 4
    back = dgl.to_networkx(g)
    assert set(back.edges()) == set(nxg.edges())
    # undirected source: both directions materialize
    und = dgl.from_networkx(nx.Graph([(0, 1), (1, 2)]))
    assert und.num_edges() == 4
    s, d = (np.asarray(x) for x in und.edges(order="eid"))
    assert (1, 0) in set(zip(s.tolist(), d.tolist()))


def test_networkx_attrs():
    import networkx as nx
    nxg = nx.DiGraph()
    nxg.add_node(0, h=np.array([1.0, 2.0]))
    nxg.add_node(1, h=np.array([3.0, 4.0]))
    nxg.add_edge(0, 1, w=np.float32(0.5))
    g = dgl.from_networkx(nxg, node_attrs=["h"], edge_attrs=["w"])
    assert np.allclose(np.asarray(g.ndata["h"]), [[1, 2], [3, 4]])
    assert np.allclose(np.asarray(g.edata["w"]), [0.5])


def test_to_heterogeneous_roundtrip():
    hg = dgl.heterograph({
        ("user", "follows", "user"): ([0, 1], [1, 2]),
        ("user", "plays", "game"): ([0, 2], [0, 1]),
    })
    homo, info = dgl.to_homogeneous(hg)
    homo.ndata["_TYPE"] = info["node_types"]
    homo.edata["_TYPE"] = info["edge_types"]
    etype_names = [c[1] for c in info["etypes"]]
    hg2 = dgl.to_heterogeneous(homo, info["ntypes"], etype_names)
    assert set(hg2.ntypes) == set(hg.ntypes)
    assert hg2.num_nodes("user") == 3 and hg2.num_nodes("game") == 2
    for cet in hg.canonical_etypes:
        s0, d0 = (np.asarray(x) for x in hg.relations[cet].edges(order="eid"))
        s1, d1 = (np.asarray(x) for x in hg2.relations[cet].edges(order="eid"))
        assert sorted(zip(s0.tolist(), d0.tolist())) == \
            sorted(zip(s1.tolist(), d1.tolist()))
    # original ids preserved
    uid = np.asarray(hg2.nodes_data("user")["_ID"])
    assert uid.shape == (3,)


def test_to_heterogeneous_features():
    g = dgl.graph(([0, 1, 0], [1, 2, 3]), num_nodes=4)
    g.ndata["_TYPE"] = np.array([0, 0, 1, 1], np.int32)
    g.edata["_TYPE"] = np.array([0, 1, 1], np.int32)
    g.ndata["h"] = np.arange(8, dtype=np.float32).reshape(4, 2)
    hg = dgl.to_heterogeneous(g, ["a", "b"], ["e0", "e1"])
    assert hg.num_nodes("a") == 2 and hg.num_nodes("b") == 2
    assert ("a", "e1", "b") in hg.canonical_etypes
    # node features split per type, preserving original order
    ha = np.asarray(hg.nodes_data("a")["h"])
    hb = np.asarray(hg.nodes_data("b")["h"])
    assert np.allclose(ha, [[0, 1], [2, 3]])
    assert np.allclose(hb, [[4, 5], [6, 7]])
    # local edge endpoints remapped: 1->2 becomes a1 -> b0
    s, d = (np.asarray(x)
            for x in hg.relations[("a", "e1", "b")].edges(order="eid"))
    assert sorted(zip(s.tolist(), d.tolist())) == [(0, 1), (1, 0)]


def test_khop_adj(g):
    a1 = dgl.khop_adj(g, 1)
    s, d = (np.asarray(x) for x in g.edges(order="eid"))
    dense = np.zeros((5, 5), np.float32)
    for u, v in zip(s, d):
        dense[v, u] += 1
    assert np.allclose(a1, dense)
    assert np.allclose(dgl.khop_adj(g, 2), dense @ dense)


def test_segmented_knn_graph():
    rng = np.random.default_rng(0)
    x = rng.random((12, 3))
    g = dgl.segmented_knn_graph(x, k=2, segs=[5, 7])
    s, d = (np.asarray(v) for v in g.edges(order="eid"))
    # no edges cross the segment boundary
    assert np.all((s < 5) == (d < 5))
    assert g.num_edges() == 12 * 2


def test_hetero_from_relations():
    r1 = dgl.bipartite(([0, 1], [1, 2]), "user", "follows", "user")
    r2 = dgl.bipartite(([0, 2], [0, 1]), "user", "plays", "game")
    hg = dgl.hetero_from_relations([r1, r2])
    assert set(hg.etypes) == {"follows", "plays"}
    assert hg.num_nodes("user") == 3 and hg.num_nodes("game") == 2


def test_metapath_reachable_graph():
    hg = dgl.heterograph({
        ("user", "plays", "game"): ([0, 1, 2], [0, 0, 1]),
        ("game", "played_by", "user"): ([0, 0, 1], [0, 1, 2]),
    })
    g = dgl.metapath_reachable_graph(hg, ["plays", "played_by"])
    s, d = (np.asarray(x) for x in g.edges(order="eid"))
    pairs = set(zip(s.tolist(), d.tolist()))
    # users 0,1 share game 0; user 2 only reaches itself via game 1
    assert (0, 1) in pairs and (1, 0) in pairs and (2, 2) in pairs
    assert (0, 2) not in pairs


def test_dfs_labeled_edges():
    from dgl_hack_tpu.core.traversal import dfs_labeled_edges_generator
    g2 = dgl.graph(([0, 1, 0, 2], [1, 2, 2, 0]), num_nodes=3)
    edges, labels = dfs_labeled_edges_generator(
        g2, 0, has_reverse_edge=True, has_nontree_edge=True)
    e = [int(x[0]) for x in edges]
    l = [int(x[0]) for x in labels]
    # forward count equals tree size - 1 = 2; each forward has a reverse
    assert l.count(0) == 2 and l.count(1) == 2
    assert l.count(2) >= 1          # the cycle closes via a nontree edge
    # each REVERSE re-emits a previously-forwarded tree edge, after it
    fwd_pos = {eid: i for i, (eid, lab) in enumerate(zip(e, l)) if lab == 0}
    for i, (eid, lab) in enumerate(zip(e, l)):
        if lab == 1:
            assert eid in fwd_pos and i > fwd_pos[eid]


def test_metis_partition_api():
    from dgl_hack_tpu.partition import metis_partition
    rng = np.random.default_rng(0)
    src = rng.integers(0, 60, 400).astype(np.int32)
    dst = rng.integers(0, 60, 400).astype(np.int32)
    g2 = dgl.graph((np.concatenate([src, dst]), np.concatenate([dst, src])),
                   num_nodes=60)
    parts = metis_partition(g2, 4, extra_cached_hops=1)
    assert len(parts) == 4
    covered = np.concatenate(
        [np.asarray(p.node_map)[np.asarray(p.inner_node)] for p in parts])
    assert sorted(covered.tolist()) == list(range(60))


def test_multilevel_partition():
    """Multilevel (HEM coarsen -> fennel -> per-level refine) recovers
    planted communities far better than one-shot fennel and keeps edge
    balance (measured round 5: cut 0.139 vs 0.350 on the clustered 100k
    graph).  Small-scale invariants here: valid assignment, beats plain
    fennel's cut on a clustered graph, balance within the cap."""
    from dgl_hack_tpu.data import planted_partition
    from dgl_hack_tpu.partition.partition import partition

    ds = planted_partition(3000, 4, 8, avg_degree=10.0, homophily=0.9,
                           seed=0, train_per_class=8)
    g = ds.graph
    s, d = g.host_edges()
    k = 4
    pf = partition(g, k, method="fennel", seed=3)
    pm = partition(g, k, method="multilevel", seed=3)
    assert pm.shape == (g.num_nodes(),)
    assert pm.min() >= 0 and pm.max() < k
    cut_f = int((pf[s] != pf[d]).sum())
    cut_m = int((pm[s] != pm[d]).sum())
    assert cut_m < cut_f
    ecnt = np.bincount(pm[d], minlength=k)
    assert ecnt.max() * k / g.num_edges() < 1.35
