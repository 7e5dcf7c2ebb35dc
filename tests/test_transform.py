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
