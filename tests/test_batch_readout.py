"""Batching + readout tests (reference: tests/compute/test_batched_graph.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dgl_hack_tpu as dgl
from dgl_hack_tpu.core import batch as B
from dgl_hack_tpu.ops import readout as R


def _mk(rng, n, e):
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    g = dgl.graph((src, dst), num_nodes=n)
    g.ndata["h"] = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    g.edata["w"] = jnp.asarray(rng.normal(size=(e, 2)).astype(np.float32))
    return g


def test_batch_unbatch(rng):
    gs = [_mk(rng, 5, 8), _mk(rng, 3, 4), _mk(rng, 7, 12)]
    bg = B.batch(gs)
    assert bg.num_nodes() == 15
    assert bg.num_edges() == 24
    assert bg.batch_num_nodes == (5, 3, 7)
    outs = B.unbatch(bg)
    for g, o in zip(gs, outs):
        np.testing.assert_allclose(np.asarray(g.ndata["h"]),
                                   np.asarray(o.ndata["h"]))
        np.testing.assert_allclose(np.asarray(g.edata["w"]),
                                   np.asarray(o.edata["w"]), rtol=1e-6)
        s0, d0 = g.edges(order="eid")
        s1, d1 = o.edges(order="eid")
        np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
        np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))


def test_readouts(rng):
    gs = [_mk(rng, 5, 8), _mk(rng, 3, 4)]
    bg = B.batch(gs)
    s = R.sum_nodes(bg, "h")
    for i, g in enumerate(gs):
        np.testing.assert_allclose(np.asarray(s[i]),
                                   np.asarray(g.ndata["h"]).sum(0), rtol=1e-5)
    m = R.mean_nodes(bg, "h")
    np.testing.assert_allclose(np.asarray(m[0]),
                               np.asarray(gs[0].ndata["h"]).mean(0), rtol=1e-5)
    mx = R.max_nodes(bg, "h")
    np.testing.assert_allclose(np.asarray(mx[1]),
                               np.asarray(gs[1].ndata["h"]).max(0), rtol=1e-5)
    se = R.sum_edges(bg, "w")
    np.testing.assert_allclose(np.asarray(se[1]),
                               np.asarray(gs[1].edata["w"]).sum(0), rtol=1e-5)
    # softmax_nodes sums to 1 per graph per column
    sm = R.softmax_nodes(bg, "h")
    col = R.sum_nodes(bg, sm)
    np.testing.assert_allclose(np.asarray(col), 1.0, rtol=1e-5)
    # broadcast
    val = jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32))
    bc = R.broadcast_nodes(bg, val)
    assert bc.shape == (8, 3)
    np.testing.assert_allclose(np.asarray(bc[:5]),
                               np.tile(np.asarray(val[0]), (5, 1)))


def test_topk(rng):
    gs = [_mk(rng, 6, 8), _mk(rng, 4, 4)]
    bg = B.batch(gs)
    t = R.topk_nodes(bg, "h", k=2)
    h0 = np.asarray(gs[0].ndata["h"])
    np.testing.assert_allclose(np.asarray(t[0]),
                               -np.sort(-h0, axis=0)[:2], rtol=1e-5)


def test_glob_pooling(rng):
    import dgl_hack_tpu.nn as gnn
    gs = [_mk(rng, 5, 8), _mk(rng, 3, 4)]
    bg = B.batch(gs)
    x = bg.ndata["h"]
    for cls in [gnn.SumPooling, gnn.AvgPooling, gnn.MaxPooling]:
        layer = cls()
        out = layer.apply({}, bg, x)
        assert out.shape == (2, 3)
    sp = gnn.SortPooling(k=2)
    out = sp.apply({}, bg, x)
    assert out.shape == (2, 6)
    import flax.linen as fnn
    gap = gnn.GlobalAttentionPooling(gate_nn=lambda f: f.sum(-1, keepdims=True))
    out = gap.apply({}, bg, x)
    assert out.shape == (2, 3)
    s2s = gnn.Set2Set(input_dim=3, n_iters=2)
    params = s2s.init(jax.random.PRNGKey(0), bg, x)
    out = s2s.apply(params, bg, x)
    assert out.shape == (2, 6)


def test_topk_edges(rng):
    gs = [_mk(rng, 6, 9), _mk(rng, 4, 7)]
    bg = B.batch(gs)
    out = R.topk_edges(bg, "w", k=3)
    assert out.shape == (2, 3, 2)
    for i, g in enumerate(gs):
        w = np.asarray(g.edata["w"])
        want = -np.sort(-w, axis=0)[:3]
        np.testing.assert_allclose(np.asarray(out[i]), want, rtol=1e-6)


def test_set_transformer(rng):
    import dgl_hack_tpu.nn as gnn
    gs = [_mk(rng, 6, 9), _mk(rng, 4, 7)]
    bg = B.batch(gs)
    x = bg.ndata["h"]
    enc = gnn.SetTransformerEncoder(d_model=8, n_heads=2, d_head=4,
                                    d_ff=16, n_layers=2, block_type="isab",
                                    m=3)
    p = enc.init(jax.random.PRNGKey(0), bg, x)
    h = enc.apply(p, bg, x)
    assert h.shape == (10, 8)
    dec = gnn.SetTransformerDecoder(d_model=8, num_heads=2, d_head=4,
                                    d_ff=16, n_layers=1, k=2)
    pd = dec.init(jax.random.PRNGKey(1), bg, x)
    out = dec.apply(pd, bg, x)
    assert out.shape == (2, 16)
    # pooling must be permutation-invariant within each graph
    perm = np.concatenate([np.random.default_rng(0).permutation(6),
                           6 + np.random.default_rng(1).permutation(4)])
    src, dst = bg.host_edges()
    inv = np.empty_like(perm)
    inv[perm] = np.arange(10)
    g2 = dgl.graph((inv[src], inv[dst]), num_nodes=10)
    g2.batch_num_nodes = bg.batch_num_nodes
    g2.batch_num_edges = bg.batch_num_edges
    out2 = dec.apply(pd, g2, x[jnp.asarray(perm)])
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out),
                               rtol=2e-4, atol=2e-4)
