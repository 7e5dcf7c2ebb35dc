"""NN layer tests (counterpart of reference tests/pytorch/test_nn.py):
shape checks, gradient flow, and dense-adjacency oracles for
GraphConv/GATConv."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dgl_hack_tpu as dgl
import dgl_hack_tpu.nn as gnn
from utils import random_graph


def _adj(src, dst, n):
    a = np.zeros((n, n), np.float32)
    for s, d in zip(src, dst):
        a[d, s] += 1.0   # A[v,u] = multiplicity of edge u->v
    return a


def test_graphconv_matches_dense(rng):
    g, src, dst = random_graph(rng, num_edges=50)
    n = g.num_nodes()
    x = rng.normal(size=(n, 5)).astype(np.float32)
    layer = gnn.GraphConv(out_feats=7, norm="both")
    params = layer.init(jax.random.PRNGKey(0), g, jnp.asarray(x))
    out = layer.apply(params, g, jnp.asarray(x))

    A = _adj(src, dst, n)
    deg_out = np.maximum(A.sum(0), 1.0)
    deg_in = np.maximum(A.sum(1), 1.0)
    W = np.asarray(params["params"]["weight"])
    b = np.asarray(params["params"]["bias"])
    ref = (A @ (x * deg_out[:, None] ** -0.5)) @ W * deg_in[:, None] ** -0.5 + b
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_graphconv_norm_right(rng):
    g, src, dst = random_graph(rng, num_edges=50)
    n = g.num_nodes()
    x = rng.normal(size=(n, 3)).astype(np.float32)
    layer = gnn.GraphConv(out_feats=3, norm="right")
    params = layer.init(jax.random.PRNGKey(0), g, jnp.asarray(x))
    out = layer.apply(params, g, jnp.asarray(x))
    A = _adj(src, dst, n)
    deg_in = np.maximum(A.sum(1), 1.0)
    W = np.asarray(params["params"]["weight"])
    ref = (A @ x) @ W / deg_in[:, None] + np.asarray(params["params"]["bias"])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_gatconv_dense_oracle(rng):
    g, src, dst = random_graph(rng, num_edges=40)
    n = g.num_nodes()
    x = rng.normal(size=(n, 6)).astype(np.float32)
    layer = gnn.GATConv(out_feats=4, num_heads=2)
    params = layer.init(jax.random.PRNGKey(1), g, jnp.asarray(x))
    out = layer.apply(params, g, jnp.asarray(x))
    assert out.shape == (n, 2, 4)

    W = np.asarray(params["params"]["fc"]["kernel"])      # (6, 8)
    al = np.asarray(params["params"]["attn_l"]).reshape(2, 4)
    ar = np.asarray(params["params"]["attn_r"]).reshape(2, 4)
    f = (x @ W).reshape(n, 2, 4)
    el = (f * al).sum(-1)
    er = (f * ar).sum(-1)
    ref = np.zeros((n, 2, 4), np.float32)
    for h in range(2):
        for v in range(n):
            eids = np.where(dst == v)[0]
            if len(eids) == 0:
                continue
            logits = el[src[eids], h] + er[v, h]
            logits = np.where(logits > 0, logits, 0.2 * logits)  # leaky relu
            w = np.exp(logits - logits.max())
            w /= w.sum()
            ref[v, h] = (w[:, None] * f[src[eids], h]).sum(0)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("agg", ["mean", "gcn", "pool", "lstm"])
def test_sageconv_shapes_and_grad(rng, agg):
    g, src, dst = random_graph(rng, num_edges=50)
    n = g.num_nodes()
    x = rng.normal(size=(n, 5)).astype(np.float32)
    layer = gnn.SAGEConv(out_feats=4, aggregator_type=agg)
    params = layer.init(jax.random.PRNGKey(0), g, jnp.asarray(x))
    out = layer.apply(params, g, jnp.asarray(x))
    assert out.shape == (n, 4)

    grads = jax.grad(lambda p: layer.apply(p, g, jnp.asarray(x)).sum())(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in flat)


@pytest.mark.parametrize("reg,nb", [("basis", None), ("basis", 2), ("bdd", 2)])
def test_relgraphconv(rng, reg, nb):
    g, src, dst = random_graph(rng, num_edges=50)
    n = g.num_nodes()
    R = 4
    x = rng.normal(size=(n, 6)).astype(np.float32)
    etypes = rng.integers(0, R, size=50).astype(np.int32)
    layer = gnn.RelGraphConv(out_feats=6, num_rels=R, regularizer=reg,
                             num_bases=nb, self_loop=True)
    params = layer.init(jax.random.PRNGKey(0), g, jnp.asarray(x),
                        jnp.asarray(etypes))
    out = layer.apply(params, g, jnp.asarray(x), jnp.asarray(etypes))
    assert out.shape == (n, 6)

    if reg == "basis" and nb is None:
        # oracle: per-relation weight gather
        W = np.asarray(params["params"]["weight"])  # (R, in, out)
        ref = np.zeros((n, 6), np.float32)
        for i in range(50):
            ref[dst[i]] += x[src[i]] @ W[etypes[i]]
        ref += np.asarray(params["params"]["h_bias"])
        ref += x @ np.asarray(params["params"]["loop_weight"])
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("cls,kw", [
    (gnn.GINConv, dict(aggregator_type="sum")),
    (gnn.SGConv, dict(out_feats=4, k=2)),
    (gnn.APPNPConv, dict(k=3, alpha=0.1)),
    (gnn.TAGConv, dict(out_feats=4, k=2)),
    (gnn.ChebConv, dict(out_feats=4, k=3)),
    (gnn.AGNNConv, dict()),
    (gnn.EdgeConv, dict(out_feats=4)),
    (gnn.GatedGraphConv, dict(out_feats=8, n_steps=2)),
])
def test_layer_smoke(rng, cls, kw):
    g, src, dst = random_graph(rng, num_edges=50)
    n = g.num_nodes()
    x = rng.normal(size=(n, 5)).astype(np.float32)
    layer = cls(**kw)
    params = layer.init(jax.random.PRNGKey(0), g, jnp.asarray(x))
    out = layer.apply(params, g, jnp.asarray(x))
    assert out.shape[0] == n
    assert np.all(np.isfinite(np.asarray(out)))


def test_gatconv_bipartite(rng):
    g, src, dst = random_graph(rng, num_src=12, num_dst=6, num_edges=30,
                               bipartite=True)
    xs = rng.normal(size=(12, 5)).astype(np.float32)
    xd = rng.normal(size=(6, 5)).astype(np.float32)
    layer = gnn.GATConv(out_feats=4, num_heads=3)
    params = layer.init(jax.random.PRNGKey(0), g,
                        (jnp.asarray(xs), jnp.asarray(xd)))
    out = layer.apply(params, g, (jnp.asarray(xs), jnp.asarray(xd)))
    assert out.shape == (6, 3, 4)


def test_gmm_conv(rng):
    g, src, dst = random_graph(rng, num_edges=50)
    n = g.num_nodes()
    x = rng.normal(size=(n, 5)).astype(np.float32)
    pseudo = rng.normal(size=(50, 2)).astype(np.float32)
    layer = gnn.GMMConv(out_feats=4, dim=2, n_kernels=3)
    params = layer.init(jax.random.PRNGKey(0), g, jnp.asarray(x),
                        jnp.asarray(pseudo))
    out = layer.apply(params, g, jnp.asarray(x), jnp.asarray(pseudo))
    assert out.shape == (n, 4)
    assert np.all(np.isfinite(np.asarray(out)))


def test_dense_layers_match_sparse(rng):
    """DenseGraphConv/DenseSAGEConv vs the sparse path on the same graph."""
    g, src, dst = random_graph(rng, num_edges=40)
    n = g.num_nodes()
    x = rng.normal(size=(n, 6)).astype(np.float32)
    adj = np.zeros((n, n), np.float32)
    for s, d in zip(src, dst):
        adj[d, s] += 1
    dense = gnn.DenseGraphConv(out_feats=4)
    p1 = dense.init(jax.random.PRNGKey(0), jnp.asarray(adj), jnp.asarray(x))
    sparse = gnn.GraphConv(out_feats=4)
    out_d = dense.apply(p1, jnp.asarray(adj), jnp.asarray(x))
    out_s = sparse.apply(
        {"params": {"weight": p1["params"]["weight"],
                    "bias": p1["params"]["bias"]}}, g, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_s),
                               rtol=1e-4, atol=1e-5)


def test_knn_factory(rng):
    x = rng.normal(size=(30, 3)).astype(np.float32)
    kg = gnn.KNNGraph(k=5)(x)
    np.testing.assert_array_equal(np.asarray(kg.in_degrees()), 5)


def test_nn_sequential_and_weight_basis(rng):
    import jax
    import jax.numpy as jnp
    import dgl_hack_tpu as dgl
    from dgl_hack_tpu import nn as gnn

    g = dgl.graph((rng.integers(0, 10, 30), rng.integers(0, 10, 30)),
                  num_nodes=10)
    model = gnn.Sequential((gnn.GraphConv(8), gnn.GraphConv(4)))
    x = jnp.asarray(rng.normal(size=(10, 6)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), g, x)
    out = model.apply(params, g, x)
    assert out.shape == (10, 4)
    # per-graph mode: one module per graph
    out2 = model.apply(params, [g, g], x)
    assert out2.shape == (10, 4)

    wb = gnn.WeightBasis((3, 5), num_bases=2, num_outputs=7)
    p = wb.init(jax.random.PRNGKey(0))
    w = wb.apply(p)
    assert w.shape == (7, 3, 5)
    # rank constraint: outputs live in a 2-dim basis span
    flat = np.asarray(w).reshape(7, -1)
    assert np.linalg.matrix_rank(flat, tol=1e-4) <= 2

    ident = gnn.Identity()
    pi = ident.init(jax.random.PRNGKey(0), x)
    assert np.allclose(np.asarray(ident.apply(pi, x)), np.asarray(x))


def test_relgraphconv_pair_plan(rng=np.random.default_rng(44)):
    """Two-level (dst,etype)-pair RGCN fast path (ops/rgcn.py) ==
    composed per-edge path, fwd + grads, with and without basis
    compression and per-edge norm.  Reference: the fork's fused RGCN
    kernels over etype-sorted CSR (binary_reduce_impl.cu:914)."""
    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.nn import RelGraphConv
    n, e, r = 200, 1500, 7
    g = dgl.graph((rng.integers(0, n, e), rng.integers(0, n, e)),
                  num_nodes=n)
    et = rng.integers(0, r, e).astype(np.int32)
    x = jnp.asarray(rng.normal(size=(n, 12)).astype(np.float32))
    norm = jnp.asarray(rng.random((e, 1)).astype(np.float32))
    plan = dgl.prepare_rgcn(g, et, r, te=64)
    assert plan.num_pairs <= e
    for B in (3, None):
        layer = RelGraphConv(out_feats=6, num_rels=r, num_bases=B,
                             self_loop=True)
        params = layer.init(jax.random.PRNGKey(0), g, x, jnp.asarray(et))
        for nrm in (None, norm):
            slow = layer.apply(params, g, x, jnp.asarray(et), nrm)
            fast = layer.apply(params, g, x, jnp.asarray(et), nrm,
                               plan=plan)
            np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                                       rtol=1e-3, atol=1e-4)

    layer = RelGraphConv(out_feats=6, num_rels=r, num_bases=3)
    params = layer.init(jax.random.PRNGKey(0), g, x, jnp.asarray(et))

    def loss(p, use_plan):
        o = layer.apply(p, g, x, jnp.asarray(et), norm,
                        plan=plan if use_plan else None)
        return (o ** 2).sum()

    g1 = jax.grad(lambda p: loss(p, True))(params)
    g2 = jax.grad(lambda p: loss(p, False))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-3)


def test_relgraphconv_pair_plan_masked(rng=np.random.default_rng(48)):
    """prepare_rgcn on an edge_mask graph builds the pair relabeling over
    REAL edges only; fast path == composed masked path."""
    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.nn import RelGraphConv
    n, e, r = 150, 1200, 5
    mask = rng.random(e) < 0.75
    g = dgl.graph((rng.integers(0, n, e), rng.integers(0, n, e)),
                  num_nodes=n, edge_mask=mask)
    et = rng.integers(0, r, e).astype(np.int32)
    x = jnp.asarray(rng.normal(size=(n, 10)).astype(np.float32))
    plan = dgl.prepare_rgcn(g, et, r, te=64)
    assert plan.num_pairs <= int(mask.sum())
    layer = RelGraphConv(out_feats=6, num_rels=r, num_bases=3)
    params = layer.init(jax.random.PRNGKey(0), g, x, jnp.asarray(et))
    slow = layer.apply(params, g, x, jnp.asarray(et))
    fast = layer.apply(params, g, x, jnp.asarray(et), plan=plan)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               rtol=1e-3, atol=1e-4)


def test_weave_layer_oracle(rng=np.random.default_rng(51)):
    """WeaveLayer vs a dense numpy oracle of the reference math
    (apps/life_sci .../gnn/weave.py:11): node update = [W_nn h || sum
    W_en e] -> W_u; edge update = [act(l_u+r_v) || act(r_u+l_v) ||
    W_ee e] -> W_ue."""
    g, src, dst = random_graph(rng, num_edges=60)
    n, e = g.num_nodes(), 60
    x = rng.normal(size=(n, 5)).astype(np.float32)
    ef = rng.normal(size=(e, 3)).astype(np.float32)
    layer = gnn.WeaveLayer(node_out_feats=7, edge_out_feats=6,
                           node_node_hidden_feats=4,
                           edge_node_hidden_feats=4,
                           node_edge_hidden_feats=5,
                           edge_edge_hidden_feats=5)
    params = layer.init(jax.random.PRNGKey(0), g, jnp.asarray(x),
                        jnp.asarray(ef))
    out_n, out_e = layer.apply(params, g, jnp.asarray(x), jnp.asarray(ef))
    assert out_n.shape == (n, 7) and out_e.shape == (e, 6)

    def dense(name, v, relu=True):
        p = params["params"][name]
        r = v @ np.asarray(p["kernel"]) + np.asarray(p["bias"])
        return np.maximum(r, 0.0) if relu else r

    nn_f = dense("node_to_node", x)
    e2n = dense("edge_to_node", ef)
    en = np.zeros((n, 4), np.float32)
    for i, d in enumerate(dst):
        en[d] += e2n[i]
    ref_n = dense("update_node", np.concatenate([nn_f, en], 1))
    np.testing.assert_allclose(np.asarray(out_n), ref_n, rtol=1e-4,
                               atol=1e-5)

    left = dense("left_node_to_edge", x, relu=False)
    right = dense("right_node_to_edge", x, relu=False)
    first = np.maximum(left[src] + right[dst], 0.0)
    second = np.maximum(right[src] + left[dst], 0.0)
    third = dense("edge_to_edge", ef)
    ref_e = dense("update_edge", np.concatenate([first, second, third], 1))
    np.testing.assert_allclose(np.asarray(out_e), ref_e, rtol=1e-4,
                               atol=1e-5)


def test_weave_gnn_grad(rng=np.random.default_rng(52)):
    g, src, dst = random_graph(rng, num_edges=40)
    n, e = g.num_nodes(), 40
    x = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32))
    ef = jnp.asarray(rng.normal(size=(e, 3)).astype(np.float32))
    model = gnn.WeaveGNN(num_layers=2, hidden_feats=8)
    params = model.init(jax.random.PRNGKey(0), g, x, ef)

    def loss(p):
        return (model.apply(p, g, x, ef) ** 2).sum()

    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(a))) for a in flat)
    assert any(float(jnp.abs(a).max()) > 0 for a in flat)


def test_wln_oracle(rng=np.random.default_rng(53)):
    """WLN vs dense numpy oracle (apps/life_sci .../gnn/wln.py:75):
    shared-parameter message passing + final pairwise product."""
    g, src, dst = random_graph(rng, num_edges=50)
    n, e = g.num_nodes(), 50
    x = rng.normal(size=(n, 4)).astype(np.float32)
    ef = rng.normal(size=(e, 3)).astype(np.float32)
    model = gnn.WLN(node_out_feats=6, n_layers=2)
    params = model.init(jax.random.PRNGKey(0), g, jnp.asarray(x),
                        jnp.asarray(ef))
    out = model.apply(params, g, jnp.asarray(x), jnp.asarray(ef))
    assert out.shape == (n, 6)

    P = params["params"]

    def lin(name, v, bias=True, relu=False):
        r = v @ np.asarray(P[name]["kernel"])
        if bias and "bias" in P[name]:
            r = r + np.asarray(P[name]["bias"])
        return np.maximum(r, 0.0) if relu else r

    h = np.maximum(lin("project_node_in_feats", x, bias=False), 0.0)
    for _ in range(2):
        he = np.maximum(
            lin("project_concatenated_messages",
                np.concatenate([h[src], ef], 1)), 0.0)
        agg = np.zeros((n, 6), np.float32)
        for i, d in enumerate(dst):
            agg[d] += he[i]
        h = np.maximum(
            lin("get_new_node_feats", np.concatenate([h, agg], 1)), 0.0)
    hv = lin("project_node_messages", h, bias=False)
    hee = lin("project_edge_messages", ef, bias=False)
    h_nbr = np.zeros((n, 6), np.float32)
    for i, (s, d) in enumerate(zip(src, dst)):
        h_nbr[d] += hv[s] * hee[i]
    ref = h_nbr * lin("project_self", h, bias=False)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_wln_grad(rng=np.random.default_rng(54)):
    g, src, dst = random_graph(rng, num_edges=30)
    n, e = g.num_nodes(), 30
    x = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    ef = jnp.asarray(rng.normal(size=(e, 3)).astype(np.float32))
    model = gnn.WLN(node_out_feats=5, n_layers=3)
    params = model.init(jax.random.PRNGKey(0), g, x, ef)

    def loss(p):
        return (model.apply(p, g, x, ef) ** 2).sum()

    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(a))) for a in flat)
