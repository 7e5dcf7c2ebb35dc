"""Exhaustive gspmm/gsddmm correctness vs dense numpy oracle.

Counterpart of the reference's test_all_binary_builtins
(tests/compute/test_kernel.py:200): every (op x reducer x target x
broadcast shape) combination, forward and gradients.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dgl_hack_tpu as dgl
from utils import random_graph, oracle_gspmm, oracle_edge_softmax, oracle_message

OPS = ["add", "sub", "mul", "div", "dot", "copy_lhs", "copy_rhs"]
REDUCERS = ["sum", "mean", "max", "min", "prod"]
SHAPES = [((4,), (4,)), ((3, 1), (1, 4)), ((1,), (3,)), ((3, 4), (3, 4))]


def _make_data(rng, g, target, shape):
    n = {"u": g.num_src_nodes, "v": g.num_dst_nodes, "e": g.num_edges()}[target]
    # keep away from zero for div
    return (rng.uniform(0.5, 2.0, size=(n,) + shape)).astype(np.float32)


@pytest.mark.parametrize("op", OPS)
@pytest.mark.parametrize("reducer", REDUCERS)
def test_gspmm_u_e(rng, op, reducer):
    g, src, dst = random_graph(rng, num_edges=50)
    n = g.num_nodes()
    lhs = _make_data(rng, g, "u", (4,))
    rhs = _make_data(rng, g, "e", (4,))
    out = dgl.gspmm(g, op, reducer, jnp.asarray(lhs),
                    jnp.asarray(rhs)[g.int2user] if g.int2user is not None
                    else jnp.asarray(rhs), "u", "e")
    ref = oracle_gspmm(src, dst, n, op, reducer, lhs, rhs, "u", "e")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("lhs_t,rhs_t", [("u", "v"), ("v", "e"), ("e", "u")])
@pytest.mark.parametrize("op", ["add", "mul", "dot"])
def test_gspmm_targets(rng, op, lhs_t, rhs_t):
    g, src, dst = random_graph(rng, num_edges=50)
    n = g.num_nodes()
    lhs = _make_data(rng, g, lhs_t, (4,))
    rhs = _make_data(rng, g, rhs_t, (4,))

    def to_internal(x, t):
        if t == "e" and g.int2user is not None:
            return jnp.asarray(x)[g.int2user]
        return jnp.asarray(x)

    out = dgl.gspmm(g, op, "sum", to_internal(lhs, lhs_t),
                    to_internal(rhs, rhs_t), lhs_t, rhs_t)
    ref = oracle_gspmm(src, dst, n, op, "sum", lhs, rhs, lhs_t, rhs_t)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("lshape,rshape", SHAPES)
def test_gspmm_broadcast(rng, lshape, rshape):
    g, src, dst = random_graph(rng, num_edges=50)
    n = g.num_nodes()
    lhs = _make_data(rng, g, "u", lshape)
    rhs = _make_data(rng, g, "e", rshape)
    out = dgl.gspmm(g, "mul", "sum", jnp.asarray(lhs),
                    jnp.asarray(rhs)[g.int2user] if g.int2user is not None
                    else jnp.asarray(rhs), "u", "e")
    ref = oracle_gspmm(src, dst, n, "mul", "sum", lhs, rhs, "u", "e")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("reducer", ["sum", "mean", "max"])
def test_gspmm_grad(rng, reducer):
    g, src, dst = random_graph(rng, num_edges=40)
    n = g.num_nodes()
    x = _make_data(rng, g, "u", (3,))
    w = _make_data(rng, g, "e", (3,))
    w_int = jnp.asarray(w)[g.int2user] if g.int2user is not None else jnp.asarray(w)

    def loss(x_, w_):
        return dgl.gspmm(g, "mul", reducer, x_, w_, "u", "e").sum()

    gx, gw = jax.grad(loss, argnums=(0, 1))(jnp.asarray(x), w_int)

    # numerical gradient check on a few coordinates
    eps = 1e-3
    f0 = float(loss(jnp.asarray(x), w_int))
    for (i, j) in [(0, 0), (2, 1), (5, 2)]:
        xp = x.copy()
        xp[i, j] += eps
        fp = float(loss(jnp.asarray(xp), w_int))
        np.testing.assert_allclose(np.asarray(gx)[i, j], (fp - f0) / eps,
                                   rtol=0.15, atol=5e-2)


@pytest.mark.parametrize("op", ["add", "sub", "mul", "div", "dot"])
def test_gsddmm_u_v(rng, op):
    g, src, dst = random_graph(rng, num_edges=50)
    lhs = _make_data(rng, g, "u", (4,))
    rhs = _make_data(rng, g, "v", (4,))
    out = dgl.gsddmm(g, op, jnp.asarray(lhs), jnp.asarray(rhs), "u", "v",
                     out_order="eid")
    ref = np.stack([oracle_message(op, lhs[src[i]], rhs[dst[i]])
                    for i in range(len(src))])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_edge_softmax(rng):
    g, src, dst = random_graph(rng, num_edges=50)
    logits = rng.normal(size=(50, 2)).astype(np.float32)
    out = dgl.edge_softmax(g, jnp.asarray(logits), order="eid")
    ref = oracle_edge_softmax(dst, g.num_nodes(), logits)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)
    # probabilities sum to 1 per dst with in-edges
    sums = np.zeros((g.num_nodes(), 2))
    np.add.at(sums, dst, np.asarray(out))
    for v in range(g.num_nodes()):
        if (dst == v).any():
            np.testing.assert_allclose(sums[v], 1.0, rtol=1e-4)


def test_edge_mask_padding(rng):
    """Padded edges must contribute the reducer identity."""
    src = np.array([0, 1, 2, 0], dtype=np.int32)
    dst = np.array([1, 1, 0, 2], dtype=np.int32)
    mask = np.array([True, True, False, True])
    g = dgl.graph((src, dst), num_nodes=3, edge_mask=mask)
    x = np.arange(3 * 2, dtype=np.float32).reshape(3, 2) + 1.0
    for reducer in ["sum", "mean", "max", "min"]:
        out = dgl.gspmm(g, "copy_lhs", reducer, jnp.asarray(x))
        ref = oracle_gspmm(src[mask], dst[mask], 3, "copy_lhs", reducer,
                           x, None)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5)


def test_stateful_gat_flow(rng):
    """DGL-style stateful message-passing flow (the reference's
    GATConv.forward sequence, nn/pytorch/conv/gatconv.py:103-160) via the
    graph-method API."""
    from dgl_hack_tpu import fn
    g, src, dst = random_graph(rng, num_edges=40)
    n = g.num_nodes()
    ft = rng.normal(size=(n, 4)).astype(np.float32)
    el = rng.normal(size=(n, 1)).astype(np.float32)
    er = rng.normal(size=(n, 1)).astype(np.float32)
    g.ndata["ft"] = jnp.asarray(ft)
    g.ndata["el"] = jnp.asarray(el)
    g.ndata["er"] = jnp.asarray(er)
    g.apply_edges(fn.u_add_v("el", "er", "e"))
    e = jax.nn.leaky_relu(g.edata_internal["e"], 0.2)
    g.edata_internal["a"] = g.edge_softmax(e)
    g.update_all(fn.u_mul_e("ft", "a", "m"), fn.sum("m", "out"))
    out = np.asarray(g.ndata["out"])

    ref = np.zeros((n, 4), np.float32)
    for v in range(n):
        eids = np.where(dst == v)[0]
        if not len(eids):
            continue
        logits = (el[src[eids], 0] + er[v, 0])
        logits = np.where(logits > 0, logits, 0.2 * logits)
        w = np.exp(logits - logits.max()); w /= w.sum()
        ref[v] = (w[:, None] * ft[src[eids]]).sum(0)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_send_recv(rng):
    from dgl_hack_tpu import fn
    g, src, dst = random_graph(rng, num_edges=30)
    n = g.num_nodes()
    x = rng.normal(size=(n, 3)).astype(np.float32)
    g.ndata["h"] = jnp.asarray(x)
    g.send(fn.copy_u("h", "m"))
    g.recv(np.array([0, 1, 2]), fn.sum("m", "agg"))
    out = np.asarray(g.ndata["agg"])
    from utils import oracle_gspmm
    ref = oracle_gspmm(src, dst, n, "copy_lhs", "sum", x, None)
    np.testing.assert_allclose(out[:3], ref[:3], rtol=1e-4, atol=1e-5)


def test_send_recv_udf_reducer(rng):
    """recv() with a UDF reducer rides the padded mailbox (reference
    degree-buckets UDF reduces, python/dgl/runtime/degree_bucketing.py:12);
    rows outside v keep previous values."""
    from dgl_hack_tpu import fn
    g, src, dst = random_graph(rng, num_edges=30)
    n = g.num_nodes()
    x = rng.normal(size=(n, 3)).astype(np.float32)
    g.ndata["h"] = jnp.asarray(x)
    g.ndata["agg"] = jnp.full((n, 3), 7.0)
    g.send(fn.copy_u("h", "m"))

    def udf_max(nodes):
        m = jnp.where(nodes.mask[..., None], nodes.mailbox["m"], -1e30)
        out = m.max(axis=1)
        return {"agg": jnp.where(nodes.degrees[:, None] > 0, out, 0.0)}

    v = np.array([0, 1, 2])
    g.recv(v, udf_max)
    out = np.asarray(g.ndata["agg"])
    from utils import oracle_gspmm
    ref = oracle_gspmm(src, dst, n, "copy_lhs", "max", x, None)
    np.testing.assert_allclose(out[:3], ref[:3], rtol=1e-4, atol=1e-5)
    # untouched rows keep the previous value
    np.testing.assert_allclose(out[3:], 7.0)


def test_pull_push(rng):
    from dgl_hack_tpu import fn
    g, src, dst = random_graph(rng, num_edges=40)
    n = g.num_nodes()
    x = rng.normal(size=(n, 3)).astype(np.float32)
    from utils import oracle_gspmm
    full = oracle_gspmm(src, dst, n, "copy_lhs", "sum", x, None)

    # pull: only nodes v updated
    g.ndata["h"] = jnp.asarray(x)
    g.ndata["agg"] = jnp.zeros((n, 3))
    g.pull(np.array([1, 4]), fn.copy_u("h", "m"), fn.sum("m", "agg"))
    out = np.asarray(g.ndata["agg"])
    np.testing.assert_allclose(out[1], full[1], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out[4], full[4], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out[0], 0.0)

    # push: only edges from u contribute
    g2, src2, dst2 = random_graph(rng, num_edges=40)
    x2 = rng.normal(size=(g2.num_nodes(), 3)).astype(np.float32)
    g2.ndata["h"] = jnp.asarray(x2)
    g2.push(np.array([0, 2]), fn.copy_u("h", "m"), fn.sum("m", "agg"))
    sel = np.isin(src2, [0, 2])
    ref = oracle_gspmm(src2[sel], dst2[sel], g2.num_nodes(), "copy_lhs",
                       "sum", x2, None)
    np.testing.assert_allclose(np.asarray(g2.ndata["agg"]), ref,
                               rtol=1e-4, atol=1e-5)


def test_udf_message_and_reduce(rng):
    """UDF message + UDF mailbox reducer vs builtin composition
    (reference: test_specialization.py degree-bucketing fallback
    equivalence)."""
    from dgl_hack_tpu import fn
    g, src, dst = random_graph(rng, num_edges=40)
    n = g.num_nodes()
    x = rng.normal(size=(n, 3)).astype(np.float32)
    g.ndata["h"] = jnp.asarray(x)

    def mfunc(edges):
        return {"m": edges.src["h"] * 2.0}

    def rfunc(nodes):
        s = (nodes.mailbox["m"]
             * nodes.mask[..., None].astype(jnp.float32)).sum(1)
        return {"agg": s}

    g.update_all(mfunc, rfunc)
    udf_out = np.asarray(g.ndata["agg"])
    g.update_all(fn.copy_u("h", "m"), fn.sum("m", "agg2"))
    builtin = 2.0 * np.asarray(g.ndata["agg2"])
    np.testing.assert_allclose(udf_out, builtin, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("reducer", ["sum", "mean", "max", "min"])
@pytest.mark.parametrize("op", ["add", "sub", "mul", "div", "dot"])
@pytest.mark.parametrize("lhs_t,rhs_t", [("u", "v"), ("v", "u"), ("e", "v"),
                                         ("v", "e"), ("v", "v")])
def test_gspmm_v_side_decomposition(rng, op, reducer, lhs_t, rhs_t):
    """v-side operands decompose algebraically (ops/spmm.py
    _v_side_decompose); every decomposed combo must match the dense
    oracle, including broadcast feature shapes."""
    g, src, dst = random_graph(rng, num_edges=60)
    n = g.num_nodes()
    lshape, rshape = ((3, 1), (1, 4)) if op != "dot" else ((4,), (4,))
    lhs = _make_data(rng, g, lhs_t, lshape)
    rhs = _make_data(rng, g, rhs_t, rshape)

    def to_internal(x, t):
        if t == "e" and g.int2user is not None:
            return jnp.asarray(x)[g.int2user]
        return jnp.asarray(x)

    out = dgl.gspmm(g, op, reducer, to_internal(lhs, lhs_t),
                    to_internal(rhs, rhs_t), lhs_t, rhs_t)
    ref = oracle_gspmm(src, dst, n, op, reducer, lhs, rhs, lhs_t, rhs_t)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("reducer", ["sum", "mean", "max"])
def test_gspmm_v_side_grad(rng, reducer):
    """Gradients flow correctly through the decomposed u_mul_v path."""
    g, src, dst = random_graph(rng, num_edges=40)
    x = _make_data(rng, g, "u", (3,))
    y = _make_data(rng, g, "v", (3,))

    def loss(x_, y_):
        return dgl.gspmm(g, "mul", reducer, x_, y_, "u", "v").sum()

    gx, gy = jax.grad(loss, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(y))
    eps = 1e-3
    f0 = float(loss(jnp.asarray(x), jnp.asarray(y)))
    for (i, j) in [(0, 0), (2, 1), (5, 2)]:
        xp = x.copy(); xp[i, j] += eps
        np.testing.assert_allclose(
            np.asarray(gx)[i, j],
            (float(loss(jnp.asarray(xp), jnp.asarray(y))) - f0) / eps,
            rtol=0.15, atol=5e-2)
        yp = y.copy(); yp[i, j] += eps
        np.testing.assert_allclose(
            np.asarray(gy)[i, j],
            (float(loss(jnp.asarray(x), jnp.asarray(yp))) - f0) / eps,
            rtol=0.15, atol=5e-2)
