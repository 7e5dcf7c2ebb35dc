"""Pallas gspmm kernel vs the reference segment-op path (interpret mode on
CPU) — the "fused vs reference composition" oracle pattern of the
reference's test_kernel.py."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dgl_hack_tpu as dgl
from utils import random_graph


def _prep(rng, num_nodes=300, num_edges=2000, te=256, bc=8, wc=2,
          flat=False):
    src = rng.integers(0, num_nodes, num_edges).astype(np.int32)
    dst = rng.integers(0, num_nodes, num_edges).astype(np.int32)
    g = dgl.graph((src, dst), num_nodes=num_nodes)
    gp = dgl.prepare_spmm(g, te=te, bc=bc, wc=wc, flat=flat)
    return g, gp


@pytest.mark.parametrize("flat", [False, True])
@pytest.mark.parametrize("reducer", ["sum", "mean"])
def test_pallas_copy_u(rng, reducer, flat):
    g, gp = _prep(rng, flat=flat)
    if flat:
        assert gp.spmm_plan_meta[0][4] == 1 and gp.spmm_plan_meta[0][5]
    x = jnp.asarray(rng.normal(size=(300, 128)).astype(np.float32))
    ref = dgl.gspmm(g, "copy_lhs", reducer, x)
    out = dgl.gspmm(gp, "copy_lhs", reducer, x)
    assert gp.spmm_plan_arrays is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pallas_chunked(rng):
    """Force multiple chunks and check the overlap-added result."""
    g, gp = _prep(rng, num_nodes=1000, num_edges=8000, te=256, bc=8, wc=2)
    assert gp.spmm_plan_meta[0][4] > 1  # multiple fwd chunks
    x = jnp.asarray(rng.normal(size=(1000, 64)).astype(np.float32))
    ref = dgl.gspmm(g, "copy_lhs", "sum", x)
    out = dgl.gspmm(gp, "copy_lhs", "sum", x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("flat", [False, True])
@pytest.mark.parametrize("wshape", [(1,), (128,)])
def test_pallas_u_mul_e(rng, wshape, flat):
    g, gp = _prep(rng, flat=flat)
    E = g.num_edges()
    x = jnp.asarray(rng.normal(size=(300, 128)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(E,) + wshape).astype(np.float32))
    ref = dgl.gspmm(g, "mul", "sum", x, w, "u", "e")
    out = dgl.gspmm(gp, "mul", "sum", x, w, "u", "e")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pallas_gat_shape_broadcast(rng):
    """u_mul_e with (N,H,D) x (E,H,1) — the GAT aggregation."""
    g, gp = _prep(rng)
    E = g.num_edges()
    x = jnp.asarray(rng.normal(size=(300, 4, 16)).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(E, 4, 1)).astype(np.float32))
    ref = dgl.gspmm(g, "mul", "sum", x, a, "u", "e")
    out = dgl.gspmm(gp, "mul", "sum", x, a, "u", "e")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("flat", [False, True])
def test_pallas_grad(rng, flat):
    """Coupled VJP: gradients wrt x and w match the reference path."""
    g, gp = _prep(rng, num_nodes=120, num_edges=700, te=256, bc=8,
                  flat=flat)
    E = g.num_edges()
    x = jnp.asarray(rng.normal(size=(120, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(E, 1)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(120, 32)).astype(np.float32))

    def loss(graph, x_, w_):
        out = dgl.gspmm(graph, "mul", "sum", x_, w_, "u", "e")
        return ((out - tgt) ** 2).sum()

    gx_ref, gw_ref = jax.grad(loss, argnums=(1, 2))(g, x, w)
    gx_out, gw_out = jax.grad(loss, argnums=(1, 2))(gp, x, w)
    np.testing.assert_allclose(np.asarray(gx_out), np.asarray(gx_ref),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_out), np.asarray(gw_ref),
                               rtol=1e-3, atol=1e-3)


def test_pallas_through_jit_and_layer(rng):
    """Plan arrays ride the Graph pytree through jit; GraphConv uses the
    kernel transparently."""
    import dgl_hack_tpu.nn as gnn
    g, gp = _prep(rng)
    x = jnp.asarray(rng.normal(size=(300, 16)).astype(np.float32))
    layer = gnn.GraphConv(out_feats=8)
    params = layer.init(jax.random.PRNGKey(0), gp, x)

    @jax.jit
    def fwd(p, graph, feat):
        return layer.apply(p, graph, feat)

    out = fwd(params, gp, x)
    ref = layer.apply(params, g, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("F", [100, 256, 384])
def test_pallas_feature_dims(rng, F):
    """Non-128-multiple and multi-tile feature dims."""
    g, gp = _prep(rng)
    x = jnp.asarray(rng.normal(size=(300, F)).astype(np.float32))
    ref = dgl.gspmm(g, "copy_lhs", "sum", x)
    out = dgl.gspmm(gp, "copy_lhs", "sum", x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("flat", [False, True])
def test_pallas_empty_windows(rng, flat):
    """Nodes with no in-edges anywhere in the id range must come out 0."""
    src = rng.integers(0, 50, 200).astype(np.int32)
    dst = np.concatenate([rng.integers(0, 20, 100),
                          rng.integers(230, 250, 100)]).astype(np.int32)
    g = dgl.graph((src, dst), num_nodes=250)
    gp = dgl.prepare_spmm(g, te=256, bc=8, wc=2, flat=flat)
    x = jnp.asarray(rng.normal(size=(250, 32)).astype(np.float32))
    ref = dgl.gspmm(g, "copy_lhs", "sum", x)
    out = dgl.gspmm(gp, "copy_lhs", "sum", x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    assert np.abs(np.asarray(out[20:230])).max() == 0.0


def test_pallas_hub_split_across_chunks(rng):
    """A hub row with more edges than a whole chunk must split and
    overlap-add correctly."""
    E = 3000
    src = rng.integers(0, 100, E).astype(np.int32)
    dst = np.zeros(E, np.int32)          # everything into node 0
    dst[:500] = rng.integers(1, 100, 500)
    g = dgl.graph((src, dst), num_nodes=100)
    gp = dgl.prepare_spmm(g, te=256, bc=8, wc=2,  # chunk=2048 edges max
                          flat=False)
    assert gp.spmm_plan_meta[0][4] >= 2
    x = jnp.asarray(rng.normal(size=(100, 16)).astype(np.float32))
    ref = dgl.gspmm(g, "copy_lhs", "sum", x)
    out = dgl.gspmm(gp, "copy_lhs", "sum", x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)


def test_pallas_end_to_end_training(rng):
    """GCN training with the Pallas plan attached — loss decreases and
    gradients flow through the coupled VJP."""
    import optax
    from dgl_hack_tpu.models import GCN
    from dgl_hack_tpu.models.training import train_node_classifier
    from dgl_hack_tpu.data import planted_partition
    ds = planted_partition(300, 4, 32, avg_degree=6.0, homophily=0.9,
                           feat_noise=2.0, seed=2, train_per_class=15,
                           num_val=50, num_test=100)
    gp = dgl.prepare_spmm(ds.graph, te=256, bc=8, wc=4)
    model = GCN(hidden_feats=16, out_feats=4, dropout=0.2)
    res = train_node_classifier(model, gp, ds.features, ds.labels,
                                ds.train_mask, ds.val_mask, ds.test_mask,
                                num_epochs=60, lr=1e-2)
    assert res["test_acc"] > 0.75, res


@pytest.mark.parametrize("flat", [False, True])
def test_pallas_bf16_packed_copy_u(rng, flat):
    """bf16 features auto-pack into u32 lanes (lossless): result equals
    the f32 segment-sum of the SAME bf16 values."""
    g, gp = _prep(rng, flat=flat)
    x16 = jnp.asarray(rng.normal(size=(300, 128))).astype(jnp.bfloat16)
    ref = dgl.gspmm(g, "copy_lhs", "sum", x16.astype(jnp.float32))
    out = dgl.gspmm(gp, "copy_lhs", "sum", x16)
    # the op returns x.dtype (bf16): compare at bf16 resolution
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref), rtol=5e-3, atol=3e-2)


def test_pallas_bf16_packed_u_mul_e(rng):
    g, gp = _prep(rng)
    E = g.num_edges()
    x16 = jnp.asarray(rng.normal(size=(300, 128))).astype(jnp.bfloat16)
    w = jnp.asarray(rng.random(E, dtype=np.float32))[:, None]
    ref = dgl.gspmm(g, "mul", "sum", x16.astype(jnp.float32), w, "u", "e")
    out = dgl.gspmm(gp, "mul", "sum", x16, w, "u", "e")
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref), rtol=5e-3, atol=3e-2)


def test_pallas_bf16_packed_grads(rng):
    g, gp = _prep(rng)
    x16 = jnp.asarray(rng.normal(size=(300, 128))).astype(jnp.bfloat16)

    def loss(graph, x):
        return (dgl.gspmm(graph, "copy_lhs", "sum", x) ** 2).sum()

    gp_ = np.asarray(jax.grad(lambda x: loss(gp, x))(x16),
                     dtype=np.float32)
    gr_ = np.asarray(jax.grad(lambda x: loss(g, x))(x16),
                     dtype=np.float32)
    # bf16 primal AND bf16 cotangent: rounding compounds — compare
    # normalized by the gradient scale
    scale = max(1.0, np.abs(gr_).max())
    np.testing.assert_allclose(gp_ / scale, gr_ / scale, atol=2e-2)


def test_pallas_bf16_odd_width_fallback(rng):
    """F whose tile width is odd skips packing but still works."""
    g, gp = _prep(rng)
    x16 = jnp.asarray(rng.normal(size=(300, 37))).astype(jnp.bfloat16)
    ref = dgl.gspmm(g, "copy_lhs", "sum", x16.astype(jnp.float32))
    out = dgl.gspmm(gp, "copy_lhs", "sum", x16)
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref), rtol=5e-3, atol=3e-2)


# ---------------------------------------------------------------------------
# max/min reducers through the plan kernel (segmented shift-scan + exact
# one-hot select; VERDICT r1 item 6)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("flat", [False, True])
@pytest.mark.parametrize("reducer", ["max", "min"])
def test_pallas_copy_u_minmax(rng, reducer, flat):
    g, gp = _prep(rng, flat=flat)
    x = jnp.asarray(rng.normal(size=(300, 128)).astype(np.float32))
    ref = dgl.gspmm(g, "copy_lhs", reducer, x)
    out = dgl.gspmm(gp, "copy_lhs", reducer, x)
    # forward max is exact (scan + HIGHEST one-hot select): bitwise equal
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("reducer", ["max", "min"])
def test_pallas_u_mul_e_minmax_chunked(rng, reducer):
    """Weighted max across chunk-split hub windows."""
    g, gp = _prep(rng, num_nodes=1000, num_edges=8000, te=256, bc=8, wc=2)
    assert gp.spmm_plan_meta[0][4] > 1
    E = g.num_edges()
    x = jnp.asarray(rng.normal(size=(1000, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(E, 1)).astype(np.float32))
    ref = dgl.gspmm(g, "mul", reducer, x, w, "u", "e")
    out = dgl.gspmm(gp, "mul", reducer, x, w, "u", "e")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("flat", [False, True])
def test_pallas_minmax_zero_degree(rng, flat):
    """Zero in-degree rows must come out 0 (DGL zero-fill), not -inf."""
    src = rng.integers(0, 100, 500).astype(np.int32)
    dst = rng.integers(0, 50, 500).astype(np.int32)   # rows 50..99 empty
    g = dgl.graph((src, dst), num_nodes=100)
    gp = dgl.prepare_spmm(g, te=256, bc=8, wc=2, flat=flat)
    x = jnp.asarray(rng.normal(size=(100, 32)).astype(np.float32) - 5.0)
    out = dgl.gspmm(gp, "copy_lhs", "max", x)
    ref = dgl.gspmm(g, "copy_lhs", "max", x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert np.all(np.asarray(out)[50:] == 0.0)


@pytest.mark.parametrize("reducer", ["max", "min"])
def test_pallas_minmax_grad(rng, reducer):
    """Argmax-edge gradient: matches the composed segment-op gradient
    (no ties with continuous random data)."""
    g, gp = _prep(rng, num_nodes=120, num_edges=700, te=256, bc=8)
    E = g.num_edges()
    x = jnp.asarray(rng.normal(size=(120, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(E, 1)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(120, 32)).astype(np.float32))

    def loss(graph):
        def f(x_, w_):
            out = dgl.gspmm(graph, "mul", reducer, x_, w_, "u", "e")
            return ((out - tgt) ** 2).sum()
        return jax.grad(f, argnums=(0, 1))(x, w)

    gx_ref, gw_ref = loss(g)
    gx, gw = loss(gp)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_minmax_bf16_packed(rng):
    """bf16 inputs ride the packed gather; max stays exact on the
    unpacked bf16 values."""
    g, gp = _prep(rng)
    x = jnp.asarray(rng.normal(size=(300, 128))).astype(jnp.bfloat16)
    ref = dgl.gspmm(g, "copy_lhs", "max", x)
    out = dgl.gspmm(gp, "copy_lhs", "max", x)
    np.testing.assert_array_equal(np.asarray(out.astype(jnp.float32)),
                                  np.asarray(ref.astype(jnp.float32)))


# ---------------------------------------------------------------------------
# src-bucketed plans (round 3): chunk = one gather-table bucket
# ---------------------------------------------------------------------------
def _prep_bucketed(rng, num_nodes=500, num_edges=6000, te=64,
                   bucket_rows=96, layout="flat"):
    src = rng.integers(0, num_nodes, num_edges).astype(np.int32)
    dst = rng.integers(0, num_nodes, num_edges).astype(np.int32)
    # dedupe (u, v) pairs: duplicate edges tie under max and the kernel
    # VJP routes the cotangent to ALL tied argmax edges while the XLA
    # oracle picks one (documented subgradient choice, KERNELS.md)
    key = np.unique(src.astype(np.int64) * num_nodes + dst)
    src = (key // num_nodes).astype(np.int32)
    dst = (key % num_nodes).astype(np.int32)
    g = dgl.graph((src, dst), num_nodes=num_nodes)
    gp = dgl.prepare_spmm(g, te=te, dense_hub=False,
                          flat=(layout == "flat"),
                          bucket_rows=bucket_rows)
    # the fwd plan must actually be bucketed (gather_rows in static meta)
    meta = gp.spmm_plan_meta[0]
    assert meta[6] == bucket_rows, meta
    if layout == "flat":
        assert meta[4] == 1 and meta[7] is not None, meta  # flat-bucketed
    else:
        assert meta[4] > 1 and meta[7] is None, meta   # chunked buckets
    return g, gp


@pytest.mark.parametrize("layout", ["flat", "chunked"])
@pytest.mark.parametrize("reducer", ["sum", "max"])
def test_bucketed_copy_u_fwd_grad(rng, reducer, layout):
    g, gp = _prep_bucketed(rng, layout=layout)
    x = jnp.asarray(rng.normal(size=(500, 128)).astype(np.float32))
    ref = dgl.gspmm(g, "copy_lhs", reducer, x)
    out = dgl.gspmm(gp, "copy_lhs", reducer, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    def loss_p(x_):
        return (dgl.gspmm(gp, "copy_lhs", reducer, x_) ** 2).sum()

    def loss_r(x_):
        return (dgl.gspmm(g, "copy_lhs", reducer, x_) ** 2).sum()

    gx = jax.grad(loss_p)(x)
    gr = jax.grad(loss_r)(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gr),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("layout", ["flat", "chunked"])
@pytest.mark.parametrize("wshape", [(1,), (16,)])
def test_bucketed_u_mul_e(rng, wshape, layout):
    g, gp = _prep_bucketed(rng, layout=layout)
    E = g.num_edges()
    x = jnp.asarray(rng.normal(size=(500, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(E,) + wshape).astype(np.float32))
    ref = dgl.gspmm(g, "mul", "sum", x, w, "u", "e")
    out = dgl.gspmm(gp, "mul", "sum", x, w, "u", "e")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("layout", ["flat", "chunked"])
def test_bucketed_bf16_packed(rng, layout):
    g, gp = _prep_bucketed(rng, layout=layout)
    x = jnp.asarray(rng.normal(size=(500, 128))).astype(jnp.bfloat16)
    # f32 oracle over the same bf16 values; out is bf16 so differences
    # are output quantization only (same pattern as the unbucketed tests)
    ref = dgl.gspmm(g, "copy_lhs", "sum", x.astype(jnp.float32))
    out = dgl.gspmm(gp, "copy_lhs", "sum", x)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref), rtol=1e-2, atol=3e-2)


@pytest.mark.slow
def test_mixed_direction_buckets(rng=np.random.default_rng(47)):
    """bucket_rows_rev=None decouples the directions: fwd plan bucketed,
    rev plan chunked — the measured-best config for wide-operand
    training (fused GAT: src-bucketed rev plans lose 2x in backward,
    KERNELS.md round 4).  dx runs over the CHUNKED rev plan while the
    forward runs bucketed; both must match the composed oracle."""
    n, e = 256, 2500
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    g = dgl.graph((src, dst), num_nodes=n)
    gp = dgl.prepare_spmm(g, te=256, dense_hub=False, flat=False,
                          bucket_rows=128, bucket_rows_rev=None)
    assert gp.spmm_plan_meta[0][6] == 128    # fwd bucketed
    assert gp.spmm_plan_meta[1][6] == 0      # rev chunked
    x = jnp.asarray(rng.normal(size=(n, 64)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(dgl.gspmm(gp, "copy_lhs", "sum", x)),
        np.asarray(dgl.gspmm(g, "copy_lhs", "sum", x)),
        rtol=1e-4, atol=1e-4)

    # dx runs over the CHUNKED rev plan (the decoupled direction)
    def f(graph, x_):
        return (dgl.gspmm(graph, "copy_lhs", "sum", x_) ** 2).sum()

    gx_p = jax.grad(f, argnums=1)(gp, x)
    gx_c = jax.grad(f, argnums=1)(g, x)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_c),
                               rtol=1e-3, atol=1e-3)


def test_bucket_width_warning(rng=np.random.default_rng(49)):
    """Running WIDER than the flat_width src-bucketed plans were sized
    at must warn (the round-3 GAT bucket-size footgun, VERDICT r3 #7a)."""
    import warnings
    n, e = 500, 6000
    g = dgl.graph((rng.integers(0, n, e), rng.integers(0, n, e)),
                  num_nodes=n)
    gp = dgl.prepare_spmm(g, te=64, dense_hub=False, flat=False,
                          bucket_rows=96, flat_width=16)
    assert gp.spmm_plan_meta[0][6] == 96
    from dgl_hack_tpu.ops.spmm import _width_warned
    _width_warned.clear()
    x_wide = jnp.asarray(rng.normal(size=(n, 64)).astype(np.float32))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        dgl.gspmm(gp, "copy_lhs", "sum", x_wide)
        assert any("flat_width" in str(x.message) for x in w), \
            [str(x.message) for x in w]
    # at or under the prepared width: silent
    x_ok = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        dgl.gspmm(gp, "copy_lhs", "sum", x_ok)
        assert not any("flat_width" in str(x.message) for x in w)


def test_dispatch_debug_line(capsys, monkeypatch,
                             rng=np.random.default_rng(50)):
    """DGL_TPU_DEBUG_DISPATCH=1 prints which path ran (VERDICT r3 #7b:
    silent fallbacks must be observable)."""
    monkeypatch.setenv("DGL_TPU_DEBUG_DISPATCH", "1")
    n, e = 200, 1500
    g = dgl.graph((rng.integers(0, n, e), rng.integers(0, n, e)),
                  num_nodes=n)
    x = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    dgl.gspmm(g, "copy_lhs", "sum", x)              # composed
    gp = dgl.prepare_spmm(g, te=256, bc=8, wc=2)
    dgl.gspmm(gp, "copy_lhs", "sum", x)             # plan path
    out = capsys.readouterr().out
    assert "[dgl-tpu dispatch] gspmm: composed" in out
    assert "[dgl-tpu dispatch] gspmm:" in out
