"""Fused flash-GAT Pallas kernel vs the composed XLA path (oracle), in
interpret mode on CPU — forward values AND gradients, including the
cross-chunk online-softmax combine for hub windows."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dgl_hack_tpu as dgl
from dgl_hack_tpu.ops.gat import gat_attention
from dgl_hack_tpu.ops.pallas.gat_kernel import gat_attention_pallas


@pytest.fixture(params=["shift", "exact"])
def softmax_mode(request, monkeypatch):
    monkeypatch.setenv("DGL_TPU_GAT_SOFTMAX", request.param)
    return request.param


def _prep(rng, num_nodes=300, num_edges=2000, hub=0, te=256, bc=8, wc=2,
          flat=False):
    src = rng.integers(0, num_nodes, num_edges).astype(np.int32)
    dst = rng.integers(0, num_nodes, num_edges).astype(np.int32)
    if hub:
        dst[:hub] = 7            # one hub node -> window split over chunks
    g = dgl.graph((src, dst), num_nodes=num_nodes)
    gp = dgl.prepare_spmm(g, te=te, bc=bc, wc=wc, flat=flat)
    return g, gp


def _oracle(g, fsrc, el, er, slope, attn_w=None):
    e = dgl.gsddmm(g, "add", el[:, :, None], er[:, :, None], "u", "v")
    e = jax.nn.leaky_relu(e, slope)
    a = dgl.edge_softmax(g, e)
    if attn_w is not None:
        a = a * attn_w[:, :, None]
    return dgl.gspmm(g, "mul", "sum", fsrc, a, "u", "e")


def _rand(rng, g, H, D, scale=1.0):
    N = g.num_nodes()
    fsrc = jnp.asarray(rng.normal(size=(N, H, D)).astype(np.float32))
    el = jnp.asarray((scale * rng.normal(size=(N, H))).astype(np.float32))
    er = jnp.asarray((scale * rng.normal(size=(N, H))).astype(np.float32))
    return fsrc, el, er


@pytest.mark.parametrize("flat", [False, True])
@pytest.mark.parametrize("H,D", [(1, 16), (4, 16), (8, 7)])
def test_gat_fused_forward(rng, H, D, softmax_mode, flat):
    g, gp = _prep(rng, flat=flat)
    fsrc, el, er = _rand(rng, g, H, D)
    ref = _oracle(g, fsrc, el, er, 0.2)
    out = gat_attention(gp, fsrc, el, er, 0.2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_gat_fused_hub_chunks(rng, softmax_mode):
    """Hub window split across chunks exercises the softmax combine."""
    g, gp = _prep(rng, num_nodes=500, num_edges=6000, hub=3000,
                  te=128, bc=8, wc=2)
    assert gp.spmm_plan_meta[0][4] > 2
    fsrc, el, er = _rand(rng, g, 2, 8, scale=3.0)
    ref = _oracle(g, fsrc, el, er, 0.2)
    out = gat_attention(gp, fsrc, el, er, 0.2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_gat_fused_isolated_nodes(rng):
    """Zero in-degree rows must be exactly zero (DGL zero-fill)."""
    src = np.array([0, 1, 2], np.int32)
    dst = np.array([5, 5, 6], np.int32)
    g = dgl.graph((src, dst), num_nodes=200)
    gp = dgl.prepare_spmm(g, te=128, bc=8, wc=2)
    fsrc, el, er = _rand(np.random.default_rng(0), g, 2, 4)
    out = gat_attention(gp, fsrc, el, er, 0.2)
    ref = _oracle(g, fsrc, el, er, 0.2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
    assert float(jnp.abs(out[10:]).max()) == 0.0


@pytest.mark.parametrize("flat", [False, True])
def test_gat_fused_grads(rng, softmax_mode, flat):
    g, gp = _prep(rng, num_nodes=200, num_edges=1500, te=128, bc=8, wc=2,
                  flat=flat)
    H, D = 2, 16
    fsrc, el, er = _rand(rng, g, H, D)
    t = jnp.asarray(rng.normal(size=(200, H, D)).astype(np.float32))

    def loss(fn_g, use):
        def f(fsrc, el, er):
            out = (gat_attention(fn_g, fsrc, el, er, 0.2) if use == "fused"
                   else _oracle(fn_g, fsrc, el, er, 0.2))
            return ((out - t) ** 2).sum()
        return f

    g_ref = jax.grad(loss(g, "oracle"), argnums=(0, 1, 2))(fsrc, el, er)
    g_out = jax.grad(loss(gp, "fused"), argnums=(0, 1, 2))(fsrc, el, er)
    for a, b, name in zip(g_out, g_ref, ("dfsrc", "del", "der")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3, err_msg=name)


def test_gat_fused_attn_dropout_weights(rng, softmax_mode):
    """Post-softmax multiplier (attention dropout) fwd + grad parity."""
    g, gp = _prep(rng, num_nodes=200, num_edges=1500, te=128, bc=8, wc=2)
    H, D = 2, 8
    fsrc, el, er = _rand(rng, g, H, D)
    E = g.num_edges()
    w = jnp.asarray(
        (rng.random((E, H)) > 0.3).astype(np.float32) / 0.7)

    ref = _oracle(g, fsrc, el, er, 0.2, w)
    out = gat_attention(gp, fsrc, el, er, 0.2, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)

    def loss_fused(w):
        return (gat_attention(gp, fsrc, el, er, 0.2, w) ** 2).sum()

    def loss_ref(w):
        return (_oracle(g, fsrc, el, er, 0.2, w) ** 2).sum()

    dw_f = jax.grad(loss_fused)(w)
    dw_r = jax.grad(loss_ref)(w)
    np.testing.assert_allclose(np.asarray(dw_f), np.asarray(dw_r),
                               rtol=5e-3, atol=5e-3)


def test_gat_fused_large_logits_stable(rng, softmax_mode):
    """Large logit magnitudes stay finite and correct: 'exact' (online
    max) for any spread; 'shift' within its documented ~80 logit-spread
    underflow window (beyond that it returns 0-rows rather than NaN)."""
    scale = 30.0 if softmax_mode == "exact" else 8.0
    g, gp = _prep(rng, num_nodes=200, num_edges=1500, te=128, bc=8, wc=2)
    fsrc, el, er = _rand(rng, g, 2, 8, scale=scale)
    ref = _oracle(g, fsrc, el, er, 0.2)
    out = gat_attention(gp, fsrc, el, er, 0.2)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-3, atol=5e-3)


def test_gatconv_fused_matches_unfused(rng):
    """GATConv on a prepared graph == GATConv on the bare graph."""
    from dgl_hack_tpu.nn import GATConv
    g, gp = _prep(rng, num_nodes=150, num_edges=900, te=128, bc=8, wc=2)
    x = jnp.asarray(rng.normal(size=(150, 12)).astype(np.float32))
    layer = GATConv(out_feats=8, num_heads=4)
    params = layer.init(jax.random.PRNGKey(0), g, x)
    ref = layer.apply(params, g, x)
    out = layer.apply(params, gp, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("flat", [False, True])
def test_gat_packed_forward(rng, softmax_mode, flat):
    """bf16-packed z gather: matches the oracle computed on
    bf16-quantized inputs (the packed path's true function) tightly, and
    the f32 oracle to bf16 tolerance."""
    H, D = 4, 16
    g, gp = _prep(rng, flat=flat)
    fsrc, el, er = _rand(rng, g, H, D)
    out = gat_attention_pallas(
        gp.spmm_plan_meta, gp.spmm_plan_arrays, gp.src, gp.dst, fsrc, el,
        er, None, 0.2, softmax=softmax_mode, packed=True)
    # packed layout: bf16 features, EXACT f32 logits
    fq = fsrc.astype(jnp.bfloat16).astype(jnp.float32)
    ref_q = _oracle(g, fq, el, er, 0.2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_q),
                               rtol=2e-3, atol=2e-3)
    ref = _oracle(g, fsrc, el, er, 0.2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=1e-2)


def test_gat_packed_odd_width(rng, softmax_mode):
    """HD+H odd exercises the pad column in the packed layout."""
    H, D = 1, 16                    # width 17: odd
    g, gp = _prep(rng)
    fsrc, el, er = _rand(rng, g, H, D)
    out = gat_attention_pallas(
        gp.spmm_plan_meta, gp.spmm_plan_arrays, gp.src, gp.dst, fsrc, el,
        er, None, 0.2, softmax=softmax_mode, packed=True)
    fq = fsrc.astype(jnp.bfloat16).astype(jnp.float32)
    ref_q = _oracle(g, fq, el, er, 0.2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_q),
                               rtol=2e-3, atol=2e-3)


def test_gat_packed_grads(rng, softmax_mode):
    H, D = 4, 16
    g, gp = _prep(rng)
    fsrc, el, er = _rand(rng, g, H, D)

    def loss_pallas(f, l, r):
        out = gat_attention_pallas(
            gp.spmm_plan_meta, gp.spmm_plan_arrays, gp.src, gp.dst, f, l,
            r, None, 0.2, softmax=softmax_mode, packed=True)
        return (out * out).sum()

    def loss_oracle(f, l, r):
        fq = f.astype(jnp.bfloat16).astype(jnp.float32)
        out = _oracle(g, fq, l, r, 0.2)
        return (out * out).sum()

    gp_ = jax.grad(loss_pallas, (0, 1, 2))(fsrc, el, er)
    go_ = jax.grad(loss_oracle, (0, 1, 2))(fsrc, el, er)
    for a, b in zip(gp_, go_):
        scale = max(1.0, float(jnp.abs(b).max()))
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("impl", ["fused", "compact", "wide", "pack"])
@pytest.mark.parametrize("flat", [False, True])
def test_gat_bwd_impls_match_oracle(rng, softmax_mode, impl, flat):
    """All four backward implementations (in-kernel fused, round-4
    compact head-weight, legacy wide w_rev, packed gathers) produce
    oracle-matching grads, including attn_w (dw)."""
    g, gp = _prep(rng, num_nodes=250, num_edges=1800, te=128, bc=8, wc=2,
                  flat=flat)
    H, D = 2, 16
    fsrc, el, er = _rand(rng, g, H, D)
    E = g.num_edges()
    w = jnp.asarray((rng.random((E, H)) > 0.3).astype(np.float32) / 0.7)
    t = jnp.asarray(rng.normal(size=(250, H, D)).astype(np.float32))

    def loss_pallas(f, l, r, w_):
        out = gat_attention_pallas(
            gp.spmm_plan_meta, gp.spmm_plan_arrays, gp.src, gp.dst, f, l,
            r, w_, 0.2, softmax=softmax_mode, bwd_impl=impl)
        return ((out - t) ** 2).sum()

    def loss_oracle(f, l, r, w_):
        return ((_oracle(g, f, l, r, 0.2, w_) - t) ** 2).sum()

    g_out = jax.grad(loss_pallas, (0, 1, 2, 3))(fsrc, el, er, w)
    g_ref = jax.grad(loss_oracle, (0, 1, 2, 3))(fsrc, el, er, w)
    tol = 2e-2 if impl == "pack" else 5e-3
    for a, b, name in zip(g_out, g_ref, ("dfsrc", "del", "der", "dw")):
        scale = max(1.0, float(jnp.abs(b).max()))
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=tol, atol=tol, err_msg=name)


def test_gat_bwd_fused_hub_chunks(rng, softmax_mode):
    """Src hub: the rev plan's hub window splits across chunks — the
    fused backward's aliased-accumulator merge must agree with the
    oracle."""
    num_nodes, num_edges = 400, 6000
    src = rng.integers(0, num_nodes, num_edges).astype(np.int32)
    dst = rng.integers(0, num_nodes, num_edges).astype(np.int32)
    src[:3000] = 11                  # rev hub window split over chunks
    g = dgl.graph((src, dst), num_nodes=num_nodes)
    gp = dgl.prepare_spmm(g, te=128, bc=8, wc=2, flat=False)
    assert gp.spmm_plan_meta[1][4] > 2   # rev plan really is multi-chunk
    H, D = 2, 8
    fsrc, el, er = _rand(rng, g, H, D)

    def loss(use):
        def f(fsrc, el, er):
            out = (gat_attention_pallas(
                gp.spmm_plan_meta, gp.spmm_plan_arrays, gp.src, gp.dst,
                fsrc, el, er, None, 0.2, softmax=softmax_mode,
                bwd_impl="fused") if use == "fused"
                else _oracle(g, fsrc, el, er, 0.2))
            return (out * out).sum()
        return f

    g_ref = jax.grad(loss("oracle"), argnums=(0, 1, 2))(fsrc, el, er)
    g_out = jax.grad(loss("fused"), argnums=(0, 1, 2))(fsrc, el, er)
    for a, b, name in zip(g_out, g_ref, ("dfsrc", "del", "der")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3, err_msg=name)


def test_gat_bwd_fused_bucketed_rev(rng, softmax_mode):
    """Src-bucketed rev plan (gather_rows > 0): the fused backward
    gathers node_rev from dynamic bucket slices."""
    g, gp = _prep(rng, num_nodes=300, num_edges=2500, te=64, bc=8, wc=4,
                  flat=False)
    gp = dgl.prepare_spmm(g, te=64, bc=8, wc=4, flat=False,
                          bucket_rows=64)
    if not gp.spmm_plan_meta[1][6]:
        pytest.skip("bucketed plan unprofitable at this shape")
    H, D = 2, 16
    fsrc, el, er = _rand(rng, g, H, D)

    def loss(use):
        def f(fsrc, el, er):
            out = (gat_attention_pallas(
                gp.spmm_plan_meta, gp.spmm_plan_arrays, gp.src, gp.dst,
                fsrc, el, er, None, 0.2, softmax=softmax_mode,
                bwd_impl="fused") if use == "fused"
                else _oracle(g, fsrc, el, er, 0.2))
            return (out * out).sum()
        return f

    g_ref = jax.grad(loss("oracle"), argnums=(0, 1, 2))(fsrc, el, er)
    g_out = jax.grad(loss("fused"), argnums=(0, 1, 2))(fsrc, el, er)
    for a, b, name in zip(g_out, g_ref, ("dfsrc", "del", "der")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3, err_msg=name)


def test_gat_bwd_fused_masked(rng, softmax_mode):
    """Masked (padded) graph with mask-aware plans: fused backward's
    plan-driven der/dw never see padded edges; grads match the composed
    masked oracle."""
    from dgl_hack_tpu.ops.gat import gat_attention
    n, e = 250, 2000
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    mask = rng.random(e) < 0.8
    g = dgl.graph((src, dst), num_nodes=n, edge_mask=mask)
    gp = dgl.prepare_spmm(g, te=128)
    H, D = 2, 16
    fsrc, el, er = _rand(rng, g, H, D)

    def loss(graph):
        def f(fsrc, el, er):
            return (gat_attention(graph, fsrc, el, er, 0.2) ** 2).sum()
        return f

    g_ref = jax.grad(loss(g), argnums=(0, 1, 2))(fsrc, el, er)
    g_out = jax.grad(loss(gp), argnums=(0, 1, 2))(fsrc, el, er)
    for a, b, name in zip(g_out, g_ref, ("dfsrc", "del", "der")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3, err_msg=name)


@pytest.mark.parametrize("impl", ["fused", "pack"])
def test_gat_packed_fwd_bwd_combo(rng, softmax_mode, impl):
    """Packed FORWARD + each backward: grads must match the oracle
    differentiated at bf16-quantized features (straight-through
    consistency — the advisor-flagged untested combination)."""
    H, D = 4, 16
    g, gp = _prep(rng)
    fsrc, el, er = _rand(rng, g, H, D)

    def loss_pallas(f, l, r):
        out = gat_attention_pallas(
            gp.spmm_plan_meta, gp.spmm_plan_arrays, gp.src, gp.dst, f, l,
            r, None, 0.2, softmax=softmax_mode, packed=True,
            bwd_impl=impl)
        return (out * out).sum()

    def loss_oracle(f, l, r):
        fq = f.astype(jnp.bfloat16).astype(jnp.float32)
        out = _oracle(g, fq, l, r, 0.2)
        return (out * out).sum()

    gp_ = jax.grad(loss_pallas, (0, 1, 2))(fsrc, el, er)
    go_ = jax.grad(loss_oracle, (0, 1, 2))(fsrc, el, er)
    # 'pack' additionally bf16-quantizes the logit-gradient chain (the
    # documented ~2e-2 opt-in tolerance); 'fused' keeps those lanes f32
    tol = 3e-2 if impl == "pack" else 5e-3
    for a, b in zip(gp_, go_):
        scale = max(1.0, float(jnp.abs(b).max()))
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=tol, atol=tol)


def test_gat_bwd_pack_grads(rng, softmax_mode, monkeypatch):
    """DGL_TPU_GAT_BWD_PACK=1 bf16-packs the backward's two wide edge
    gathers (fs / do_d feature lanes only; logits and softmax stats stay
    exact f32).  Grads must match the unpacked backward at bf16-feature
    tolerance."""
    H, D = 4, 16
    g, gp = _prep(rng)
    fsrc, el, er = _rand(rng, g, H, D)
    t = jnp.asarray(rng.normal(size=(g.num_nodes(), H, D)).astype(np.float32))

    def loss(f, l, r):
        out = gat_attention_pallas(
            gp.spmm_plan_meta, gp.spmm_plan_arrays, gp.src, gp.dst, f, l,
            r, None, 0.2, softmax=softmax_mode)
        return ((out - t) ** 2).sum()

    g_ref = jax.grad(loss, (0, 1, 2))(fsrc, el, er)
    monkeypatch.setenv("DGL_TPU_GAT_BWD_PACK", "1")
    jax.clear_caches()         # env is read at trace time
    g_pk = jax.grad(loss, (0, 1, 2))(fsrc, el, er)
    jax.clear_caches()
    for a, b, name in zip(g_pk, g_ref, ("dfsrc", "del", "der")):
        scale = max(1.0, float(jnp.abs(b).max()))
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=2e-2, atol=2e-2, err_msg=name)
