"""Fused Pallas gSDDMM (dense dst-window reads) vs the composed
gather path — interpret mode on CPU (the same fused-vs-composition
oracle pattern as test_pallas_spmm.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dgl_hack_tpu as dgl


@pytest.fixture(autouse=True)
def _enable_sddmm_kernel(monkeypatch):
    """The fused sddmm kernel is opt-in (measured slower than composed
    XLA on v5e — KERNELS.md round 3); these tests cover its correctness
    so they force the kernel path."""
    monkeypatch.setenv("DGL_TPU_SDDMM_KERNEL", "1")


def _prep(rng, num_nodes=300, num_edges=2500):
    src = rng.integers(0, num_nodes, num_edges).astype(np.int32)
    dst = rng.integers(0, num_nodes, num_edges).astype(np.int32)
    g = dgl.graph((src, dst), num_nodes=num_nodes)
    gp = dgl.prepare_spmm(g, dense_hub=False)
    assert gp.sddmm_plan_arrays is not None
    return g, gp


@pytest.mark.parametrize("op", ["add", "sub", "mul", "div", "copy_rhs"])
def test_sddmm_u_op_v(rng, op):
    g, gp = _prep(rng)
    x = jnp.asarray(rng.uniform(0.5, 2.0, (300, 32)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0.5, 2.0, (300, 32)).astype(np.float32))
    ref = dgl.gsddmm(g, op, x, y, "u", "v")
    out = dgl.gsddmm(gp, op, x, y, "u", "v")
    # the y select is exact; add/sub/mul/div on exact operands match
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_sddmm_dot(rng):
    g, gp = _prep(rng)
    x = jnp.asarray(rng.normal(size=(300, 64)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(300, 64)).astype(np.float32))
    ref = dgl.gsddmm(g, "dot", x, y, "u", "v")
    out = dgl.gsddmm(gp, "dot", x, y, "u", "v")
    assert out.shape == (g.num_edges(), 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("op", ["add", "mul"])
def test_sddmm_e_op_v(rng, op):
    """Edge-side lhs: ZERO gathers in the fused path."""
    g, gp = _prep(rng)
    E = g.num_edges()
    e = jnp.asarray(rng.uniform(0.5, 2.0, (E, 16)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0.5, 2.0, (300, 16)).astype(np.float32))
    ref = dgl.gsddmm(g, op, e, y, "e", "v")
    out = dgl.gsddmm(gp, op, e, y, "e", "v")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_sddmm_v_side_swap(rng):
    """v-op-u normalises onto the fused path (incl. the sub sign flip)."""
    g, gp = _prep(rng)
    x = jnp.asarray(rng.uniform(0.5, 2.0, (300, 8)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0.5, 2.0, (300, 8)).astype(np.float32))
    for op in ("add", "mul", "sub", "dot", "copy_lhs"):
        kw = {}
        if op == "dot":
            continue  # dot needs 2-D which is fine but sub-case covered
        ref = dgl.gsddmm(g, op, y, x, "v", "u")
        out = dgl.gsddmm(gp, op, y, x, "v", "u")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6, err_msg=op)


def test_sddmm_eid_order(rng):
    g, gp = _prep(rng)
    x = jnp.asarray(rng.normal(size=(300, 8)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(300, 8)).astype(np.float32))
    ref = dgl.gsddmm(g, "add", x, y, "u", "v", out_order="eid")
    out = dgl.gsddmm(gp, "add", x, y, "u", "v", out_order="eid")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("op", ["add", "mul", "div", "dot"])
def test_sddmm_grad(rng, op):
    """Coupled VJP (scatter-free plan-kernel reductions) matches the
    composed autodiff gradient."""
    g, gp = _prep(rng, num_nodes=150, num_edges=1200)
    shape = (150, 16) if op != "dot" else (150, 24)
    x = jnp.asarray(rng.uniform(0.5, 2.0, shape).astype(np.float32))
    y = jnp.asarray(rng.uniform(0.5, 2.0, shape).astype(np.float32))
    E = g.num_edges()
    width = 1 if op == "dot" else 16
    tgt = jnp.asarray(rng.normal(size=(E, width)).astype(np.float32))

    def loss(graph):
        def f(x_, y_):
            out = dgl.gsddmm(graph, op, x_, y_, "u", "v")
            return ((out - tgt) ** 2).sum()
        return jax.grad(f, argnums=(0, 1))(x, y)

    gx_r, gy_r = loss(g)
    gx, gy = loss(gp)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(gy_r),
                               rtol=1e-4, atol=1e-5)


def test_sddmm_e_lhs_grad(rng):
    g, gp = _prep(rng, num_nodes=150, num_edges=1200)
    E = g.num_edges()
    e = jnp.asarray(rng.uniform(0.5, 2.0, (E, 8)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0.5, 2.0, (150, 8)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(E, 8)).astype(np.float32))

    def loss(graph):
        def f(e_, y_):
            return ((dgl.gsddmm(graph, "mul", e_, y_, "e", "v") - tgt) ** 2).sum()
        return jax.grad(f, argnums=(0, 1))(e, y)

    ge_r, gy_r = loss(g)
    ge, gy = loss(gp)
    np.testing.assert_allclose(np.asarray(ge), np.asarray(ge_r),
                               rtol=1e-4, atol=1e-5)
    # dy sums via the f32x2 plan reduce (~2^-16 relative)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(gy_r),
                               rtol=1e-4, atol=1e-3)


def test_sddmm_multihead_add(rng):
    """(N, H, 1) u_add_v — the GAT logit shape — flattens to width H."""
    g, gp = _prep(rng)
    el = jnp.asarray(rng.normal(size=(300, 4, 1)).astype(np.float32))
    er = jnp.asarray(rng.normal(size=(300, 4, 1)).astype(np.float32))
    ref = dgl.gsddmm(g, "add", el, er, "u", "v")
    out = dgl.gsddmm(gp, "add", el, er, "u", "v")
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_sddmm_multihead_dot(rng):
    """(N, H, D) dot contracts the last dim only (reference broadcast
    dot via CalcBcastInfo, src/kernel/binary_reduce.cc:96); the head-sum
    rides an exact in-kernel one-hot matmul — fwd AND grads."""
    g, gp = _prep(rng)
    H, D = 4, 16
    x = jnp.asarray(rng.normal(size=(300, H, D)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(300, H, D)).astype(np.float32))
    ref = dgl.gsddmm(g, "dot", x, y, "u", "v")
    out = dgl.gsddmm(gp, "dot", x, y, "u", "v")
    assert out.shape == (g.num_edges(), H, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    def loss_p(x_, y_):
        return (dgl.gsddmm(gp, "dot", x_, y_, "u", "v") ** 2).sum()

    def loss_r(x_, y_):
        return (dgl.gsddmm(g, "dot", x_, y_, "u", "v") ** 2).sum()

    gx, gy = jax.grad(loss_p, (0, 1))(x, y)
    rx, ry = jax.grad(loss_r, (0, 1))(x, y)
    # f32x2 plan-kernel accumulation noise ~1e-5 rel (same for H=1)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(ry),
                               rtol=1e-3, atol=5e-3)


def _gap_graph(rng, num_nodes=10000, num_edges=500):
    """Sparse graph whose dst ids cluster just past window boundaries,
    leaving huge zero-degree gaps — a te-edge run then spans far more
    than span distinct windows (the exact c73fce3 overflow scenario)."""
    tr = 128
    wins = rng.choice(num_nodes // tr, num_edges, replace=True)
    dst = (wins * tr + rng.integers(0, 4, num_edges)).astype(np.int32)
    src = rng.integers(0, num_nodes, num_edges).astype(np.int32)
    g = dgl.graph((src, dst), num_nodes=num_nodes)
    gp = dgl.prepare_spmm(g, dense_hub=False)
    # the scenario must actually overflow the rank-based window span
    assert gp.sddmm_plan_arrays[3].shape[0] > 0, "no overflow edges"
    return g, gp


@pytest.mark.parametrize("op", ["add", "mul", "dot", "copy_rhs"])
def test_sddmm_window_gap_overflow(rng, op):
    """Regression for the c73fce3 window-span bug: zero-degree dst gaps
    silently zeroed the dst operand for overflow edges.  fwd + grad."""
    g, gp = _gap_graph(rng)
    n = g.num_nodes()
    x = jnp.asarray(rng.uniform(0.5, 2.0, (n, 32)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0.5, 2.0, (n, 32)).astype(np.float32))
    ref = dgl.gsddmm(g, op, x, y, "u", "v")
    out = dgl.gsddmm(gp, op, x, y, "u", "v")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    if op != "copy_rhs":
        def loss_p(x_, y_):
            return (dgl.gsddmm(gp, op, x_, y_, "u", "v") ** 2).sum()

        def loss_r(x_, y_):
            return (dgl.gsddmm(g, op, x_, y_, "u", "v") ** 2).sum()

        gx, gy = jax.grad(loss_p, (0, 1))(x, y)
        rx, ry = jax.grad(loss_r, (0, 1))(x, y)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gy), np.asarray(ry),
                                   rtol=1e-4, atol=1e-4)
