"""Hybrid dense-hub gspmm (dense C matmul for hub dst-windows + sparse
remainder plan) vs the reference segment-op path — the same oracle pattern
as test_pallas_spmm.py.  The hybrid path covers unweighted copy_u sum/mean
(reference: CopyReduce, src/kernel/binary_reduce.cc:628) on power-law
graphs, the load-imbalance case the fork's NbAccess experiments target."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dgl_hack_tpu as dgl
from dgl_hack_tpu.ops.pallas.spmm_kernel import select_dense_windows


def _skewed(rng, num_nodes=500, num_edges=4000):
    """Graph where a handful of dst nodes receive most edges."""
    src = rng.integers(0, num_nodes, num_edges).astype(np.int32)
    hub = rng.integers(0, 40, num_edges).astype(np.int32)   # windows 0
    tail = rng.integers(0, num_nodes, num_edges).astype(np.int32)
    take_hub = rng.random(num_edges) < 0.8
    dst = np.where(take_hub, hub, tail).astype(np.int32)
    return dgl.graph((src, dst), num_nodes=num_nodes)


@pytest.mark.parametrize("reducer", ["sum", "mean"])
def test_hybrid_copy_u(rng, reducer):
    g = _skewed(rng)
    gp = dgl.prepare_spmm(g, te=256, bc=8, wc=2, weighted=False,
                          dense_threshold=200)
    assert gp.spmm_hybrid_arrays is not None
    x = jnp.asarray(rng.normal(size=(500, 128)).astype(np.float32))
    ref = dgl.gspmm(g, "copy_lhs", reducer, x)
    out = dgl.gspmm(gp, "copy_lhs", reducer, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_hybrid_grad(rng):
    g = _skewed(rng, num_nodes=300, num_edges=2500)
    gp = dgl.prepare_spmm(g, te=256, bc=8, wc=2, weighted=False,
                          dense_threshold=150)
    assert gp.spmm_hybrid_arrays is not None
    x = jnp.asarray(rng.normal(size=(300, 32)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(300, 32)).astype(np.float32))

    def loss(graph, x_):
        out = dgl.gspmm(graph, "copy_lhs", "sum", x_)
        return ((out - tgt) ** 2).sum()

    gx_ref = jax.grad(loss, argnums=1)(g, x)
    gx_out = jax.grad(loss, argnums=1)(gp, x)
    np.testing.assert_allclose(np.asarray(gx_out), np.asarray(gx_ref),
                               rtol=1e-3, atol=1e-3)


def test_hybrid_all_windows_dense(rng):
    """threshold=1: every nonempty window goes dense, remainder empty."""
    g = _skewed(rng, num_nodes=200, num_edges=1500)
    gp = dgl.prepare_spmm(g, te=256, bc=8, wc=2, weighted=False,
                          dense_threshold=1)
    x = jnp.asarray(rng.normal(size=(200, 16)).astype(np.float32))
    ref = dgl.gspmm(g, "copy_lhs", "sum", x)
    out = dgl.gspmm(gp, "copy_lhs", "sum", x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_hybrid_multigraph_duplicate_edges(rng):
    """Duplicate (u, v) pairs: C carries exact small-int counts in int8."""
    src = np.repeat(rng.integers(0, 50, 100), 5).astype(np.int32)
    dst = np.repeat(rng.integers(0, 8, 100), 5).astype(np.int32)
    g = dgl.graph((src, dst), num_nodes=50)
    gp = dgl.prepare_spmm(g, te=256, bc=8, wc=2, weighted=False,
                          dense_threshold=1)
    assert gp.spmm_hybrid_arrays is not None
    x = jnp.asarray(rng.normal(size=(50, 16)).astype(np.float32))
    ref = dgl.gspmm(g, "copy_lhs", "sum", x)
    out = dgl.gspmm(gp, "copy_lhs", "sum", x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_hybrid_weighted_falls_back_to_full_plan(rng):
    """u_mul_e must not use the dense path (C is unweighted): with
    weighted=True both plans coexist and both ops match the oracle."""
    g = _skewed(rng)
    gp = dgl.prepare_spmm(g, te=256, bc=8, wc=2, weighted=True,
                          dense_threshold=200)
    assert gp.spmm_hybrid_arrays is not None
    assert gp.spmm_plan_arrays is not None
    E = g.num_edges()
    x = jnp.asarray(rng.normal(size=(500, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(E, 1)).astype(np.float32))
    for op, args in (("copy_lhs", (x,)), ("mul", (x, w, "u", "e"))):
        ref = dgl.gspmm(g, op, "sum", *args)
        out = dgl.gspmm(gp, op, "sum", *args)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


def test_hybrid_through_jit(rng):
    """Hybrid arrays ride the Graph pytree through jit."""
    g = _skewed(rng, num_nodes=300, num_edges=2500)
    gp = dgl.prepare_spmm(g, te=256, bc=8, wc=2, weighted=False,
                          dense_threshold=150)
    x = jnp.asarray(rng.normal(size=(300, 32)).astype(np.float32))

    @jax.jit
    def fwd(graph, feat):
        return dgl.gspmm(graph, "copy_lhs", "sum", feat)

    out = fwd(gp, x)
    ref = dgl.gspmm(g, "copy_lhs", "sum", x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_select_dense_windows_budget():
    """Budget caps the number of densified windows, heaviest first."""
    indptr = np.array([0, 1000, 1000, 1500, 1500, 1500, 3000, 3000, 3001])
    # tr=1: window counts = per-node in-degrees
    # bf16 C: budget counts 2 bytes per (row, src) cell
    wins = select_dense_windows(indptr, num_src=1000, num_dst=8, tr=1,
                                threshold=400, budget_bytes=2 * 1000 * 2)
    assert list(wins) == [0, 5]
    wins = demoted = select_dense_windows(indptr, num_src=1000, num_dst=8,
                                          tr=1, threshold=400,
                                          budget_bytes=1 * 1000 * 2)
    assert list(demoted) == [5]  # heaviest kept under a 1-window budget


def test_hybrid_3d_features(rng):
    """(N, H, D) features reshape through the hybrid path."""
    g = _skewed(rng, num_nodes=200, num_edges=1500)
    gp = dgl.prepare_spmm(g, te=256, bc=8, wc=2, weighted=False,
                          dense_threshold=100)
    x = jnp.asarray(rng.normal(size=(200, 4, 8)).astype(np.float32))
    ref = dgl.gspmm(g, "copy_lhs", "sum", x)
    out = dgl.gspmm(gp, "copy_lhs", "sum", x)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_hybrid_multigraph_over_exact_range_not_densified(rng):
    """Per-pair multiplicity past bf16's exact-int range (256) must drop
    the window from the dense path, falling back to the sparse plan —
    result still exact.  (int8 C storage is REFUTED: the int8->bf16
    convert into the TPU dot hangs the compile — KERNELS.md round 3.)"""
    src = np.repeat(rng.integers(0, 20, 4), 300).astype(np.int32)  # x300
    dst = np.repeat(rng.integers(0, 4, 4), 300).astype(np.int32)
    g = dgl.graph((src, dst), num_nodes=20)
    gp = dgl.prepare_spmm(g, te=256, bc=8, wc=2, weighted=False,
                          dense_threshold=1)
    # every window containing a >256-multiplicity pair was dropped
    if gp.spmm_hybrid_arrays is not None:
        C = np.asarray(gp.spmm_hybrid_arrays[-2]).astype(np.float32)
        assert C.max(initial=0) <= 256
    x = jnp.asarray(rng.normal(size=(20, 8)).astype(np.float32))
    ref = dgl.gspmm(g, "copy_lhs", "sum", x)
    out = dgl.gspmm(gp, "copy_lhs", "sum", x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
