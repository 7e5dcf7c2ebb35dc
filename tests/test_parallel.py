"""Multi-chip tests on the 8-device virtual CPU mesh: halo-exchange
spatial gspmm vs single-device reference, fwd + grad (the distributed
correctness test the reference runs over localhost sockets,
tests/compute/test_kvstore.py — here it's one compiled program)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

import dgl_hack_tpu as dgl
from dgl_hack_tpu.parallel import (
    build_spatial_plan, shard_features, unshard_rows, make_halo_gspmm,
    make_mesh,
)


@pytest.fixture(scope="module")
def mesh():
    devs = np.asarray(jax.devices()[:8])
    return Mesh(devs, ("node",))


def test_halo_gspmm_matches_single(mesh, rng=np.random.default_rng(0)):
    n, e, F = 200, 1200, 16
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    g = dgl.graph((src, dst), num_nodes=n)
    x = rng.normal(size=(n, F)).astype(np.float32)

    plan = build_spatial_plan(g, 8, method="random", seed=0)
    dev = plan.device_arrays()
    xs = jnp.asarray(shard_features(plan, x))
    halo_fn = make_halo_gspmm(plan, mesh)

    with mesh:
        out_sh = jax.jit(halo_fn)(xs, dev)
    out = unshard_rows(plan, np.asarray(out_sh), n)
    ref = np.asarray(dgl.gspmm(g, "copy_lhs", "sum", jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_halo_gspmm_grad(mesh, rng=np.random.default_rng(1)):
    n, e, F = 100, 600, 8
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    g = dgl.graph((src, dst), num_nodes=n)
    x = rng.normal(size=(n, F)).astype(np.float32)

    plan = build_spatial_plan(g, 8, method="random", seed=0)
    dev = plan.device_arrays()
    xs = jnp.asarray(shard_features(plan, x))
    halo_fn = make_halo_gspmm(plan, mesh)

    def loss_sh(xs_):
        o = halo_fn(xs_, dev)
        return (o * o).sum()

    def loss_ref(x_):
        o = dgl.gspmm(g, "copy_lhs", "sum", x_)
        return (o * o).sum()

    with mesh:
        gx_sh = jax.jit(jax.grad(loss_sh))(xs)
    gx = unshard_rows(plan, np.asarray(gx_sh), n)
    gref = np.asarray(jax.grad(loss_ref)(jnp.asarray(x)))
    np.testing.assert_allclose(gx, gref, rtol=1e-3, atol=1e-3)


def test_spmd_dryrun():
    """The __graft_entry__ dryrun path on the virtual mesh."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
