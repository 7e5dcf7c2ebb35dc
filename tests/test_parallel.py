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


def test_halo_gspmm_hub_replication(mesh, rng=np.random.default_rng(7)):
    """Hub replication (hub_k>0): hub sources broadcast via all_gather
    instead of pairwise halo sends; fwd AND grad must match the
    single-device oracle on a power-law graph where hubs matter."""
    n, e, F = 300, 3000, 16
    deg = np.clip(rng.pareto(1.1, n) + 1, 1, None)
    src = rng.choice(n, e, p=deg / deg.sum()).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    g = dgl.graph((src, dst), num_nodes=n)
    x = rng.normal(size=(n, F)).astype(np.float32)

    plan0 = build_spatial_plan(g, 8, method="random", seed=0)
    plan = build_spatial_plan(g, 8, method="random", seed=0, hub_k=16)
    assert plan.hk_max > 0
    # replication must shrink the padded pairwise send buffer
    assert plan.s_max < plan0.s_max, (plan.s_max, plan0.s_max)
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
        out_sh = jax.jit(halo_fn)(xs, dev)
        gx_sh = jax.jit(jax.grad(loss_sh))(xs)
    out = unshard_rows(plan, np.asarray(out_sh), n)
    ref = np.asarray(dgl.gspmm(g, "copy_lhs", "sum", jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
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


def test_spatial_gcn_matches_single(mesh, rng=np.random.default_rng(2)):
    """Full 2-layer distributed GCN forward == single-device GraphConv
    stack with the same params."""
    import dgl_hack_tpu.nn as gnn
    from dgl_hack_tpu.parallel import make_spatial_gcn
    n, e, F, H, C = 160, 900, 12, 8, 4
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    g = dgl.graph((src, dst), num_nodes=n)
    x = rng.normal(size=(n, F)).astype(np.float32)

    plan = build_spatial_plan(g, 8, method="random", seed=0)
    dev = plan.device_arrays()
    init, forward = make_spatial_gcn(plan, mesh, hidden=H, out_feats=C)
    params = init(jax.random.PRNGKey(0), F)
    xs = jnp.asarray(shard_features(plan, x))
    with mesh:
        logits_sh = jax.jit(forward)(params, xs, dev)
    got = unshard_rows(plan, np.asarray(logits_sh), n)

    # reference: stacked GraphConv with the same weights
    l1 = gnn.GraphConv(out_feats=H)
    l2 = gnn.GraphConv(out_feats=C)
    h = l1.apply({"params": {"weight": params["W1"], "bias": params["b1"]}},
                 g, jnp.asarray(x))
    h = jax.nn.relu(h)
    ref = l2.apply({"params": {"weight": params["W2"], "bias": params["b2"]}},
                   g, h)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_spatial_train_step_learns(mesh, rng=np.random.default_rng(3)):
    import optax
    from dgl_hack_tpu.parallel import make_spatial_gcn, spatial_train_step
    from dgl_hack_tpu.data import planted_partition
    ds = planted_partition(160, 4, 12, avg_degree=6.0, homophily=0.9,
                           feat_noise=1.0, seed=0, train_per_class=15,
                           num_val=20, num_test=40)
    plan = build_spatial_plan(ds.graph, 8, method="random", seed=0)
    dev = plan.device_arrays()
    init, forward = make_spatial_gcn(plan, mesh, hidden=16, out_feats=4)
    params = init(jax.random.PRNGKey(0), 12)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    step = spatial_train_step(forward, tx)
    xs = jnp.asarray(shard_features(plan, ds.features))
    labels = jnp.asarray(shard_features(plan, ds.labels))
    mask = jnp.asarray(shard_features(
        plan, ds.train_mask & np.asarray(plan is not None)))
    losses = []
    with mesh:
        for _ in range(40):
            params, opt_state, loss = step(params, opt_state, xs, dev,
                                           labels, mask)
            losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0], losses[::10]


def _rand_graph(rng, n, e):
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    return dgl.graph((src, dst), num_nodes=n)


@pytest.mark.parametrize("reduce_op", ["sum", "mean", "max", "min"])
def test_halo_gspmm_overlap_reducers(mesh, reduce_op,
                                     rng=np.random.default_rng(4)):
    """Overlap-split halo gspmm (local edges reduce while the all_to_all
    is in flight) must match the single-device reducer exactly, including
    max/min identity handling on one-sided dsts."""
    n, e, F = 150, 900, 8
    g = _rand_graph(rng, n, e)
    x = rng.normal(size=(n, F)).astype(np.float32)
    plan = build_spatial_plan(g, 8, method="random", seed=0)
    dev = plan.device_arrays()
    xs = jnp.asarray(shard_features(plan, x))
    halo_fn = make_halo_gspmm(plan, mesh, reduce_op=reduce_op, overlap=True)
    with mesh:
        out_sh = jax.jit(halo_fn)(xs, dev)
    out = unshard_rows(plan, np.asarray(out_sh), n)
    ref = np.asarray(dgl.gspmm(g, "copy_lhs", reduce_op, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_halo_gspmm_weighted_u_mul_e(mesh, rng=np.random.default_rng(5)):
    """Per-edge weights in split plan order (u_mul_e sum) — the halo path
    the reference serves via KVStore pulls for weighted aggregation."""
    from dgl_hack_tpu.parallel import shard_edata
    n, e, F = 120, 700, 8
    g = _rand_graph(rng, n, e)
    x = rng.normal(size=(n, F)).astype(np.float32)
    w = rng.normal(size=(e,)).astype(np.float32)
    plan = build_spatial_plan(g, 8, method="random", seed=0)
    dev = plan.device_arrays()
    w_l, w_r = shard_edata(plan, w, layout="split")
    halo_fn = make_halo_gspmm(plan, mesh, reduce_op="sum", weighted=True,
                              overlap=True)
    xs = jnp.asarray(shard_features(plan, x))
    with mesh:
        out_sh = jax.jit(halo_fn)(xs, dev, jnp.asarray(w_l),
                                  jnp.asarray(w_r))
    out = unshard_rows(plan, np.asarray(out_sh), n)
    w_int = w if g.int2user is None else w[np.asarray(g.int2user)]
    ref = np.asarray(dgl.gspmm(g, "mul", "sum", jnp.asarray(x),
                               jnp.asarray(w_int)[:, None], "u", "e"))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_spatial_gat_matches_single(mesh, rng=np.random.default_rng(6)):
    """Distributed 2-layer GAT (halo exchange + LOCAL edge_softmax) ==
    single-device GATConv stack with the same params, fwd AND grad."""
    from dgl_hack_tpu.nn import GATConv
    from dgl_hack_tpu.parallel import make_spatial_gat
    n, e, F, H, C = 120, 700, 10, 6, 4
    g = _rand_graph(rng, n, e)
    x = rng.normal(size=(n, F)).astype(np.float32)
    plan = build_spatial_plan(g, 8, method="random", seed=0)
    dev = plan.device_arrays()
    init, fwd = make_spatial_gat(plan, mesh, hidden=H, out_feats=C,
                                 heads=(4, 1))
    params = init(jax.random.PRNGKey(0), F)
    xs = jnp.asarray(shard_features(plan, x))
    with mesh:
        got_sh = jax.jit(fwd)(params, xs, dev)
    got = unshard_rows(plan, np.asarray(got_sh), n)

    # single-device oracle with the SAME params: bipartite (x, x) feeds
    # the same fc_src/fc_dst kernels
    l1 = GATConv(out_feats=H, num_heads=4)
    l2 = GATConv(out_feats=C, num_heads=1)
    h = l1.apply(params["l1"], g, (jnp.asarray(x), jnp.asarray(x)))
    h = jax.nn.elu(h).reshape(n, -1)
    ref = l2.apply(params["l2"], g, (h, h)).mean(axis=1)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-3, atol=2e-3)

    # grads wrt params must match too (DDP equivalence through shard_map)
    def loss_sh(p):
        return (jax.jit(fwd)(p, xs, dev) ** 2).sum()

    def loss_ref(p):
        hh = l1.apply(p["l1"], g, (jnp.asarray(x), jnp.asarray(x)))
        hh = jax.nn.elu(hh).reshape(n, -1)
        return (l2.apply(p["l2"], g, (hh, hh)).mean(axis=1) ** 2).sum()

    with mesh:
        g_sh = jax.grad(loss_sh)(params)
    g_ref = jax.grad(loss_ref)(params)
    flat_sh = jax.tree_util.tree_leaves(g_sh)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    for a, b in zip(flat_sh, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_spatial_rgcn_matches_single(mesh, rng=np.random.default_rng(7)):
    """Distributed R-GCN with per-etype typing through the plan =="""
    from dgl_hack_tpu.nn import RelGraphConv
    from dgl_hack_tpu.parallel import make_spatial_rgcn, shard_edata
    n, e, F, H, C, R = 100, 600, 8, 12, 3, 5
    g = _rand_graph(rng, n, e)
    x = rng.normal(size=(n, F)).astype(np.float32)
    etypes = rng.integers(0, R, e).astype(np.int32)
    plan = build_spatial_plan(g, 8, method="random", seed=0)
    dev = plan.device_arrays()
    init, fwd = make_spatial_rgcn(plan, mesh, hidden=H, out_feats=C,
                                  num_rels=R, num_bases=3)
    params = init(jax.random.PRNGKey(0), F)
    xs = jnp.asarray(shard_features(plan, x))
    ets = jnp.asarray(shard_edata(plan, etypes))
    with mesh:
        got_sh = jax.jit(fwd)(params, xs, dev, ets)
    got = unshard_rows(plan, np.asarray(got_sh), n)

    l1 = RelGraphConv(out_feats=H, num_rels=R, num_bases=3)
    l2 = RelGraphConv(out_feats=C, num_rels=R, num_bases=3)
    h = l1.apply(params["l1"], g, jnp.asarray(x), jnp.asarray(etypes))
    h = jax.nn.relu(h)
    ref = l2.apply(params["l2"], g, h, jnp.asarray(etypes))
    np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_spatial_gat_train_step_learns(mesh):
    import optax
    from dgl_hack_tpu.data import planted_partition
    from dgl_hack_tpu.parallel import make_spatial_gat, spatial_train_step
    ds = planted_partition(160, 4, 12, avg_degree=6.0, homophily=0.9,
                           feat_noise=1.0, seed=0, train_per_class=15,
                           num_val=20, num_test=40)
    plan = build_spatial_plan(ds.graph, 8, method="random", seed=0)
    dev = plan.device_arrays()
    init, fwd = make_spatial_gat(plan, mesh, hidden=8, out_feats=4,
                                 heads=(4, 1))
    params = init(jax.random.PRNGKey(0), 12)
    tx = optax.adam(1e-2)
    step = spatial_train_step(fwd, tx)
    xs = jnp.asarray(shard_features(plan, ds.features))
    labels = jnp.asarray(shard_features(plan, ds.labels))
    mask = jnp.asarray(shard_features(plan, ds.train_mask))
    losses = []
    opt_state = tx.init(params)
    with mesh:
        for _ in range(30):
            params, opt_state, loss = step(params, opt_state, xs, dev,
                                           labels, mask)
            losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0], losses[::10]


def test_sampled_dp_sage_multichip(mesh, rng=np.random.default_rng(8)):
    """Multi-chip sampled-minibatch GraphSAGE: seeds sharded across the
    mesh, per-device padded block stacks, psum'd grads == the mean of
    per-device single-chip losses/grads (reference:
    examples/pytorch/graphsage/train_sampling_multi_gpu.py)."""
    import optax
    from dgl_hack_tpu.models import GraphSAGE
    from dgl_hack_tpu.sampling import MultiLayerNeighborSampler
    from dgl_hack_tpu.parallel.spmd import (make_sampled_dp_step,
                                            sample_sharded_batch)
    n, e, F, C, B = 300, 2400, 8, 4, 16
    g = _rand_graph(rng, n, e)
    x = rng.normal(size=(n, F)).astype(np.float32)
    y = rng.integers(0, C, n).astype(np.int32)
    model = GraphSAGE(hidden_feats=8, out_feats=C, num_layers=2,
                      dropout=0.0)
    sampler = MultiLayerNeighborSampler([3, 3], replace=True, pad=True,
                                        seed=0)
    seed_shards = rng.integers(0, n, (8, B)).astype(np.int32)
    blocks, xs, ys = sample_sharded_batch(g, sampler, seed_shards, x, y)

    params = model.init(jax.random.PRNGKey(0),
                        jax.tree.map(lambda a: a[0], blocks), xs[0])
    tx = optax.adam(1e-2)
    step = make_sampled_dp_step(model, tx, mesh)
    with mesh:
        new_params, opt_state, loss = step(params, tx.init(params), blocks,
                                           xs, ys)
    loss = float(loss)

    # single-device oracle: mean of per-device losses
    def dev_loss(p, i):
        blk = jax.tree.map(lambda a: a[i], blocks)
        logits = model.apply(p, blk, xs[i])
        logp = jax.nn.log_softmax(logits)
        return -jnp.take_along_axis(
            logp, ys[i][..., None].astype(jnp.int32), axis=-1).mean()

    ref_losses = [float(dev_loss(params, i)) for i in range(8)]
    np.testing.assert_allclose(loss, np.mean(ref_losses), rtol=1e-5)

    def total(p):
        return sum(dev_loss(p, i) for i in range(8)) / 8.0

    g_ref = jax.grad(total)(params)
    # grads: recompute through the dp step's mapped fn by finite update
    # equivalence — instead compare updated params directions
    upd_ref, _ = tx.update(g_ref, tx.init(params), params)
    p_ref = optax.apply_updates(params, upd_ref)
    for a, b in zip(jax.tree_util.tree_leaves(new_params),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# round 4: Pallas plans threaded into the spatial path (attach_spmm_plans)
# ---------------------------------------------------------------------------
def _planned_setup(rng, n=400, e=3000, F=12, hub_k=8, flat_width=128):
    from dgl_hack_tpu.parallel import attach_spmm_plans
    g = _rand_graph(rng, n, e)
    x = rng.normal(size=(n, F)).astype(np.float32)
    plan = build_spatial_plan(g, 8, method="fennel", seed=0, hub_k=hub_k)
    planp = attach_spmm_plans(plan, te=64, flat_width=flat_width)
    return g, x, plan, planp


@pytest.mark.parametrize("reduce_op", ["sum", "mean", "max", "min"])
def test_spatial_plans_halo_gspmm(mesh, reduce_op,
                                  rng=np.random.default_rng(40)):
    """Plan-driven split reduce == composed split reduce == 1-chip oracle."""
    g, x, plan, planp = _planned_setup(rng)
    assert planp.spmm_meta_local is not None
    dev = planp.device_arrays()
    assert "spl_0" in dev and "spr_0" in dev and "spg_0" in dev
    xs = jnp.asarray(shard_features(planp, x))
    fn = make_halo_gspmm(planp, mesh, reduce_op=reduce_op, overlap=True)
    with mesh:
        out_sh = jax.jit(fn)(xs, dev)
    out = unshard_rows(planp, np.asarray(out_sh), g.num_nodes())
    ref = np.asarray(dgl.gspmm(g, "copy_lhs", reduce_op, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_spatial_plans_weighted_grads(mesh, rng=np.random.default_rng(41)):
    """u_mul_e over attached plans: dx/dw match the no-plan spatial path
    (whose own correctness vs single-chip is covered above)."""
    from dgl_hack_tpu.parallel.halo import shard_edata
    g, x, plan, planp = _planned_setup(rng)
    e = g.num_edges()
    w = rng.normal(size=(e,)).astype(np.float32)
    wl, wr = (jnp.asarray(a) for a in shard_edata(plan, w, layout="split"))
    dev_p, dev_r = planp.device_arrays(), plan.device_arrays()
    f_p = make_halo_gspmm(planp, mesh, reduce_op="sum", weighted=True)
    f_r = make_halo_gspmm(plan, mesh, reduce_op="sum", weighted=True)
    xs = jnp.asarray(shard_features(plan, x))

    def loss(f, dev):
        def inner(xs_, wl_, wr_):
            return (jax.jit(f)(xs_, dev, wl_, wr_) ** 2).sum()
        return inner

    with mesh:
        gp = jax.grad(loss(f_p, dev_p), argnums=(0, 1, 2))(xs, wl, wr)
        gr = jax.grad(loss(f_r, dev_r), argnums=(0, 1, 2))(xs, wl, wr)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_spatial_plans_gat_fused(mesh, rng=np.random.default_rng(42)):
    """Spatial GAT with 'graph' plans attached (fused Pallas kernel inside
    shard_map, mask-aware) == the composed spatial GAT, fwd + param grads.
    The round-4 deliverable: single-chip kernel wins serving the
    multi-chip path (VERDICT r3 #1)."""
    from dgl_hack_tpu.parallel import make_spatial_gat
    H, hid, C, F = 4, 8, 4, 10
    g, x, plan, planp = _planned_setup(rng, F=F,
                                       flat_width=H * hid + 2 * H)
    dev_p, dev_r = planp.device_arrays(), plan.device_arrays()
    init_p, fwd_p = make_spatial_gat(planp, mesh, hidden=hid, out_feats=C,
                                     heads=(H, 1))
    init_r, fwd_r = make_spatial_gat(plan, mesh, hidden=hid, out_feats=C,
                                     heads=(H, 1))
    xs = jnp.asarray(shard_features(planp, x))
    with mesh:
        params = init_p(jax.random.PRNGKey(0), F)

    def loss(fwd, dev):
        def inner(p):
            return (jax.jit(fwd)(p, xs, dev) ** 2).sum()
        return inner

    with mesh:
        lp, gp = jax.value_and_grad(loss(fwd_p, dev_p))(params)
        lr, gr = jax.value_and_grad(loss(fwd_r, dev_r))(params)
    np.testing.assert_allclose(float(lp), float(lr), rtol=1e-3)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-4)


def test_masked_prepare_spmm(rng=np.random.default_rng(43)):
    """prepare_spmm on an edge_mask graph builds mask-aware plans; fwd and
    grads match the composed masked path, padded dw rows stay zero."""
    from dgl_hack_tpu.ops.pallas.spmm_kernel import plan_info
    from dgl_hack_tpu.ops.spmm import gspmm
    n, e = 300, 2500
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    mask = rng.random(e) < 0.8
    g = dgl.graph((src, dst), num_nodes=n, edge_mask=mask)
    gp = dgl.prepare_spmm(g, te=64)
    assert plan_info(gp.spmm_plan_meta).masked
    x = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(e, 1)).astype(np.float32))
    for red in ("sum", "mean", "max", "min"):
        np.testing.assert_allclose(
            np.asarray(gspmm(gp, "copy_lhs", red, x)),
            np.asarray(gspmm(g, "copy_lhs", red, x)),
            rtol=1e-4, atol=1e-4)

    def f(graph, x_, w_):
        return (gspmm(graph, "mul", "sum", x_, w_, "u", "e") ** 2).sum()

    gx_p, gw_p = jax.grad(f, argnums=(1, 2))(gp, x, w)
    gx_c, gw_c = jax.grad(f, argnums=(1, 2))(g, x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_c),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_c),
                               rtol=1e-3, atol=1e-4)
    mask_int = mask if gp.int2user is None \
        else mask[np.asarray(gp.int2user)]
    assert np.allclose(np.asarray(gw_p)[~mask_int], 0.0)


def test_spatial_dense_hub(mesh, rng=np.random.default_rng(45)):
    """DISTRIBUTED dense-hub (build_spatial_plan dense_threshold=...):
    hub dst rows via column-sliced C matmuls + one psum_scatter, the
    rest over the reduced halo — matches the 1-chip oracle fwd (sum and
    mean, with and without attached plans) and in gradient."""
    from dgl_hack_tpu.parallel import attach_spmm_plans
    n, e = 1500, 15000
    w = (np.arange(n) + 1.0) ** -0.8
    w /= w.sum()
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.choice(n, e, p=w).astype(np.int32)
    g = dgl.graph((src, dst), num_nodes=n)
    x = rng.normal(size=(n, 12)).astype(np.float32)
    plan = build_spatial_plan(g, 8, method="fennel", seed=0, hub_k=8,
                              dense_threshold=40)
    st = plan.stats()
    assert plan.reduced is not None and st["dense_edge_frac"] > 0.1
    assert st["cut_fraction_reduced"] < st["cut_fraction"]
    xs = jnp.asarray(shard_features(plan, x))
    for planp in (plan, attach_spmm_plans(plan, te=64)):
        dev = planp.device_arrays()
        assert "dC" in dev
        for red in ("sum", "mean"):
            f = make_halo_gspmm(planp, mesh, reduce_op=red)
            with mesh:
                out = jax.jit(f)(xs, dev)
            got = unshard_rows(planp, np.asarray(out), n)
            ref = np.asarray(dgl.gspmm(g, "copy_lhs", red,
                                       jnp.asarray(x)))
            np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-4)

    planp = attach_spmm_plans(plan, te=64)
    dev = planp.device_arrays()
    f = make_halo_gspmm(planp, mesh, reduce_op="sum")

    def loss(xs_):
        with mesh:
            return (jax.jit(f)(xs_, dev) ** 2).sum()

    gx = unshard_rows(planp, np.asarray(jax.grad(loss)(xs)), n)
    gref = np.asarray(jax.grad(
        lambda x_: (dgl.gspmm(g, "copy_lhs", "sum", x_) ** 2).sum())(
        jnp.asarray(x)))
    np.testing.assert_allclose(gx, gref, rtol=1e-4, atol=1e-3)
