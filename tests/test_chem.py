"""Chem model zoo + molecular dataset tests (counterpart of the
reference's model_zoo/chem, exercised the way tests/compute does:
shape/grad checks plus a short end-to-end fit on the synthetic data)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import dgl_hack_tpu as dgl
from dgl_hack_tpu.data.chem import (
    MoleculeCSVDataset, PubChemBioAssayAromaticity, TencentAlchemyDataset,
    Tox21)
from dgl_hack_tpu.models import chem


@pytest.fixture(scope="module")
def tox21():
    return Tox21(n_mols=32, seed=0)


@pytest.fixture(scope="module")
def alchemy():
    return TencentAlchemyDataset(n_mols=16, seed=0)


def _batch(ds, idx):
    graphs = [ds.graphs[i] for i in idx]
    return dgl.batch(graphs)


def test_tox21_dataset(tox21):
    assert tox21.n_tasks == 12
    smiles, g, label, mask = tox21[0]
    assert label.shape == (12,) and mask.shape == (12,)
    assert set(np.unique(tox21.labels)).issubset({0.0, 1.0})
    # missing labels exist and are masked
    assert tox21.mask.mean() < 1.0
    assert tox21.task_pos_weights.shape == (12,)
    assert np.all(tox21.task_pos_weights >= 0)
    assert "h" in g.ndata and g.ndata["h"].shape[1] == 14


def test_alchemy_dataset(alchemy):
    g, y = alchemy[0]
    assert y.shape == (12,)
    assert "atomic_number" in g.ndata
    d = np.asarray(g.edata["distance"])
    assert d.shape[1] == 1 and (d > 0).all()


def test_aromaticity_dataset():
    ds = PubChemBioAssayAromaticity(n_mols=8, seed=1)
    assert ds.n_tasks == 1 and len(ds) == 8


def test_schnet_mgcn_shapes(alchemy):
    bg = _batch(alchemy, range(4))
    atom = bg.ndata["atomic_number"]
    dist = bg.edata_internal["distance"]
    for model in (chem.SchNet(dim=16, n_conv=2, output_dim=12),
                  chem.MGCN(dim=16, edge_dim=16, n_conv=2, output_dim=12)):
        params = model.init(jax.random.PRNGKey(0), bg, atom, dist)
        out = model.apply(params, bg, atom, dist)
        assert out.shape == (4, 12)
        assert np.isfinite(np.asarray(out)).all()


def test_schnet_norm_stats(alchemy):
    bg = _batch(alchemy, range(2))
    model = chem.SchNet(dim=8, n_conv=1, output_dim=12, norm=True,
                        mean=5.0, std=2.0)
    params = model.init(jax.random.PRNGKey(0), bg,
                        bg.ndata["atomic_number"],
                        bg.edata_internal["distance"])
    out = model.apply(params, bg, bg.ndata["atomic_number"],
                      bg.edata_internal["distance"])
    assert out.shape == (2, 12)


def test_classifier_shapes_and_grads(tox21):
    bg = _batch(tox21, range(8))
    feats = bg.ndata["h"]
    y = jnp.asarray(tox21.labels[:8])
    w = jnp.asarray(tox21.mask[:8])
    for model in (chem.GCNClassifier(n_tasks=12, gcn_hidden_feats=(16, 16)),
                  chem.GATClassifier(n_tasks=12, gat_hidden_feats=(8, 8),
                                     num_heads=(2, 2))):
        params = model.init(jax.random.PRNGKey(0), bg, feats)

        def loss_fn(p):
            logits = model.apply(p, bg, feats)
            ls = optax.sigmoid_binary_cross_entropy(logits, y)
            return (ls * w).sum() / w.sum()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss))
        leaves = jax.tree_util.tree_leaves(grads)
        assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_attentivefp_node_weights(tox21):
    bg = _batch(tox21, range(4))
    model = chem.AttentiveFP(num_layers=2, num_timesteps=2,
                             graph_feat_size=16, output_size=12)
    feats, efeats = bg.ndata["h"], bg.edata_internal["e"]
    params = model.init(jax.random.PRNGKey(0), bg, feats, efeats)
    out, weights = model.apply(params, bg, feats, efeats,
                               get_node_weight=True)
    assert out.shape == (4, 12)
    assert len(weights) == 2 and weights[0].shape == (bg.num_nodes(), 1)
    # per-graph attention normalizes to 1
    s = dgl.sum_nodes(bg, weights[0])
    assert np.allclose(np.asarray(s), 1.0, atol=1e-4)


def test_mpnn_fits_synthetic(alchemy):
    """End-to-end: MPNN loss decreases on a tiny alchemy batch."""
    bg = _batch(alchemy, range(8))
    feats, efeats = bg.ndata["h"], bg.edata_internal["e"]
    y = jnp.asarray(alchemy.labels[:8])
    y = (y - y.mean(0)) / (y.std(0) + 1e-6)
    model = chem.MPNN(output_dim=12, node_hidden_dim=16, edge_hidden_dim=16,
                      num_step_message_passing=2, num_step_set2set=2)
    params = model.init(jax.random.PRNGKey(0), bg, feats, efeats)
    opt = optax.adam(1e-2)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            pred = model.apply(p, bg, feats, efeats)
            return jnp.mean((pred - y) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    first = None
    for i in range(60):
        params, state, loss = step(params, state)
        if first is None:
            first = float(loss)
    assert float(loss) < 0.7 * first


def test_weight_and_sum_permutation_invariance():
    from dgl_hack_tpu.nn import WeightAndSum
    rng = np.random.default_rng(0)
    src = rng.integers(0, 10, 20).astype(np.int32)
    dst = rng.integers(0, 10, 20).astype(np.int32)
    g = dgl.graph((src, dst), num_nodes=10)
    x = jnp.asarray(rng.random((10, 6), dtype=np.float32))
    m = WeightAndSum()
    params = m.init(jax.random.PRNGKey(0), g, x)
    out = m.apply(params, g, x)
    perm = rng.permutation(10)
    out_p = m.apply(params, g, x[perm])  # node order within one graph
    assert np.allclose(np.asarray(out), np.asarray(out_p), atol=1e-5)


def _geo_graph(rng, n):
    import dgl_hack_tpu as dgl
    coords = rng.random((n, 3)) * 6
    d2 = np.sqrt(((coords[:, None] - coords[None]) ** 2).sum(-1))
    src, dst = np.nonzero((d2 < 3.0) & (d2 > 0))
    g = dgl.graph((src.astype(np.int32), dst.astype(np.int32)), num_nodes=n)
    g.ndata["atomic_number"] = rng.choice(
        [6.0, 7.0, 8.0], n).astype(np.float32).reshape(-1, 1)
    g.edata["distance"] = d2[src, dst].astype(np.float32).reshape(-1, 1)
    return g


def test_atomic_conv_types_and_cutoff():
    from dgl_hack_tpu.nn import AtomicConv
    rng = np.random.default_rng(3)
    g = _geo_graph(rng, 10)
    conv = AtomicConv(interaction_cutoffs=(2.5,), rbf_kernel_means=(0., 2.),
                      rbf_kernel_scaling=(4.,), features_to_use=(6., 7., 8.))
    feat = g.ndata["atomic_number"]
    dist = g.edata_internal["distance"]
    params = conv.init(jax.random.PRNGKey(0), g, feat, dist)
    out = conv.apply(params, g, feat, dist)
    assert out.shape == (10, 2 * 3)       # K=2 filters x T=3 types
    # edges beyond the cutoff contribute nothing: shrink cutoff -> out
    # for an isolated-far graph is 0
    g2 = _geo_graph(rng, 8)
    far = conv.apply(params, g2, g2.ndata["atomic_number"],
                     g2.edata_internal["distance"] * 100.0)
    assert np.allclose(np.asarray(far), 0.0, atol=1e-6)
    # type pooling: per-type columns only collect same-type neighbors
    an = np.asarray(g.ndata["atomic_number"]).ravel()
    col = np.asarray(out).reshape(10, 2, 3)
    s, d = g.host_edges()
    for t, z in enumerate([6.0, 7.0, 8.0]):
        has_nbr = np.zeros(10, bool)
        for u, v in zip(s, d):
            if an[u] == z:
                has_nbr[v] = True
        assert np.all(np.abs(col[~has_nbr, :, t]) < 1e-6)


def test_acnn_end_to_end():
    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.models.chem import ACNN
    rng = np.random.default_rng(0)
    pairs = []
    for _ in range(3):
        lig, prot = _geo_graph(rng, 5), _geo_graph(rng, 12)
        comp = _geo_graph(rng, 17)
        mask = np.zeros(17, np.float32)
        mask[:5] = 1
        pairs.append((lig, prot, comp, mask))
    ligs, prots, comps, masks = zip(*pairs)
    blg, bpr, bcx = (dgl.batch(list(x)) for x in (ligs, prots, comps))
    bmask = jnp.asarray(np.concatenate(masks))
    m = ACNN(features_to_use=(6.0, 7.0, 8.0), num_tasks=2)
    params = m.init(jax.random.PRNGKey(0), blg, bpr, bcx, bmask)
    out = m.apply(params, blg, bpr, bcx, bmask)
    assert out.shape == (3, 2) and np.isfinite(np.asarray(out)).all()
    grads = jax.grad(lambda p: m.apply(p, blg, bpr, bcx, bmask).sum())(params)
    assert any(float(jnp.abs(l).sum()) > 0
               for l in jax.tree_util.tree_leaves(grads))
