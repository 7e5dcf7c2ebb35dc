"""Extra dataset families (reference: python/dgl/data/{ppi,tu,gindt,
gnn_benckmark,bitcoinotc,qm7b,gdelt,icews18}.py): synthetic-fallback smoke
tests + real-format parser tests against fixture files written in the
reference's on-disk formats."""
import json
import os

import numpy as np
import pytest

from dgl_hack_tpu import data as D


def test_ppi_synthetic_smoke():
    for mode, n in (("train", 20), ("valid", 2), ("test", 2)):
        ds = D.load_ppi(mode)
        assert len(ds) == n
        g, x, y = ds[0]
        assert x.shape[0] == g.num_nodes()
        assert y.shape == (g.num_nodes(), 121)
        assert set(np.unique(y)) <= {0.0, 1.0}


def test_ppi_real_parser(tmp_path, monkeypatch):
    monkeypatch.setenv("DGL_DOWNLOAD_DIR", str(tmp_path))
    root = tmp_path / "ppi"
    root.mkdir()
    # two tiny graphs in the reference's node-link + npy layout
    links = ([{"source": 0, "target": 1}, {"source": 1, "target": 2}]
             + [{"source": 3, "target": 4}])
    (root / "test_graph.json").write_text(json.dumps({"links": links}))
    np.save(root / "test_feats.npy", np.arange(10, dtype=np.float32
                                               ).reshape(5, 2))
    np.save(root / "test_labels.npy", np.ones((5, 121), np.float32))
    np.save(root / "test_graph_id.npy", np.array([1, 1, 1, 2, 2]))
    ds = D.load_ppi("test")
    assert len(ds) == 2
    g0, x0, y0 = ds[0]
    assert g0.num_nodes() == 3 and g0.num_edges() == 2
    g1, x1, y1 = ds[1]
    assert g1.num_nodes() == 2 and g1.num_edges() == 1
    np.testing.assert_array_equal(x1, [[6, 7], [8, 9]])


def test_tu_synthetic_and_gin():
    ds = D.TUDataset("synthetic", num_graphs=20)
    assert len(ds) == 20
    gin = D.GINDataset("synthetic", degree_as_nlabel=True, num_graphs=10)
    g, f = gin.graphs[0], gin.features[0]
    assert f.shape[0] == g.num_nodes()
    assert (f.sum(1) == 1).all()       # one-hot degrees


def test_tu_real_parser(tmp_path, monkeypatch):
    monkeypatch.setenv("DGL_DOWNLOAD_DIR", str(tmp_path))
    root = tmp_path / "tu" / "TOY"
    root.mkdir(parents=True)
    # graph 1: nodes 1-3 (triangle), graph 2: nodes 4-5 (one edge)
    (root / "TOY_A.txt").write_text("1, 2\n2, 3\n3, 1\n4, 5\n")
    (root / "TOY_graph_indicator.txt").write_text("1\n1\n1\n2\n2\n")
    (root / "TOY_graph_labels.txt").write_text("6\n-1\n")
    (root / "TOY_node_labels.txt").write_text("0\n1\n0\n1\n1\n")
    ds = D.TUDataset("TOY")
    assert len(ds) == 2 and ds.num_classes == 2
    assert sorted(ds.labels.tolist()) == [0, 1]
    assert ds.graphs[0].num_nodes() == 3 and ds.graphs[0].num_edges() == 3
    assert ds.graphs[1].num_nodes() == 2
    assert ds.features[0].shape == (3, 2)   # one-hot node labels


def test_gnn_benchmark_synthetic():
    ds = D.AmazonCoBuyPhotoDataset(scale=0.05)
    assert ds.num_classes == 8
    assert ds.features.shape[0] == ds.graph.num_nodes()
    ds2 = D.CoauthorCSDataset(scale=0.05)
    assert ds2.num_classes == 15


def test_gnn_benchmark_real_npz(tmp_path, monkeypatch):
    monkeypatch.setenv("DGL_DOWNLOAD_DIR", str(tmp_path))
    import scipy.sparse as sp
    rng = np.random.default_rng(0)
    n, f = 30, 6
    adj = sp.random(n, n, density=0.2, format="csr",
                    random_state=np.random.RandomState(0))
    attr = sp.random(n, f, density=0.5, format="csr",
                     random_state=np.random.RandomState(1))
    labels = rng.integers(0, 3, n)
    np.savez(tmp_path / "cora_full.npz",
             adj_data=adj.data, adj_indices=adj.indices,
             adj_indptr=adj.indptr, adj_shape=adj.shape,
             attr_data=attr.data, attr_indices=attr.indices,
             attr_indptr=attr.indptr, attr_shape=attr.shape,
             labels=labels)
    ds = D.CoraFullDataset()
    assert ds.graph.num_nodes() == n
    assert ds.graph.num_edges() == adj.nnz
    assert ds.features.shape == (n, f)
    assert ds.num_classes == int(labels.max()) + 1
    assert (ds.train_mask & ds.val_mask).sum() == 0


def test_bitcoinotc_synthetic():
    ds = D.load_bitcoinotc(num_spans=5, synth_nodes=100)
    assert len(ds) == 5
    g = ds[0]
    assert "h" in g.edata
    assert g.edata["h"].shape == (g.num_edges(), 1)


def test_qm7b_synthetic():
    ds = D.load_qm7b(num_synth=5)
    assert ds.labels.shape == (5, 14)
    g = ds.graphs[0]
    assert g.edata["h"].shape == (g.num_edges(), 1)


@pytest.mark.parametrize("loader", [D.GDELTDataset, D.ICEWS18Dataset])
def test_temporal_kg_synthetic(loader):
    tr = loader("train")
    assert tr.triplets.shape[1] == 4
    assert tr.triplets[:, [0, 2]].max() < tr.num_entities
    assert tr.triplets[:, 1].max() < tr.num_relations
    # timestamps non-decreasing (event-stream contract)
    assert (np.diff(tr.triplets[:, 3]) >= 0).all()
