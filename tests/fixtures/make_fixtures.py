"""Generate the checked-in mini-fixtures that exercise every REAL
dataset-parse path offline (VERDICT r1 item 4).

Each fixture is byte-accurate to the format the reference consumes:
* planetoid ``ind.<name>.*`` pickles + test.index
  (reference parser: python/dgl/data/citation_graph.py:433-file _load)
* TU text files (reference: python/dgl/data/tu.py)
* gnn-benchmark npz (reference: python/dgl/data/gnn_benckmark.py)
* reddit npz pair (reference: python/dgl/data/reddit.py)
* PPI node-link json + npy (reference: python/dgl/data/ppi.py)
* KG triple TSVs + dicts (reference: python/dgl/contrib/data/
  knowledge_graph.py; apps/kg dataset layout)
* RDF preprocessed npz (our on-disk format for data/rdf.py)
* bitcoinotc csv, qm7b .mat, GDELT/ICEWS18 quad TSVs

Deterministic (seeded); run ``python tests/fixtures/make_fixtures.py`` to
regenerate.  The files are committed so the parse paths run in CI without
egress.
"""
import json
import os
import pickle

import numpy as np
import scipy.sparse as sp

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.join(HERE, "data")


def _dir(*parts):
    p = os.path.join(ROOT, *parts)
    os.makedirs(p, exist_ok=True)
    return p


def planetoid(name, n_train, n_allx, n_test, f, c, gap=False, seed=0):
    """ind.<name>.{x,y,tx,ty,allx,ally,graph} + test.index.

    Layout (matching the real files): nodes 0..n_allx-1 are allx rows
    (first n_train of them are the x training rows), test nodes occupy
    ids n_allx..; test.index lists them SHUFFLED.  gap=True leaves holes
    in the test range (citeseer's isolated test nodes).
    """
    rng = np.random.default_rng(seed)
    root = _dir(name)
    n_range = n_test + (3 if gap else 0)     # test ids span a wider range
    n = n_allx + n_range
    feats = (rng.random((n, f)) < 0.3).astype(np.float32)
    labels = rng.integers(0, c, n)
    onehot = np.eye(c, dtype=np.int32)[labels]

    test_ids = np.arange(n_allx, n_allx + n_range)
    if gap:
        # drop INTERIOR ids only (real citeseer's isolated test nodes are
        # interior holes; first and last test ids exist)
        test_ids = np.delete(test_ids, [1, 4, 7])[:n_test]
    shuf = rng.permutation(n_test)
    test_index = test_ids[shuf]

    x = sp.csr_matrix(feats[:n_train])
    y = onehot[:n_train]
    allx = sp.csr_matrix(feats[:n_allx])
    ally = onehot[:n_allx]
    # tx/ty rows are in test.index FILE order (the parser's
    # features[test_idx] = features[test_range] permutation undoes this —
    # same quirk as the real planetoid files)
    tx = sp.csr_matrix(feats[test_index])
    ty = onehot[test_index]

    graph = {}
    for u in range(n):
        nbrs = rng.choice(n, size=3, replace=False)
        graph[int(u)] = [int(v) for v in nbrs if v != u]

    for ext, obj in [("x", x), ("y", y), ("tx", tx), ("ty", ty),
                     ("allx", allx), ("ally", ally), ("graph", graph)]:
        with open(os.path.join(root, f"ind.{name}.{ext}"), "wb") as fh:
            pickle.dump(obj, fh, protocol=2)
    with open(os.path.join(root, f"ind.{name}.test.index"), "w") as fh:
        fh.write("\n".join(str(i) for i in test_index) + "\n")
    n_parsed = n_allx + (int(test_ids.max()) - n_allx + 1)
    meta = dict(n=n_parsed, f=f, c=c, n_train=n_train,
                test_index=[int(i) for i in test_index],
                labels=[int(v) for v in labels[:n_parsed]],
                raw_feats_sum=float(feats[:n_parsed].sum()))
    with open(os.path.join(root, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def tu(name="MINI", seed=1):
    rng = np.random.default_rng(seed)
    root = _dir("tu", name)
    sizes = [4, 5, 3]
    glabels = [7, 9, 7]                       # non-contiguous -> remap
    rows_a, gi = [], []
    off = 0
    for g, sz in enumerate(sizes):
        for u in range(sz):
            gi.append(g + 1)
        for u in range(sz):                    # ring edges, 1-based global
            v = (u + 1) % sz
            rows_a.append((off + u + 1, off + v + 1))
            rows_a.append((off + v + 1, off + u + 1))
        off += sz
    with open(os.path.join(root, f"{name}_A.txt"), "w") as fh:
        fh.write("\n".join(f"{a}, {b}" for a, b in rows_a) + "\n")
    with open(os.path.join(root, f"{name}_graph_indicator.txt"), "w") as fh:
        fh.write("\n".join(map(str, gi)) + "\n")
    with open(os.path.join(root, f"{name}_graph_labels.txt"), "w") as fh:
        fh.write("\n".join(map(str, glabels)) + "\n")
    attrs = rng.random((sum(sizes), 3)).round(4)
    with open(os.path.join(root, f"{name}_node_attributes.txt"), "w") as fh:
        fh.write("\n".join(", ".join(f"{x:.4f}" for x in row)
                           for row in attrs) + "\n")
    meta = dict(sizes=sizes, glabels=glabels, attrs_sum=float(attrs.sum()))
    with open(os.path.join(root, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def gnn_benchmark(name="amazon_co_buy_computer", n=30, f=6, c=3, seed=2):
    rng = np.random.default_rng(seed)
    root = _dir()
    adj = sp.random(n, n, density=0.15, random_state=2, format="csr")
    adj.setdiag(0)
    adj.eliminate_zeros()
    attr = sp.random(n, f, density=0.4, random_state=3, format="csr")
    labels = rng.integers(0, c, n).astype(np.int64)
    np.savez(os.path.join(root, f"{name}.npz"),
             adj_data=adj.data, adj_indices=adj.indices,
             adj_indptr=adj.indptr, adj_shape=np.asarray(adj.shape),
             attr_data=attr.data, attr_indices=attr.indices,
             attr_indptr=attr.indptr, attr_shape=np.asarray(attr.shape),
             labels=labels)
    meta = dict(n=n, f=f, c=c, nnz=int(adj.nnz),
                labels=[int(v) for v in labels])
    with open(os.path.join(root, f"{name}.meta.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def reddit(n=40, f=5, c=4, seed=3):
    rng = np.random.default_rng(seed)
    root = _dir("reddit")
    adj = sp.random(n, n, density=0.1, random_state=4, format="coo")
    types = rng.choice([1, 2, 3], size=n)     # 1=train 2=val 3=test
    np.savez(os.path.join(root, "reddit_data.npz"),
             feature=rng.random((n, f)).astype(np.float32),
             label=rng.integers(0, c, n).astype(np.int64),
             node_types=types,
             node_ids=np.arange(n))
    sp.save_npz(os.path.join(root, "reddit_graph.npz"), adj.tocsr())
    meta = dict(n=n, f=f, c=c, nnz=int(adj.nnz),
                types=[int(v) for v in types])
    with open(os.path.join(root, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def ppi(n_graphs=3, nodes_per=6, f=4, L=3, seed=4):
    rng = np.random.default_rng(seed)
    root = _dir("ppi")
    n = n_graphs * nodes_per
    gid = np.repeat(np.arange(n_graphs), nodes_per)
    links = []
    for g in range(n_graphs):
        lo = g * nodes_per
        for u in range(nodes_per):
            links.append({"source": int(lo + u),
                          "target": int(lo + (u + 1) % nodes_per)})
    for mode in ("train", "valid", "test"):
        with open(os.path.join(root, f"{mode}_graph.json"), "w") as fh:
            json.dump({"nodes": [{"id": int(i)} for i in range(n)],
                       "links": links}, fh)
        np.save(os.path.join(root, f"{mode}_feats.npy"),
                rng.random((n, f)).astype(np.float32))
        np.save(os.path.join(root, f"{mode}_labels.npy"),
                (rng.random((n, L)) < 0.5).astype(np.int64))
        np.save(os.path.join(root, f"{mode}_graph_id.npy"), gid)
    return dict(n_graphs=n_graphs, nodes_per=nodes_per, f=f, L=L)


def kg(name="FB15k", ne=20, nr=4, seed=5):
    rng = np.random.default_rng(seed)
    root = _dir(name)
    ents = [f"/m/ent{i:03d}" for i in range(ne)]
    rels = [f"/rel/r{i}" for i in range(nr)]
    with open(os.path.join(root, "entities.dict"), "w") as fh:
        fh.write("\n".join(f"{i}\t{e}" for i, e in enumerate(ents)) + "\n")
    with open(os.path.join(root, "relations.dict"), "w") as fh:
        fh.write("\n".join(f"{i}\t{r}" for i, r in enumerate(rels)) + "\n")
    counts = {"train": 60, "valid": 10, "test": 12}
    out = {}
    for split, cnt in counts.items():
        h = rng.integers(0, ne, cnt)
        r = rng.integers(0, nr, cnt)
        t = rng.integers(0, ne, cnt)
        with open(os.path.join(root, f"{split}.txt"), "w") as fh:
            fh.write("\n".join(f"{ents[hh]}\t{rels[rr]}\t{ents[tt]}"
                               for hh, rr, tt in zip(h, r, t)) + "\n")
        out[split] = [[int(v) for v in a] for a in (h, r, t)]
    meta = dict(ne=ne, nr=nr, counts=counts, triples=out)
    with open(os.path.join(root, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def rdf(name="aifb", n=25, R=5, C=3, E=80, seed=6):
    rng = np.random.default_rng(seed)
    root = _dir(name)
    src = rng.integers(0, n, E).astype(np.int32)
    dst = rng.integers(0, n, E).astype(np.int32)
    ety = rng.integers(0, R, E).astype(np.int32)
    labels = rng.integers(0, C, n).astype(np.int32)
    train = np.zeros(n, bool)
    test = np.zeros(n, bool)
    train[:10] = True
    test[10:14] = True
    np.savez(os.path.join(root, f"{name}.npz"), src=src, dst=dst,
             etypes=ety, labels=labels, train_mask=train, test_mask=test,
             num_nodes=n, num_classes=C, num_rels=R)
    return dict(n=n, R=R, C=C, E=E)


def bitcoinotc(seed=7):
    rng = np.random.default_rng(seed)
    root = _dir()
    E, n = 50, 12
    span = 14 * 24 * 3600.0
    rows = []
    for i in range(E):
        t = 1.2e9 + float(rng.integers(0, 3)) * span + \
            float(rng.integers(0, span))
        rows.append((int(rng.integers(0, n)), int(rng.integers(0, n)),
                     int(rng.integers(-10, 11)), t))
    with open(os.path.join(root, "soc-sign-bitcoinotc.csv"), "w") as fh:
        fh.write("\n".join(f"{a},{b},{r},{t:.1f}" for a, b, r, t in rows)
                 + "\n")
    return dict(E=E)


def qm7b(n_mols=4, seed=8):
    import scipy.io as sio
    rng = np.random.default_rng(seed)
    root = _dir()
    X = rng.normal(size=(n_mols, 23, 23)).astype(np.float32)
    X = np.abs(X + X.transpose(0, 2, 1)) * (rng.random(X.shape) < 0.3)
    T = rng.normal(size=(n_mols, 14)).astype(np.float32)
    sio.savemat(os.path.join(root, "qm7b.mat"), {"X": X, "T": T})
    return dict(n_mols=n_mols)


def temporal_kg(name, seed=9):
    rng = np.random.default_rng(seed)
    root = _dir(name)
    for mode, cnt in (("train", 30), ("valid", 8), ("test", 8)):
        q = np.stack([rng.integers(0, 15, cnt), rng.integers(0, 4, cnt),
                      rng.integers(0, 15, cnt),
                      np.sort(rng.integers(0, 100, cnt))], 1)
        np.savetxt(os.path.join(root, f"{mode}.txt"), q, fmt="%d",
                   delimiter="\t")


def main():
    planetoid("cora", n_train=12, n_allx=520, n_test=20, f=8, c=3)
    planetoid("citeseer", n_train=10, n_allx=515, n_test=15, f=6, c=3,
              gap=True, seed=10)
    tu()
    gnn_benchmark()
    reddit()
    ppi()
    kg()
    rdf()
    bitcoinotc()
    qm7b()
    temporal_kg("GDELT")
    temporal_kg("ICEWS18")
    print(f"fixtures written under {ROOT}")


if __name__ == "__main__":
    main()
