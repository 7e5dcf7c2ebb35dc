"""Graph transforms (host-side preprocessing, numpy).

Reference: python/dgl/transform.py (khop, line_graph, to_bidirected,
add/remove_self_loop, compact_graphs, to_block, to_simple, remove_edges,
in/out_subgraph, knn_graph) backed by C++ in src/graph/transform/ — here
pure numpy/scipy since graph construction is host-side in the TPU design;
the device only ever sees the resulting static index arrays.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import scipy.sparse as sp

from .graph import Graph, _build

__all__ = ["khop_graph", "line_graph", "to_bidirected", "add_self_loop",
           "remove_self_loop", "to_simple", "remove_edges", "node_subgraph",
           "edge_subgraph", "in_subgraph", "out_subgraph", "compact_graphs",
           "to_block", "knn_graph", "laplacian_lambda_max", "khop_adj",
           "segmented_knn_graph"]


def _edges_np(g: Graph) -> Tuple[np.ndarray, np.ndarray]:
    return g.host_edges()


def _adj(g: Graph) -> sp.csr_matrix:
    s, d = _edges_np(g)
    n = g.num_nodes()
    return sp.csr_matrix((np.ones(len(s)), (s, d)), shape=(n, n))


def khop_graph(g: Graph, k: int) -> Graph:
    """Graph with edges u->v iff a k-hop path exists, with multiplicity
    (reference: transform.py khop_graph)."""
    a = _adj(g) ** k
    coo = a.tocoo()
    src = np.repeat(coo.row, coo.data.astype(np.int64))
    dst = np.repeat(coo.col, coo.data.astype(np.int64))
    return _build(src.astype(np.int32), dst.astype(np.int32),
                  g.num_nodes(), g.num_nodes(), is_block=False)


def line_graph(g: Graph, backtracking: bool = True) -> Graph:
    """Edge-adjacency graph: node per edge; edge (e1, e2) iff
    dst(e1) == src(e2) (reference: transform.py line_graph /
    GraphOp::LineGraph, src/graph/graph_op.cc)."""
    s, d = _edges_np(g)
    E = len(s)
    by_src: dict = {}
    for e in range(E):
        by_src.setdefault(s[e], []).append(e)
    ls, ld = [], []
    for e1 in range(E):
        for e2 in by_src.get(d[e1], ()):
            if not backtracking and s[e1] == d[e2] and d[e1] == s[e2]:
                continue
            ls.append(e1)
            ld.append(e2)
    return _build(np.asarray(ls, np.int32), np.asarray(ld, np.int32),
                  E, E, is_block=False)


def to_bidirected(g: Graph) -> Graph:
    """Symmetrized simple graph (reference: transform.py to_bidirected)."""
    s, d = _edges_np(g)
    ss = np.concatenate([s, d])
    dd = np.concatenate([d, s])
    uniq = np.unique(np.stack([ss, dd], 1), axis=0)
    return _build(uniq[:, 0].astype(np.int32), uniq[:, 1].astype(np.int32),
                  g.num_nodes(), g.num_nodes(), is_block=False)


def add_self_loop(g: Graph) -> Graph:
    s, d = _edges_np(g)
    loop = np.arange(g.num_nodes(), dtype=np.int32)
    return _build(np.concatenate([s, loop]).astype(np.int32),
                  np.concatenate([d, loop]).astype(np.int32),
                  g.num_nodes(), g.num_nodes(), is_block=False)


def remove_self_loop(g: Graph) -> Graph:
    s, d = _edges_np(g)
    keep = s != d
    return _build(s[keep].astype(np.int32), d[keep].astype(np.int32),
                  g.num_nodes(), g.num_nodes(), is_block=False)


def to_simple(g: Graph, return_counts: bool = False):
    """Deduplicate parallel edges (reference: transform.py to_simple)."""
    s, d = _edges_np(g)
    pairs, counts = np.unique(np.stack([s, d], 1), axis=0,
                              return_counts=True)
    out = _build(pairs[:, 0].astype(np.int32), pairs[:, 1].astype(np.int32),
                 g.num_src_nodes, g.num_dst_nodes, is_block=g.is_block)
    if return_counts:
        return out, counts.astype(np.int32)
    return out


def remove_edges(g: Graph, eids: Sequence[int]) -> Graph:
    """Remove edges by (user-order) id (reference: transform.py
    remove_edges; src/array/cpu/csr_remove.cc)."""
    s, d = _edges_np(g)
    keep = np.ones(len(s), bool)
    keep[np.asarray(eids, np.int64)] = False
    return _build(s[keep].astype(np.int32), d[keep].astype(np.int32),
                  g.num_src_nodes, g.num_dst_nodes, is_block=g.is_block)


def node_subgraph(g: Graph, nodes: Sequence[int],
                  relabel: bool = True):
    """Induced subgraph on ``nodes``; returns (subgraph, orig_node_ids,
    orig_edge_ids) (reference: src/graph/subgraph.cc VertexSubgraph)."""
    nodes = np.asarray(nodes, np.int64)
    s, d = _edges_np(g)
    sel = np.zeros(g.num_nodes(), bool)
    sel[nodes] = True
    keep = sel[s] & sel[d]
    eids = np.nonzero(keep)[0].astype(np.int32)
    new_id = np.full(g.num_nodes(), -1, np.int32)
    new_id[nodes] = np.arange(len(nodes), dtype=np.int32)
    sub = _build(new_id[s[keep]], new_id[d[keep]], len(nodes), len(nodes),
                 is_block=False)
    return sub, nodes.astype(np.int32), eids


def edge_subgraph(g: Graph, eids: Sequence[int], relabel_nodes: bool = True):
    """Subgraph of the given edges (reference: subgraph.cc EdgeSubgraph)."""
    eids = np.asarray(eids, np.int64)
    s, d = _edges_np(g)
    es, ed = s[eids], d[eids]
    if relabel_nodes:
        nodes = np.unique(np.concatenate([es, ed]))
        new_id = np.full(g.num_nodes(), -1, np.int32)
        new_id[nodes] = np.arange(len(nodes), dtype=np.int32)
        sub = _build(new_id[es], new_id[ed], len(nodes), len(nodes),
                     is_block=False)
        return sub, nodes.astype(np.int32), eids.astype(np.int32)
    sub = _build(es.astype(np.int32), ed.astype(np.int32),
                 g.num_nodes(), g.num_nodes(), is_block=False)
    return sub, np.arange(g.num_nodes(), dtype=np.int32), eids.astype(np.int32)


def in_subgraph(g: Graph, nodes: Sequence[int]):
    """All in-edges of ``nodes``, original node ids kept
    (reference: python/dgl/sampling in_subgraph)."""
    s, d = _edges_np(g)
    sel = np.zeros(g.num_dst_nodes, bool)
    sel[np.asarray(nodes, np.int64)] = True
    eids = np.nonzero(sel[d])[0]
    return edge_subgraph(g, eids, relabel_nodes=False)


def out_subgraph(g: Graph, nodes: Sequence[int]):
    s, d = _edges_np(g)
    sel = np.zeros(g.num_src_nodes, bool)
    sel[np.asarray(nodes, np.int64)] = True
    eids = np.nonzero(sel[s])[0]
    return edge_subgraph(g, eids, relabel_nodes=False)


def compact_graphs(graphs, always_preserve=None):
    """Drop nodes with no edges across all given (bipartite) graphs,
    relabelling consistently (reference: src/graph/transform/compact.cc:30).

    Returns (new_graphs, induced_src_nodes, induced_dst_nodes).
    """
    single = isinstance(graphs, Graph)
    if single:
        graphs = [graphs]
    src_used, dst_used = [], []
    for g in graphs:
        s, d = _edges_np(g)
        src_used.append(s)
        dst_used.append(d)
    if always_preserve is not None:
        dst_used.append(np.asarray(always_preserve, np.int32))
    src_ids = np.unique(np.concatenate(src_used)) if src_used else \
        np.zeros(0, np.int32)
    dst_ids = np.unique(np.concatenate(dst_used)) if dst_used else \
        np.zeros(0, np.int32)
    smap = np.full(graphs[0].num_src_nodes, -1, np.int32)
    smap[src_ids] = np.arange(len(src_ids), dtype=np.int32)
    dmap = np.full(graphs[0].num_dst_nodes, -1, np.int32)
    dmap[dst_ids] = np.arange(len(dst_ids), dtype=np.int32)
    outs = []
    for g in graphs:
        s, d = _edges_np(g)
        outs.append(_build(smap[s], dmap[d], len(src_ids), len(dst_ids),
                           is_block=g.is_block))
    if single:
        outs = outs[0]
    return outs, src_ids.astype(np.int32), dst_ids.astype(np.int32)


def to_block(frontier: Graph, dst_nodes: Optional[np.ndarray] = None,
             include_dst_in_src: bool = True,
             pad_num_src: Optional[int] = None,
             pad_num_edges: Optional[int] = None,
             device: bool = True):
    """Bipartite compaction of a sampled frontier — the minibatch block
    builder (reference: src/graph/transform/to_bipartite.cc:31, IdHashMap
    based, CPU-only there too).

    dst nodes are ``dst_nodes`` (default: unique dst of the frontier);
    src nodes are dst nodes first (so dstdata is a prefix of srcdata, the
    DGL block convention) followed by other source endpoints.  Optional
    ``pad_num_src``/``pad_num_edges`` produce static shapes for TPU
    minibatching: padded edges carry mask=False.

    Returns (block, src_orig_ids, dst_orig_ids).
    """
    s, d = _edges_np(frontier)
    if dst_nodes is None:
        dst_nodes = np.unique(d)
    dst_nodes = np.asarray(dst_nodes, np.int32)
    n_dst = len(dst_nodes)

    dmap = np.full(frontier.num_dst_nodes, -1, np.int32)
    dmap[dst_nodes] = np.arange(n_dst, dtype=np.int32)

    if include_dst_in_src:
        smap = np.full(frontier.num_src_nodes, -1, np.int64)
        smap[dst_nodes] = np.arange(n_dst)
        extra = np.unique(s[smap[s] < 0]) if len(s) else np.zeros(0, np.int64)
        extra = extra[smap[extra] < 0]
        smap[extra] = n_dst + np.arange(len(extra))
        src_ids = np.concatenate([dst_nodes, extra.astype(np.int32)])
    else:
        src_ids = np.unique(s)
        smap = np.full(frontier.num_src_nodes, -1, np.int64)
        smap[src_ids] = np.arange(len(src_ids))
    n_src = len(src_ids)

    bs = smap[s].astype(np.int32)
    bd = dmap[d]
    keep = bd >= 0
    bs, bd = bs[keep], bd[keep]
    E = len(bs)

    num_src = n_src if pad_num_src is None else max(pad_num_src, n_src)
    mask = None
    if pad_num_edges is not None:
        # always carry a mask (and identity perms, via force_perm) when
        # padding was requested, even at exact fit — padded blocks stay
        # structurally uniform across batches/devices (stackable pytrees,
        # single jit cache entry)
        pad = max(pad_num_edges - E, 0)
        bs = np.concatenate([bs, np.zeros(pad, np.int32)])
        bd = np.concatenate([bd, np.zeros(pad, np.int32)])
        mask = np.concatenate([np.ones(E, bool), np.zeros(pad, bool)])
    blk = _build(bs, bd, num_src, n_dst, is_block=True, edge_mask=mask,
                 force_perm=pad_num_edges is not None, device=device)
    if pad_num_src is not None and num_src > n_src:
        src_ids = np.concatenate(
            [src_ids, np.zeros(num_src - n_src, np.int32)])
    return blk, src_ids.astype(np.int32), dst_nodes


def laplacian_lambda_max(g: Graph) -> List[float]:
    """Largest eigenvalue of the symmetric normalized Laplacian
    ``I - D^-1/2 A D^-1/2`` per graph in the batch (reference:
    dgl.laplacian_lambda_max, python/dgl/transform.py — used to scale
    ChebConv).  Host-side scipy (one-time preprocessing, like the
    reference's CPU implementation)."""
    import scipy.sparse.linalg as spla
    sizes = getattr(g, "batch_num_nodes", None) or (g.num_nodes(),)
    s, d = _edges_np(g)
    out = []
    off = 0
    for n in sizes:
        m = (s >= off) & (s < off + n)
        a = sp.coo_matrix((np.ones(int(m.sum())), (s[m] - off, d[m] - off)),
                          shape=(n, n)).tocsr()
        deg = np.asarray(a.sum(1)).ravel()
        inv_sqrt = np.where(deg > 0, deg, 1.0) ** -0.5
        dmat = sp.diags(inv_sqrt)
        lap = sp.eye(n) - dmat @ a @ dmat
        if n <= 2:
            out.append(float(np.linalg.eigvals(lap.toarray()).real.max()))
        else:
            val = spla.eigs(lap, 1, which="LM", return_eigenvectors=False,
                            tol=1e-6)
            out.append(float(val.real[0]))
        off += n
    return out


def knn_graph(x: np.ndarray, k: int) -> Graph:
    """k-nearest-neighbour graph over point features
    (reference: transform.py knn_graph; nn factory KNNGraph)."""
    x = np.asarray(x)
    n = x.shape[0]
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    nbrs = np.argsort(d2, axis=1)[:, :k]
    dst = np.repeat(np.arange(n, dtype=np.int32), k)
    src = nbrs.reshape(-1).astype(np.int32)
    return _build(src, dst, n, n, is_block=False)


def reorder_graph(g: Graph, method: str = "degree"):
    """Relabel nodes to improve SpMM locality / kernel-plan density.

    methods: 'degree' (in-degree descending — clusters nonempty rows so
    the Pallas plan's windows are dense, see KERNELS.md), 'random'.
    Returns (new_graph, orig_ids) with orig_ids[new_id] = old_id, so
    features/labels follow via ``x_new = x[orig_ids]``.

    Reference analogue: DGL's reorder_graph / the locality experiments
    behind the fork's NbAccess kernels
    (src/kernel/cuda/binary_reduce_impl.cu:445-778).
    """
    n = g.num_nodes()
    if method == "degree":
        indptr = g.host("csc_indptr")
        deg = indptr[1:] - indptr[:-1]
        orig_ids = np.argsort(-deg, kind="stable").astype(np.int32)
    elif method == "random":
        orig_ids = np.random.default_rng(0).permutation(n).astype(np.int32)
    else:
        raise ValueError(method)
    new_id = np.empty(n, np.int32)
    new_id[orig_ids] = np.arange(n, dtype=np.int32)
    s, d = _edges_np(g)
    g2 = _build(new_id[s], new_id[d], n, n, is_block=False)
    return g2, orig_ids


def add_edges(g: Graph, src, dst) -> Graph:
    """Functional edge addition — rebuilds the immutable graph
    (reference: mutable Graph::AddEdges, src/graph/graph.cc; mutation is
    rebuild-by-design on TPU)."""
    s, d = _edges_np(g)
    s2 = np.concatenate([s, np.asarray(src, np.int32)])
    d2 = np.concatenate([d, np.asarray(dst, np.int32)])
    n = max(g.num_nodes(), int(s2.max(initial=-1)) + 1,
            int(d2.max(initial=-1)) + 1)
    return _build(s2.astype(np.int32), d2.astype(np.int32), n, n,
                  is_block=False)


def add_nodes(g: Graph, num: int) -> Graph:
    """Functional node addition (reference: Graph::AddVertices)."""
    s, d = _edges_np(g)
    n = g.num_nodes() + int(num)
    return _build(s, d, n, n, is_block=False)


def khop_adj(g: Graph, k: int) -> np.ndarray:
    """Dense k-hop adjacency A^k with A[dst, src] multiplicity semantics
    (reference: transform.py khop_adj — returns a dense tensor)."""
    a = _adj(g).T.astype(np.float64)     # A[v, u]: u -> v
    out = np.linalg.matrix_power(a.toarray(), k)
    return out.astype(np.float32)


def segmented_knn_graph(x, k: int, segs) -> Graph:
    """kNN graph per point segment, one unioned graph (reference:
    transform.py segmented_knn_graph)."""
    x = np.asarray(x)
    offs = np.concatenate([[0], np.cumsum(segs)]).astype(np.int64)
    srcs, dsts = [], []
    for i in range(len(segs)):
        xi = x[offs[i]:offs[i + 1]]
        d2 = ((xi[:, None] - xi[None]) ** 2).sum(-1)
        nbr = np.argsort(d2, axis=1)[:, :k]
        dsts.append(np.repeat(np.arange(len(xi)), k) + offs[i])
        srcs.append(nbr.reshape(-1) + offs[i])
    return _build(np.concatenate(srcs).astype(np.int32),
                  np.concatenate(dsts).astype(np.int32),
                  int(offs[-1]), int(offs[-1]), is_block=False)
