"""Graph batching — disjoint union with static per-graph segment info.

Reference: python/dgl/batched_graph.py (BatchedDGLGraph) and
python/dgl/graph.py:4029,4241 (batch/unbatch).  The TPU formulation keeps
per-graph node/edge counts as *static* aux data, so per-graph readout
segment ids are compile-time constants — no dynamic bookkeeping arrays.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from .graph import Graph, _build


def batch(graphs: Sequence[Graph]) -> Graph:
    """Disjoint union of homogeneous graphs; features are concatenated.

    The result carries ``batch_num_nodes``/``batch_num_edges`` (tuples of
    ints) used by readout ops.
    """
    if any(g.is_block for g in graphs):
        raise ValueError("cannot batch blocks")
    n_nodes = [g.num_nodes() for g in graphs]
    n_edges = [g.num_edges() for g in graphs]
    node_off = np.concatenate([[0], np.cumsum(n_nodes)])
    srcs, dsts = [], []
    for g, off in zip(graphs, node_off[:-1]):
        s, d = g.host_edges()
        srcs.append(s + off)
        dsts.append(d + off)
    src = np.concatenate(srcs) if srcs else np.zeros(0, np.int32)
    dst = np.concatenate(dsts) if dsts else np.zeros(0, np.int32)
    bg = _build(src.astype(np.int32), dst.astype(np.int32),
                int(node_off[-1]), int(node_off[-1]), is_block=False)
    bg.batch_num_nodes = tuple(n_nodes)
    bg.batch_num_edges = tuple(n_edges)
    # concatenate features present in every graph
    if graphs:
        common_n = set(graphs[0].ndata.keys())
        common_e = set(graphs[0].edata.keys())
        for g in graphs[1:]:
            common_n &= set(g.ndata.keys())
            common_e &= set(g.edata.keys())
        for k in sorted(common_n):
            bg.ndata[k] = jnp.concatenate([g.ndata[k] for g in graphs])
        for k in sorted(common_e):
            bg.edata[k] = jnp.concatenate([g.edata[k] for g in graphs])
    return bg


def unbatch(bg: Graph) -> List[Graph]:
    """Split a batched graph back into components (reference:
    graph.py:4241)."""
    n_nodes = getattr(bg, "batch_num_nodes", None)
    if n_nodes is None:
        raise ValueError("graph was not produced by batch()")
    n_edges = bg.batch_num_edges
    node_off = np.concatenate([[0], np.cumsum(n_nodes)])
    edge_off = np.concatenate([[0], np.cumsum(n_edges)])
    src, dst = bg.host_edges()
    out = []
    for i, (nn_, ne) in enumerate(zip(n_nodes, n_edges)):
        s = src[edge_off[i]:edge_off[i + 1]] - node_off[i]
        d = dst[edge_off[i]:edge_off[i + 1]] - node_off[i]
        g = _build(s.astype(np.int32), d.astype(np.int32), nn_, nn_,
                   is_block=False)
        for k in bg.ndata.keys():
            g.ndata[k] = bg.ndata[k][node_off[i]:node_off[i + 1]]
        for k in bg.edata.keys():
            g.edata[k] = bg.edata[k][edge_off[i]:edge_off[i + 1]]
        out.append(g)
    return out


def node_segment_ids(bg: Graph) -> jnp.ndarray:
    """(num_nodes,) graph id per node — a compile-time constant."""
    return jnp.asarray(np.repeat(np.arange(len(bg.batch_num_nodes)),
                                 bg.batch_num_nodes).astype(np.int32))


def edge_segment_ids(bg: Graph) -> jnp.ndarray:
    ids = np.repeat(np.arange(len(bg.batch_num_edges)),
                    bg.batch_num_edges).astype(np.int32)
    ids = jnp.asarray(ids)
    if bg.int2user is not None:
        ids = ids[bg.int2user]  # internal order
    return ids


def num_graphs(bg: Graph) -> int:
    return len(getattr(bg, "batch_num_nodes", (0,)))


def batch_hetero(graphs):
    """Disjoint union of heterographs sharing one metagraph; per-ntype
    node frames and per-relation edge frames are concatenated (common
    fields only).  Reference: dgl.batch_hetero
    (python/dgl/batched_heterograph.py:390)."""
    from .heterograph import HeteroGraph
    if not graphs:
        raise ValueError("batch_hetero needs at least one graph")
    cets = graphs[0].canonical_etypes
    ntypes = graphs[0].ntypes
    for g in graphs[1:]:
        if g.canonical_etypes != cets or g.ntypes != ntypes:
            raise ValueError("heterographs must share one metagraph")

    bnn = {nt: tuple(g.num_nodes(nt) for g in graphs) for nt in ntypes}
    bne = {c: tuple(g.num_edges(c) for g in graphs) for c in cets}
    node_off = {nt: np.concatenate([[0], np.cumsum(bnn[nt])])
                for nt in ntypes}
    num_nodes = {nt: int(node_off[nt][-1]) for nt in ntypes}

    relations = {}
    for c in cets:
        st, _, dt = c
        srcs, dsts = [], []
        for i, g in enumerate(graphs):
            s, d = g.relations[c].host_edges()
            srcs.append(s + node_off[st][i])
            dsts.append(d + node_off[dt][i])
        src = np.concatenate(srcs).astype(np.int32)
        dst = np.concatenate(dsts).astype(np.int32)
        rel = _build(src, dst, num_nodes[st], num_nodes[dt],
                     is_block=(st != dt))
        common_e = set(graphs[0].relations[c].edata.keys())
        for g in graphs[1:]:
            common_e &= set(g.relations[c].edata.keys())
        for k in sorted(common_e):
            rel.edata[k] = jnp.concatenate(
                [g.relations[c].edata[k] for g in graphs])
        relations[c] = rel

    node_frames = {}
    for nt in ntypes:
        common_n = set(graphs[0].nodes_data(nt).keys())
        for g in graphs[1:]:
            common_n &= set(g.nodes_data(nt).keys())
        node_frames[nt] = {k: jnp.concatenate(
            [g.nodes_data(nt)[k] for g in graphs]) for k in sorted(common_n)}

    return HeteroGraph(relations, num_nodes, node_frames,
                       batch_info=(bnn, bne))


def unbatch_hetero(bg):
    """Split a batched heterograph back into components (reference:
    python/dgl/batched_heterograph.py:334)."""
    from .heterograph import HeteroGraph
    if bg._batch_info is None:
        raise ValueError("graph was not produced by batch_hetero()")
    bnn, bne = bg._batch_info
    B = bg.batch_size
    node_off = {nt: np.concatenate([[0], np.cumsum(cnt)])
                for nt, cnt in bnn.items()}
    edge_off = {c: np.concatenate([[0], np.cumsum(cnt)])
                for c, cnt in bne.items()}
    out = []
    for i in range(B):
        rels, frames = {}, {}
        for c, rel in bg.relations.items():
            st, _, dt = c
            s, d = rel.host_edges()
            e0, e1 = edge_off[c][i], edge_off[c][i + 1]
            rg = _build((s[e0:e1] - node_off[st][i]).astype(np.int32),
                        (d[e0:e1] - node_off[dt][i]).astype(np.int32),
                        int(bnn[st][i]), int(bnn[dt][i]),
                        is_block=(st != dt))
            for k in rel.edata.keys():
                rg.edata[k] = rel.edata[k][e0:e1]
            rels[c] = rg
        for nt, cnt in bnn.items():
            n0, n1 = node_off[nt][i], node_off[nt][i + 1]
            view = bg.nodes_data(nt)
            frames[nt] = {k: view[k][n0:n1] for k in view.keys()}
        out.append(HeteroGraph(rels, {nt: int(c[i]) for nt, c in bnn.items()},
                               frames))
    return out
