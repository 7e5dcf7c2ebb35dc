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
