"""Per-graph readouts over batched graphs.

Reference: python/dgl/readout.py (sum/mean/max/softmax/broadcast/topk over
per-graph segments).  Segment ids are compile-time constants derived from
the batch's static per-graph counts, so every readout is a single fused
segment op on TPU.
"""
from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core import batch as batch_mod
from ..core.graph import Graph
from . import segment

Array = jax.Array


def _node_ids(g: Graph):
    if g.batch_num_nodes is None:
        return jnp.zeros((g.num_dst_nodes,), jnp.int32), 1
    return batch_mod.node_segment_ids(g), len(g.batch_num_nodes)


def _edge_ids(g: Graph):
    if g.batch_num_edges is None:
        return jnp.zeros((g.num_edges_static,), jnp.int32), 1
    return batch_mod.edge_segment_ids(g), len(g.batch_num_edges)


def _resolve_n(g: Graph, feat: Union[str, Array]) -> Array:
    return g.ndata[feat] if isinstance(feat, str) else feat


def _resolve_e(g: Graph, feat: Union[str, Array]) -> Array:
    """Edge readouts consume internal-order data."""
    return g.edata_internal[feat] if isinstance(feat, str) else feat


def _weighted(x: Array, w: Optional[Array]) -> Array:
    if w is None:
        return x
    return x * w.reshape(w.shape + (1,) * (x.ndim - w.ndim))


def sum_nodes(g, feat, weight=None):
    ids, n = _node_ids(g)
    x = _weighted(_resolve_n(g, feat),
                  None if weight is None else _resolve_n(g, weight))
    return segment.segment_sum(x, ids, n, indices_are_sorted=True)


def mean_nodes(g, feat, weight=None):
    ids, n = _node_ids(g)
    x = _weighted(_resolve_n(g, feat),
                  None if weight is None else _resolve_n(g, weight))
    return segment.segment_mean(x, ids, n, indices_are_sorted=True)


def max_nodes(g, feat):
    ids, n = _node_ids(g)
    return segment.segment_max(_resolve_n(g, feat), ids, n,
                               indices_are_sorted=True)


def sum_edges(g, feat, weight=None):
    ids, n = _edge_ids(g)
    x = _weighted(_resolve_e(g, feat),
                  None if weight is None else _resolve_e(g, weight))
    return segment.segment_sum(x, ids, n)


def mean_edges(g, feat, weight=None):
    ids, n = _edge_ids(g)
    x = _weighted(_resolve_e(g, feat),
                  None if weight is None else _resolve_e(g, weight))
    return segment.segment_mean(x, ids, n)


def max_edges(g, feat):
    ids, n = _edge_ids(g)
    return segment.segment_max(_resolve_e(g, feat), ids, n)


def softmax_nodes(g, feat):
    ids, n = _node_ids(g)
    return segment.segment_softmax(_resolve_n(g, feat), ids, n,
                                   indices_are_sorted=True)


def softmax_edges(g, feat):
    ids, n = _edge_ids(g)
    return segment.segment_softmax(_resolve_e(g, feat), ids, n)


def broadcast_nodes(g, value: Array) -> Array:
    """(num_graphs, *) -> (num_nodes, *) per-graph broadcast."""
    ids, _ = _node_ids(g)
    return value[ids]


def broadcast_edges(g, value: Array) -> Array:
    ids, _ = _edge_ids(g)
    return value[ids]


def topk_nodes(g, feat, k: int, descending: bool = True, idx: Optional[int] = None):
    """Per-graph top-k (reference: readout.py topk_nodes).

    Returns (num_graphs, k, feat_dim) values.  Implemented by scattering
    into a dense (num_graphs, max_n, D) buffer padded with -inf — static
    shapes, one sort on device.  If ``idx`` is given, rows are ranked by
    feature column ``idx`` (values of all columns returned); otherwise
    each column is ranked independently.
    """
    x = _resolve_n(g, feat)
    counts = g.batch_num_nodes if g.batch_num_nodes is not None \
        else (g.num_dst_nodes,)
    nG, max_n = len(counts), max(counts)
    offs = np.concatenate([[0], np.cumsum(counts)])
    gid = np.repeat(np.arange(nG), counts).astype(np.int32)
    pos = (np.arange(offs[-1]) - offs[gid]).astype(np.int32)
    pad = -jnp.inf if descending else jnp.inf
    dense = jnp.full((nG, max_n) + x.shape[1:], pad, x.dtype)
    dense = dense.at[jnp.asarray(gid), jnp.asarray(pos)].set(x)
    if idx is None:
        srt = jnp.sort(dense, axis=1)
        srt = srt[:, ::-1] if descending else srt
        return srt[:, :k]
    order = jnp.argsort(dense[..., idx], axis=1)
    order = order[:, ::-1] if descending else order
    return jnp.take_along_axis(dense, order[..., None], axis=1)[:, :k]


def topk_edges(g, feat, k: int, descending: bool = True,
               idx: Optional[int] = None):
    """Per-graph top-k over edge features (reference: readout.py
    topk_edges); same dense-padded formulation as topk_nodes."""
    x = _resolve_e(g, feat)
    counts = g.batch_num_edges if g.batch_num_edges is not None \
        else (g.num_edges_static,)
    nG, max_n = len(counts), max(counts)
    offs = np.concatenate([[0], np.cumsum(counts)])
    gid = np.repeat(np.arange(nG), counts).astype(np.int32)
    pos = (np.arange(offs[-1]) - offs[gid]).astype(np.int32)
    pad = -jnp.inf if descending else jnp.inf
    dense = jnp.full((nG, max_n) + x.shape[1:], pad, x.dtype)
    dense = dense.at[jnp.asarray(gid), jnp.asarray(pos)].set(x)
    if idx is None:
        srt = jnp.sort(dense, axis=1)
        srt = srt[:, ::-1] if descending else srt
        return srt[:, :k]
    order = jnp.argsort(dense[..., idx], axis=1)
    order = order[:, ::-1] if descending else order
    return jnp.take_along_axis(dense, order[..., None], axis=1)[:, :k]
