"""Neighbor sampling -> static-shape minibatch blocks.

Reference: dgl.sampling.sample_neighbors (python/dgl/sampling/neighbor.py:14
-> src/graph/sampling/neighbor/neighbor.cc:20 -> per-etype
aten::CSRRowWiseSampling, src/array/cpu/rowwise_sampling.cc with OpenMP
rowwise_pick.h).  Sampling stays host-side (numpy) exactly as in the
reference (their kernels are CPU-only too); the TPU twist is **padded
static shapes**: with replace=True each block has exactly
len(seeds)*fanout edges; with replace=False blocks are padded to that
bound with masked edges, so every minibatch compiles once.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..core.graph import Graph, _build
from ..core.transform import to_block


class _HostCSC:
    """Cached numpy view of a Graph's CSC arrays for fast host sampling."""

    def __init__(self, g: Graph):
        self.indptr = g.host("csc_indptr")
        self.src = g.host("src")
        self.eid = (g.host("int2user") if g.int2user is not None
                    else np.arange(len(self.src), dtype=np.int32))
        self.num_src = g.num_src_nodes
        self.num_dst = g.num_dst_nodes


def _get_csc(g: Graph) -> _HostCSC:
    cache = getattr(g, "_host_csc", None)
    if cache is None:
        cache = _HostCSC(g)
        g._host_csc = cache
    return cache


def sample_neighbors(g: Graph, nodes: Sequence[int], fanout: int,
                     replace: bool = False,
                     prob: Optional[np.ndarray] = None,
                     rng: Optional[np.random.Generator] = None,
                     device: bool = True) -> Tuple[Graph, np.ndarray]:
    """Pick up to ``fanout`` in-edges per seed (fanout=-1: all).

    Returns (frontier, edge_ids): frontier keeps ORIGINAL node ids (same
    num_nodes as g) like the reference; edge_ids are user-order ids of the
    sampled edges (the reference stores them as EID edata).
    """
    rng = rng or np.random.default_rng()
    csc = _get_csc(g)
    nodes = np.asarray(nodes, dtype=np.int64)
    starts = csc.indptr[nodes].astype(np.int64)
    degs = (csc.indptr[nodes + 1] - csc.indptr[nodes]).astype(np.int64)

    if fanout >= 0 and prob is None:
        # native OpenMP sampler (reference: src/array/cpu/
        # rowwise_sampling.cc); numpy fallback below
        from ..native import rowwise_sample_native
        res = rowwise_sample_native(csc.indptr, csc.src, nodes, fanout,
                                    replace, int(rng.integers(1 << 62)))
        if res is not None:
            pos, counts = res
            dst_sel = np.repeat(nodes, counts)
            src_sel = csc.src[pos]
            eids = csc.eid[pos]
            frontier = _build(src_sel.astype(np.int32),
                              dst_sel.astype(np.int32), csc.num_src,
                              csc.num_dst, is_block=False, build_csr=False,
                              device=device)
            return frontier, eids.astype(np.int32)

    if fanout < 0:          # take all in-edges
        pos = np.concatenate([np.arange(s, s + c)
                              for s, c in zip(starts, degs)]) \
            if len(nodes) else np.zeros(0, np.int64)
        dst_sel = np.repeat(nodes, degs)
    elif replace and prob is None:
        # vectorised: fanout uniform picks per seed (zero-degree -> none)
        nz = degs > 0
        r = rng.random((nz.sum(), fanout))
        pick = (r * degs[nz][:, None]).astype(np.int64)
        pos = (starts[nz][:, None] + pick).reshape(-1)
        dst_sel = np.repeat(nodes[nz], fanout)
    elif replace:
        # weighted with replacement: vectorised inverse-CDF over the
        # per-seed edge-weight prefix sums (reference: ArrayHeap sampling,
        # src/graph/sampler.cc:28)
        nz = degs > 0
        w = prob[csc.eid].astype(np.float64)
        cumw = np.concatenate([[0.0], np.cumsum(w)])
        lo, hi = cumw[starts[nz]], cumw[starts[nz] + degs[nz]]
        r = lo[:, None] + rng.random((int(nz.sum()), fanout)) \
            * (hi - lo)[:, None]
        pick = np.searchsorted(cumw, r.reshape(-1), side="right") - 1
        pos = np.minimum(pick, np.repeat(starts[nz] + degs[nz] - 1, fanout))
        dst_sel = np.repeat(nodes[nz], fanout)
    else:
        # without replacement: per-seed partial permutation
        pos_list, dst_list = [], []
        for v, s, c in zip(nodes, starts, degs):
            if c == 0:
                continue
            k = min(fanout, int(c))
            if prob is not None:
                p = prob[csc.eid[s:s + c]].astype(np.float64)
                p = p / p.sum()
                sel = rng.choice(int(c), size=k, replace=False, p=p)
            else:
                sel = rng.choice(int(c), size=k, replace=False)
            pos_list.append(s + sel)
            dst_list.append(np.full(k, v, np.int64))
        pos = np.concatenate(pos_list) if pos_list else np.zeros(0, np.int64)
        dst_sel = np.concatenate(dst_list) if dst_list else \
            np.zeros(0, np.int64)

    src_sel = csc.src[pos]
    eids = csc.eid[pos]
    frontier = _build(src_sel.astype(np.int32), dst_sel.astype(np.int32),
                      csc.num_src, csc.num_dst, is_block=False,
                      build_csr=False, device=device)
    return frontier, eids.astype(np.int32)


def _round_up_pow2(n: int, floor: int = 128) -> int:
    r = floor
    while r < n:
        r <<= 1
    return r


class MultiLayerNeighborSampler:
    """Layered sampler producing one bipartite block per GNN layer.

    Reference: examples/pytorch/graphsage/train_sampling.py
    NeighborSampler.sample_blocks (sample_neighbors -> to_block per
    layer).  Blocks are padded to static shapes (num_src rounded to a
    power-of-two bucket; edges padded to len(seeds)*fanout) so XLA
    compiles one executable per bucket, the TPU replacement for dynamic
    minibatch shapes.
    """

    def __init__(self, fanouts: Sequence[int], replace: bool = False,
                 pad: bool = True, seed: Optional[int] = None,
                 device: bool = False):
        # device=False (default): blocks keep HOST (numpy) structure
        # arrays — the prefetcher ships each sample in ONE batched
        # device_put (or the jit boundary converts).  Eager per-array
        # transfers through the axon tunnel measured ~350 ms/batch
        # (round 5, the sampled pipeline's actual bottleneck).
        self.fanouts = list(fanouts)
        self.replace = replace
        self.pad = pad
        self.device = device
        self.rng = np.random.default_rng(seed)

    def sample_blocks(self, g: Graph, seeds: Sequence[int]
                      ) -> Tuple[List[Graph], np.ndarray, np.ndarray]:
        """Returns (blocks outermost-first, input_node_ids, seed_ids)."""
        seeds = np.asarray(seeds, dtype=np.int32)
        blocks: List[Graph] = []
        cur = seeds
        for fanout in reversed(self.fanouts):
            frontier, eids = sample_neighbors(g, cur, fanout,
                                              replace=self.replace,
                                              rng=self.rng, device=False)
            pad_src = pad_e = None
            if self.pad:
                cap = len(cur) * (fanout if fanout > 0 else 0)
                pad_e = cap if fanout > 0 else None
                pad_src = _round_up_pow2(len(cur) + (cap or 0)) \
                    if fanout > 0 else None
            blk, src_ids, _ = to_block(frontier, cur, pad_num_src=pad_src,
                                       pad_num_edges=pad_e,
                                       device=self.device)
            blk.edata["_ID"] = np.pad(
                eids, (0, blk.num_edges() - len(eids)))
            blocks.insert(0, blk)
            cur = src_ids
        return blocks, cur, seeds


class NodeDataLoader:
    """Minibatch iterator over seed nodes (reference: the
    torch DataLoader + collate pattern in train_sampling.py:21-38).

    Yields (input_nodes, seeds, blocks); final partial batch is padded to
    batch_size with repeated seeds so shapes stay static.
    """

    def __init__(self, g: Graph, nids: Sequence[int],
                 sampler: MultiLayerNeighborSampler, batch_size: int,
                 shuffle: bool = True, drop_last: bool = False,
                 seed: Optional[int] = None):
        self.g = g
        self.nids = np.asarray(nids, dtype=np.int32)
        self.sampler = sampler
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.nids)
        return n // self.batch_size if self.drop_last else \
            -(-n // self.batch_size)

    def __iter__(self):
        order = self.rng.permutation(len(self.nids)) if self.shuffle \
            else np.arange(len(self.nids))
        bs = self.batch_size
        for i in range(0, len(order) - (bs - 1 if self.drop_last else 0), bs):
            batch = self.nids[order[i:i + bs]]
            if len(batch) < bs:                      # pad final batch
                batch = np.concatenate(
                    [batch, batch[np.zeros(bs - len(batch), np.int64)]])
            blocks, input_nodes, seeds = self.sampler.sample_blocks(
                self.g, batch)
            yield input_nodes, seeds, blocks


class GraphDataLoader:
    """Minibatch iterator over a graph-classification dataset: yields
    (batched_graph, stacked_features, labels) with fixed batch size
    (reference: the GraphDataLoader/collate pattern of
    examples/pytorch/gin)."""

    def __init__(self, graphs, features, labels, batch_size: int,
                 shuffle: bool = True, seed: Optional[int] = None):
        from ..core import batch as _batch
        self._batch = _batch.batch
        self.graphs = list(graphs)
        self.features = list(features)
        self.labels = np.asarray(labels)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.graphs) // self.batch_size

    def __iter__(self):
        order = self.rng.permutation(len(self.graphs)) if self.shuffle \
            else np.arange(len(self.graphs))
        bs = self.batch_size
        for i in range(0, len(order) - bs + 1, bs):
            sel = order[i:i + bs]
            bg = self._batch([self.graphs[j] for j in sel])
            x = np.concatenate([self.features[j] for j in sel])
            yield bg, x, self.labels[sel]


def select_topk(g: Graph, k: int, weight: np.ndarray,
                nodes: Optional[Sequence[int]] = None):
    """Keep the k highest-weight in-edges per node (reference:
    aten::CSRRowWiseTopk, src/array/cpu/rowwise_topk.cc; python API
    dgl.sampling.select_topk).  ``weight`` is per-edge in user order.

    Returns (frontier, edge_ids) like sample_neighbors.
    """
    csc = _get_csc(g)
    weight = np.asarray(weight)
    if nodes is None:
        nodes = np.arange(csc.num_dst, dtype=np.int64)
    else:
        nodes = np.asarray(nodes, dtype=np.int64)
    pos_list, dst_list = [], []
    for v in nodes:
        lo, hi = csc.indptr[v], csc.indptr[v + 1]
        if hi == lo:
            continue
        w = weight[csc.eid[lo:hi]]
        kk = min(k, hi - lo)
        sel = np.argpartition(-w, kk - 1)[:kk] if kk < hi - lo \
            else np.arange(hi - lo)
        pos_list.append(lo + sel)
        dst_list.append(np.full(kk, v, np.int64))
    pos = np.concatenate(pos_list) if pos_list else np.zeros(0, np.int64)
    dsts = np.concatenate(dst_list) if dst_list else np.zeros(0, np.int64)
    frontier = _build(csc.src[pos].astype(np.int32), dsts.astype(np.int32),
                      csc.num_src, csc.num_dst, is_block=False,
                      build_csr=False)
    return frontier, csc.eid[pos].astype(np.int32)


def sample_layer_neighbors(g: Graph, seeds: Sequence[int],
                           layer_size: int,
                           rng: Optional[np.random.Generator] = None):
    """Layer-wise (LADIES/FastGCN-style) sampling: one shared set of
    ``layer_size`` source nodes for the whole layer (reference: the
    legacy LayerSampler, _CAPI_LayerSampling, src/graph/sampler.cc:951).

    Returns (frontier, edge_ids): edges from sampled sources into seeds.
    """
    rng = rng or np.random.default_rng()
    csc = _get_csc(g)
    seeds = np.asarray(seeds, dtype=np.int64)
    # candidate sources = union of all in-neighbors of the seeds
    pos_all = np.concatenate([np.arange(csc.indptr[v], csc.indptr[v + 1])
                              for v in seeds]) if len(seeds) else \
        np.zeros(0, np.int64)
    cand = np.unique(csc.src[pos_all])
    if len(cand) > layer_size:
        cand = rng.choice(cand, size=layer_size, replace=False)
    sel_mask = np.zeros(csc.num_src, bool)
    sel_mask[cand] = True
    keep = sel_mask[csc.src[pos_all]]
    pos = pos_all[keep]
    dsts = np.repeat(seeds, csc.indptr[seeds + 1] - csc.indptr[seeds])[keep]
    frontier = _build(csc.src[pos].astype(np.int32), dsts.astype(np.int32),
                      csc.num_src, csc.num_dst, is_block=False,
                      build_csr=False)
    return frontier, csc.eid[pos].astype(np.int32)


class EdgeSampler:
    """Minibatch iterator over (positive edges, chunked negatives) —
    the link-prediction / KG batch sampler (reference:
    UniformEdgeSamplerObject, src/graph/sampler.cc:1428, with
    chunked negative mode)."""

    def __init__(self, g: Graph, batch_size: int, neg_sample_size: int = 0,
                 chunk_size: int = 1, negative_mode: str = "tail",
                 shuffle: bool = True, seed: Optional[int] = None):
        self.g = g
        self.batch_size = batch_size
        self.neg_sample_size = neg_sample_size
        self.chunk_size = chunk_size
        self.negative_mode = negative_mode
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)

    def __iter__(self):
        s, d = self.g.host_edges()
        E = len(s)
        order = self.rng.permutation(E) if self.shuffle else np.arange(E)
        bs = self.batch_size
        for i in range(0, E - bs + 1, bs):
            sel = order[i:i + bs]
            batch = {"src": s[sel], "dst": d[sel], "eid": sel.astype(np.int32)}
            if self.neg_sample_size:
                C = -(-bs // self.chunk_size)
                batch["neg"] = self.rng.integers(
                    0, self.g.num_nodes(),
                    (C, self.neg_sample_size)).astype(np.int32)
                batch["neg_is_head"] = self.negative_mode == "head"
            yield batch
