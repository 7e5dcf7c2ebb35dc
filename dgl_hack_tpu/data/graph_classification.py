"""Graph classification datasets.

Reference: python/dgl/data/{tu.py,gindt.py,sbm.py} (TUDataset, GINDataset,
SBMMixture).  Download-gated; the synthetic generator produces batched
mini-graphs whose label is determined by structure (community count /
triangle density), giving GIN a learnable signal offline.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np

from ..core.graph import Graph, _build


@dataclass
class GraphClassificationDataset:
    graphs: List[Graph]
    features: List[np.ndarray]
    labels: np.ndarray
    num_classes: int
    name: str = "synthetic-gc"

    def __len__(self):
        return len(self.graphs)

    def __getitem__(self, i):
        return self.graphs[i], self.labels[i]


def sbm_mixture(num_graphs: int = 200, nodes_per_graph: int = 40,
                communities=(1, 2, 4), p_in: float = 0.5,
                p_out: float = 0.05, feat_dim: int = 8,
                seed: int = 0) -> GraphClassificationDataset:
    """Graphs drawn from SBMs with varying community counts; the label is
    the community count (reference: data/sbm.py SBMMixture)."""
    rng = np.random.default_rng(seed)
    graphs, feats, labels = [], [], []
    for i in range(num_graphs):
        ci = rng.integers(0, len(communities))
        k = communities[ci]
        comm = rng.integers(0, k, nodes_per_graph)
        prob = np.where(comm[:, None] == comm[None, :], p_in, p_out)
        adj = rng.random((nodes_per_graph, nodes_per_graph)) < prob
        np.fill_diagonal(adj, False)
        adj = adj | adj.T
        s, d = np.nonzero(adj)
        g = _build(s.astype(np.int32), d.astype(np.int32),
                   nodes_per_graph, nodes_per_graph, is_block=False)
        graphs.append(g)
        feats.append(np.ones((nodes_per_graph, feat_dim), np.float32))
        labels.append(ci)
    return GraphClassificationDataset(graphs, feats,
                                      np.asarray(labels, np.int32),
                                      len(communities), name="sbm-mixture")


def TUDatasetSynthetic(name: str = "synthetic", **kw):
    return sbm_mixture(**kw)
