"""Negative edge sampling for link prediction / knowledge-graph training.

Reference: EdgeSampler with negative mode (src/graph/sampler.cc:1428
UniformEdgeSamplerObject, chunked head/tail corruption in
apps/kg/dataloader/sampler.py:383 ChunkNegEdgeSubgraph /
create_neg_subgraph:422).  The chunked scheme corrupts one endpoint for a
whole chunk of positive edges against a shared pool of negative nodes —
exactly the memory-efficient batched formulation DGL-KE uses, and ideal
on TPU because scores become one dense batched matmul.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def uniform_negative_edges(num_nodes: int, num_samples: int,
                           rng: Optional[np.random.Generator] = None
                           ) -> Tuple[np.ndarray, np.ndarray]:
    rng = rng or np.random.default_rng()
    return (rng.integers(0, num_nodes, num_samples).astype(np.int32),
            rng.integers(0, num_nodes, num_samples).astype(np.int32))


class ChunkedNegativeSampler:
    """Per chunk of ``chunk_size`` positive edges, draw ``neg_sample_size``
    corrupting nodes shared by the chunk; ``mode`` picks which endpoint is
    corrupted ('head' or 'tail').  Mirrors DGL-KE's sampler semantics."""

    def __init__(self, neg_sample_size: int, chunk_size: int,
                 mode: str = "tail", seed: Optional[int] = None):
        assert mode in ("head", "tail")
        self.neg_sample_size = neg_sample_size
        self.chunk_size = chunk_size
        self.mode = mode
        self.rng = np.random.default_rng(seed)

    def sample(self, num_pos: int, num_nodes: int) -> np.ndarray:
        """Returns (num_chunks, neg_sample_size) negative node ids."""
        num_chunks = -(-num_pos // self.chunk_size)
        return self.rng.integers(
            0, num_nodes,
            (num_chunks, self.neg_sample_size)).astype(np.int32)
