"""Random walks (reference: src/graph/sampling/randomwalks/ —
metapath_randomwalk.h, randomwalks.cc; python API dgl.sampling.random_walk).
Host-side numpy; walks feed node2vec/metapath2vec-style training."""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..core.graph import Graph


class _HostCSR:
    def __init__(self, g: Graph):
        if g.csr_indptr is None:
            raise ValueError("random walks need the CSR format")
        self.indptr = g.host("csr_indptr")
        # out-neighbors: dst of edges sorted by src
        eids = g.host("csr_eids")
        self.dst = g.host("dst")[eids]


def _get_csr(g: Graph) -> _HostCSR:
    cache = getattr(g, "_host_csr", None)
    if cache is None:
        cache = _HostCSR(g)
        g._host_csr = cache
    return cache


def random_walk(g: Graph, nodes: Sequence[int], length: int,
                restart_prob: float = 0.0,
                rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Uniform random walks of ``length`` steps from each start node.

    Returns (len(nodes), length+1) traces; -1 marks early termination
    (dead end), matching the reference's trace padding semantics
    (src/graph/sampler.cc random walk APIs).
    """
    rng = rng or np.random.default_rng()
    csr = _get_csr(g)
    nodes = np.asarray(nodes, dtype=np.int64)
    n = len(nodes)
    traces = np.full((n, length + 1), -1, dtype=np.int32)
    traces[:, 0] = nodes
    cur = nodes.copy()
    alive = np.ones(n, dtype=bool)
    for t in range(1, length + 1):
        deg = csr.indptr[cur + 1] - csr.indptr[cur]
        alive &= deg > 0
        if restart_prob > 0:
            alive &= rng.random(n) >= restart_prob
        if not alive.any():
            break
        pick = (rng.random(n) * np.maximum(deg, 1)).astype(np.int64)
        nxt = csr.dst[csr.indptr[cur] + pick]
        cur = np.where(alive, nxt, cur)
        traces[alive, t] = nxt[alive]
    return traces


def node2vec_random_walk(g: Graph, nodes: Sequence[int], p: float, q: float,
                         length: int,
                         rng: Optional[np.random.Generator] = None
                         ) -> np.ndarray:
    """Biased 2nd-order walks (node2vec).  Simple rejection-sampling
    implementation."""
    rng = rng or np.random.default_rng()
    csr = _get_csr(g)
    nodes = np.asarray(nodes, dtype=np.int64)
    n = len(nodes)
    traces = np.full((n, length + 1), -1, dtype=np.int32)
    traces[:, 0] = nodes
    for i, start in enumerate(nodes):
        prev, cur = -1, int(start)
        for t in range(1, length + 1):
            lo, hi = csr.indptr[cur], csr.indptr[cur + 1]
            if hi == lo:
                break
            # rejection sampling on the node2vec bias
            for _ in range(64):
                nxt = int(csr.dst[lo + rng.integers(0, hi - lo)])
                if prev < 0:
                    break
                if nxt == prev:
                    w = 1.0 / p
                else:
                    plo, phi = csr.indptr[prev], csr.indptr[prev + 1]
                    is_common = np.any(csr.dst[plo:phi] == nxt)
                    w = 1.0 if is_common else 1.0 / q
                if rng.random() < w / max(1.0, 1.0 / p, 1.0 / q):
                    break
            traces[i, t] = nxt
            prev, cur = cur, nxt
    return traces
