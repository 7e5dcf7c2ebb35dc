"""Graph traversals as frontier batches.

Reference: src/graph/traversal.cc + python/dgl/traversal.py — BFS/DFS/
topological order returned as per-level node (or edge) frontiers, which
propagate.py then feeds to message passing one frontier at a time.
"""
from __future__ import annotations

from typing import List

import numpy as np

from .graph import Graph


def _csr(g: Graph):
    indptr = np.asarray(g.csr_indptr)
    eids = np.asarray(g.csr_eids)
    dst = np.asarray(g.dst)[eids]
    return indptr, dst


def bfs_nodes_generator(g: Graph, source, reverse: bool = False
                        ) -> List[np.ndarray]:
    """Per-level node frontiers (reference: traversal.py bfs_nodes_generator)."""
    if reverse:
        indptr = np.asarray(g.csc_indptr)
        nbr = np.asarray(g.src)
    else:
        indptr, nbr = _csr(g)
    n = g.num_nodes()
    visited = np.zeros(n, bool)
    frontier = np.atleast_1d(np.asarray(source, np.int64))
    visited[frontier] = True
    out = []
    while len(frontier):
        out.append(frontier.astype(np.int32))
        nxts = []
        for v in frontier:
            nxts.append(nbr[indptr[v]:indptr[v + 1]])
        nxt = np.unique(np.concatenate(nxts)) if nxts else np.zeros(0, np.int64)
        nxt = nxt[~visited[nxt]]
        visited[nxt] = True
        frontier = nxt
    return out


def bfs_edges_generator(g: Graph, source, reverse: bool = False
                        ) -> List[np.ndarray]:
    """Per-level edge-id frontiers (edges entering newly visited nodes)."""
    s, d = (np.asarray(x) for x in g.edges(order="eid"))
    if reverse:
        s, d = d, s
    n = g.num_nodes()
    visited = np.zeros(n, bool)
    frontier = np.atleast_1d(np.asarray(source, np.int64))
    visited[frontier] = True
    out = []
    while True:
        cand = np.nonzero(visited[s] & ~visited[d])[0]
        if not len(cand):
            break
        out.append(cand.astype(np.int32))
        visited[d[cand]] = True
    return out


def topological_nodes_generator(g: Graph, reverse: bool = False
                                ) -> List[np.ndarray]:
    """Topological frontiers (reference: traversal.py
    topological_nodes_generator)."""
    if reverse:
        deg = np.asarray(g.out_degrees()).copy()
        indptr = np.asarray(g.csc_indptr)
        nbr = np.asarray(g.src)
    else:
        deg = np.asarray(g.in_degrees()).copy()
        indptr, nbr = _csr(g)
    frontier = np.nonzero(deg == 0)[0]
    out = []
    while len(frontier):
        out.append(frontier.astype(np.int32))
        cnt = np.zeros(g.num_nodes(), np.int64)
        for v in frontier:
            np.add.at(cnt, nbr[indptr[v]:indptr[v + 1]], 1)
        deg = deg - cnt
        deg[frontier] = -1
        frontier = np.nonzero(deg == 0)[0]
    return out


def dfs_edges_generator(g: Graph, source, reverse: bool = False
                        ) -> List[np.ndarray]:
    """DFS edge order, one edge per step (reference: traversal.py
    dfs_edges_generator)."""
    indptr, dst = _csr(g) if not reverse else (
        np.asarray(g.csc_indptr), np.asarray(g.src))
    # map (v, k-th nbr) -> user edge id
    eids_by = np.asarray(g.csr_eids) if not reverse else \
        np.arange(g.num_edges())
    int2user = (np.asarray(g.int2user) if g.int2user is not None
                else np.arange(g.num_edges()))
    visited = np.zeros(g.num_nodes(), bool)
    order = []
    for s0 in np.atleast_1d(np.asarray(source, np.int64)):
        if visited[s0]:
            continue
        visited[s0] = True
        stack = [(int(s0), 0)]
        while stack:
            v, i = stack.pop()
            if i >= indptr[v + 1] - indptr[v]:
                continue
            stack.append((v, i + 1))
            pos = indptr[v] + i
            u = dst[pos]
            if not visited[u]:
                visited[u] = True
                order.append(int2user[eids_by[pos]] if not reverse
                             else int2user[pos])
                stack.append((int(u), 0))
    return [np.asarray([e], np.int32) for e in order]


def dfs_labeled_edges_generator(g: Graph, source, reverse: bool = False,
                                has_reverse_edge: bool = False,
                                has_nontree_edge: bool = False):
    """DFS with edge labels (reference: traversal.py
    dfs_labeled_edges_generator): yields (edge_frontiers, label_frontiers)
    with labels 0=forward (tree), 1=reverse (pop back along a tree edge),
    2=nontree.  Host-side generator like the other traversals."""
    FORWARD, REVERSE, NONTREE = 0, 1, 2
    indptr, nbr = _csr(g) if not reverse else (
        np.asarray(g.csc_indptr), np.asarray(g.src))
    eids_by = np.asarray(g.csr_eids) if not reverse else \
        np.arange(g.num_edges())
    int2user = (np.asarray(g.int2user) if g.int2user is not None
                else np.arange(g.num_edges()))
    visited = np.zeros(g.num_nodes(), bool)
    edges, labels = [], []
    for s0 in np.atleast_1d(np.asarray(source, np.int64)):
        if visited[s0]:
            continue
        visited[s0] = True
        # stack entries: (node, next-nbr index, incoming tree edge id)
        stack = [(int(s0), 0, -1)]
        while stack:
            v, i, in_eid = stack.pop()
            if i >= indptr[v + 1] - indptr[v]:
                # subtree finished: backtrack over the incoming edge
                if has_reverse_edge and in_eid >= 0:
                    edges.append(in_eid)
                    labels.append(REVERSE)
                continue
            pos = indptr[v] + i
            u = int(nbr[pos])
            eid = int(int2user[eids_by[pos]])
            stack.append((v, i + 1, in_eid))
            if not visited[u]:
                visited[u] = True
                edges.append(eid)
                labels.append(FORWARD)
                stack.append((u, 0, eid))
            elif has_nontree_edge:
                edges.append(eid)
                labels.append(NONTREE)
    return ([np.asarray([e], np.int64) for e in edges],
            [np.asarray([l], np.int64) for l in labels])
