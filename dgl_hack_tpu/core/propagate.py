"""Frontier-ordered message propagation.

Reference: python/dgl/propagate.py (prop_nodes/prop_edges,
prop_nodes_bfs:57, prop_nodes_topo:87) — apply pull/send_and_recv one
frontier at a time along a traversal order.
"""
from __future__ import annotations

from .graph import Graph
from . import traversal
from .message import pull, send_and_recv


def prop_nodes(g: Graph, nodes_generator, message_func, reduce_func) -> None:
    for frontier in nodes_generator:
        pull(g, frontier, message_func, reduce_func)


def prop_edges(g: Graph, edges_generator, message_func, reduce_func) -> None:
    for frontier in edges_generator:
        send_and_recv(g, frontier, message_func, reduce_func)


def prop_nodes_bfs(g: Graph, source, message_func, reduce_func,
                   reverse: bool = False) -> None:
    prop_nodes(g, traversal.bfs_nodes_generator(g, source, reverse),
               message_func, reduce_func)


def prop_nodes_topo(g: Graph, message_func, reduce_func,
                    reverse: bool = False) -> None:
    prop_nodes(g, traversal.topological_nodes_generator(g, reverse),
               message_func, reduce_func)


def prop_edges_dfs(g: Graph, source, message_func, reduce_func,
                   reverse: bool = False) -> None:
    prop_edges(g, traversal.dfs_edges_generator(g, source, reverse),
               message_func, reduce_func)
