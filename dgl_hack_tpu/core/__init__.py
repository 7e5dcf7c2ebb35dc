from .graph import Graph, graph, block, from_scipy, reverse  # noqa: F401
