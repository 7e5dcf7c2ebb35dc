"""dgl_hack_tpu — a TPU-native graph neural network framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of the
reference DGL v0.4 fork (surveyed in SURVEY.md): immutable array-pytree
graphs, fused gSpMM/gSDDMM message passing, nn layer zoo, sampling,
partitioning and multi-chip distributed training over a jax.sharding.Mesh.
"""
import os as _os

if _os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    # the container's sitecustomize registers the axon TPU backend
    # unconditionally at interpreter start; honour an explicit CPU
    # request (regression-harness children, CPU-mesh tools) — the env
    # var alone is not enough, jax.config must be updated too
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")

from . import function  # noqa: F401
from .core.graph import (  # noqa: F401
    Graph, graph, block, from_scipy, reverse, from_networkx, to_networkx,
)
from .core.heterograph import (  # noqa: F401
    HeteroGraph, heterograph, bipartite, to_homogeneous, to_heterogeneous,
    hetero_from_relations, metapath_reachable_graph,
)
from .core import message as _message  # attaches Graph methods  # noqa: F401
from .core.message import (  # noqa: F401
    update_all, apply_edges, apply_nodes, send_and_recv, pull, push,
    send, recv, EdgeBatch, NodeBatch,
)
from .core.batch import batch, unbatch, batch_hetero, unbatch_hetero  # noqa: F401
from .core.biggraph import BigGraph, BigPartition  # noqa: F401
from .core import transform  # noqa: F401
from .core.transform import (  # noqa: F401
    khop_graph, line_graph, to_bidirected, add_self_loop, remove_self_loop,
    to_simple, remove_edges, node_subgraph, edge_subgraph, in_subgraph,
    out_subgraph, compact_graphs, to_block, knn_graph, reorder_graph,
    add_edges, add_nodes, laplacian_lambda_max, khop_adj,
    segmented_knn_graph,
)
from .core import traversal, propagate  # noqa: F401
from .ops.spmm import gspmm  # noqa: F401
from .ops.sddmm import gsddmm  # noqa: F401
from .ops.edge_softmax import edge_softmax  # noqa: F401
from .ops import segment, readout  # noqa: F401
from .ops.readout import (  # noqa: F401
    sum_nodes, mean_nodes, max_nodes, sum_edges, mean_edges, max_edges,
    softmax_nodes, softmax_edges, broadcast_nodes, broadcast_edges,
    topk_nodes, topk_edges,
)
from .ops.pallas.spmm_kernel import prepare_spmm  # noqa: F401
from .ops.rgcn import prepare_rgcn  # noqa: F401
from . import sampling  # noqa: F401

fn = function  # DGL-style alias: dgl.function

__version__ = "0.1.0"
__all__ = [
    "Graph", "graph", "block", "from_scipy", "reverse", "from_networkx",
    "to_networkx",
    "HeteroGraph", "heterograph", "bipartite", "to_homogeneous",
    "to_heterogeneous", "laplacian_lambda_max", "khop_adj",
    "segmented_knn_graph", "hetero_from_relations",
    "metapath_reachable_graph",
    "update_all", "apply_edges", "apply_nodes", "send_and_recv", "pull",
    "push", "batch", "unbatch", "batch_hetero", "unbatch_hetero",
    "gspmm", "gsddmm", "edge_softmax",
    "segment", "readout", "function", "fn", "prepare_spmm",
    "prepare_rgcn", "sampling",
    "transform", "traversal", "propagate",
    "khop_graph", "line_graph", "to_bidirected", "add_self_loop",
    "remove_self_loop", "to_simple", "remove_edges", "node_subgraph",
    "edge_subgraph", "in_subgraph", "out_subgraph", "compact_graphs",
    "to_block", "knn_graph", "reorder_graph",
    "sum_nodes", "mean_nodes", "max_nodes", "sum_edges", "mean_edges",
    "max_edges", "softmax_nodes", "softmax_edges", "broadcast_nodes",
    "broadcast_edges", "topk_nodes", "topk_edges",
]
