"""dgl_hack_tpu — a TPU-native graph neural network framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of the
reference DGL v0.4 fork (surveyed in SURVEY.md): immutable array-pytree
graphs, fused gSpMM/gSDDMM message passing, nn layer zoo, sampling,
partitioning and multi-chip distributed training over a jax.sharding.Mesh.
"""
from . import function  # noqa: F401
from .core.graph import Graph, graph, block, from_scipy, reverse  # noqa: F401
from .core import message as _message  # attaches Graph methods  # noqa: F401
from .core.message import (  # noqa: F401
    update_all, apply_edges, apply_nodes, send_and_recv, pull, push,
    EdgeBatch, NodeBatch,
)
from .ops.spmm import gspmm  # noqa: F401
from .ops.sddmm import gsddmm  # noqa: F401
from .ops.edge_softmax import edge_softmax  # noqa: F401
from .ops import segment  # noqa: F401
from .ops.pallas.spmm_kernel import prepare_spmm  # noqa: F401

fn = function  # DGL-style alias: dgl.function

__version__ = "0.1.0"
__all__ = [
    "Graph", "graph", "block", "from_scipy", "reverse",
    "update_all", "apply_edges", "apply_nodes", "send_and_recv", "pull",
    "push", "gspmm", "gsddmm", "edge_softmax", "segment", "function", "fn",
    "prepare_spmm",
]
