"""NodeFlow compatibility layer.

Reference: python/dgl/nodeflow.py (1054 LoC) — the legacy layered
minibatch structure with ``copy_from_parent``, ``block_compute`` and
``prop_flow``.  The modern equivalent is the list of bipartite blocks
from ``MultiLayerNeighborSampler``; this wrapper provides the old call
surface over those blocks for API parity.
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..core.graph import Graph
from ..core.message import update_all


class NodeFlow:
    """Layered computation flow: ``num_blocks`` bipartite blocks between
    ``num_layers = num_blocks + 1`` node layers.

    layers[0] is the input frontier (outermost sampled nodes); the last
    layer holds the seeds — matching the reference's layer indexing
    (include/dgl/nodeflow.h:27-49).
    """

    def __init__(self, blocks: Sequence[Graph],
                 layer_node_ids: Sequence[np.ndarray]):
        assert len(layer_node_ids) == len(blocks) + 1
        self.blocks = list(blocks)
        self._layer_ids = [np.asarray(x) for x in layer_node_ids]
        self._layer_frames = [dict() for _ in self._layer_ids]

    @classmethod
    def from_sampler(cls, g: Graph, seeds, sampler) -> "NodeFlow":
        blocks, input_nodes, seeds = sampler.sample_blocks(g, seeds)
        layer_ids = [input_nodes]
        for blk in blocks:
            layer_ids.append(layer_ids[-1][:blk.num_dst_nodes])
        return cls(blocks, layer_ids)

    @property
    def num_layers(self) -> int:
        return len(self._layer_ids)

    @property
    def num_blocks(self) -> int:
        return len(self.blocks)

    def layer_parent_nid(self, layer: int) -> np.ndarray:
        """Original (parent-graph) node ids of a layer (reference:
        nodeflow.py layer_parent_nid)."""
        return self._layer_ids[layer]

    def layer_size(self, layer: int) -> int:
        return len(self._layer_ids[layer])

    def layers(self, layer: int) -> dict:
        return self._layer_frames[layer]

    def copy_from_parent(self, parent_ndata: dict, fields=None) -> None:
        """Slice parent node features into every layer (reference:
        nodeflow.py:237 copy_from_parent)."""
        for li, ids in enumerate(self._layer_ids):
            for k, v in parent_ndata.items():
                if fields is None or k in fields:
                    self._layer_frames[li][k] = jnp.asarray(v)[
                        jnp.asarray(ids)]

    def block_compute(self, block_id: int, message_func, reduce_func,
                      apply_node_func: Optional[Callable] = None) -> None:
        """Message passing from layer block_id to block_id+1
        (reference: nodeflow.py:891)."""
        blk = self.blocks[block_id]
        blk._node_frames = (dict(self._layer_frames[block_id]),
                            dict(self._layer_frames[block_id + 1]))
        update_all(blk, message_func, reduce_func, apply_node_func)
        self._layer_frames[block_id + 1].update(blk._node_frames[-1])

    def prop_flow(self, message_func, reduce_func,
                  apply_node_func: Optional[Callable] = None) -> None:
        """Propagate through every block in order (reference:
        nodeflow.py:959)."""
        for i in range(self.num_blocks):
            self.block_compute(i, message_func, reduce_func,
                               apply_node_func)
