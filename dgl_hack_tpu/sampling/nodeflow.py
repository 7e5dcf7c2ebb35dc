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

    def layer_nid(self, layer: int) -> np.ndarray:
        """NodeFlow-local node ids of a layer: consecutive across layers
        (reference: nodeflow.py layer_nid / _get_layer_offsets)."""
        off = sum(len(self._layer_ids[i]) for i in range(layer))
        return np.arange(off, off + len(self._layer_ids[layer]),
                         dtype=np.int64)

    def map_to_parent_nid(self, nid) -> np.ndarray:
        """NodeFlow-local ids -> parent ids (reference:
        nodeflow.py map_to_parent_nid)."""
        flat = np.concatenate([np.asarray(x, np.int64)
                               for x in self._layer_ids])
        return flat[np.asarray(nid, np.int64)]

    def map_from_parent_nid(self, layer: int, parent_nid) -> np.ndarray:
        """Parent ids -> NodeFlow-local ids within a layer; -1 when the
        node is absent (reference: nodeflow.py map_from_parent_nid)."""
        ids = np.asarray(self._layer_ids[layer], np.int64)
        lut = {int(p): i for i, p in enumerate(ids)}
        off = int(self.layer_nid(layer)[0]) if len(ids) else 0
        return np.asarray([lut.get(int(p), -1 - off) + off
                           for p in np.asarray(parent_nid).ravel()],
                          np.int64)

    def layer_size(self, layer: int) -> int:
        return len(self._layer_ids[layer])

    def block_size(self, block_id: int) -> int:
        """Edges in a block (reference: nodeflow.py block_size)."""
        blk = self.blocks[block_id]
        if blk.edge_mask is not None:
            return int(np.asarray(blk.host("edge_mask")).sum())
        return blk.num_edges()

    def block_edges(self, block_id: int):
        """(src, dst) endpoints in BLOCK-local ids (reference:
        nodeflow.py block_edges)."""
        return self.blocks[block_id].edges(order="eid")

    def block_parent_eid(self, block_id: int) -> np.ndarray:
        """Parent-graph edge ids of a block (reference: nodeflow.py
        block_parent_eid) — carried by the sampler as edata['_ID']."""
        blk = self.blocks[block_id]
        eid = blk.edata["_ID"] if "_ID" in blk.edata else None
        if eid is None:
            raise KeyError("block carries no parent eids "
                           "(sampler did not record edata['_ID'])")
        return np.asarray(eid)

    def layers(self, layer: int) -> dict:
        return self._layer_frames[layer]

    def apply_layer(self, layer: int, func: Callable,
                    inplace: bool = True) -> dict:
        """Apply a node UDF to one layer's frame (reference:
        nodeflow.py apply_layer).  The UDF sees a NodeBatch-like object
        with ``.data``; must return a dict."""
        class _LayerBatch:
            def __init__(self, data):
                self.data = data
        res = func(_LayerBatch(dict(self._layer_frames[layer])))
        if not isinstance(res, dict):
            raise TypeError("apply_layer UDF must return a dict")
        if inplace:
            self._layer_frames[layer].update(res)
        return res

    def apply_block(self, block_id: int, func: Callable) -> None:
        """Apply an edge UDF over one block (reference: nodeflow.py
        apply_block); results land in the block's edge frame."""
        from ..core.message import apply_edges
        blk = self.blocks[block_id]
        blk._node_frames = (dict(self._layer_frames[block_id]),
                            dict(self._layer_frames[block_id + 1]))
        apply_edges(blk, func)

    def copy_from_parent(self, parent_ndata: dict, fields=None) -> None:
        """Slice parent node features into every layer (reference:
        nodeflow.py:237 copy_from_parent)."""
        for li, ids in enumerate(self._layer_ids):
            for k, v in parent_ndata.items():
                if fields is None or k in fields:
                    self._layer_frames[li][k] = jnp.asarray(v)[
                        jnp.asarray(ids)]

    def copy_to_parent(self, parent_ndata: dict, fields=None,
                       layer: int = -1) -> dict:
        """Write a layer's frames back into parent-sized arrays
        (reference: nodeflow.py copy_to_parent); returns the updated
        dict (functional — parent arrays are not mutated in place)."""
        layer = layer % self.num_layers
        ids = jnp.asarray(self._layer_ids[layer])
        out = dict(parent_ndata)
        for k, v in self._layer_frames[layer].items():
            if fields is not None and k not in fields:
                continue
            if k in out:
                out[k] = jnp.asarray(out[k]).at[ids].set(v)
            else:
                base = jnp.zeros((len(next(iter(parent_ndata.values()))),)
                                 + v.shape[1:], v.dtype) \
                    if parent_ndata else None
                if base is None:
                    raise ValueError("copy_to_parent needs a parent frame "
                                     "to size new fields against")
                out[k] = base.at[ids].set(v)
        return out

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
