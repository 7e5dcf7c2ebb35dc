"""edge_softmax — per-destination softmax over incoming-edge logits.

The reference composes this from five kernel launches
(copy_reduce(max) -> binary_reduce(sub,e,v) -> exp -> copy_reduce(sum) ->
binary_reduce(div,e,v); reference: python/dgl/nn/pytorch/softmax.py:69-80,
with a hand-written backward at softmax.py:85-114).  Here it is one traced
segment-softmax that XLA fuses; JAX autodiff reproduces the custom
backward (softmax VJP) automatically.  The fork's fused CUDA GAT kernels
(gatExpLeakyReluSumKernel, reference: src/kernel/cuda/
binary_reduce_impl.cu:52) correspond to the Pallas fused path in
ops/pallas/gat_kernel.py.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from . import segment

Array = jax.Array


def edge_softmax(g, logits: Array, order: str = "internal") -> Array:
    """Softmax of ``logits`` (num_edges, ...) grouped by dst node.

    ``order`` declares the layout of ``logits`` ('internal' CSC order or
    'eid' user order); the result is returned in the same layout.
    Padded edges (g.edge_mask) get probability 0 and do not contribute
    to the normaliser.
    """
    internal = order == "internal" or g.int2user is None
    e = logits if internal else logits[g.int2user]
    if g.edge_mask is not None:
        e = segment.apply_identity_mask("max", e, g.edge_mask)
    out = segment.segment_softmax(e, g.dst, g.num_dst_nodes,
                                  indices_are_sorted=True)
    if g.edge_mask is not None:
        mask = g.edge_mask.reshape(g.edge_mask.shape + (1,) * (out.ndim - 1))
        out = jnp.where(mask, out, jnp.zeros_like(out))
    if not internal:
        out = out[g.user2int]
    return out
