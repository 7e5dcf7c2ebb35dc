"""Global (whole-graph) pooling layers.

Reference: python/dgl/nn/pytorch/glob.py (Sum/Avg/Max/SortPooling,
GlobalAttentionPooling, Set2Set, SetTransformer) re-derived on the
segment readouts in ops/readout.py.
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.graph import Graph
from ..ops import readout

Array = jax.Array


class SumPooling(nn.Module):
    @nn.compact
    def __call__(self, g: Graph, feat: Array) -> Array:
        return readout.sum_nodes(g, feat)


class AvgPooling(nn.Module):
    @nn.compact
    def __call__(self, g: Graph, feat: Array) -> Array:
        return readout.mean_nodes(g, feat)


class MaxPooling(nn.Module):
    @nn.compact
    def __call__(self, g: Graph, feat: Array) -> Array:
        return readout.max_nodes(g, feat)


class SortPooling(nn.Module):
    """Sort nodes by last feature channel, keep top-k, flatten
    (reference: glob.py SortPooling)."""
    k: int

    @nn.compact
    def __call__(self, g: Graph, feat: Array) -> Array:
        feat = jnp.sort(feat, axis=-1)
        ret = readout.topk_nodes(g, feat, self.k, idx=-1)
        return ret.reshape(ret.shape[0], -1)


class GlobalAttentionPooling(nn.Module):
    """Gated attention readout (reference: glob.py GlobalAttentionPooling):
    r = sum_v softmax(gate(x_v)) * feat_nn(x_v)."""
    gate_nn: Callable
    feat_nn: Optional[Callable] = None

    @nn.compact
    def __call__(self, g: Graph, feat: Array) -> Array:
        gate = self.gate_nn(feat)
        assert gate.shape[-1] == 1
        feat = self.feat_nn(feat) if self.feat_nn is not None else feat
        alpha = readout.softmax_nodes(g, gate)
        return readout.sum_nodes(g, feat * alpha)


class Set2Set(nn.Module):
    """Set2Set readout (reference: glob.py Set2Set): n_iters of
    LSTM-query -> attention -> weighted sum, output (G, 2*in)."""
    input_dim: int
    n_iters: int
    n_layers: int = 1

    @nn.compact
    def __call__(self, g: Graph, feat: Array) -> Array:
        nG = len(g.batch_num_nodes) if g.batch_num_nodes is not None else 1
        lstm = nn.OptimizedLSTMCell(features=self.input_dim, name="lstm")
        carry = lstm.initialize_carry(jax.random.PRNGKey(0),
                                      (nG, 2 * self.input_dim))
        q_star = jnp.zeros((nG, 2 * self.input_dim), feat.dtype)
        for _ in range(self.n_iters):
            carry, q = lstm(carry, q_star)           # q: (G, input_dim)
            e = (feat * readout.broadcast_nodes(g, q)).sum(-1, keepdims=True)
            alpha = readout.softmax_nodes(g, e)
            r = readout.sum_nodes(g, feat * alpha)   # (G, input_dim)
            q_star = jnp.concatenate([q, r], axis=-1)
        return q_star
