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


class WeightAndSum(nn.Module):
    """Per-node sigmoid gate then weighted-sum readout (reference:
    python/dgl/nn/pytorch/glob.py WeightAndSum — the readout of the chem
    GCN/GAT classifiers, model_zoo/chem/classifiers.py)."""

    @nn.compact
    def __call__(self, g: Graph, feat: Array) -> Array:
        w = nn.sigmoid(nn.Dense(1)(feat))
        return readout.sum_nodes(g, feat, weight=w[:, 0])


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


def _to_dense_batch(g: Graph, x: Array):
    """Scatter per-node features into (G, max_n, D) + validity mask —
    the static-shape set layout the SetTransformer blocks attend over."""
    import numpy as np
    counts = g.batch_num_nodes if g.batch_num_nodes is not None \
        else (g.num_dst_nodes,)
    nG, max_n = len(counts), max(counts)
    offs = np.concatenate([[0], np.cumsum(counts)])
    gid = np.repeat(np.arange(nG), counts).astype(np.int32)
    pos = (np.arange(offs[-1]) - offs[gid]).astype(np.int32)
    gid_j, pos_j = jnp.asarray(gid), jnp.asarray(pos)
    dense = jnp.zeros((nG, max_n) + x.shape[1:], x.dtype
                      ).at[gid_j, pos_j].set(x)
    mask = jnp.zeros((nG, max_n), bool).at[gid_j, pos_j].set(True)
    return dense, mask, (gid_j, pos_j)


class _MAB(nn.Module):
    """Multihead attention block: LN(x + attn) -> LN(o + rFF(o))
    (reference: glob.py MultiHeadAttention, the Set-Transformer MAB)."""
    d_model: int
    num_heads: int
    d_head: int
    d_ff: int

    @nn.compact
    def __call__(self, q: Array, kv: Array,
                 kv_mask: Optional[Array] = None) -> Array:
        attn_mask = None
        if kv_mask is not None:
            attn_mask = kv_mask[:, None, None, :]
        a = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.num_heads * self.d_head,
            out_features=self.d_model)(q, kv, mask=attn_mask)
        h = nn.LayerNorm()(q + a)
        ff = nn.Dense(self.d_model)(nn.relu(nn.Dense(self.d_ff)(h)))
        return nn.LayerNorm()(h + ff)


class SetTransformerEncoder(nn.Module):
    """SAB/ISAB self-attention over each graph's node set (reference:
    glob.py SetTransformerEncoder).  Returns per-node features
    (num_nodes, d_model)."""
    d_model: int
    n_heads: int
    d_head: int
    d_ff: int
    n_layers: int = 1
    block_type: str = "sab"          # 'sab' | 'isab'
    m: Optional[int] = None          # inducing points for isab

    @nn.compact
    def __call__(self, g: Graph, feat: Array) -> Array:
        if self.block_type == "isab" and self.m is None:
            raise ValueError("isab blocks need m inducing points")
        x, mask, (gid, pos) = _to_dense_batch(
            g, nn.Dense(self.d_model)(feat))
        for i in range(self.n_layers):
            if self.block_type == "sab":
                x = _MAB(self.d_model, self.n_heads, self.d_head,
                         self.d_ff, name=f"sab{i}")(x, x, mask)
            else:
                ind = self.param(f"induce{i}", nn.initializers.xavier_uniform(),
                                 (self.m, self.d_model))
                ind = jnp.broadcast_to(ind, (x.shape[0],) + ind.shape)
                h = _MAB(self.d_model, self.n_heads, self.d_head,
                         self.d_ff, name=f"isab{i}_a")(ind, x, mask)
                x = _MAB(self.d_model, self.n_heads, self.d_head,
                         self.d_ff, name=f"isab{i}_b")(x, h)
        return x[gid, pos]


class SetTransformerDecoder(nn.Module):
    """PMA pooling by k seed vectors + SAB layers (reference: glob.py
    SetTransformerDecoder).  Returns (num_graphs, k * d_model)."""
    d_model: int
    num_heads: int
    d_head: int
    d_ff: int
    n_layers: int = 1
    k: int = 1

    @nn.compact
    def __call__(self, g: Graph, feat: Array) -> Array:
        x, mask, _ = _to_dense_batch(g, nn.Dense(self.d_model)(feat))
        seeds = self.param("seeds", nn.initializers.xavier_uniform(),
                           (self.k, self.d_model))
        q = jnp.broadcast_to(seeds, (x.shape[0],) + seeds.shape)
        out = _MAB(self.d_model, self.num_heads, self.d_head, self.d_ff,
                   name="pma")(q, x, mask)
        for i in range(self.n_layers):
            out = _MAB(self.d_model, self.num_heads, self.d_head,
                       self.d_ff, name=f"sab{i}")(out, out)
        return out.reshape(out.shape[0], self.k * self.d_model)
