"""End-to-end model definitions.

TPU-native counterparts of the reference's example models:
* GCN        — examples/pytorch/gcn/gcn.py (stack of GraphConv)
* GAT        — examples/pytorch/gat/gat.py (multi-head, concat hidden /
               mean output head aggregation)
* GraphSAGE  — examples/pytorch/graphsage/graphsage.py
* RGCN       — examples/pytorch/rgcn/entity_classify.py (basis RelGraphConv
               on a homogeneous graph with etype array)
* GIN        — examples/pytorch/gin/
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.graph import Graph
from ..nn.conv import GATConv, GINConv, GraphConv, RelGraphConv, SAGEConv

Array = jax.Array


class GCN(nn.Module):
    hidden_feats: int
    out_feats: int
    num_layers: int = 2
    dropout: float = 0.5
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, g: Graph, x: Array, deterministic: bool = True):
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        h = x
        for i in range(self.num_layers - 1):
            if i:
                h = drop(h)
            h = GraphConv(self.hidden_feats, activation=self.activation,
                          name=f"layer{i}")(g, h)
        h = drop(h)
        return GraphConv(self.out_feats, name=f"layer{self.num_layers-1}")(g, h)


class GAT(nn.Module):
    """Multi-head GAT; hidden layers concat heads, output layer means
    them (reference: examples/pytorch/gat/gat.py)."""
    hidden_feats: int
    out_feats: int
    heads: Sequence[int] = (8, 1)
    feat_drop: float = 0.6
    attn_drop: float = 0.6
    negative_slope: float = 0.2
    residual: bool = False

    @nn.compact
    def __call__(self, g: Graph, x: Array, deterministic: bool = True):
        h = x
        L = len(self.heads)
        for i in range(L - 1):
            h = GATConv(self.hidden_feats, self.heads[i],
                        feat_drop=self.feat_drop, attn_drop=self.attn_drop,
                        negative_slope=self.negative_slope,
                        residual=self.residual, activation=nn.elu,
                        name=f"gat{i}")(g, h, deterministic=deterministic)
            h = h.reshape(h.shape[0], -1)        # concat heads
        out = GATConv(self.out_feats, self.heads[-1],
                      feat_drop=self.feat_drop, attn_drop=self.attn_drop,
                      negative_slope=self.negative_slope,
                      residual=self.residual,
                      name=f"gat{L-1}")(g, h, deterministic=deterministic)
        return out.mean(axis=1)                  # mean over heads


class GraphSAGE(nn.Module):
    """Full-graph or block-wise GraphSAGE.  For minibatch training, call
    with a list of blocks (one per layer) like the reference's
    train_sampling.py:60-74."""
    hidden_feats: int
    out_feats: int
    num_layers: int = 2
    aggregator_type: str = "mean"
    dropout: float = 0.5
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, g, x: Array, deterministic: bool = True):
        blocks = g if isinstance(g, (list, tuple)) else [g] * self.num_layers
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        h = x
        for i in range(self.num_layers):
            block = blocks[i]
            dims = self.hidden_feats if i < self.num_layers - 1 \
                else self.out_feats
            if block.is_block:
                h_dst = h[:block.num_dst_nodes]
                h = SAGEConv(dims, self.aggregator_type,
                             name=f"sage{i}")(block, (h, h_dst),
                                              deterministic=deterministic)
            else:
                h = SAGEConv(dims, self.aggregator_type,
                             name=f"sage{i}")(block, h,
                                              deterministic=deterministic)
            if i < self.num_layers - 1:
                h = self.activation(h)
                h = drop(h)
        return h


class RGCN(nn.Module):
    """Entity-classification R-GCN (reference:
    examples/pytorch/rgcn/entity_classify.py): embedding input layer +
    basis RelGraphConv stack."""
    num_nodes: int
    hidden_feats: int
    out_feats: int
    num_rels: int
    num_bases: int = -1
    num_layers: int = 2
    dropout: float = 0.0
    self_loop: bool = True

    @nn.compact
    def __call__(self, g: Graph, etypes: Array, norm: Optional[Array] = None,
                 feats: Optional[Array] = None, deterministic: bool = True,
                 plan=None):
        """``plan`` (dgl.prepare_rgcn) routes every layer through the
        two-level (dst,etype)-pair fast path — one narrow gather per
        edge (ops/rgcn.py; the fork's fused-RGCN analogue)."""
        nb = None if self.num_bases <= 0 else self.num_bases
        if feats is None:
            feats = nn.Embed(self.num_nodes, self.hidden_feats,
                             name="embed")(jnp.arange(self.num_nodes))
        h = feats
        for i in range(self.num_layers - 1):
            h = RelGraphConv(self.hidden_feats, self.num_rels, "basis", nb,
                             activation=nn.relu, self_loop=self.self_loop,
                             dropout=self.dropout, name=f"rgcn{i}")(
                g, h, etypes, norm, deterministic=deterministic,
                plan=plan)
        return RelGraphConv(self.out_feats, self.num_rels, "basis", nb,
                            self_loop=self.self_loop,
                            name=f"rgcn{self.num_layers-1}")(
            g, h, etypes, norm, deterministic=deterministic, plan=plan)


class GIN(nn.Module):
    """GIN for graph classification (reference: examples/pytorch/gin)."""
    hidden_feats: int
    out_feats: int
    num_layers: int = 5

    @nn.compact
    def __call__(self, g: Graph, x: Array, deterministic: bool = True):
        from ..ops import readout
        h = x
        outs = []
        for i in range(self.num_layers):
            mlp = nn.Sequential([
                nn.Dense(self.hidden_feats), nn.relu,
                nn.Dense(self.hidden_feats)])
            h = GINConv(apply_func=mlp, learn_eps=True,
                        name=f"gin{i}")(g, h)
            h = nn.relu(nn.LayerNorm(name=f"ln{i}")(h))
            outs.append(readout.sum_nodes(g, h))
        score = 0.0
        for i, r in enumerate(outs):
            score = score + nn.Dense(self.out_feats, name=f"pred{i}")(r)
        return score


class MLPPredictor(nn.Module):
    """Edge-score MLP head for link prediction."""
    hidden_feats: int
    out_feats: int = 1

    @nn.compact
    def __call__(self, h_src: Array, h_dst: Array):
        h = jnp.concatenate([h_src, h_dst], axis=-1)
        h = nn.relu(nn.Dense(self.hidden_feats)(h))
        return nn.Dense(self.out_feats)(h)
