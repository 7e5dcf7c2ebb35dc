"""NN utility modules (reference: python/dgl/nn/pytorch/utils.py —
Sequential, WeightBasis, Identity)."""
from __future__ import annotations

from typing import Callable, Sequence as Seq, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class Sequential(nn.Module):
    """Stack GNN modules: apply all to one graph, or module i to graph i
    when a list of graphs is given (reference: utils.py Sequential:106).
    Each layer is called as layer(g, feat) (extra *args forwarded)."""
    layers: Tuple[Callable, ...]

    @nn.compact
    def __call__(self, graph, feat, *args):
        graphs = graph if isinstance(graph, (list, tuple)) else \
            [graph] * len(self.layers)
        if len(graphs) != len(self.layers):
            raise ValueError("number of graphs != number of modules")
        for g, layer in zip(graphs, self.layers):
            feat = layer(g, feat, *args)
        return feat


class WeightBasis(nn.Module):
    """Basis decomposition W_o = sum_b a_ob V_b (reference:
    utils.py WeightBasis:220 — the R-GCN basis regularizer as a
    standalone module).  Returns (num_outputs, *shape)."""
    shape: Tuple[int, ...]
    num_bases: int
    num_outputs: int

    @nn.compact
    def __call__(self) -> Array:
        if self.num_outputs <= self.num_bases:
            raise ValueError(
                "usually #outputs > #bases; got "
                f"{self.num_outputs} <= {self.num_bases}")
        basis = self.param("weight", nn.initializers.glorot_uniform(),
                           (self.num_bases,) + tuple(self.shape))
        coeff = self.param("w_comp", nn.initializers.glorot_uniform(),
                           (self.num_outputs, self.num_bases))
        flat = basis.reshape(self.num_bases, -1)
        return (coeff @ flat).reshape((self.num_outputs,)
                                      + tuple(self.shape))


class Identity(nn.Module):
    """Placeholder identity (reference: utils.py Identity:94)."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return x
