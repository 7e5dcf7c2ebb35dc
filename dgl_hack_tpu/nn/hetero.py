"""HeteroGraphConv — per-relation module application + cross-type
aggregation (reference: python/dgl/nn/pytorch/hetero.py)."""
from __future__ import annotations

from typing import Callable, Dict

import flax.linen as nn
import jax.numpy as jnp

from ..core.heterograph import HeteroGraph


class HeteroGraphConv(nn.Module):
    """Apply one sub-module per canonical etype and aggregate results per
    destination node type.

    ``mods`` maps etype name -> flax module taking (rel_graph,
    (src_feat, dst_feat)).  aggregate in {'sum', 'max', 'min', 'mean',
    'stack'}.
    """
    mods: Dict[str, Callable]
    aggregate: str = "sum"

    @nn.compact
    def __call__(self, hg: HeteroGraph, inputs: Dict[str, jnp.ndarray],
                 **kwargs) -> Dict[str, jnp.ndarray]:
        outputs: Dict[str, list] = {}
        for c in hg.canonical_etypes:
            st, et, dt = c
            if et not in self.mods or st not in inputs:
                continue
            rel = hg[c]
            dst_in = inputs.get(dt, inputs[st])
            out = self.mods[et](rel, (inputs[st], dst_in), **kwargs)
            outputs.setdefault(dt, []).append(out)
        agg = {}
        for dt, outs in outputs.items():
            if len(outs) == 1 and self.aggregate != "stack":
                agg[dt] = outs[0]
            elif self.aggregate == "sum":
                agg[dt] = sum(outs[1:], outs[0])
            elif self.aggregate == "mean":
                agg[dt] = sum(outs[1:], outs[0]) / len(outs)
            elif self.aggregate == "max":
                agg[dt] = jnp.stack(outs).max(0)
            elif self.aggregate == "min":
                agg[dt] = jnp.stack(outs).min(0)
            elif self.aggregate == "stack":
                agg[dt] = jnp.stack(outs, axis=1)
            else:
                raise ValueError(self.aggregate)
        return agg
