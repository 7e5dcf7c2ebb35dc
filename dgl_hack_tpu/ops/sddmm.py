"""gSDDMM — sampled dense-dense ops producing per-edge values.

TPU-native replacement for the reference's edge-output "binary reduce with
reducer=none" path (reference: src/kernel/binary_reduce.cc:295 with
``reducer="none"``; scheduled via schedule_apply_edges,
python/dgl/runtime/scheduler.py:334).  The classic instance is the GAT
attention-logit computation ``u_add_v`` (reference:
nn/pytorch/conv/gatconv.py:152).
"""
from __future__ import annotations

from typing import Optional

import jax

from .common import apply_binary, gather_edge_operand

Array = jax.Array


def gsddmm(g, op: str,
           lhs_data: Optional[Array] = None,
           rhs_data: Optional[Array] = None,
           lhs_target: str = "u", rhs_target: str = "v",
           out_order: str = "internal") -> Array:
    """out[e=(u,v)] = op(lhs[lhs_target], rhs[rhs_target]).

    Returns per-edge values in internal (CSC) order by default — ready to
    feed gspmm / edge_softmax without a permutation.  Pass
    ``out_order='eid'`` to get user insertion order (DGL parity).
    """
    lhs = None if op == "copy_rhs" else gather_edge_operand(g, lhs_data, lhs_target)
    rhs = None if op == "copy_lhs" else gather_edge_operand(g, rhs_data, rhs_target)
    out = apply_binary(op, lhs, rhs)
    if out_order == "eid" and g.int2user is not None:
        out = out[g.user2int]
    return out
