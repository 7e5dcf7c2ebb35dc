"""gSpMM — generalised sparse-dense matmul (fused message + reduce).

TPU-native replacement for the reference's ``BinaryOpReduce`` /
``CopyReduce`` kernels (reference: src/kernel/binary_reduce.cc:295,628 and
the minigun CPU/CUDA instantiations in src/kernel/{cpu,cuda}/).  One traced
function covers every (op × reducer × target × broadcast) combination; XLA
fuses the gathers, the elementwise op and the segment reduction.  A Pallas
CSR-tiled kernel (ops/pallas/spmm_kernel.py) provides the tuned fast path
for the common cases and is validated against this implementation.

Semantics, matched to the reference for parity tests:
* reduce to **dst** nodes over incoming edges;
* ``mean`` divides by clamp(in_degree, 1)
  (reference: python/dgl/backend/pytorch/tensor.py:303-326);
* zero in-degree rows give 0 for sum/mean/max/min;
* padded edges (``g.edge_mask``) contribute the reducer identity.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .common import apply_binary, gather_edge_operand
from . import segment

Array = jax.Array

REDUCERS = ("sum", "mean", "max", "min", "prod")


def gspmm(g, op: str, reduce_op: str,
          lhs_data: Optional[Array] = None,
          rhs_data: Optional[Array] = None,
          lhs_target: str = "u", rhs_target: str = "e") -> Array:
    """out[v] = reduce_{e=(u,v)} op(lhs[lhs_target], rhs[rhs_target]).

    ``lhs_data``/``rhs_data`` live on the target's index space: (num_src,
    ...) for 'u', (num_dst, ...) for 'v', (num_edges, ...) internal order
    for 'e'.  Returns (num_dst, ...broadcast feature shape...).
    """
    if reduce_op not in REDUCERS:
        raise ValueError(f"unknown reducer {reduce_op!r}")
    lhs = None if op == "copy_rhs" else gather_edge_operand(g, lhs_data, lhs_target)
    rhs = None if op == "copy_lhs" else gather_edge_operand(g, rhs_data, rhs_target)
    msg = apply_binary(op, lhs, rhs)
    return segment.segment_reduce(
        reduce_op, msg, g.dst, g.num_dst_nodes,
        indices_are_sorted=True, mask=g.edge_mask)


def copy_u_sum(g, x: Array) -> Array:
    """The single most common aggregation (GCN/SAGE):
    out[v] = sum_{u->v} x[u].  Equivalent of the reference's CopyReduce
    fast path (src/kernel/binary_reduce.cc:628)."""
    return gspmm(g, "copy_lhs", "sum", x)


def u_mul_e_sum(g, x: Array, w: Array) -> Array:
    """out[v] = sum_{e=(u,v)} x[u] * w[e] — the GAT aggregation
    (reference: gatconv.py:157 u_mul_e + sum)."""
    return gspmm(g, "mul", "sum", x, w, "u", "e")
