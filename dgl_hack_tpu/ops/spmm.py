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
import numpy as np

from .common import apply_binary, gather_edge_operand
from . import segment

Array = jax.Array

REDUCERS = ("sum", "mean", "max", "min", "prod")


def _pallas_eligible(g, op, reduce_op, lhs_data, rhs_data, lhs_target,
                     rhs_target) -> bool:
    from ..utils.env import get_config
    if get_config().disable_pallas:
        return False
    if getattr(g, "spmm_plan_arrays", None) is None or g.edge_mask is not None:
        return False
    if lhs_target != "u" or op not in ("copy_lhs", "mul"):
        return False
    if op == "mul" and rhs_target != "e":
        return False
    if reduce_op not in ("sum", "mean"):
        return False
    if not jnp.issubdtype(jnp.result_type(lhs_data), jnp.floating):
        return False
    if op == "mul":
        # the kernel broadcasts w up to x's feature shape, not vice versa
        bshape = jnp.broadcast_shapes(lhs_data.shape[1:], rhs_data.shape[1:])
        if bshape != tuple(lhs_data.shape[1:]):
            return False
    from .pallas.spmm_kernel import flat_plans_fit
    width = int(np.prod(lhs_data.shape[1:])) if lhs_data.ndim > 1 else 1
    return flat_plans_fit(g.spmm_plan_meta, g.spmm_plan_arrays, width)


def _hybrid_eligible(g, op, reduce_op, lhs_data, lhs_target) -> bool:
    """Unweighted copy_u sum/mean via the dense-hub hybrid plan
    (prepare_spmm dense_hub=True; see ops/pallas/spmm_kernel.py)."""
    from ..utils.env import get_config
    if get_config().disable_pallas:
        return False
    if getattr(g, "spmm_hybrid_arrays", None) is None \
            or g.edge_mask is not None:
        return False
    if op != "copy_lhs" or lhs_target != "u":
        return False
    if reduce_op not in ("sum", "mean"):
        return False
    if not jnp.issubdtype(jnp.result_type(lhs_data), jnp.floating):
        return False
    from .pallas.spmm_kernel import flat_plans_fit
    width = int(np.prod(lhs_data.shape[1:])) if lhs_data.ndim > 1 else 1
    return flat_plans_fit(g.spmm_hybrid_meta, g.spmm_hybrid_arrays, width)


def gspmm(g, op: str, reduce_op: str,
          lhs_data: Optional[Array] = None,
          rhs_data: Optional[Array] = None,
          lhs_target: str = "u", rhs_target: str = "e") -> Array:
    """out[v] = reduce_{e=(u,v)} op(lhs[lhs_target], rhs[rhs_target]).

    ``lhs_data``/``rhs_data`` live on the target's index space: (num_src,
    ...) for 'u', (num_dst, ...) for 'v', (num_edges, ...) internal order
    for 'e'.  Returns (num_dst, ...broadcast feature shape...).

    When the graph carries a Pallas block plan (prepare_spmm) and the
    combination is the hot u/e sum/mean path, dispatches to the
    scatter-free MXU kernel (ops/pallas/spmm_kernel.py).
    """
    if reduce_op not in REDUCERS:
        raise ValueError(f"unknown reducer {reduce_op!r}")
    if _hybrid_eligible(g, op, reduce_op, lhs_data, lhs_target):
        from .pallas.spmm_kernel import gspmm_hybrid
        from ..utils.env import get_config
        deg = g.in_degrees() if reduce_op == "mean" else None
        return gspmm_hybrid(g.spmm_hybrid_meta, g.spmm_hybrid_arrays,
                            lhs_data, reduce_op, deg,
                            mode=get_config().spmm_mode)
    if _pallas_eligible(g, op, reduce_op, lhs_data, rhs_data, lhs_target,
                        rhs_target):
        from .pallas.spmm_kernel import gspmm_pallas
        w = None
        if op == "mul":
            w = rhs_data
            if w.ndim > 1 and all(s == 1 for s in w.shape[1:]):
                # one scalar per edge: keep it scalar — the kernel
                # multiplies in VMEM (broadcasting to full feature width
                # here costs a (slots x F) HBM round-trip)
                w = w.reshape(w.shape[0])
            elif w.ndim > 1 and w.shape[1:] != lhs_data.shape[1:]:
                w = jnp.broadcast_to(
                    w, (w.shape[0],) + jnp.broadcast_shapes(
                        w.shape[1:], lhs_data.shape[1:]))
        deg = g.in_degrees() if reduce_op == "mean" else None
        from ..utils.env import get_config
        return gspmm_pallas(g.spmm_plan_meta, g.spmm_plan_arrays, g.src,
                            g.dst, lhs_data, w, reduce_op, deg,
                            mode=get_config().spmm_mode)
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
