"""Shared pieces of the message-passing primitives.

Binary op / target vocabulary mirrors the reference's "binary reduce"
algebra (reference: src/kernel/binary_reduce_common.h:28-44 — ops
add/sub/mul/div/dot/use_lhs; targets src/dst/edge) but is implemented as
plain traced jnp, letting XLA fuse gather + elementwise + segment-reduce
into one TPU computation instead of instantiating one CUDA kernel per
(op × reducer × target) as minigun does.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

BINARY_OPS = ("add", "sub", "mul", "div", "dot", "copy_lhs", "copy_rhs")
TARGETS = ("u", "v", "e")


def apply_binary(op: str, lhs: Optional[Array], rhs: Optional[Array]) -> Array:
    """Elementwise combine with numpy broadcasting; 'dot' contracts the
    last dim keeping a trailing 1 (matches dgl.function.u_dot_v shape,
    reference: python/dgl/function/message.py)."""
    if op == "copy_lhs":
        return lhs
    if op == "copy_rhs":
        return rhs
    if op == "add":
        return lhs + rhs
    if op == "sub":
        return lhs - rhs
    if op == "mul":
        return lhs * rhs
    if op == "div":
        return lhs / rhs
    if op == "dot":
        return jnp.sum(lhs * rhs, axis=-1, keepdims=True)
    raise ValueError(f"unknown binary op {op!r}; expected one of {BINARY_OPS}")


def gather_edge_operand(g, data: Array, target: str) -> Array:
    """Materialise an operand per edge (internal CSC edge order).

    target 'u' gathers from src nodes, 'v' from dst nodes, 'e' expects
    edge data already in internal order (use ``Graph.edata_internal`` or
    pass user-order data through ``edata`` view once).
    """
    if target == "u":
        return data[g.src]
    if target == "v":
        return data[g.dst]
    if target == "e":
        return data
    raise ValueError(f"unknown target {target!r}; expected one of {TARGETS}")
