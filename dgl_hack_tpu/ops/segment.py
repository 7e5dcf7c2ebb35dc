"""Segment reductions — the TPU-native substrate for message aggregation.

The reference implements reduction over incoming edges with minigun
``Advance`` kernels (reference: src/kernel/cpu/binary_reduce_impl.h:29-52,
one hot loop per (op, reducer)).  On TPU the idiomatic equivalent is a
gather + XLA segment reduction: XLA lowers sorted segment ops onto the VPU
with good HBM utilisation, and JAX autodiff provides the backward pass
(gather <-> scatter-add transpose) for free.

Numerical conventions match the reference exactly (they matter for
`allclose` parity tests):

* ``mean`` = sum / clamp(degree, 1)   (reference:
  python/dgl/backend/pytorch/tensor.py:303-326)
* ``max``/``min`` over an empty segment yield 0, not +-inf (DGL zero-fills
  zero-degree rows).
* ``prod`` over an empty segment yields 1 (identity), matching DGL's
  semantics for the ``prod`` reducer.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

_REDUCERS = ("sum", "mean", "max", "min", "prod")


def _expand(x: Array, ref: Array) -> Array:
    """Broadcast a (E,) vector against trailing feature dims of ``ref``."""
    return x.reshape(x.shape + (1,) * (ref.ndim - 1))


def segment_sum(data: Array, segment_ids: Array, num_segments: int,
                indices_are_sorted: bool = False) -> Array:
    return jax.ops.segment_sum(data, segment_ids, num_segments,
                               indices_are_sorted=indices_are_sorted)


def segment_mean(data: Array, segment_ids: Array, num_segments: int,
                 indices_are_sorted: bool = False) -> Array:
    """sum / clamp(count, 1) — reference backend/pytorch/tensor.py:309-326."""
    s = segment_sum(data, segment_ids, num_segments, indices_are_sorted)
    cnt = jax.ops.segment_sum(jnp.ones((data.shape[0],), dtype=data.dtype),
                              segment_ids, num_segments,
                              indices_are_sorted=indices_are_sorted)
    cnt = jnp.maximum(cnt, 1)
    return s / _expand(cnt, s)


def segment_max(data: Array, segment_ids: Array, num_segments: int,
                indices_are_sorted: bool = False) -> Array:
    """Max-reduce; empty segments produce 0 (DGL zero-fill semantics)."""
    m = jax.ops.segment_max(data, segment_ids, num_segments,
                            indices_are_sorted=indices_are_sorted)
    return jnp.where(jnp.isneginf(m), jnp.zeros_like(m), m)


def segment_min(data: Array, segment_ids: Array, num_segments: int,
                indices_are_sorted: bool = False) -> Array:
    m = jax.ops.segment_min(data, segment_ids, num_segments,
                            indices_are_sorted=indices_are_sorted)
    return jnp.where(jnp.isposinf(m), jnp.zeros_like(m), m)


def segment_prod(data: Array, segment_ids: Array, num_segments: int,
                 indices_are_sorted: bool = False) -> Array:
    return jax.ops.segment_prod(data, segment_ids, num_segments,
                                indices_are_sorted=indices_are_sorted)


def segment_softmax(data: Array, segment_ids: Array, num_segments: int,
                    indices_are_sorted: bool = False) -> Array:
    """Numerically-stable per-segment softmax over ``data``'s leading axis.

    This is the composition the reference's edge_softmax uses
    (reference: python/dgl/nn/pytorch/softmax.py:69-80): segment max ->
    subtract -> exp -> segment sum -> divide.
    """
    m = jax.ops.segment_max(data, segment_ids, num_segments,
                            indices_are_sorted=indices_are_sorted)
    m = jnp.where(jnp.isneginf(m), jnp.zeros_like(m), m)
    e = jnp.exp(data - m[segment_ids])
    s = segment_sum(e, segment_ids, num_segments, indices_are_sorted)
    return e / jnp.maximum(s, jnp.finfo(data.dtype).tiny)[segment_ids]


_SEGMENT_FNS = {
    "sum": segment_sum,
    "mean": segment_mean,
    "max": segment_max,
    "min": segment_min,
    "prod": segment_prod,
}


def segment_reduce(reducer: str, data: Array, segment_ids: Array,
                   num_segments: int, indices_are_sorted: bool = False,
                   mask: Optional[Array] = None) -> Array:
    """Dispatch a named reducer; ``mask`` (E,) bool drops padded entries.

    Masked entries are replaced with the reducer's identity so padded
    edges (static-shape minibatching) never contaminate real segments.
    """
    if reducer not in _SEGMENT_FNS:
        raise ValueError(f"unknown reducer {reducer!r}; expected one of {_REDUCERS}")
    if mask is not None:
        data = apply_identity_mask(reducer, data, mask)
        if reducer == "mean":
            # mean must not count padded edges: route them to a trash
            # segment beyond num_segments (dropped by segment ops).
            segment_ids = jnp.where(mask, segment_ids, num_segments)
    return _SEGMENT_FNS[reducer](data, segment_ids, num_segments,
                                 indices_are_sorted=indices_are_sorted)


def apply_identity_mask(reducer: str, data: Array, mask: Array) -> Array:
    """Replace masked-out rows with the reducer's identity element."""
    mask = _expand(mask, data)
    if reducer in ("sum", "mean"):
        ident = jnp.zeros((), data.dtype)
    elif reducer == "max":
        ident = jnp.asarray(-jnp.inf if jnp.issubdtype(data.dtype, jnp.floating)
                            else jnp.iinfo(data.dtype).min, data.dtype)
    elif reducer == "min":
        ident = jnp.asarray(jnp.inf if jnp.issubdtype(data.dtype, jnp.floating)
                            else jnp.iinfo(data.dtype).max, data.dtype)
    elif reducer == "prod":
        ident = jnp.ones((), data.dtype)
    else:
        raise ValueError(f"unknown reducer {reducer!r}")
    return jnp.where(mask, data, ident)


@functools.partial(jax.jit, static_argnums=(2,))
def bincount(ids: Array, weights: Optional[Array], length: int) -> Array:
    w = jnp.ones_like(ids, dtype=jnp.float32) if weights is None else weights
    return jax.ops.segment_sum(w, ids, length)
