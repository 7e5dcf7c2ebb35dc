"""Shared test helpers: random graph cases + dense numpy oracles.

Mirrors the reference's oracle strategy (tests/compute/test_kernel.py:200:
fused builtin path checked against an explicit composition, forward AND
gradients) with numpy as the reference implementation.
"""
import numpy as np

import dgl_hack_tpu as dgl


def random_graph(rng, num_src=13, num_dst=11, num_edges=60, bipartite=False,
                 self_loops=True):
    src = rng.integers(0, num_src, size=num_edges).astype(np.int32)
    dst = rng.integers(0, num_dst, size=num_edges).astype(np.int32)
    if bipartite:
        g = dgl.block((src, dst), num_src, num_dst)
    else:
        n = max(num_src, num_dst)
        g = dgl.graph((src, dst), num_nodes=n)
    return g, src, dst


def oracle_message(op, lhs, rhs):
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
        return (lhs * rhs).sum(axis=-1, keepdims=True)
    raise ValueError(op)


def oracle_gspmm(src, dst, num_dst, op, reducer, lhs, rhs,
                 lhs_target="u", rhs_target="e"):
    """Dense per-edge loop oracle. lhs/rhs in USER edge order for 'e'."""
    def sel(data, target, i):
        if target == "u":
            return data[src[i]]
        if target == "v":
            return data[dst[i]]
        return data[i]

    msgs = [oracle_message(op,
                           None if op == "copy_rhs" else sel(lhs, lhs_target, i),
                           None if op == "copy_lhs" else sel(rhs, rhs_target, i))
            for i in range(len(src))]
    feat_shape = np.broadcast_shapes(
        *(m.shape for m in msgs)) if msgs else ()
    out = np.zeros((num_dst,) + tuple(feat_shape), dtype=np.float64)
    buckets = [[] for _ in range(num_dst)]
    for i in range(len(src)):
        buckets[dst[i]].append(np.broadcast_to(msgs[i], feat_shape))
    for v, bucket in enumerate(buckets):
        if not bucket:
            if reducer == "prod":
                out[v] = 1.0
            continue
        stack = np.stack(bucket)
        if reducer == "sum":
            out[v] = stack.sum(0)
        elif reducer == "mean":
            out[v] = stack.mean(0)
        elif reducer == "max":
            out[v] = stack.max(0)
        elif reducer == "min":
            out[v] = stack.min(0)
        elif reducer == "prod":
            out[v] = stack.prod(0)
        else:
            raise ValueError(reducer)
    return out


def oracle_edge_softmax(dst, num_dst, logits):
    out = np.zeros_like(logits)
    for v in range(num_dst):
        idx = np.where(dst == v)[0]
        if len(idx) == 0:
            continue
        e = logits[idx]
        e = np.exp(e - e.max(axis=0, keepdims=True))
        out[idx] = e / e.sum(axis=0, keepdims=True)
    return out
