"""Message-passing API: update_all / apply_edges / apply_nodes / pull / push.

The reference routes these through a scheduler that emits a tiny IR executed
by per-opcode executors (reference: python/dgl/runtime/scheduler.py:196,334,
801; runtime/ir/executor.py:1000,1141), choosing between (a) fused gSpMM,
(b) message materialisation + degree bucketing for UDF reducers, (c)
copy-reduce, (d) full degree bucketing.  Under JAX, tracing *is* the
scheduler: builtin (message, reduce) pairs lower directly onto one gspmm
call; UDFs are traced Python over gathered edge batches / padded dense
mailboxes (the static-shape TPU replacement for degree bucketing,
reference: python/dgl/runtime/degree_bucketing.py:12).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Union

import jax
import jax.numpy as jnp

from ..function import BuiltinMessage, BuiltinReduce
from ..ops import segment as segment_ops
from ..ops.common import apply_binary, gather_edge_operand
from ..ops.edge_softmax import edge_softmax as _edge_softmax
from ..ops.spmm import gspmm
from .graph import Graph

Array = jax.Array
MessageFunc = Union[BuiltinMessage, Callable]
ReduceFunc = Union[BuiltinReduce, Callable]


def _target_frame(g: Graph, target: str) -> Dict[str, Array]:
    if target == "u":
        return g._node_frames[0]
    if target == "v":
        return g._node_frames[-1]
    if target == "e":
        return g._edge_frame
    raise ValueError(target)


def _lookup(g: Graph, target: str, field: str) -> Array:
    frame = _target_frame(g, target)
    if field not in frame:
        kind = {"u": "srcdata", "v": "dstdata", "e": "edata"}[target]
        raise KeyError(f"field {field!r} not found in {kind}")
    return frame[field]


# ---------------------------------------------------------------------------
# UDF batches (reference: python/dgl/udf.py EdgeBatch/NodeBatch)
# ---------------------------------------------------------------------------
class EdgeBatch:
    """Per-edge view handed to edge UDFs: ``.src``/``.dst``/``.data`` are
    dicts of per-edge arrays (internal CSC order)."""

    def __init__(self, g: Graph):
        self._g = g
        self.src = _LazyGather(g, "u")
        self.dst = _LazyGather(g, "v")
        self.data = _LazyGather(g, "e")

    def edges(self):
        e = self._g
        eid = (jnp.arange(e.src.shape[0], dtype=jnp.int32)
               if e.int2user is None else e.int2user)
        return e.src, e.dst, eid

    def batch_size(self) -> int:
        return self._g.num_edges_static


class _LazyGather:
    def __init__(self, g: Graph, target: str):
        self._g, self._target = g, target

    def __getitem__(self, field: str) -> Array:
        return gather_edge_operand(self._g, _lookup(self._g, self._target, field),
                                   self._target)

    def __contains__(self, field):
        return field in _target_frame(self._g, self._target)

    def keys(self):
        return _target_frame(self._g, self._target).keys()


class NodeBatch:
    """Per-dst-node view for reduce / apply-node UDFs.

    ``mailbox[field]`` is a dense padded mailbox of shape
    (num_dst, max_degree, *feat): the static-shape TPU replacement for the
    reference's per-degree bucketing (runtime/degree_bucketing.py).  Padded
    slots are zero-filled; ``mask`` (num_dst, max_degree) marks real
    messages and ``degrees`` gives exact in-degrees so UDFs can implement
    mean/softmax correctly.
    """

    def __init__(self, data: Dict[str, Array], mailbox=None, mask=None,
                 degrees=None):
        self.data = data
        self.mailbox = mailbox
        self.mask = mask
        self.degrees = degrees

    def batch_size(self) -> int:
        return next(iter(self.data.values())).shape[0] if self.data else 0


def build_mailbox(g: Graph, messages: Dict[str, Array],
                  max_degree: Optional[int] = None):
    """Scatter per-edge messages into a (num_dst, max_deg, ...) mailbox."""
    E = g.num_edges_static
    deg = g.in_degrees()
    if max_degree is None:
        max_degree = int(jax.device_get(deg.max())) if E else 1
        max_degree = max(max_degree, 1)
    # slot of edge within its dst segment (edges are dst-sorted)
    slot = jnp.arange(E, dtype=jnp.int32) - g.csc_indptr[g.dst]
    slot = jnp.minimum(slot, max_degree - 1)
    mailbox = {}
    for k, v in messages.items():
        box = jnp.zeros((g.num_dst_nodes, max_degree) + v.shape[1:], v.dtype)
        mailbox[k] = box.at[g.dst, slot].set(
            v if g.edge_mask is None
            else jnp.where(g.edge_mask.reshape((-1,) + (1,) * (v.ndim - 1)),
                           v, jnp.zeros_like(v)))
    arange = jnp.arange(max_degree, dtype=jnp.int32)
    mask = arange[None, :] < jnp.minimum(deg, max_degree)[:, None]
    return mailbox, mask, deg


# ---------------------------------------------------------------------------
# Core entry points
# ---------------------------------------------------------------------------
def compute_messages(g: Graph, message_func: MessageFunc) -> Dict[str, Array]:
    """Materialise messages per edge (internal order)."""
    if isinstance(message_func, BuiltinMessage):
        m = message_func
        lhs = (None if m.op == "copy_rhs" else
               gather_edge_operand(g, _lookup(g, m.lhs_target, m.lhs_field),
                                   m.lhs_target))
        rhs = (None if m.op == "copy_lhs" else
               gather_edge_operand(g, _lookup(g, m.rhs_target, m.rhs_field),
                                   m.rhs_target))
        return {m.out_field: apply_binary(m.op, lhs, rhs)}
    out = message_func(EdgeBatch(g))
    if not isinstance(out, dict):
        raise TypeError("edge UDF must return a dict of per-edge arrays")
    return out


def update_all(g: Graph, message_func: MessageFunc, reduce_func: ReduceFunc,
               apply_node_func: Optional[Callable] = None,
               max_degree: Optional[int] = None) -> None:
    """Fused message + reduce over all edges, writing into dstdata.

    Reference: DGLGraph.update_all (python/dgl/graph.py:3221) ->
    schedule_update_all (runtime/scheduler.py:196).
    """
    if isinstance(message_func, BuiltinMessage) and \
            isinstance(reduce_func, BuiltinReduce):
        m, r = message_func, reduce_func
        out = gspmm(
            g, m.op, r.reducer,
            None if m.op == "copy_rhs" else _lookup(g, m.lhs_target, m.lhs_field),
            None if m.op == "copy_lhs" else _lookup(g, m.rhs_target, m.rhs_field),
            m.lhs_target or "u", m.rhs_target or "e")
        g._node_frames[-1][r.out_field] = out
    else:
        msgs = compute_messages(g, message_func)
        if isinstance(reduce_func, BuiltinReduce):
            r = reduce_func
            out = segment_ops.segment_reduce(
                r.reducer, msgs[r.msg_field], g.dst, g.num_dst_nodes,
                indices_are_sorted=True, mask=g.edge_mask)
            g._node_frames[-1][r.out_field] = out
        else:
            mailbox, mask, deg = build_mailbox(g, msgs, max_degree)
            nb = NodeBatch(dict(g._node_frames[-1]), mailbox, mask, deg)
            res = reduce_func(nb)
            if not isinstance(res, dict):
                raise TypeError("reduce UDF must return a dict")
            g._node_frames[-1].update(res)
    if apply_node_func is not None:
        apply_nodes(g, apply_node_func)


def apply_edges(g: Graph, func: MessageFunc) -> None:
    """Compute per-edge values and store them in edata.

    Reference: DGLGraph.apply_edges (python/dgl/graph.py:2600) — the
    gSDDMM path.
    """
    msgs = compute_messages(g, func)
    g._edge_frame.update(msgs)   # internal order, matching storage


def apply_nodes(g: Graph, func: Callable) -> None:
    """Apply a node UDF over dstdata (reference: graph.py:2546)."""
    nb = NodeBatch(dict(g._node_frames[-1]))
    res = func(nb)
    if not isinstance(res, dict):
        raise TypeError("node UDF must return a dict")
    g._node_frames[-1].update(res)


def send_and_recv(g: Graph, edge_ids: Array, message_func: MessageFunc,
                  reduce_func: ReduceFunc) -> None:
    """Message-pass along a subset of edges (reference: graph.py:2912).

    TPU-native formulation: a masked update_all with the complement edges
    contributing the reducer identity (static shapes; no dynamic subgraph).
    """
    E = g.num_edges_static
    if g.int2user is not None:
        internal_ids = jnp.asarray(g.user2int)[jnp.asarray(edge_ids)]
    else:
        internal_ids = jnp.asarray(edge_ids)
    sel = jnp.zeros((E,), bool).at[internal_ids].set(True)
    if g.edge_mask is not None:
        sel = sel & g.edge_mask
    # replace() shares the frame dicts, so writes land in g's frames
    update_all(g.replace(edge_mask=sel), message_func, reduce_func)


def pull(g: Graph, v: Array, message_func: MessageFunc,
         reduce_func: ReduceFunc,
         max_degree: Optional[int] = None) -> None:
    """Aggregate only into nodes ``v`` (reference: graph.py:3021).

    Perf note: this is **O(E) regardless of |v|** — it computes the
    full-graph reduction then keeps rows v, because static shapes are
    what XLA wants (the reference builds a dynamic subgraph instead,
    runtime/scheduler.py:451).  For a small, repeated pull on a huge
    graph, build an ``in_subgraph(g, v)`` once and ``update_all`` on it.
    Pass ``max_degree`` for UDF reducers under jit (the mailbox width
    must be static).
    """
    prev = {k: val for k, val in g._node_frames[-1].items()}
    update_all(g, message_func, reduce_func, max_degree=max_degree)
    v = jnp.asarray(v)
    out_fields = (set(g._node_frames[-1]) - set(prev)) | \
        {k for k in prev if g._node_frames[-1][k] is not prev[k]}
    keep = jnp.zeros((g.num_dst_nodes,), bool).at[v].set(True)
    for k in out_fields:
        new = g._node_frames[-1][k]
        if k in prev and prev[k].shape == new.shape:
            mask = keep.reshape((-1,) + (1,) * (new.ndim - 1))
            g._node_frames[-1][k] = jnp.where(mask, new, prev[k])


def push(g: Graph, u: Array, message_func: MessageFunc,
         reduce_func: ReduceFunc) -> None:
    """Send along out-edges of ``u`` only (reference: graph.py:3124)."""
    u = jnp.asarray(u)
    src_sel = jnp.zeros((g.num_src_nodes,), bool).at[u].set(True)
    sel = src_sel[g.src]
    if g.edge_mask is not None:
        sel = sel & g.edge_mask
    update_all(g.replace(edge_mask=sel), message_func, reduce_func)


def edge_softmax_graph(g: Graph, logits: Array, order="internal") -> Array:
    return _edge_softmax(g, logits, order)


class GroupedEdgeBatch:
    """Edge UDF view for ``group_apply_edges``: ``.src``/``.dst``/``.data``
    are dicts of (num_group_nodes, max_degree, *feat) padded arrays;
    ``mask`` (num_group_nodes, max_degree) marks real edges and
    ``degrees`` gives exact group sizes (the static-shape replacement for
    the reference's per-degree edge bucketing,
    src/scheduler/scheduler.cc group-by-edge path)."""

    def __init__(self, src, dst, data, mask, degrees):
        self.src = src
        self.dst = dst
        self.data = data
        self.mask = mask
        self.degrees = degrees

    def batch_size(self) -> int:
        return self.mask.shape[0]


def group_apply_edges(g: Graph, group_by: str, func: Callable,
                      max_degree: Optional[int] = None) -> None:
    """Group edges by their src or dst node and apply a UDF per group,
    writing returned fields to edata (reference: DGLGraph.
    group_apply_edges, python/dgl/graph.py:2660 ->
    schedule_group_apply_edge, runtime/scheduler.py:516).

    The UDF receives a GroupedEdgeBatch with (N, max_deg, feat)-padded
    views and must return a dict of same-layout arrays; padded slots are
    discarded on write-back.  Typical use: per-node softmax over
    out-edges."""
    if group_by not in ("src", "dst"):
        raise ValueError("group_by must be 'src' or 'dst'")
    E = g.num_edges_static
    if group_by == "dst":
        n = g.num_dst_nodes
        seg = g.dst                                  # internal = dst-sorted
        indptr = g.csc_indptr
        order = None
        deg = g.in_degrees()
    else:
        if g.csr_indptr is None or g.csr_eids is None:
            raise ValueError("group_by='src' requires the CSR format")
        n = g.num_src_nodes
        order = g.csr_eids                           # src-sorted -> internal
        seg = g.src[order]
        indptr = g.csr_indptr
        deg = g.out_degrees()
    if max_degree is None:
        max_degree = max(1, int(jax.device_get(deg.max()))) if E else 1
    slot = jnp.arange(E, dtype=jnp.int32) - indptr[seg]
    slot = jnp.minimum(slot, max_degree - 1)

    def box(v):
        b = jnp.zeros((n, max_degree) + v.shape[1:], v.dtype)
        if g.edge_mask is not None:
            v = jnp.where(g.edge_mask.reshape((-1,) + (1,) * (v.ndim - 1)),
                          v, jnp.zeros_like(v))
        return b.at[seg, slot].set(v)

    def boxed_frame(target):
        frame = _target_frame(g, target)
        out = {}
        for k in frame.keys():
            v = gather_edge_operand(g, frame[k], target)
            if order is not None:
                v = v[order]
            out[k] = box(v)
        return out

    mask = (jnp.arange(max_degree, dtype=jnp.int32)[None, :]
            < jnp.minimum(deg, max_degree)[:, None])
    batch = GroupedEdgeBatch(boxed_frame("u"), boxed_frame("v"),
                             boxed_frame("e"), mask, deg)
    res = func(batch)
    if not isinstance(res, dict):
        raise TypeError("group_apply_edges UDF must return a dict")
    for k, v in res.items():
        flat = v[seg, slot]                          # grouped -> edge order
        if order is not None:
            flat = jnp.zeros_like(flat).at[order].set(flat)
        g._edge_frame[k] = flat


# ---------------------------------------------------------------------------
# Attach ergonomic methods to Graph (DGL API parity)
# ---------------------------------------------------------------------------
def _attach():
    Graph.update_all = lambda self, mf, rf, af=None, **kw: \
        update_all(self, mf, rf, af, **kw)
    Graph.apply_edges = lambda self, f: apply_edges(self, f)
    Graph.apply_nodes = lambda self, f: apply_nodes(self, f)
    Graph.send_and_recv = lambda self, eids, mf, rf: \
        send_and_recv(self, eids, mf, rf)
    Graph.pull = lambda self, v, mf, rf: pull(self, v, mf, rf)
    Graph.push = lambda self, u, mf, rf: push(self, u, mf, rf)
    Graph.edge_softmax = lambda self, logits, order="internal": \
        _edge_softmax(self, logits, order)
    Graph.send = lambda self, mf: send(self, mf)
    Graph.recv = lambda self, v, rf: recv(self, v, rf)
    Graph.group_apply_edges = lambda self, group_by, f, **kw: \
        group_apply_edges(self, group_by, f, **kw)


_attach()


def send(g: Graph, message_func: MessageFunc) -> None:
    """Stage messages on all edges (reference: DGLGraph.send,
    python/dgl/graph.py:2749).  Messages are stored on the graph and
    consumed by ``recv``; under tracing this is just deferred fusion."""
    g._staged_messages = compute_messages(g, message_func)


def recv(g: Graph, v, reduce_func: ReduceFunc) -> None:
    """Reduce staged messages into nodes ``v`` (reference:
    DGLGraph.recv, graph.py:2810).

    UDF reducers ride the same padded mailbox as ``update_all`` (the
    degree-bucketing scheduler's stand-in, reference:
    python/dgl/runtime/degree_bucketing.py:12); rows outside ``v`` keep
    their previous values."""
    msgs = getattr(g, "_staged_messages", None)
    if msgs is None:
        raise RuntimeError("recv() without a prior send()")
    v = jnp.asarray(v)
    keep = jnp.zeros((g.num_dst_nodes,), bool).at[v].set(True)

    def _merge(field, out):
        prev = g._node_frames[-1].get(field)
        if prev is not None and prev.shape == out.shape:
            mask = keep.reshape((-1,) + (1,) * (out.ndim - 1))
            out = jnp.where(mask, out, prev)
        g._node_frames[-1][field] = out

    if isinstance(reduce_func, BuiltinReduce):
        r = reduce_func
        out = segment_ops.segment_reduce(
            r.reducer, msgs[r.msg_field], g.dst, g.num_dst_nodes,
            indices_are_sorted=True, mask=g.edge_mask)
        _merge(r.out_field, out)
    else:
        mailbox, mask, deg = build_mailbox(g, msgs)
        nb = NodeBatch(dict(g._node_frames[-1]), mailbox, mask, deg)
        res = reduce_func(nb)
        if not isinstance(res, dict):
            raise TypeError("reduce UDF must return a dict")
        for k, out in res.items():
            _merge(k, out)
    g._staged_messages = None
