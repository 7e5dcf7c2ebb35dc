"""Heterogeneous graphs: typed nodes/edges over relation-wise Graphs.

The reference implements heterographs as a C++ metagraph + vector of
``UnitGraph`` relation graphs (reference: src/graph/heterograph.cc,
src/graph/unit_graph.h:39; python/dgl/heterograph.py:21).  Here a
HeteroGraph is a plain pytree: a static metagraph (tuple of canonical
(srctype, etype, dsttype) triples) + one bipartite ``Graph`` per relation
+ per-ntype feature frames.  ``multi_update_all`` reproduces the
reference's per-etype reduce followed by a cross-type reducer
(reference: python/dgl/heterograph.py:3570).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..function import BuiltinMessage, BuiltinReduce
from .graph import Graph, _build, _FrameView

Array = jax.Array
CanonicalEtype = Tuple[str, str, str]


@jax.tree_util.register_pytree_node_class
class HeteroGraph:
    """metagraph + {canonical_etype: relation Graph} + per-ntype frames."""

    def __init__(self, relations: Dict[CanonicalEtype, Graph],
                 num_nodes: Dict[str, int],
                 node_frames: Optional[Dict[str, Dict[str, Array]]] = None,
                 batch_info: Optional[Tuple] = None):
        self.relations = dict(relations)
        self._num_nodes = dict(num_nodes)
        if node_frames is None:
            node_frames = {nt: {} for nt in num_nodes}
        self._node_frames = node_frames
        # (per-ntype node counts, per-cetype edge counts) for batched
        # heterographs (reference: python/dgl/batched_heterograph.py:12)
        self._batch_info = batch_info

    # -- schema -------------------------------------------------------------
    @property
    def ntypes(self) -> Tuple[str, ...]:
        return tuple(sorted(self._num_nodes))

    @property
    def canonical_etypes(self) -> Tuple[CanonicalEtype, ...]:
        return tuple(self.relations.keys())

    @property
    def etypes(self) -> Tuple[str, ...]:
        return tuple(et for _, et, _ in self.canonical_etypes)

    def num_nodes(self, ntype: Optional[str] = None) -> int:
        if ntype is None:
            if len(self._num_nodes) != 1:
                return sum(self._num_nodes.values())
            ntype = next(iter(self._num_nodes))
        return self._num_nodes[ntype]

    def num_edges(self, etype: Optional[Union[str, CanonicalEtype]] = None) -> int:
        if etype is None:
            return sum(g.num_edges() for g in self.relations.values())
        return self._rel(etype).num_edges()

    def to_canonical_etype(self, etype: Union[str, CanonicalEtype]) -> CanonicalEtype:
        if isinstance(etype, tuple):
            return etype
        cands = [c for c in self.canonical_etypes if c[1] == etype]
        if len(cands) != 1:
            raise KeyError(f"etype {etype!r} is absent or ambiguous "
                           f"({len(cands)} matches)")
        return cands[0]

    def _rel(self, etype) -> Graph:
        return self.relations[self.to_canonical_etype(etype)]

    # -- batching (reference: batched_heterograph.py:256,265,298) -----------
    @property
    def batch_size(self) -> int:
        if self._batch_info is None:
            return 1
        return len(next(iter(self._batch_info[0].values())))

    def batch_num_nodes(self, ntype: Optional[str] = None):
        """Per-component node counts of a batched heterograph."""
        if self._batch_info is None:
            nts = self.ntypes
            if ntype is None and len(nts) != 1:
                raise ValueError("pass ntype for multi-ntype graphs")
            return (self.num_nodes(ntype or nts[0]),)
        bnn = self._batch_info[0]
        if ntype is None:
            if len(bnn) != 1:
                raise ValueError("pass ntype for multi-ntype graphs")
            ntype = next(iter(bnn))
        return bnn[ntype]

    def batch_num_edges(self, etype=None):
        """Per-component edge counts of a batched heterograph."""
        if self._batch_info is None:
            return (self.num_edges(etype),)
        bne = self._batch_info[1]
        if etype is None:
            if len(bne) != 1:
                raise ValueError("pass etype for multi-etype graphs")
            return next(iter(bne.values()))
        return bne[self.to_canonical_etype(etype)]

    def __getitem__(self, etype) -> Graph:
        """Relation slice: the bipartite Graph of one canonical etype, with
        src/dst frames bound to the node-type frames (mutations visible on
        the heterograph) — the analogue of DGL's etype-slice views
        (reference: heterograph.py etype-slicing)."""
        st, et, dt = self.to_canonical_etype(etype)
        g = self.relations[(st, et, dt)]
        g = g.replace(node_frames=(self._node_frames[st],
                                   self._node_frames[dt]))
        return g

    # -- frames -------------------------------------------------------------
    def nodes_data(self, ntype: str) -> _FrameView:
        return _FrameView(self._node_frames[ntype])

    @property
    def ndata(self) -> _FrameView:
        if len(self._num_nodes) != 1:
            raise ValueError("ndata requires a single node type; use "
                             "nodes_data(ntype)")
        return _FrameView(next(iter(self._node_frames.values())))

    def edges_data(self, etype) -> _FrameView:
        return self._rel(etype).edata

    # -- message passing ----------------------------------------------------
    def update_all(self, message_func, reduce_func, etype=None) -> None:
        """Single-etype (or single-relation graph) update_all
        (reference: heterograph.py:3507)."""
        if etype is None:
            if len(self.relations) != 1:
                raise ValueError("multiple etypes; pass etype= or use "
                                 "multi_update_all")
            etype = self.canonical_etypes[0]
        from .message import update_all as _ua
        _ua(self[etype], message_func, reduce_func)

    def multi_update_all(self, etype_dict: Dict[Any, Tuple], cross_reducer: str,
                         apply_node_func=None,
                         max_degree: Optional[int] = None) -> None:
        """Per-etype message+reduce, then cross-type combination
        (sum/max/min/mean/stack), writing into each dst ntype's frame
        (reference: python/dgl/heterograph.py:3570).

        UDF reducers run per relation over the dense padded mailbox
        (core/message.py:build_mailbox — the static-shape replacement for
        the reference's degree bucketing); each field the UDF returns
        becomes a per-etype partial and joins the cross-type reduction.
        Pass ``max_degree`` (the max in-degree over all relations) when
        calling under jit so the mailbox width is static.
        """
        from .message import NodeBatch, build_mailbox, compute_messages
        from ..ops import segment as seg

        partials: Dict[str, Dict[str, list]] = {}
        for etype, spec in etype_dict.items():
            mf, rf = spec[0], spec[1]
            st, et, dt = self.to_canonical_etype(etype)
            rel = self[(st, et, dt)]
            if isinstance(mf, BuiltinMessage) and isinstance(rf, BuiltinReduce):
                from ..ops.spmm import gspmm
                from .message import _lookup
                out = gspmm(
                    rel, mf.op, rf.reducer,
                    None if mf.op == "copy_rhs" else _lookup(rel, mf.lhs_target, mf.lhs_field),
                    None if mf.op == "copy_lhs" else _lookup(rel, mf.rhs_target, mf.rhs_field),
                    mf.lhs_target or "u", mf.rhs_target or "e")
                outs = {rf.out_field: out}
            elif isinstance(rf, BuiltinReduce):
                msgs = compute_messages(rel, mf)
                out = seg.segment_reduce(rf.reducer, msgs[rf.msg_field],
                                         rel.dst, rel.num_dst_nodes,
                                         indices_are_sorted=True,
                                         mask=rel.edge_mask)
                outs = {rf.out_field: out}
            else:
                # UDF reducer: dense padded mailbox per relation, exactly
                # the single-etype update_all UDF path
                msgs = compute_messages(rel, mf)
                mailbox, mask, deg = build_mailbox(rel, msgs, max_degree)
                nb = NodeBatch(dict(self._node_frames[dt]), mailbox, mask,
                               deg)
                outs = rf(nb)
                if not isinstance(outs, dict):
                    raise TypeError("reduce UDF must return a dict")
            for field, out in outs.items():
                partials.setdefault(dt, {}).setdefault(field, []).append(out)

        for dt, fields in partials.items():
            for field, outs in fields.items():
                if cross_reducer == "sum":
                    val = sum(outs[1:], outs[0])
                elif cross_reducer == "mean":
                    val = sum(outs[1:], outs[0]) / len(outs)
                elif cross_reducer == "max":
                    val = jnp.stack(outs).max(0)
                elif cross_reducer == "min":
                    val = jnp.stack(outs).min(0)
                elif cross_reducer == "stack":
                    val = jnp.stack(outs, axis=1)
                else:
                    raise ValueError(f"unknown cross reducer {cross_reducer!r}")
                self._node_frames[dt][field] = val
        if apply_node_func is not None:
            for dt in partials:
                from .message import NodeBatch
                nb = NodeBatch(dict(self._node_frames[dt]))
                res = apply_node_func(nb)
                if not isinstance(res, dict):
                    raise TypeError("node UDF must return a dict")
                self._node_frames[dt].update(res)

    def apply_edges(self, func, etype=None) -> None:
        from .message import apply_edges as _ae
        if etype is None:
            if len(self.relations) != 1:
                raise ValueError("multiple etypes; pass etype=")
            etype = self.canonical_etypes[0]
        _ae(self[etype], func)

    # -- pytree -------------------------------------------------------------
    def tree_flatten(self):
        etypes = tuple(self.relations.keys())
        rel_leaves, rel_defs = [], []
        for c in etypes:
            leaves, d = jax.tree_util.tree_flatten(self.relations[c])
            rel_leaves.append(leaves)
            rel_defs.append(d)
        ntypes = tuple(sorted(self._node_frames))
        fkeys = tuple(tuple(sorted(self._node_frames[nt])) for nt in ntypes)
        flat = [l for ls in rel_leaves for l in ls]
        flat += [self._node_frames[nt][k]
                 for nt, keys in zip(ntypes, fkeys) for k in keys]
        binfo = None
        if self._batch_info is not None:
            binfo = (tuple(sorted(self._batch_info[0].items())),
                     tuple(sorted(self._batch_info[1].items())))
        aux = (etypes, tuple(rel_defs),
               tuple(len(ls) for ls in rel_leaves),
               tuple(sorted(self._num_nodes.items())), ntypes, fkeys, binfo)
        return flat, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        etypes, rel_defs, rel_lens, nn_items, ntypes, fkeys, binfo = aux
        leaves = list(leaves)
        relations = {}
        i = 0
        for c, d, n in zip(etypes, rel_defs, rel_lens):
            relations[c] = jax.tree_util.tree_unflatten(d, leaves[i:i + n])
            i += n
        node_frames = {}
        for nt, keys in zip(ntypes, fkeys):
            node_frames[nt] = {k: leaves[i + j] for j, k in enumerate(keys)}
            i += len(keys)
        if binfo is not None:
            binfo = (dict(binfo[0]), dict(binfo[1]))
        return cls(relations, dict(nn_items), node_frames, binfo)

    def __repr__(self):
        return (f"HeteroGraph(num_nodes={self._num_nodes}, etypes="
                f"{list(self.canonical_etypes)})")


def heterograph(data_dict: Dict[CanonicalEtype, Tuple[Any, Any]],
                num_nodes_dict: Optional[Dict[str, int]] = None,
                build_csr: bool = True) -> HeteroGraph:
    """Build a heterograph from {(srctype, etype, dsttype): (src, dst)}
    (reference: dgl.heterograph, python/dgl/convert.py:405)."""
    nn: Dict[str, int] = dict(num_nodes_dict or {})
    rels: Dict[CanonicalEtype, Graph] = {}
    for (st, et, dt), (src, dst) in data_dict.items():
        src = np.asarray(src, dtype=np.int32)
        dst = np.asarray(dst, dtype=np.int32)
        nn.setdefault(st, 0)
        nn.setdefault(dt, 0)
        if num_nodes_dict is None:
            nn[st] = max(nn[st], int(src.max(initial=-1)) + 1)
            nn[dt] = max(nn[dt], int(dst.max(initial=-1)) + 1)
    for (st, et, dt), (src, dst) in data_dict.items():
        src = np.asarray(src, dtype=np.int32)
        dst = np.asarray(dst, dtype=np.int32)
        rels[(st, et, dt)] = _build(src, dst, nn[st], nn[dt],
                                    is_block=(st != dt), build_csr=build_csr)
    return HeteroGraph(rels, nn)


def bipartite(edges, utype="_U", etype="_E", vtype="_V",
              num_nodes=None) -> HeteroGraph:
    """Reference: dgl.bipartite (convert.py:151)."""
    nn = None
    if num_nodes is not None:
        nn = {utype: num_nodes[0], vtype: num_nodes[1]}
    return heterograph({(utype, etype, vtype): edges}, nn)


def to_heterogeneous(g: Graph, ntypes: Sequence[str],
                     etypes: Sequence[str],
                     node_type: Any = None, edge_type: Any = None,
                     metagraph: Optional[Sequence[CanonicalEtype]] = None
                     ) -> HeteroGraph:
    """Inverse of :func:`to_homogeneous` — split a homogeneous graph into
    a typed heterograph (reference: dgl.to_hetero,
    python/dgl/convert.py:493).

    ``node_type``/``edge_type`` are per-node / per-edge (user order) type
    ids into ``ntypes``/``etypes``; they default to ``g.ndata['_TYPE']`` /
    ``g.edata['_TYPE']``.  Each edge type must connect exactly one
    (srctype, dsttype) pair unless ``metagraph`` pins the canonical
    triples.  Per-type original node/edge ids are stored as ``'_ID'`` in
    the node frames and relation ``edata`` (the reference's NID/EID).
    Node features in ``g.ndata`` (other than ``_TYPE``) are split
    per-ntype when every node of the type has them.
    """
    nt = np.asarray(node_type if node_type is not None
                    else g.ndata["_TYPE"]).astype(np.int64)
    et = np.asarray(edge_type if edge_type is not None
                    else g.edata["_TYPE"]).astype(np.int64)
    if nt.shape[0] != g.num_nodes():
        raise ValueError("node_type length != num_nodes")
    if et.shape[0] != g.num_edges():
        raise ValueError("edge_type length != num_edges")
    src, dst = g.host_edges()  # user edge order
    # local ids: nodes of each type keep their relative order
    local = np.zeros(nt.shape[0], np.int64)
    num_nodes: Dict[str, int] = {}
    orig_ids: Dict[str, np.ndarray] = {}
    for i, name in enumerate(ntypes):
        m = nt == i
        local[m] = np.arange(int(m.sum()))
        num_nodes[name] = int(m.sum())
        orig_ids[name] = np.nonzero(m)[0].astype(np.int32)
    pinned = {c[1]: c for c in (metagraph or ())}
    rels: Dict[CanonicalEtype, Graph] = {}
    rel_eids: Dict[CanonicalEtype, np.ndarray] = {}
    for j, ename in enumerate(etypes):
        m = et == j
        if not m.any() and ename not in pinned:
            continue
        s, d = src[m], dst[m]
        st_ids = np.unique(nt[s]) if s.size else np.zeros(0, np.int64)
        dt_ids = np.unique(nt[d]) if d.size else np.zeros(0, np.int64)
        if ename in pinned:
            cet = pinned[ename]
        else:
            if st_ids.size > 1 or dt_ids.size > 1:
                raise ValueError(
                    f"edge type {ename!r} spans multiple src/dst node "
                    f"types; pass metagraph= to disambiguate")
            cet = (ntypes[int(st_ids[0])], ename, ntypes[int(dt_ids[0])])
        rels[cet] = _build(local[s].astype(np.int32),
                           local[d].astype(np.int32),
                           num_nodes[cet[0]], num_nodes[cet[2]],
                           is_block=(cet[0] != cet[2]))
        rel_eids[cet] = np.nonzero(m)[0].astype(np.int32)
    node_frames: Dict[str, Dict[str, Array]] = {n: {} for n in num_nodes}
    for name in num_nodes:
        node_frames[name]["_ID"] = jnp.asarray(orig_ids[name])
        for key in g.ndata:
            if key != "_TYPE":
                node_frames[name][key] = g.ndata[key][orig_ids[name]]
    hg = HeteroGraph(rels, num_nodes, node_frames)
    for cet, ids in rel_eids.items():
        hg.edges_data(cet)["_ID"] = jnp.asarray(ids)
    return hg


def to_homogeneous(hg: HeteroGraph) -> Tuple[Graph, Dict[str, Any]]:
    """Flatten a heterograph to a homogeneous graph with node/edge type
    arrays (reference: dgl.to_homo, python/dgl/convert.py:671).

    Returns (graph, info) where info holds 'ntype_offsets', 'node_types'
    (per node), 'edge_types' (per edge, user order), matching the
    reference's NTYPE/ETYPE node/edge data.
    """
    ntypes = hg.ntypes
    offs = {nt: 0 for nt in ntypes}
    total = 0
    for nt in ntypes:
        offs[nt] = total
        total += hg.num_nodes(nt)
    node_types = np.concatenate([
        np.full(hg.num_nodes(nt), i, np.int32) for i, nt in enumerate(ntypes)])
    srcs, dsts, etys = [], [], []
    for i, c in enumerate(hg.canonical_etypes):
        st, et, dt = c
        rel = hg.relations[c]
        s, d = rel.edges(order="eid")
        srcs.append(np.asarray(s) + offs[st])
        dsts.append(np.asarray(d) + offs[dt])
        etys.append(np.full(rel.num_edges(), i, np.int32))
    src = np.concatenate(srcs) if srcs else np.zeros(0, np.int32)
    dst = np.concatenate(dsts) if dsts else np.zeros(0, np.int32)
    g = _build(src.astype(np.int32), dst.astype(np.int32), total, total,
               is_block=False)
    info = {"ntype_offsets": offs,
            "node_types": node_types,
            "edge_types": np.concatenate(etys) if etys else np.zeros(0, np.int32),
            "ntypes": ntypes, "etypes": hg.canonical_etypes}
    return g, info


def hetero_from_relations(rel_graphs: Sequence[HeteroGraph]) -> HeteroGraph:
    """Union single-relation heterographs into one (reference:
    dgl.hetero_from_relations, python/dgl/convert.py)."""
    rels: Dict[CanonicalEtype, Graph] = {}
    num_nodes: Dict[str, int] = {}
    frames: Dict[str, Dict[str, Array]] = {}
    for rg in rel_graphs:
        for cet in rg.canonical_etypes:
            rels[cet] = rg.relations[cet]
        for nt in rg.ntypes:
            num_nodes[nt] = max(num_nodes.get(nt, 0), rg.num_nodes(nt))
            for key in rg.nodes_data(nt):
                frames.setdefault(nt, {})[key] = rg.nodes_data(nt)[key]
    hg = HeteroGraph(rels, num_nodes)
    for nt, fr in frames.items():
        for key, val in fr.items():
            hg.nodes_data(nt)[key] = val
    return hg


def metapath_reachable_graph(hg: HeteroGraph,
                             metapath: Sequence[Any]) -> Graph:
    """Reachability graph over a metapath: an edge (u, v) iff v is
    reachable from u through the relation chain (reference:
    dgl.transform.metapath_reachable_graph).  Host-side boolean sparse
    products."""
    import scipy.sparse as sp
    mats = []
    for et in metapath:
        rel = hg.relations[hg.to_canonical_etype(et)]
        s, d = rel.host_edges()
        mats.append(sp.coo_matrix(
            (np.ones(len(s), bool), (s, d)),
            shape=(rel.num_src_nodes, rel.num_dst_nodes)).tocsr())
    acc = mats[0]
    for m in mats[1:]:
        acc = (acc @ m).astype(bool)
    coo = acc.tocoo()
    return _build(coo.row.astype(np.int32), coo.col.astype(np.int32),
                  acc.shape[0], acc.shape[1],
                  is_block=acc.shape[0] != acc.shape[1])


# ---------------------------------------------------------------------------
# DGLHeteroGraph-API ergonomics (reference: python/dgl/heterograph.py)
# ---------------------------------------------------------------------------
def _hetero_api_extras():
    import contextlib

    def number_of_nodes(self, ntype=None):
        return self.num_nodes(ntype)

    def number_of_edges(self, etype=None):
        return self.num_edges(etype)

    def apply_nodes(self, func, ntype=None):
        """Node UDF over one ntype's frame (reference:
        heterograph.py apply_nodes)."""
        if ntype is None:
            if len(self._num_nodes) != 1:
                raise ValueError("pass ntype for multi-ntype graphs")
            ntype = self.ntypes[0]
        from .message import NodeBatch
        nb = NodeBatch(dict(self._node_frames[ntype]))
        res = func(nb)
        if not isinstance(res, dict):
            raise TypeError("node UDF must return a dict")
        self._node_frames[ntype].update(res)

    def node_type_subgraph(self, ntypes):
        """Subgraph keeping only the given node types and relations
        among them (reference: heterograph.py node_type_subgraph)."""
        keep = set(ntypes)
        rels = {c: g for c, g in self.relations.items()
                if c[0] in keep and c[2] in keep}
        nn = {nt: self._num_nodes[nt] for nt in keep}
        frames = {nt: dict(self._node_frames[nt]) for nt in keep}
        return HeteroGraph(rels, nn, frames)

    def edge_type_subgraph(self, etypes):
        """Subgraph keeping only the given edge types (+ their endpoint
        node types) (reference: heterograph.py edge_type_subgraph)."""
        cets = [self.to_canonical_etype(et) for et in etypes]
        rels = {c: self.relations[c] for c in cets}
        keep = {c[0] for c in cets} | {c[2] for c in cets}
        nn = {nt: self._num_nodes[nt] for nt in keep}
        frames = {nt: dict(self._node_frames[nt]) for nt in keep}
        return HeteroGraph(rels, nn, frames)

    def local_var(self):
        return HeteroGraph(self.relations, self._num_nodes,
                           {nt: dict(f)
                            for nt, f in self._node_frames.items()},
                           self._batch_info)

    @contextlib.contextmanager
    def local_scope(self):
        saved = {nt: dict(f) for nt, f in self._node_frames.items()}
        try:
            yield self
        finally:
            for nt, f in self._node_frames.items():
                f.clear()
                f.update(saved[nt])

    HeteroGraph.number_of_nodes = number_of_nodes
    HeteroGraph.number_of_edges = number_of_edges
    HeteroGraph.apply_nodes = apply_nodes
    HeteroGraph.node_type_subgraph = node_type_subgraph
    HeteroGraph.edge_type_subgraph = edge_type_subgraph
    HeteroGraph.local_var = local_var
    HeteroGraph.local_scope = local_scope


_hetero_api_extras()
