"""TPU-native graph structure.

The reference keeps graphs in a C++ core — mutable ``Graph``
(reference: src/graph/graph.cc), immutable CSR/COO ``ImmutableGraph``
(src/graph/immutable_graph.cc) and heterograph building block ``UnitGraph``
(src/graph/unit_graph.h:39) with lazy COO/CSR/CSC materialisation — reached
through a ctypes FFI.  None of that machinery survives on TPU: a graph here
is an immutable **pytree of jax.Arrays** that flows straight through
``jit`` / ``pjit`` / ``shard_map``.

Design:

* Canonical edge order is **dst-sorted** (CSC order).  Segment reductions
  over incoming edges — the universal hot path of ``update_all`` — then see
  sorted segment ids, which XLA lowers efficiently on TPU.  A permutation
  back to the user's input edge order is kept so ``edata`` keeps DGL's
  "edge id = insertion order" semantics (the reference does the analogous
  re-mapping with ``outcsr.data`` edge-id arrays,
  src/kernel/cpu/binary_reduce_impl.h:160-170).
* CSC is implicit (edges are stored in CSC order; only ``indptr`` is kept);
  CSR (out-edges) is an explicit permutation, built eagerly on host at
  construction — graphs are built host-side with numpy, used device-side.
* Shapes are static: ``num_src/num_dst/num_edges`` are Python ints.  Padded
  graphs (static-shape minibatching) carry an ``edge_mask``; masked edges
  are neutralised inside the segment reducers.
* Bipartite "blocks" (the output of neighbour sampling,
  reference: src/graph/transform/to_bipartite.cc) are Graphs with
  ``is_block=True`` and distinct src/dst node frames.

Feature storage (`ndata`/`edata`, reference: python/dgl/frame.py) is a plain
dict of arrays riding along in the pytree; ``edata`` values are stored in
internal (CSC) order and transparently permuted at the get/set boundary.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
IdType = jnp.int32


# ---------------------------------------------------------------------------
# Frame views: thin mutable-mapping shims mirroring python/dgl/view.py
# ---------------------------------------------------------------------------
class _FrameView:
    """dict-like view over a feature frame, with an optional permutation
    applied on get/set (used for edata user-order <-> internal-order)."""

    __slots__ = ("_frame", "_get_perm", "_set_perm")

    def __init__(self, frame: Dict[str, Array], get_perm=None, set_perm=None):
        self._frame = frame
        self._get_perm = get_perm
        self._set_perm = set_perm

    def __getitem__(self, key: str) -> Array:
        v = self._frame[key]
        if self._get_perm is not None:
            v = v[self._get_perm]
        return v

    def __setitem__(self, key: str, value) -> None:
        # keep numpy inputs host-side (sampler-produced blocks defer
        # device transfer to the prefetcher's ONE batched device_put —
        # eager per-array transfers through the axon tunnel measured
        # ~350 ms/batch of pure latency, round 5); anything else
        # converts as before
        if not isinstance(value, (np.ndarray, jax.Array)):
            value = jnp.asarray(value)
        if self._set_perm is not None:
            value = value[self._set_perm]
        self._frame[key] = value

    def __delitem__(self, key: str) -> None:
        del self._frame[key]

    def __contains__(self, key: str) -> bool:
        return key in self._frame

    def keys(self):
        return self._frame.keys()

    def __iter__(self):
        return iter(self._frame)

    def __len__(self):
        return len(self._frame)

    def pop(self, key: str) -> Array:
        v = self[key]
        del self._frame[key]
        return v

    def update(self, other) -> None:
        for k in other:
            self[k] = other[k]

    def internal(self, key: str) -> Array:
        """Raw (internal-order) array without the view permutation."""
        return self._frame[key]


# ---------------------------------------------------------------------------
# Graph
# ---------------------------------------------------------------------------
@jax.tree_util.register_pytree_node_class
class Graph:
    """Immutable (bi)graph over static-shaped index arrays.

    Structure arrays (all ``int32``):
      src, dst            (E,)  endpoints in internal (dst-sorted) order
      csc_indptr          (num_dst+1,)  in-edge offsets per dst node
      csr_indptr          (num_src+1,)  out-edge offsets per src node
      csr_eids            (E,)  internal edge ids in src-sorted order
      int2user / user2int (E,)  permutations internal<->user edge order
                                 (None when input was already dst-sorted)
      edge_mask           (E,) bool or None — False rows are padding
    """

    def __init__(self, *, num_src: int, num_dst: int, src: Array, dst: Array,
                 csc_indptr: Array, csr_indptr: Optional[Array] = None,
                 csr_eids: Optional[Array] = None,
                 int2user: Optional[Array] = None,
                 user2int: Optional[Array] = None,
                 edge_mask: Optional[Array] = None,
                 is_block: bool = False,
                 node_frames: Optional[Tuple[Dict[str, Array], ...]] = None,
                 edge_frame: Optional[Dict[str, Array]] = None,
                 batch_num_nodes: Optional[Tuple[int, ...]] = None,
                 batch_num_edges: Optional[Tuple[int, ...]] = None,
                 spmm_plan_arrays: Optional[Tuple[Array, ...]] = None,
                 spmm_plan_meta: Optional[Tuple] = None,
                 spmm_hybrid_arrays: Optional[Tuple[Array, ...]] = None,
                 spmm_hybrid_meta: Optional[Tuple] = None,
                 sddmm_plan_arrays: Optional[Tuple[Array, ...]] = None,
                 sddmm_plan_meta: Optional[Tuple] = None):
        self._num_src = int(num_src)
        self._num_dst = int(num_dst)
        self.src = src
        self.dst = dst
        self.csc_indptr = csc_indptr
        self.csr_indptr = csr_indptr
        self.csr_eids = csr_eids
        self.int2user = int2user
        self.user2int = user2int
        self.edge_mask = edge_mask
        self.is_block = bool(is_block)
        if node_frames is None:
            node_frames = ({}, {}) if is_block else ({},)
        self._node_frames = node_frames
        self._edge_frame = {} if edge_frame is None else edge_frame
        self.batch_num_nodes = batch_num_nodes
        self.batch_num_edges = batch_num_edges
        # Pallas gspmm block plan (see ops/pallas/spmm_kernel.py):
        # arrays ride the pytree; meta is static aux
        self.spmm_plan_arrays = spmm_plan_arrays
        self.spmm_plan_meta = spmm_plan_meta
        # hybrid dense-hub plan (dense C matmul for hub dst-windows +
        # sparse remainder plan) for unweighted copy_u aggregation
        self.spmm_hybrid_arrays = spmm_hybrid_arrays
        self.spmm_hybrid_meta = spmm_hybrid_meta
        # contiguous-block per-edge (sddmm) plan (ops/pallas/sddmm_kernel.py)
        self.sddmm_plan_arrays = sddmm_plan_arrays
        self.sddmm_plan_meta = sddmm_plan_meta

    # -- basic properties ---------------------------------------------------
    @property
    def num_src_nodes(self) -> int:
        return self._num_src

    @property
    def num_dst_nodes(self) -> int:
        return self._num_dst

    def number_of_nodes(self) -> int:
        if self.is_block:
            raise ValueError("block has distinct src/dst node sets; use "
                             "num_src_nodes/num_dst_nodes")
        return self._num_dst

    num_nodes = number_of_nodes

    def number_of_edges(self) -> int:
        return int(self.src.shape[0])

    num_edges = number_of_edges

    @property
    def num_edges_static(self) -> int:
        return int(self.src.shape[0])

    # -- frames -------------------------------------------------------------
    @property
    def srcdata(self) -> _FrameView:
        return _FrameView(self._node_frames[0])

    @property
    def dstdata(self) -> _FrameView:
        return _FrameView(self._node_frames[-1])

    @property
    def ndata(self) -> _FrameView:
        if self.is_block:
            raise ValueError("block graphs use srcdata/dstdata")
        return _FrameView(self._node_frames[0])

    @property
    def edata(self) -> _FrameView:
        """Edge features in user (insertion) order; stored internally in
        CSC order."""
        # stored internal; user_vals = internal_vals[user2int];
        # internal_vals = user_vals[int2user]
        return _FrameView(self._edge_frame, get_perm=self.user2int,
                          set_perm=self.int2user)

    @property
    def edata_internal(self) -> _FrameView:
        """Edge features in internal (CSC) order — what kernels consume."""
        return _FrameView(self._edge_frame)

    # -- structure queries --------------------------------------------------
    def edges(self, order: str = "eid") -> Tuple[Array, Array]:
        """(src, dst) arrays. order='eid' returns user insertion order
        (DGL parity); order='internal' returns dst-sorted order."""
        if order == "internal" or self.int2user is None:
            return self.src, self.dst
        if order == "eid":
            # user edge u lives at internal position user2int[u]
            return self.src[self.user2int], self.dst[self.user2int]
        raise ValueError(order)

    def in_degrees(self) -> Array:
        d = self.csc_indptr[1:] - self.csc_indptr[:-1]
        return d.astype(IdType)

    def out_degrees(self) -> Array:
        if self.csr_indptr is None:
            raise ValueError("graph was built without the CSR format")
        d = self.csr_indptr[1:] - self.csr_indptr[:-1]
        return d.astype(IdType)

    @property
    def dst_sorted(self) -> bool:
        return True  # internal order is always CSC

    # -- pytree protocol ----------------------------------------------------
    _OPT = ("csr_indptr", "csr_eids", "int2user", "user2int", "edge_mask")

    def tree_flatten(self):
        opt_present = tuple(getattr(self, n) is not None for n in self._OPT)
        leaves = [self.src, self.dst, self.csc_indptr]
        leaves += [getattr(self, n) for n, p in zip(self._OPT, opt_present) if p]
        frame_keys = tuple(tuple(sorted(f.keys())) for f in self._node_frames)
        for f, keys in zip(self._node_frames, frame_keys):
            leaves += [f[k] for k in keys]
        ekeys = tuple(sorted(self._edge_frame.keys()))
        leaves += [self._edge_frame[k] for k in ekeys]
        n_plan = 0 if self.spmm_plan_arrays is None \
            else len(self.spmm_plan_arrays)
        if n_plan:
            leaves += list(self.spmm_plan_arrays)
        n_hyb = 0 if self.spmm_hybrid_arrays is None \
            else len(self.spmm_hybrid_arrays)
        if n_hyb:
            leaves += list(self.spmm_hybrid_arrays)
        n_sd = 0 if self.sddmm_plan_arrays is None \
            else len(self.sddmm_plan_arrays)
        if n_sd:
            leaves += list(self.sddmm_plan_arrays)
        aux = (self._num_src, self._num_dst, self.is_block, opt_present,
               frame_keys, ekeys, self.batch_num_nodes, self.batch_num_edges,
               n_plan, self.spmm_plan_meta, n_hyb, self.spmm_hybrid_meta,
               n_sd, self.sddmm_plan_meta)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        (num_src, num_dst, is_block, opt_present, frame_keys, ekeys,
         bnn, bne, n_plan, plan_meta, n_hyb, hyb_meta, n_sd, sd_meta) = aux
        leaves = list(leaves)
        src, dst, csc_indptr = leaves[:3]
        i = 3
        opts = {}
        for n, p in zip(cls._OPT, opt_present):
            opts[n] = leaves[i] if p else None
            i += int(p)
        node_frames = []
        for keys in frame_keys:
            node_frames.append({k: leaves[i + j] for j, k in enumerate(keys)})
            i += len(keys)
        edge_frame = {k: leaves[i + j] for j, k in enumerate(ekeys)}
        i += len(ekeys)
        plan_arrays = tuple(leaves[i:i + n_plan]) if n_plan else None
        i += n_plan
        hyb_arrays = tuple(leaves[i:i + n_hyb]) if n_hyb else None
        i += n_hyb
        sd_arrays = tuple(leaves[i:i + n_sd]) if n_sd else None
        return cls(num_src=num_src, num_dst=num_dst, src=src, dst=dst,
                   csc_indptr=csc_indptr, is_block=is_block,
                   node_frames=tuple(node_frames), edge_frame=edge_frame,
                   batch_num_nodes=bnn, batch_num_edges=bne,
                   spmm_plan_arrays=plan_arrays, spmm_plan_meta=plan_meta,
                   spmm_hybrid_arrays=hyb_arrays, spmm_hybrid_meta=hyb_meta,
                   sddmm_plan_arrays=sd_arrays, sddmm_plan_meta=sd_meta,
                   **opts)

    def replace(self, **kw) -> "Graph":
        fields = dict(num_src=self._num_src, num_dst=self._num_dst,
                      src=self.src, dst=self.dst, csc_indptr=self.csc_indptr,
                      csr_indptr=self.csr_indptr, csr_eids=self.csr_eids,
                      int2user=self.int2user, user2int=self.user2int,
                      edge_mask=self.edge_mask, is_block=self.is_block,
                      node_frames=self._node_frames,
                      edge_frame=self._edge_frame,
                      batch_num_nodes=self.batch_num_nodes,
                      batch_num_edges=self.batch_num_edges,
                      spmm_plan_arrays=self.spmm_plan_arrays,
                      spmm_plan_meta=self.spmm_plan_meta,
                      spmm_hybrid_arrays=self.spmm_hybrid_arrays,
                      spmm_hybrid_meta=self.spmm_hybrid_meta,
                      sddmm_plan_arrays=self.sddmm_plan_arrays,
                      sddmm_plan_meta=self.sddmm_plan_meta)
        fields.update(kw)
        return Graph(**fields)

    def structure_only(self) -> "Graph":
        """Copy without feature frames (cheap; arrays are shared)."""
        return self.replace(node_frames=None, edge_frame=None)

    def __repr__(self):
        kind = "Block" if self.is_block else "Graph"
        return (f"{kind}(num_src={self._num_src}, num_dst={self._num_dst}, "
                f"num_edges={self.src.shape[0]})")

    # -- host-side array cache ------------------------------------------
    def host(self, name: str) -> np.ndarray:
        """numpy view of a structure array WITHOUT a device->host
        transfer when the graph was built on host (the common case).

        Device transfers through a remote-TPU tunnel are very slow for
        big index arrays; every host-side consumer (samplers, planners,
        transforms) must come through here.
        """
        cache = getattr(self, "_np_cache", None)
        if cache is None:
            cache = {}
            object.__setattr__(self, "_np_cache", cache)
        if name not in cache:
            cache[name] = np.asarray(getattr(self, name))
        return cache[name]

    def host_edges(self) -> Tuple[np.ndarray, np.ndarray]:
        """(src, dst) in user order, host-side."""
        s, d = self.host("src"), self.host("dst")
        if self.int2user is None:
            return s, d
        u2i = self.host("user2int")
        return s[u2i], d[u2i]

    # Message passing methods are attached by core.message to avoid an
    # import cycle (see core/message.py).


# ---------------------------------------------------------------------------
# Builders (host-side, numpy)
# ---------------------------------------------------------------------------
def _build(src: np.ndarray, dst: np.ndarray, num_src: int, num_dst: int,
           *, is_block: bool, build_csr: bool = True,
           edge_mask: Optional[np.ndarray] = None,
           force_perm: bool = False, device: bool = True) -> Graph:
    # device=False keeps every structure array HOST-side (numpy pytree
    # leaves): sampler-produced minibatch blocks go to the device in ONE
    # batched device_put (prefetch.py) or at the jit boundary — the
    # eager per-array jnp.asarray here measured ~350 ms/batch of tunnel
    # latency in the sampled pipeline (round 5, bench_pipeline --profile)
    E = src.shape[0]
    # id-width ceiling: every index is int32 on-device (512 B gather rows
    # want narrow ids; see KERNELS.md).  The reference carries 32/64-bit
    # ids (python/dgl/heterograph_index.py:162-183 asbits/bits_needed);
    # here graphs beyond 2^31-1 nodes/edges must be partitioned first
    # (partition/partition.py), so fail loudly instead of overflowing.
    _I32_MAX = np.iinfo(np.int32).max
    if E > _I32_MAX or num_src > _I32_MAX or num_dst > _I32_MAX:
        raise ValueError(
            f"graph exceeds the int32 id ceiling (num_src={num_src}, "
            f"num_dst={num_dst}, num_edges={E} vs 2^31-1); partition the "
            "graph (dgl_hack_tpu.partition) before building device arrays")
    src = np.ascontiguousarray(src, dtype=np.int32)
    dst = np.ascontiguousarray(dst, dtype=np.int32)
    if E and (src.min(initial=0) < 0 or src.max(initial=-1) >= num_src):
        raise ValueError("src ids out of range")
    if E and (dst.min(initial=0) < 0 or dst.max(initial=-1) >= num_dst):
        raise ValueError("dst ids out of range")

    # canonical internal order: stable sort by dst (CSC order).
    # force_perm keeps identity permutations even when input is already
    # sorted, so padded minibatch blocks are structurally uniform (one
    # pytree shape -> one jit cache entry, stackable across devices).
    perm = np.argsort(dst, kind="stable").astype(np.int32)
    already_sorted = (not force_perm) and \
        bool(np.all(perm == np.arange(E, dtype=np.int32)))
    s_src, s_dst = src[perm], dst[perm]
    csc_indptr = np.zeros(num_dst + 1, dtype=np.int32)
    np.cumsum(np.bincount(s_dst, minlength=num_dst), out=csc_indptr[1:])

    conv = jnp.asarray if device else (lambda a: a)
    kw: Dict[str, Any] = {}
    if not already_sorted:
        inv = np.empty(E, dtype=np.int32)
        inv[perm] = np.arange(E, dtype=np.int32)
        kw["int2user"] = conv(perm)   # internal i -> user id perm[i]
        kw["user2int"] = conv(inv)    # user u -> internal position
    if build_csr:
        csr_perm = np.argsort(s_src, kind="stable").astype(np.int32)
        csr_indptr = np.zeros(num_src + 1, dtype=np.int32)
        np.cumsum(np.bincount(s_src, minlength=num_src), out=csr_indptr[1:])
        kw["csr_indptr"] = conv(csr_indptr)
        kw["csr_eids"] = conv(csr_perm)
    if edge_mask is not None:
        kw["edge_mask"] = conv(edge_mask[perm])

    np_arrays = {"src": s_src, "dst": s_dst, "csc_indptr": csc_indptr}
    if not already_sorted:
        np_arrays["int2user"] = perm
        np_arrays["user2int"] = inv
    if build_csr:
        np_arrays["csr_indptr"] = csr_indptr
        np_arrays["csr_eids"] = csr_perm
    g = Graph(num_src=num_src, num_dst=num_dst,
              src=conv(s_src), dst=conv(s_dst),
              csc_indptr=conv(csc_indptr), is_block=is_block, **kw)
    # host-side numpy cache: avoids device->host transfers in samplers,
    # planners and transforms (they are huge through a remote-TPU tunnel)
    object.__setattr__(g, "_np_cache", np_arrays)
    return g


def graph(edges: Tuple[Any, Any], num_nodes: Optional[int] = None,
          build_csr: bool = True, edge_mask: Optional[Any] = None) -> Graph:
    """Build a homogeneous graph from an edge list.

    TPU-native replacement of ``dgl.graph`` (reference:
    python/dgl/convert.py:24) — host-side numpy preprocessing, device
    arrays out.
    """
    src = np.asarray(edges[0])
    dst = np.asarray(edges[1])
    if num_nodes is None:
        num_nodes = int(max(src.max(initial=-1), dst.max(initial=-1)) + 1)
    if edge_mask is not None:
        edge_mask = np.asarray(edge_mask, dtype=bool)
    return _build(src, dst, num_nodes, num_nodes, is_block=False,
                  build_csr=build_csr, edge_mask=edge_mask)


def block(edges: Tuple[Any, Any], num_src: int, num_dst: int,
          build_csr: bool = True, edge_mask: Optional[Any] = None) -> Graph:
    """Build a bipartite message-flow block (sampling frontier), the
    TPU-native analogue of ``dgl.to_block``'s output
    (reference: src/graph/transform/to_bipartite.cc:31)."""
    src = np.asarray(edges[0])
    dst = np.asarray(edges[1])
    if edge_mask is not None:
        edge_mask = np.asarray(edge_mask, dtype=bool)
    return _build(src, dst, int(num_src), int(num_dst), is_block=True,
                  build_csr=build_csr, edge_mask=edge_mask)


def from_scipy(spmat, build_csr: bool = True) -> Graph:
    """Graph from a scipy sparse matrix (row=src, col=dst), mirroring
    ``dgl.graph`` on scipy input (reference: python/dgl/convert.py)."""
    coo = spmat.tocoo()
    n = max(coo.shape)
    return _build(coo.row.astype(np.int32), coo.col.astype(np.int32),
                  n, n, is_block=False, build_csr=build_csr)


def from_networkx(nx_graph, node_attrs: Optional[Sequence[str]] = None,
                  edge_attrs: Optional[Sequence[str]] = None,
                  build_csr: bool = True) -> Graph:
    """Graph from a networkx graph (reference: DGLGraph.from_networkx,
    python/dgl/graph.py / convert.py networkx input path).

    Nodes are relabelled to 0..N-1 in sorted node order; undirected
    networkx graphs produce both edge directions (matching the
    reference's behavior).  ``node_attrs``/``edge_attrs`` name per-node /
    per-edge attributes to copy into ``ndata``/``edata`` (stacked into
    arrays; edge attributes follow user edge order).
    """
    import networkx as nx
    nodes = sorted(nx_graph.nodes())
    relabel = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    directed = nx_graph.is_directed()
    us, vs = [], []
    edge_rows = []
    for u, v, data in nx_graph.edges(data=True):
        us.append(relabel[u]); vs.append(relabel[v])
        edge_rows.append(data)
        if not directed:
            us.append(relabel[v]); vs.append(relabel[u])
            edge_rows.append(data)
    src = np.asarray(us, dtype=np.int32)
    dst = np.asarray(vs, dtype=np.int32)
    g = _build(src, dst, n, n, is_block=False, build_csr=build_csr)
    if node_attrs:
        for key in node_attrs:
            g.ndata[key] = jnp.asarray(
                np.stack([np.asarray(nx_graph.nodes[nd][key])
                          for nd in nodes]))
    if edge_attrs:
        for key in edge_attrs:
            g.edata[key] = jnp.asarray(
                np.stack([np.asarray(row[key]) for row in edge_rows]))
    return g


def to_networkx(g: Graph, node_attrs: Optional[Sequence[str]] = None,
                edge_attrs: Optional[Sequence[str]] = None):
    """Convert to a networkx MultiDiGraph with edge ``id`` attributes
    (reference: DGLGraph.to_networkx, python/dgl/graph.py)."""
    import networkx as nx
    nxg = nx.MultiDiGraph()
    nxg.add_nodes_from(range(g.num_nodes()))
    src, dst = g.host_edges()
    eid = (g.host("int2user") if g.int2user is not None
           else np.arange(src.shape[0]))
    # emit in user edge order
    order = np.argsort(eid, kind="stable")
    nfeat = {k: np.asarray(g.ndata[k]) for k in (node_attrs or ())}
    efeat = {k: np.asarray(g.edata[k]) for k in (edge_attrs or ())}
    for i in order:
        attrs = {"id": int(eid[i])}
        for k, v in efeat.items():
            attrs[k] = v[int(eid[i])]
        nxg.add_edge(int(src[i]), int(dst[i]), **attrs)
    for k, v in nfeat.items():
        for nd in range(g.num_nodes()):
            nxg.nodes[nd][k] = v[nd]
    return nxg


def reverse(g: Graph) -> Graph:
    """Edge-reversed graph (reference: GraphOp::Reverse,
    src/graph/graph_op.cc; python/dgl/transform.py reverse)."""
    src, dst = np.asarray(g.dst), np.asarray(g.src)
    em = None if g.edge_mask is None else np.asarray(g.edge_mask)
    out = _build(src, dst, g.num_dst_nodes, g.num_src_nodes,
                 is_block=False if not g.is_block else True,
                 build_csr=True, edge_mask=em)
    return out


# ---------------------------------------------------------------------------
# structure queries (host-side; reference: DGLGraph query API, graph.py)
# ---------------------------------------------------------------------------
def _graph_queries():
    def in_edges(self, v):
        """(src, dst, eid) of in-edges of nodes v (reference:
        graph.py in_edges)."""
        indptr = np.asarray(self.csc_indptr)
        src = np.asarray(self.src)
        eid = (np.asarray(self.int2user) if self.int2user is not None
               else np.arange(src.shape[0], dtype=np.int32))
        v = np.atleast_1d(np.asarray(v, np.int64))
        pos = np.concatenate([np.arange(indptr[n], indptr[n + 1])
                              for n in v]) if len(v) else \
            np.zeros(0, np.int64)
        dsts = np.repeat(v, indptr[v + 1] - indptr[v])
        return src[pos], dsts.astype(np.int32), eid[pos]

    def out_edges(self, u):
        if self.csr_indptr is None:
            raise ValueError("graph was built without the CSR format")
        indptr = np.asarray(self.csr_indptr)
        eids_int = np.asarray(self.csr_eids)
        dst = np.asarray(self.dst)
        eid = (np.asarray(self.int2user) if self.int2user is not None
               else np.arange(dst.shape[0], dtype=np.int32))
        u = np.atleast_1d(np.asarray(u, np.int64))
        pos = np.concatenate([np.arange(indptr[n], indptr[n + 1])
                              for n in u]) if len(u) else \
            np.zeros(0, np.int64)
        e_int = eids_int[pos]
        srcs = np.repeat(u, indptr[u + 1] - indptr[u])
        return srcs.astype(np.int32), dst[e_int], eid[e_int]

    def predecessors(self, v):
        return np.unique(self.in_edges(v)[0])

    def successors(self, u):
        return np.unique(self.out_edges(u)[1])

    def _pair_index(self):
        """Cached sorted (src<<32|dst) key table for O(log E) pair queries
        (built once per graph; graphs are immutable)."""
        cache = getattr(self, "_pair_lut", None)
        if cache is None:
            s, d = self.host_edges()
            keys = s.astype(np.int64) << 32 | d.astype(np.int64)
            order = np.argsort(keys, kind="stable")
            cache = (keys[order], order.astype(np.int32))
            object.__setattr__(self, "_pair_lut", cache)
        return cache

    def has_edges_between(self, u, v):
        keys, _ = self._pair_index()
        u = np.atleast_1d(np.asarray(u, np.int64))
        v = np.atleast_1d(np.asarray(v, np.int64))
        q = u << 32 | v
        pos = np.searchsorted(keys, q)
        pos = np.minimum(pos, max(len(keys) - 1, 0))
        return (keys[pos] == q) if len(keys) else np.zeros(len(q), bool)

    def edge_ids(self, u, v):
        """First edge id between each (u, v) pair; -1 if absent."""
        keys, order = self._pair_index()
        u = np.atleast_1d(np.asarray(u, np.int64))
        v = np.atleast_1d(np.asarray(v, np.int64))
        q = u << 32 | v
        pos = np.searchsorted(keys, q)
        pos_c = np.minimum(pos, max(len(keys) - 1, 0))
        hit = (keys[pos_c] == q) if len(keys) else np.zeros(len(q), bool)
        out = np.where(hit, order[pos_c] if len(keys) else 0, -1)
        return out.astype(np.int32)

    def filter_nodes(self, predicate):
        """Node ids where predicate(NodeBatch) is True (reference:
        graph.py filter_nodes)."""
        from .message import NodeBatch
        keep = np.asarray(predicate(NodeBatch(dict(self._node_frames[-1]))))
        return np.nonzero(keep)[0].astype(np.int32)

    def filter_edges(self, predicate):
        from .message import EdgeBatch
        keep = np.asarray(predicate(EdgeBatch(self)))
        if self.user2int is not None:
            keep = keep[np.asarray(self.user2int)]
        return np.nonzero(keep)[0].astype(np.int32)

    Graph.in_edges = in_edges
    Graph.out_edges = out_edges
    Graph.predecessors = predecessors
    Graph.successors = successors
    Graph._pair_index = _pair_index
    Graph.has_edges_between = has_edges_between
    Graph.edge_ids = edge_ids
    Graph.filter_nodes = filter_nodes
    Graph.filter_edges = filter_edges


_graph_queries()


# ---------------------------------------------------------------------------
# DGL-API ergonomics (reference: python/dgl/graph.py method surface)
# ---------------------------------------------------------------------------
def _graph_api_extras():
    import contextlib

    def local_var(self):
        """A shallow graph copy whose frame MUTATIONS don't leak back
        (reference: DGLGraph.local_var, graph.py).  Structure arrays are
        shared; only the frame dicts are copied."""
        g = self.replace()
        g._node_frames = [dict(f) for f in self._node_frames]
        g._edge_frame = dict(self._edge_frame)
        return g

    @contextlib.contextmanager
    def local_scope(self):
        """Context manager: frame writes inside the block are discarded
        on exit (reference: DGLGraph.local_scope)."""
        saved_n = [dict(f) for f in self._node_frames]
        saved_e = dict(self._edge_frame)
        try:
            yield self
        finally:
            for f, s in zip(self._node_frames, saved_n):
                f.clear()
                f.update(s)
            self._edge_frame.clear()
            self._edge_frame.update(saved_e)

    def subgraph(self, nodes):
        from .transform import node_subgraph
        return node_subgraph(self, nodes)

    def edge_subgraph_m(self, eids, relabel_nodes=True):
        from .transform import edge_subgraph
        return edge_subgraph(self, eids, relabel_nodes)

    def in_degree(self, v) -> int:
        return int(np.asarray(self.host("csc_indptr"))[int(v) + 1]
                   - np.asarray(self.host("csc_indptr"))[int(v)])

    def out_degree(self, u) -> int:
        indptr = self.host("csr_indptr")
        return int(indptr[int(u) + 1] - indptr[int(u)])

    def has_node(self, v) -> bool:
        return 0 <= int(v) < self.num_nodes()

    def has_edge_between(self, u, v) -> bool:
        return bool(np.asarray(self.has_edges_between([u], [v]))[0])

    def adjacency_matrix(self, transpose: bool = False, scipy_fmt=None):
        """Adjacency as scipy sparse (A[dst, src] by default, matching
        the reference's 'in' orientation) or a dense jnp array."""
        import scipy.sparse as sp
        s, d = self.host_edges()
        n, m = self.num_src_nodes, self.num_dst_nodes
        a = sp.coo_matrix((np.ones(len(s), np.float32), (d, s)),
                          shape=(m, n))
        if transpose:
            a = a.T
        if scipy_fmt:
            return a.asformat(scipy_fmt)
        return jnp.asarray(a.toarray())

    def incidence_matrix(self, typestr: str = "both"):
        """Node-edge incidence ('in' | 'out' | 'both', reference:
        graph.py incidence_matrix), dense jnp array."""
        s, d = self.host_edges()
        E = len(s)
        m = np.zeros((self.num_nodes(), E), np.float32)
        if typestr in ("in", "both"):
            m[d, np.arange(E)] += 1.0
        if typestr in ("out", "both"):
            m[s, np.arange(E)] += -1.0 if typestr == "both" else 1.0
        if typestr == "both":
            # self-loops cancel to 0, matching the reference
            loop = s == d
            m[d[loop], np.nonzero(loop)[0]] = 0.0
        return jnp.asarray(m)

    def add_nodes_m(self, num: int):
        """Functional: returns a NEW graph (immutable design; the
        reference mutates in place)."""
        from .transform import add_nodes
        return add_nodes(self, num)

    def add_edges_m(self, u, v):
        from .transform import add_edges
        return add_edges(self, u, v)

    Graph.local_var = local_var
    Graph.local_scope = local_scope
    Graph.subgraph = subgraph
    Graph.edge_subgraph = edge_subgraph_m
    Graph.in_degree = in_degree
    Graph.out_degree = out_degree
    Graph.has_node = has_node
    Graph.has_edge_between = has_edge_between
    Graph.adjacency_matrix = adjacency_matrix
    Graph.incidence_matrix = incidence_matrix
    Graph.add_nodes = add_nodes_m
    Graph.add_edges = add_edges_m
    Graph.is_readonly = property(lambda self: True)


_graph_api_extras()
