"""Spatial (graph-partitioned) multi-chip message passing with halo
exchange over ICI — the TPU-native successor of the reference's
distributed stack, generalised past copy_u-sum to the FULL op surface.

Reference mapping:
* METIS partition + halo (src/graph/metis_partition.cc,
  python/dgl/transform.py:551)            -> partition/partition.py plans
* KVStore remote pull of boundary features (contrib/dis_kvstore.py:670,
  C++ FastPull src/graph/network.cc:705)  -> one `jax.lax.all_to_all`
  inside shard_map, compiled onto ICI
* "pull serves every model" (every layer trains through KVStore pulls)
  -> `local_graph()`: each device's partition is a real ``Graph`` over the
  extended [own || halo] index space, so every existing op — gspmm,
  gsddmm, edge_softmax, per-etype RGCN messages, nn layers — runs
  unchanged inside shard_map
* PyTorch DDP gradient allreduce          -> jax AD through shard_map
  emits the psum automatically

Design: each device owns one partition's dst nodes and their features
(row-sharded).  A host-built exchange plan lists, per (src part -> dst
part) pair, which owned rows must be shipped; devices gather their send
rows, all_to_all them, and concatenate [own || halo] into an extended
feature table.  Because edges were assigned to their dst's partition,
every dst-side reduction (segment reduce, edge softmax normalisation,
degree clamps) is exact locally.  Everything is static-shape (padded to
the max over parts) so the whole step jits once.

Comm/compute overlap: the plan splits each partition's edges into
local-src and remote-src sets (each dst-sorted).  The gspmm fast path
reduces local edges from the resident feature table while the all_to_all
is in flight — the two computations share no data dependence, so XLA's
latency-hiding scheduler overlaps them on TPU (the compiled analogue of
the reference's sampler prefetch overlap, contrib/sampling/
sampler.py:44-133).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.graph import Graph
from ..partition.partition import partition as make_parts

Array = jax.Array

# arrays stacked on axis 0 = part, shipped to devices by device_arrays()
_DEVICE_FIELDS = (
    # general local-graph layout (dst-sorted, padded to e_max)
    "src_ext", "dst_loc", "edge_mask", "csc_indptr",
    # overlap split layout (local-src then remote-src, each dst-sorted)
    "lsrc", "ldst", "lmask", "rsrc", "rdst", "rmask", "lcnt", "rcnt",
    # exchange plan + node bookkeeping
    "send_idx", "send_mask", "owned_ids", "owned_mask", "in_deg", "out_deg",
)


@dataclass
class SpatialPlan:
    """Host-built stacked per-part arrays (leading dim = num parts).

    n_owned_max / e_max / s_max are the padded per-part sizes; halo_max =
    num_parts * s_max is the receive-buffer size (recv row of node owned
    by part q at send slot j lives at n_owned_max + q*s_max + j in the
    extended index space).
    """
    num_parts: int
    n_owned_max: int          # owned rows per device (padded)
    halo_max: int             # recv halo rows per device (P * s_max)
    s_max: int                # send rows per (part, peer) pair (padded)
    e_max: int                # edges per device (padded, general layout)
    el_max: int               # local-src edges per device (padded)
    er_max: int               # remote-src edges per device (padded)
    # general local-graph arrays:
    src_ext: np.ndarray       # (P, e_max) src index into [own || halo]
    dst_loc: np.ndarray       # (P, e_max) local dst row
    edge_mask: np.ndarray     # (P, e_max) bool
    csc_indptr: np.ndarray    # (P, n_owned_max+1)
    edge_uid: np.ndarray      # (P, e_max) original USER edge id (-1 pad)
    # overlap split arrays:
    lsrc: np.ndarray          # (P, el_max) OWN-row index
    ldst: np.ndarray          # (P, el_max)
    lmask: np.ndarray         # (P, el_max) bool
    luid: np.ndarray          # (P, el_max) user edge id (-1 pad)
    rsrc: np.ndarray          # (P, er_max) index into the HALO buffer
    rdst: np.ndarray          # (P, er_max)
    rmask: np.ndarray         # (P, er_max) bool
    ruid: np.ndarray          # (P, er_max) user edge id (-1 pad)
    lcnt: np.ndarray          # (P, n_owned_max) true local-src in-degree
    rcnt: np.ndarray          # (P, n_owned_max) true remote-src in-degree
    # exchange plan + node bookkeeping:
    send_idx: np.ndarray      # (P, P, s_max) rows of OWN x to send to peer q
    send_mask: np.ndarray     # (P, P, s_max) bool
    owned_ids: np.ndarray     # (P, n_owned_max) original node id (pad 0)
    owned_mask: np.ndarray    # (P, n_owned_max) bool
    in_deg: np.ndarray        # (P, n_owned_max) true in-degree
    out_deg: np.ndarray       # (P, n_owned_max) true GLOBAL out-degree

    def device_arrays(self) -> Dict[str, Array]:
        return {k: jnp.asarray(getattr(self, k)) for k in _DEVICE_FIELDS}

    @property
    def num_src_ext(self) -> int:
        return self.n_owned_max + self.halo_max

    def stats(self) -> Dict[str, float]:
        """Padding / communication accounting for the scaling harness."""
        E = int(self.edge_mask.sum())
        sent = int(self.send_mask.sum())
        return {
            "num_parts": self.num_parts,
            "edges_real": E,
            "edges_padded": self.num_parts * self.e_max,
            "edge_pad_factor": self.num_parts * self.e_max / max(E, 1),
            "halo_rows_real": sent,
            "halo_rows_padded": self.num_parts ** 2 * self.s_max,
            "halo_pad_factor": (self.num_parts ** 2 * self.s_max)
            / max(sent, 1),
            "cut_fraction": int(self.rmask.sum()) / max(E, 1),
        }


def build_spatial_plan(g: Graph, num_parts: int, method: str = "fennel",
                       seed: int = 0,
                       parts: Optional[np.ndarray] = None) -> SpatialPlan:
    """Partition g and derive the static exchange + local-graph plan."""
    s, d = g.host_edges()
    n = g.num_nodes()
    if parts is None:
        parts = make_parts(g, num_parts, method=method, seed=seed)
    P_ = num_parts

    owned = [np.nonzero(parts == p)[0] for p in range(P_)]
    n_owned_max = max(1, max(len(o) for o in owned))
    local_of = np.zeros(n, np.int64)
    for p in range(P_):
        local_of[owned[p]] = np.arange(len(owned[p]))

    # per-pair sends: rows of part q needed by part p (halo of p owned by q)
    send_rows = [[None] * P_ for _ in range(P_)]   # [q][p] -> local rows of q
    for p in range(P_):
        esel = parts[d] == p
        ext_src = s[esel]
        remote = ext_src[parts[ext_src] != p]
        halo_nodes = np.unique(remote)
        for q in range(P_):
            qs = halo_nodes[parts[halo_nodes] == q]
            send_rows[q][p] = local_of[qs]
    s_max = max(1, max(len(send_rows[q][p]) for q in range(P_)
                       for p in range(P_)))

    # per-part edge sets + local/remote split sizes
    part_edges = [np.nonzero(parts[d] == p)[0] for p in range(P_)]
    is_local = [parts[s[e]] == p for p, e in enumerate(part_edges)]
    e_max = max(1, max(len(e) for e in part_edges))
    el_max = max(1, max(int(m.sum()) for m in is_local))
    er_max = max(1, max(int((~m).sum()) for m in is_local))
    halo_max = P_ * s_max

    z_i = lambda *sh: np.zeros(sh, np.int32)
    z_b = lambda *sh: np.zeros(sh, bool)
    src_ext, dst_loc = z_i(P_, e_max), z_i(P_, e_max)
    edge_mask = z_b(P_, e_max)
    csc_indptr = z_i(P_, n_owned_max + 1)
    edge_uid = np.full((P_, e_max), -1, np.int32)
    lsrc, ldst = z_i(P_, el_max), z_i(P_, el_max)
    lmask = z_b(P_, el_max)
    luid = np.full((P_, el_max), -1, np.int32)
    rsrc, rdst = z_i(P_, er_max), z_i(P_, er_max)
    rmask = z_b(P_, er_max)
    ruid = np.full((P_, er_max), -1, np.int32)
    lcnt, rcnt = z_i(P_, n_owned_max), z_i(P_, n_owned_max)
    send_idx = z_i(P_, P_, s_max)
    send_mask = z_b(P_, P_, s_max)
    owned_ids = z_i(P_, n_owned_max)
    owned_mask = z_b(P_, n_owned_max)
    in_deg, out_deg = z_i(P_, n_owned_max), z_i(P_, n_owned_max)
    global_out_deg = np.bincount(s, minlength=n)

    for q in range(P_):
        for p in range(P_):
            r = send_rows[q][p]
            send_idx[q, p, :len(r)] = r
            send_mask[q, p, :len(r)] = True

    for p in range(P_):
        o = owned[p]
        owned_ids[p, :len(o)] = o
        owned_mask[p, :len(o)] = True
        out_deg[p, :len(o)] = global_out_deg[o]
        # extended index: own rows [0, n_owned_max), halo rows at
        # n_owned_max + q*s_max + send-slot (recv buffer layout)
        ext_index = np.full(n, -1, np.int64)
        ext_index[o] = np.arange(len(o))
        for q in range(P_):
            r = send_rows[q][p]          # rows of q sent to p
            if len(r):
                orig = owned[q][r]
                ext_index[orig] = n_owned_max + q * s_max + np.arange(len(r))
        esel = part_edges[p]
        loc = is_local[p]
        # stable dst sort of ALL of p's edges (general layout)
        order = np.argsort(local_of[d[esel]], kind="stable")
        esel_s = esel[order]
        ne = len(esel_s)
        src_ext[p, :ne] = ext_index[s[esel_s]]
        dst_loc[p, :ne] = local_of[d[esel_s]]
        # pad edges sit at the end with dst = last row (keeps dst-sorted)
        if ne < e_max:
            dst_loc[p, ne:] = max(n_owned_max - 1, 0)
        edge_mask[p, :ne] = True
        edge_uid[p, :ne] = esel_s
        np.cumsum(np.bincount(dst_loc[p], minlength=n_owned_max),
                  out=csc_indptr[p, 1:])
        deg = np.bincount(local_of[d[esel_s]], minlength=n_owned_max)
        in_deg[p] = deg[:n_owned_max]
        # overlap split layout: local / remote, each dst-sorted
        e_loc = esel[loc]
        e_loc = e_loc[np.argsort(local_of[d[e_loc]], kind="stable")]
        k = len(e_loc)
        lsrc[p, :k] = ext_index[s[e_loc]]           # < n_owned_max
        ldst[p, :k] = local_of[d[e_loc]]
        if k < el_max:
            ldst[p, k:] = max(n_owned_max - 1, 0)
        lmask[p, :k] = True
        luid[p, :k] = e_loc
        lcnt[p] = np.bincount(local_of[d[e_loc]],
                              minlength=n_owned_max)[:n_owned_max]
        e_rem = esel[~loc]
        e_rem = e_rem[np.argsort(local_of[d[e_rem]], kind="stable")]
        k = len(e_rem)
        rsrc[p, :k] = ext_index[s[e_rem]] - n_owned_max  # halo-buffer index
        rdst[p, :k] = local_of[d[e_rem]]
        if k < er_max:
            rdst[p, k:] = max(n_owned_max - 1, 0)
        rmask[p, :k] = True
        ruid[p, :k] = e_rem
        rcnt[p] = np.bincount(local_of[d[e_rem]],
                              minlength=n_owned_max)[:n_owned_max]

    return SpatialPlan(P_, n_owned_max, halo_max, s_max, e_max, el_max,
                       er_max, src_ext, dst_loc, edge_mask, csc_indptr,
                       edge_uid, lsrc, ldst, lmask, luid, rsrc, rdst, rmask,
                       ruid, lcnt, rcnt, send_idx, send_mask, owned_ids,
                       owned_mask, in_deg, out_deg)


# ---------------------------------------------------------------------------
# host-side shuffles
# ---------------------------------------------------------------------------
def shard_features(plan: SpatialPlan, x: np.ndarray) -> np.ndarray:
    """(N, ...) global features -> (P, n_owned_max, ...) stacked shards."""
    out = np.zeros((plan.num_parts, plan.n_owned_max) + x.shape[1:],
                   x.dtype)
    for p in range(plan.num_parts):
        m = plan.owned_mask[p]
        out[p, m] = x[plan.owned_ids[p, m]]
    return out


def unshard_rows(plan: SpatialPlan, xs: np.ndarray, n: int) -> np.ndarray:
    """(P, n_owned_max, ...) -> (N, ...) global order."""
    out = np.zeros((n,) + xs.shape[2:], xs.dtype)
    for p in range(plan.num_parts):
        m = plan.owned_mask[p]
        out[plan.owned_ids[p, m]] = xs[p, m]
    return out


def shard_edata(plan: SpatialPlan, w: np.ndarray, fill=0,
                layout: str = "graph") -> np.ndarray:
    """Per-edge USER-order array -> stacked plan-order array.

    layout='graph' -> (P, e_max) matching the local graph's edge order;
    layout='split' -> ((P, el_max), (P, er_max)) for the overlap gspmm.
    """
    w = np.asarray(w)

    def take(uid):
        out = np.full(uid.shape + w.shape[1:], fill, w.dtype)
        m = uid >= 0
        out[m] = w[uid[m]]
        return out

    if layout == "graph":
        return take(plan.edge_uid)
    if layout == "split":
        return take(plan.luid), take(plan.ruid)
    raise ValueError(layout)


# ---------------------------------------------------------------------------
# device-side building blocks (called INSIDE shard_map; leading part dim
# already dropped)
# ---------------------------------------------------------------------------
def halo_exchange(x: Array, send_idx: Array, send_mask: Array,
                  axis: str = "node") -> Array:
    """Gather send rows, all_to_all over ICI, return the (halo_max, ...)
    receive buffer.  AD transposes the all_to_all automatically (the
    backward halo push the reference would do with KVStore push)."""
    sends = x[send_idx] * send_mask.reshape(
        send_mask.shape + (1,) * (x.ndim - 1)).astype(x.dtype)
    halo = jax.lax.all_to_all(sends, axis, 0, 0, tiled=False)
    return halo.reshape((-1,) + x.shape[1:])


def extend(x: Array, halo: Array) -> Array:
    """[own || halo] extended feature table for the local graph."""
    return jnp.concatenate([x, halo], axis=0)


def local_graph(plan: SpatialPlan, dev1: Dict[str, Array]) -> Graph:
    """This device's partition as a real ``Graph`` over the extended
    [own || halo] index space — every library op works on it."""
    return Graph(num_src=plan.num_src_ext, num_dst=plan.n_owned_max,
                 src=dev1["src_ext"], dst=dev1["dst_loc"],
                 csc_indptr=dev1["csc_indptr"],
                 edge_mask=dev1["edge_mask"], is_block=True)


# ---------------------------------------------------------------------------
# general wrapper: run ANY per-partition function under shard_map
# ---------------------------------------------------------------------------
def make_spatial_apply(plan: SpatialPlan, mesh: Mesh, fn: Callable,
                       axis: str = "node", n_extra: int = 0,
                       extra_specs: Optional[Tuple] = None):
    """Wrap ``fn(params, g_local, exchange, x, *extras)`` into
    ``apply(params, x_stacked, dev, *extras_stacked)`` under shard_map.

    * ``g_local`` is this device's partition Graph (extended src space);
    * ``exchange(h)`` returns the (halo_max, ...) halo rows of any
      (n_owned_max, ...) owned-row array — call it once per layer and
      ``extend(h, exchange(h))`` to build the layer's src table;
    * extras are stacked (P, ...) arrays (etypes, masks, labels...),
      delivered with the leading dim dropped;
    * params are replicated; jax AD through the wrapper yields psum'd
      gradients (DDP equivalence).
    """
    def local_fn(params, x, dev, *extras):
        x = x[0]
        dev1 = {k: v[0] for k, v in dev.items()}
        extras = tuple(e[0] for e in extras)
        g = local_graph(plan, dev1)

        def exchange(h):
            return halo_exchange(h, dev1["send_idx"], dev1["send_mask"],
                                 axis)

        out = fn(params, g, exchange, x, *extras)
        return jax.tree.map(lambda o: o[None], out)

    if extra_specs is None:
        extra_specs = (P(axis),) * n_extra
    return jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(axis), P(axis)) + tuple(extra_specs),
        out_specs=P(axis))


# ---------------------------------------------------------------------------
# overlap-split gspmm fast path
# ---------------------------------------------------------------------------
def make_halo_gspmm(plan: SpatialPlan, mesh: Mesh, axis: str = "node",
                    reduce_op: str = "sum", weighted: bool = False,
                    overlap: bool = True):
    """Returns f(x_shard, dev[, w_local, w_remote]) -> out_shard: a
    shard_map'ed halo-exchange aggregation (copy_u or u_mul_e ×
    sum/mean/max/min).

    With ``overlap=True`` local-src edges reduce from the resident rows
    while the all_to_all is in flight (no data dependence -> XLA's
    latency-hiding scheduler overlaps them); remote-src edges reduce from
    the landed halo buffer and the partials combine exactly.  ``weighted``
    adds per-edge weights in SPLIT plan order (see ``shard_edata``).
    """
    from ..ops import segment as seg
    if reduce_op not in ("sum", "mean", "max", "min"):
        raise ValueError(f"unsupported reducer {reduce_op!r}")

    def _wmul(msg, w):
        if w is None:
            return msg
        return msg * w.reshape(w.shape + (1,) * (msg.ndim - w.ndim))

    def local_fn(x, dev, w_l, w_r):
        x = x[0]
        d = {k: v[0] for k, v in dev.items()}
        w_l = None if w_l is None else w_l[0]
        w_r = None if w_r is None else w_r[0]
        n = plan.n_owned_max
        base = "sum" if reduce_op == "mean" else reduce_op

        if not overlap:
            halo = halo_exchange(x, d["send_idx"], d["send_mask"], axis)
            x_ext = extend(x, halo)
            msg = _wmul(x_ext[d["src_ext"]],
                        None if w_l is None else
                        jnp.concatenate([w_l, w_r], 0))
            out = seg.segment_reduce(base, msg, d["dst_loc"], n,
                                     indices_are_sorted=True,
                                     mask=d["edge_mask"])
        else:
            # issue the collective FIRST; the local reduce below shares no
            # data with it, so the scheduler overlaps the two.
            halo = halo_exchange(x, d["send_idx"], d["send_mask"], axis)
            out_l = seg.segment_reduce(
                base, _wmul(x[d["lsrc"]], w_l), d["ldst"], n,
                indices_are_sorted=True, mask=d["lmask"])
            out_r = seg.segment_reduce(
                base, _wmul(halo[d["rsrc"]], w_r), d["rdst"], n,
                indices_are_sorted=True, mask=d["rmask"])
            if base == "sum":
                out = out_l + out_r
            else:
                # max/min: identity-fill empty sides before combining
                # (segment_* zero-fills empty segments, and 0 would win
                # over all-negative maxima)
                lc = d["lcnt"].reshape((n,) + (1,) * (out_l.ndim - 1)) > 0
                rc = d["rcnt"].reshape((n,) + (1,) * (out_r.ndim - 1)) > 0
                comb = jnp.maximum if base == "max" else jnp.minimum
                out = jnp.where(
                    lc & rc, comb(out_l, out_r),
                    jnp.where(lc, out_l, jnp.where(rc, out_r,
                                                   jnp.zeros_like(out_l))))
        if reduce_op == "mean":
            deg = jnp.maximum(d["in_deg"], 1).astype(out.dtype)
            out = out / deg.reshape((plan.n_owned_max,)
                                    + (1,) * (out.ndim - 1))
        return out[None]

    mapped = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis) if weighted else None,
                  P(axis) if weighted else None),
        out_specs=P(axis))

    if weighted:
        def apply(x_stacked, dev, w_l, w_r):
            return mapped(x_stacked, dev, w_l, w_r)
    else:
        def apply(x_stacked, dev):
            return mapped(x_stacked, dev, None, None)
    return apply


# ---------------------------------------------------------------------------
# distributed models
# ---------------------------------------------------------------------------
def make_spatial_gcn(plan: SpatialPlan, mesh: Mesh, hidden: int,
                     out_feats: int, axis: str = "node"):
    """Distributed 2-layer GCN over a spatial partition.

    forward(params, x_stacked, dev) -> logits (P, n_owned_max, out);
    per-layer halo all_to_all overlapped with the local-edge reduce; the
    dense matmuls run on the row-sharded activations (weights
    replicated); gradient psum falls out of jax AD.

    This is the functional successor of the reference's per-partition
    trainers + KVStore feature pulls (apps/kg/kvclient.py, contrib/
    graph_store.py) as one compiled program.
    """
    halo = make_halo_gspmm(plan, mesh, axis=axis, reduce_op="sum",
                           overlap=True)

    def init(key, in_feats):
        k1, k2 = jax.random.split(key)
        s1 = (6.0 / (in_feats + hidden)) ** 0.5
        s2 = (6.0 / (hidden + out_feats)) ** 0.5
        return {
            "W1": jax.random.uniform(k1, (in_feats, hidden), jnp.float32,
                                     -s1, s1),
            "b1": jnp.zeros((hidden,), jnp.float32),
            "W2": jax.random.uniform(k2, (hidden, out_feats), jnp.float32,
                                     -s2, s2),
            "b2": jnp.zeros((out_feats,), jnp.float32),
        }

    def layer(x, dev, W, b):
        # GraphConv norm='both' (reference: graphconv.py:130-170):
        # D_out^-1/2 -> aggregate -> D_in^-1/2, matmul order by dims
        dout = jnp.maximum(dev["out_deg"].astype(x.dtype), 1.0)
        din = jnp.maximum(dev["in_deg"].astype(x.dtype), 1.0)
        h = x * jax.lax.rsqrt(dout)[..., None]
        if h.shape[-1] > W.shape[1]:
            h = h @ W
            h = halo(h, dev)
        else:
            h = halo(h, dev)
            h = h @ W
        return h * jax.lax.rsqrt(din)[..., None] + b

    def forward(params, x, dev):
        h = jax.nn.relu(layer(x, dev, params["W1"], params["b1"]))
        return layer(h, dev, params["W2"], params["b2"])

    return init, forward


def _init_dev1(plan: SpatialPlan) -> Dict[str, np.ndarray]:
    """Part-0 slice of the plan arrays, for shape-faithful flax init."""
    return {k: jnp.asarray(getattr(plan, k)[0]) for k in _DEVICE_FIELDS}


def make_spatial_gat(plan: SpatialPlan, mesh: Mesh, hidden: int,
                     out_feats: int, heads: Tuple[int, int] = (4, 1),
                     negative_slope: float = 0.2, axis: str = "node"):
    """Distributed 2-layer GAT: per-layer halo exchange of the raw
    activations, then the standard GATConv (dense proj + u_add_v logits +
    LOCAL edge_softmax + u_mul_e gspmm) on each device's partition graph.

    dst-sharding makes edge_softmax exact locally: every in-edge of an
    owned dst lives in its partition, so the per-dst normaliser needs no
    collective (the distributed counterpart of the reference's
    FusedGATConv training through KVStore pulls).
    """
    from ..nn import GATConv
    l1 = GATConv(out_feats=hidden, num_heads=heads[0],
                 negative_slope=negative_slope)
    l2 = GATConv(out_feats=out_feats, num_heads=heads[1],
                 negative_slope=negative_slope)

    def fn(params, g, exchange, x):
        h = l1.apply(params["l1"], g, (extend(x, exchange(x)), x))
        h = jax.nn.elu(h).reshape(x.shape[0], -1)
        h = l2.apply(params["l2"], g, (extend(h, exchange(h)), h))
        return h.mean(axis=1)                     # head-mean output layer

    apply = make_spatial_apply(plan, mesh, fn, axis)

    def init(key, in_feats):
        g0 = local_graph(plan, _init_dev1(plan))
        k1, k2 = jax.random.split(key)
        xe = jnp.zeros((plan.num_src_ext, in_feats), jnp.float32)
        x0 = jnp.zeros((plan.n_owned_max, in_feats), jnp.float32)
        he = jnp.zeros((plan.num_src_ext, hidden * heads[0]), jnp.float32)
        h0 = jnp.zeros((plan.n_owned_max, hidden * heads[0]), jnp.float32)
        return {"l1": l1.init(k1, g0, (xe, x0)),
                "l2": l2.init(k2, g0, (he, h0))}

    return init, apply


def make_spatial_rgcn(plan: SpatialPlan, mesh: Mesh, hidden: int,
                      out_feats: int, num_rels: int,
                      num_bases: Optional[int] = None, axis: str = "node"):
    """Distributed 2-layer R-GCN: per-edge relation types ride the plan
    (``shard_edata(plan, etypes)``), messages use the basis-projection
    MXU layout on the extended feature table, reductions are dst-local.

    forward(params, x_stacked, dev, etypes_stacked) ->
    (P, n_owned_max, out).  Reference: distributed RGCN through KVStore
    (contrib/dis_kvstore.py) / rgcn entity_classify.
    """
    from ..nn import RelGraphConv
    l1 = RelGraphConv(out_feats=hidden, num_rels=num_rels,
                      num_bases=num_bases)
    l2 = RelGraphConv(out_feats=out_feats, num_rels=num_rels,
                      num_bases=num_bases)

    def fn(params, g, exchange, x, etypes):
        h = l1.apply(params["l1"], g, extend(x, exchange(x)), etypes)
        h = jax.nn.relu(h)
        h = l2.apply(params["l2"], g, extend(h, exchange(h)), etypes)
        return h

    apply = make_spatial_apply(plan, mesh, fn, axis, n_extra=1)

    def init(key, in_feats):
        g0 = local_graph(plan, _init_dev1(plan))
        k1, k2 = jax.random.split(key)
        et0 = jnp.zeros((plan.e_max,), jnp.int32)
        xe = jnp.zeros((plan.num_src_ext, in_feats), jnp.float32)
        he = jnp.zeros((plan.num_src_ext, hidden), jnp.float32)
        return {"l1": l1.init(k1, g0, xe, et0),
                "l2": l2.init(k2, g0, he, et0)}

    return init, apply


def spatial_train_step(forward, tx, n_extra: int = 0):
    """Masked-CE train step over stacked shards; labels/masks stacked
    (P, n_owned_max).  ``n_extra`` stacked extras (e.g. etypes) are
    threaded through to forward."""
    import optax

    @jax.jit
    def step(params, opt_state, x, dev, labels, mask, *extras):
        def loss_fn(p):
            logits = forward(p, x, dev, *extras)
            logp = jax.nn.log_softmax(logits)
            nll = -jnp.take_along_axis(
                logp, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
            m = mask.astype(logits.dtype)
            return (nll * m).sum() / jnp.maximum(m.sum(), 1.0)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step
