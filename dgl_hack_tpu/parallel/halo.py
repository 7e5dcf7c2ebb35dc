"""Spatial (graph-partitioned) multi-chip message passing with halo
exchange over ICI — the TPU-native successor of the reference's
distributed stack.

Reference mapping:
* METIS partition + halo (src/graph/metis_partition.cc,
  python/dgl/transform.py:551)            -> partition/partition.py plans
* KVStore remote pull of boundary features (contrib/dis_kvstore.py:670,
  C++ FastPull src/graph/network.cc:705)  -> one `jax.lax.all_to_all`
  inside shard_map, compiled onto ICI
* PyTorch DDP gradient allreduce          -> jax AD through shard_map
  emits the psum automatically

Design: each device owns one partition's dst nodes and their features
(row-sharded).  A host-built exchange plan lists, per (src part -> dst
part) pair, which owned rows must be shipped; devices gather their send
rows, all_to_all them, concatenate [own || halo] into an extended feature
table, and run the *local* gspmm on edges whose src ids were pre-mapped
into that extended table.  Everything is static-shape (padded to the max
over parts) so the whole step jits once.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.graph import Graph
from ..partition.partition import partition as make_parts

Array = jax.Array


@dataclass
class SpatialPlan:
    """Host-built stacked per-part arrays (leading dim = num parts).

    n_owned_max / e_max / s_max are the padded per-part sizes.
    """
    num_parts: int
    n_owned_max: int          # owned rows per device (padded)
    halo_max: int             # recv halo rows per device (padded, total)
    s_max: int                # send rows per (part, peer) pair (padded)
    # device-resident arrays, all stacked on axis 0 = part:
    src_ext: np.ndarray       # (P, E_max) src index into [own || halo]
    dst_loc: np.ndarray       # (P, E_max) local dst row
    edge_mask: np.ndarray     # (P, E_max) bool
    send_idx: np.ndarray      # (P, P, s_max) rows of OWN x to send to peer q
    send_mask: np.ndarray     # (P, P, s_max) bool
    owned_ids: np.ndarray     # (P, n_owned_max) original node id (pad 0)
    owned_mask: np.ndarray    # (P, n_owned_max) bool
    in_deg: np.ndarray        # (P, n_owned_max) true in-degree
    out_deg: np.ndarray       # (P, n_owned_max) true out-degree

    def device_arrays(self):
        return {k: jnp.asarray(getattr(self, k)) for k in
                ("src_ext", "dst_loc", "edge_mask", "send_idx", "send_mask",
                 "owned_ids", "owned_mask", "in_deg", "out_deg")}


def build_spatial_plan(g: Graph, num_parts: int, method: str = "fennel",
                       seed: int = 0,
                       parts: Optional[np.ndarray] = None) -> SpatialPlan:
    """Partition g and derive the static exchange plan."""
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
    halo_of_p = []
    for p in range(P_):
        esel = parts[d] == p
        ext_src = s[esel]
        remote = ext_src[parts[ext_src] != p]
        halo_nodes = np.unique(remote)
        halo_of_p.append(halo_nodes)
        for q in range(P_):
            qs = halo_nodes[parts[halo_nodes] == q]
            send_rows[q][p] = local_of[qs]
    s_max = max(1, max(len(send_rows[q][p]) for q in range(P_)
                       for p in range(P_)))

    e_max = max(1, int(np.bincount(parts[d], minlength=P_).max()))
    halo_max = max(1, max(len(h) for h in halo_of_p))
    # recv layout on device p: halo rows arrive ordered by (q, send pos)
    src_ext = np.zeros((P_, e_max), np.int32)
    dst_loc = np.zeros((P_, e_max), np.int32)
    edge_mask = np.zeros((P_, e_max), bool)
    send_idx = np.zeros((P_, P_, s_max), np.int32)
    send_mask = np.zeros((P_, P_, s_max), bool)
    owned_ids = np.zeros((P_, n_owned_max), np.int32)
    owned_mask = np.zeros((P_, n_owned_max), bool)
    in_deg = np.zeros((P_, n_owned_max), np.int32)
    out_deg = np.zeros((P_, n_owned_max), np.int32)
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
        # extended index: own rows [0, n_owned_max), halo rows packed at
        # n_owned_max + P*s_max slots (recv buffer layout, masked)
        ext_index = np.full(n, -1, np.int64)
        ext_index[o] = np.arange(len(o))
        for q in range(P_):
            r = send_rows[q][p]          # rows of q sent to p
            if len(r):
                orig = owned[q][r]
                ext_index[orig] = n_owned_max + q * s_max + np.arange(len(r))
        esel = np.nonzero(parts[d] == p)[0]
        # sort by local dst so segment ops see sorted ids
        order = np.argsort(local_of[d[esel]], kind="stable")
        esel = esel[order]
        src_ext[p, :len(esel)] = ext_index[s[esel]]
        dst_loc[p, :len(esel)] = local_of[d[esel]]
        edge_mask[p, :len(esel)] = True
        deg = np.bincount(local_of[d[esel]], minlength=n_owned_max)
        in_deg[p] = deg[:n_owned_max]

    return SpatialPlan(P_, n_owned_max, P_ * s_max, s_max, src_ext, dst_loc,
                       edge_mask, send_idx, send_mask, owned_ids, owned_mask,
                       in_deg, out_deg)


def shard_features(plan: SpatialPlan, x: np.ndarray) -> np.ndarray:
    """(N, F) global features -> (P, n_owned_max, F) stacked shards."""
    out = np.zeros((plan.num_parts, plan.n_owned_max) + x.shape[1:],
                   x.dtype)
    for p in range(plan.num_parts):
        m = plan.owned_mask[p]
        out[p, m] = x[plan.owned_ids[p, m]]
    return out


def unshard_rows(plan: SpatialPlan, xs: np.ndarray, n: int) -> np.ndarray:
    """(P, n_owned_max, F) -> (N, F) global order."""
    out = np.zeros((n,) + xs.shape[2:], xs.dtype)
    for p in range(plan.num_parts):
        m = plan.owned_mask[p]
        out[plan.owned_ids[p, m]] = xs[p, m]
    return out


def make_halo_gspmm(plan: SpatialPlan, mesh: Mesh, axis: str = "node",
                    reduce_op: str = "sum"):
    """Returns f(x_shard, plan_dev, *edge_w) -> out_shard, a shard_map'ed
    halo-exchange aggregation.

    Inside: gather send rows -> all_to_all over ICI -> local masked
    segment reduce.  jax AD through this function transposes the
    all_to_all automatically — the backward halo exchange the reference
    would have done with KVStore push.
    """
    from ..ops import segment as seg

    def local_fn(x, src_ext, dst_loc, edge_mask, send_idx, send_mask,
                 in_deg):
        # leading dim 1 (this device's slice); drop it
        x = x[0]
        src_ext, dst_loc = src_ext[0], dst_loc[0]
        edge_mask, in_deg = edge_mask[0], in_deg[0]
        send_idx, send_mask = send_idx[0], send_mask[0]

        sends = x[send_idx] * send_mask[..., None].astype(x.dtype)
        # (P, s_max, F): row q goes to device q
        halo = jax.lax.all_to_all(sends, axis, 0, 0, tiled=False)
        halo = halo.reshape(-1, x.shape[-1])          # (P*s_max, F)
        x_ext = jnp.concatenate([x, halo], axis=0)
        msg = x_ext[src_ext]
        out = seg.segment_reduce(reduce_op, msg, dst_loc,
                                 plan.n_owned_max,
                                 indices_are_sorted=True, mask=edge_mask)
        return out[None]

    mapped = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis)),
        out_specs=P(axis))

    def apply(x_stacked, dev):
        return mapped(x_stacked, dev["src_ext"], dev["dst_loc"],
                      dev["edge_mask"], dev["send_idx"], dev["send_mask"],
                      dev["in_deg"])

    return apply


# ---------------------------------------------------------------------------
# spatial multi-layer GCN: the full distributed training path
# ---------------------------------------------------------------------------
def make_spatial_gcn(plan: SpatialPlan, mesh: Mesh, hidden: int,
                     out_feats: int, axis: str = "node"):
    """Distributed 2-layer GCN over a spatial partition.

    forward(params, x_stacked, dev) -> logits (P, n_owned_max, out);
    the halo all_to_all runs per layer inside shard_map; the dense matmuls
    run on the row-sharded activations (GSPMD inserts nothing — weights
    replicated); gradient psum falls out of jax AD.

    This is the functional successor of the reference's per-partition
    trainers + KVStore feature pulls (apps/kg/kvclient.py, contrib/
    graph_store.py) as one compiled program.
    """
    halo = make_halo_gspmm(plan, mesh, axis=axis)

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


def spatial_train_step(forward, tx):
    """Masked-CE train step over stacked shards; labels/masks stacked
    (P, n_owned_max)."""
    import optax

    @jax.jit
    def step(params, opt_state, x, dev, labels, mask):
        def loss_fn(p):
            logits = forward(p, x, dev)
            logp = jax.nn.log_softmax(logits)
            nll = -jnp.take_along_axis(
                logp, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
            m = mask.astype(logits.dtype)
            return (nll * m).sum() / jnp.maximum(m.sum(), 1.0)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step
