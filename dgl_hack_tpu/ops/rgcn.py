"""Relational (per-etype) aggregation — the TPU formulation of the
fork's fused R-GCN kernels.

Reference: ``RgcnLayer0/1KernelImpl`` run fused message+reduce over an
etype-sorted CSR (``GetCsrSortedByEdgeType``,
/root/reference/src/kernel/cuda/binary_reduce_impl.cu:914 ff., exposed at
backend/pytorch/tensor.py:461,493).  A CUDA thread block gathers
``W[etype] @ x[src]`` per edge; the TPU analogue must avoid the per-edge
WIDE gather (B*out lanes through ``z[src]``) because gather cost scales
with lane count (KERNELS.md width law).

Two-level design (this module):

1. relabel edges to (dst, etype) PAIRS: pair ids are dense, sorted by
   (dst, etype) — a stable refinement of the internal CSC order;
2. first level: ``agg[m] = sum_{e in pair m} norm_e * x[src_e]`` — a
   plain (weighted) copy_u-sum onto M pair rows.  This is a *relabeled
   Graph*, so it rides the ENTIRE existing machinery: Pallas block
   plans, src bucketing, dense-hub windows (prepare_spmm);
3. project per pair on the MXU: ``msg[m] = (comp[etype_m] . (agg[m] @
   V_b))`` (basis) — M rows, not E;
4. second level: ``out[v] = sum_{pairs of v} msg[m]`` — pair rows are
   dst-sorted by construction, one segment-sum.

Per edge this costs ONE narrow (in-dim) gather; the reference's design
(and our previous projection-first layout) gathers B*out lanes per edge.
Per-edge ``norm`` folds into the first-level reduce as an edge weight, so
arbitrary norms (DGL's 1/c_{v,r}) stay exact.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class RgcnPlan(NamedTuple):
    """Host-built relabeling for the two-level relational aggregation.

    pair_graph:  Graph src -> pair-id (num_dst = M), dst-sorted; carries
                 Pallas spmm plans when ``prepare=True``
    pair_dst:    (M,) int32 destination node of each pair (non-decreasing)
    pair_etype:  (M,) int32 relation of each pair
    edge_perm:   (E_real,) int32 pair-graph edge position -> ORIGINAL
                 internal edge id (for permuting per-edge norms)
    num_pairs:   M (static)
    """
    pair_graph: object
    pair_dst: Array
    pair_etype: Array
    edge_perm: Array
    num_pairs: int


def prepare_rgcn(g, etypes, num_rels: int, prepare: bool = True,
                 **prepare_kwargs) -> RgcnPlan:
    """Build the (dst, etype)-pair relabeling (host-side, one-time).

    ``etypes`` is per-edge in USER (eid) order, like the reference's
    RelGraphConv; masked (padded) edges are excluded so the plan is
    mask-aware.  ``prepare_kwargs`` forward to prepare_spmm for the
    first-level plan (te, bucket_rows, dense thresholds...)."""
    from ..core.graph import Graph

    et = np.asarray(etypes, np.int64)
    if g.int2user is not None:
        et = et[g.host("int2user")]          # internal (CSC) edge order
    src = g.host("src").astype(np.int64)
    dst = g.host("dst").astype(np.int64)
    E = src.shape[0]
    R = int(num_rels)
    if g.edge_mask is not None:
        keep = g.host("edge_mask").astype(bool)
    else:
        keep = np.ones(E, bool)
    eids = np.nonzero(keep)[0]
    key = dst[eids] * R + et[eids]
    # internal order is dst-sorted; refine to (dst, etype) with a stable
    # sort on etype only (cheaper than a full key sort, same result)
    order = eids[np.argsort(key, kind="stable")]
    key_sorted = dst[order] * R + et[order]
    uk, inv = np.unique(key_sorted, return_inverse=True)
    M = len(uk)
    pair_dst = (uk // R).astype(np.int32)
    pair_etype = (uk % R).astype(np.int32)

    # relabeled graph: edges (src -> pair), already pair-sorted
    pg = Graph(num_src=g.num_src_nodes, num_dst=max(M, 1),
               src=jnp.asarray(src[order].astype(np.int32)),
               dst=jnp.asarray(inv.astype(np.int32)),
               csc_indptr=jnp.asarray(_indptr(inv, max(M, 1))),
               is_block=True)
    if prepare and M:
        # plan perms live in PAIR-GRAPH edge space (all real edges);
        # per-edge norms permute through ``edge_perm`` once per call
        from .pallas.spmm_kernel import (
            FLAT_MAX_BYTES, MSG_CHUNK_BYTES, PlanInfo,
            build_gspmm_plan_edges)
        kw = dict(prepare_kwargs)
        tr = kw.pop("tr", 128)
        te = kw.pop("te", 64)
        bucket_rows = kw.pop("bucket_rows", "auto")
        flat = kw.pop("flat", "auto")
        flat_width = kw.pop("flat_width", 128)
        if bucket_rows == "auto":
            B = max(8, min((64 << 20) // (max(flat_width, 1) * 4),
                       196_608) // 8 * 8)  # row-count law cap
            bucket_rows = B if g.num_src_nodes > 2 * B else None
        # width-aware chunk/budget sizing, same as prepare_spmm (the
        # default bc=512 would scan hundreds of chunks at 16M edges)
        bc = max(8, (MSG_CHUNK_BYTES // (te * max(flat_width, 1) * 4))
                 // 8 * 8)
        fms = max(te, FLAT_MAX_BYTES // (max(flat_width, 1) * 4))
        # REV bucketing follows the ROW-COUNT gather law (round 5,
        # bench_rgcn_bwd_tpu + the microbench sweep): the engine gathers
        # at 2.05 ns/row from tables of <=~192k ROWS and ~10 ns/row past
        # ~256k rows REGARDLESS of byte size (192k x 128 lanes = 94 MB
        # still fast; 384k x 16 lanes = 23 MB already slow) — a
        # refinement of round 3's byte-denominated operand-size law.
        # The reverse gathers the (M, in) pair table, so when M sits in
        # (256k, 2*192k] a TWO-bucket rev plan wins (measured 21.5 vs
        # 23.0 unbucketed vs 28.5 at the old byte-law 131k buckets:
        # finer buckets lose to cell fragmentation).  Larger M is
        # unmeasured -> unbucketed.
        bucket_rows_rev = kw.pop("bucket_rows_rev", "auto")
        if bucket_rows_rev == "auto":
            bucket_rows_rev = ((-(-M // 2) // 8) * 8 + 8
                               if 262_144 < M <= 2 * 196_608 else None)
        plan = build_gspmm_plan_edges(
            src[order], inv.astype(np.int64), g.num_src_nodes, M,
            tr=tr, te=te, bc=bc, wc=max(1, -(-M // tr)), flat=flat,
            flat_max_slots=fms, bucket_rows=bucket_rows,
            bucket_rows_rev=bucket_rows_rev)
        info = PlanInfo(masked=False, flat_width=flat_width,
                        bucket_rows=plan.fwd.gather_rows or 0)
        pg = pg.replace(
            spmm_plan_arrays=(plan.fwd.device_arrays()
                              + plan.rev.device_arrays()),
            spmm_plan_meta=plan.static_meta + (info,))
    return RgcnPlan(pg, jnp.asarray(pair_dst), jnp.asarray(pair_etype),
                    jnp.asarray(order.astype(np.int32)), M)


def _indptr(sorted_ids: np.ndarray, n: int) -> np.ndarray:
    out = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(sorted_ids, minlength=n), out=out[1:])
    return out.astype(np.int32)


def rgcn_aggregate_pairs(plan: RgcnPlan, x: Array,
                         norm: Optional[Array] = None) -> Array:
    """First level: (M, in) per-(dst,etype) sums of (normed) src rows.

    ``norm`` is per-edge in INTERNAL order of the ORIGINAL graph, length
    E; it permutes into pair-graph order through ``plan.edge_perm`` (one
    scalar gather — the same cost class as the weight gather any
    formulation pays) and multiplies the gathered rows in VMEM."""
    from .spmm import gspmm
    if norm is None:
        return gspmm(plan.pair_graph, "copy_lhs", "sum", x)
    if norm.ndim > 1:
        norm = norm.reshape(norm.shape[0])
    norm_pg = norm[plan.edge_perm]
    return gspmm(plan.pair_graph, "mul", "sum", x, norm_pg, "u", "e")


def rgcn_basis_message(plan: RgcnPlan, agg: Array, weight: Array,
                       w_comp: Optional[Array]) -> Array:
    """(M, in) pair sums -> (M, out) relation-projected messages on the
    MXU.  weight (B, in, out); w_comp (R, B) or None (B == R)."""
    if w_comp is not None:
        zb = jnp.einsum("mi,bio->mbo", agg, weight)      # (M, B, out)
        coef = w_comp[plan.pair_etype]                   # (M, B)
        return jnp.einsum("mb,mbo->mo", coef, zb)
    wsel = weight[plan.pair_etype]                       # (M, in, out)
    return jnp.einsum("mi,mio->mo", agg, wsel)


def rgcn_reduce_pairs(plan: RgcnPlan, msg: Array, num_dst: int) -> Array:
    """Second level: pair messages -> dst rows (pairs are dst-sorted)."""
    from . import segment
    return segment.segment_reduce("sum", msg, plan.pair_dst, num_dst,
                                  indices_are_sorted=True)
