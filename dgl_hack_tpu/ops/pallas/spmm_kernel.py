"""Pallas TPU kernel: gSpMM with sorted-segment reduction on the MXU.

TPU-native replacement for the reference's minigun scatter kernels
(reference: src/kernel/cpu/binary_reduce_impl.h:29-52 hot loop; CUDA
atomics in src/kernel/cuda/atomic.cuh).  XLA's native scatter-add on TPU
processes one (1, F) row per step and dominates gspmm runtime; this path
removes the scatter from forward AND backward:

* Edges are dst-sorted (the Graph's internal CSC order).  A host-side
  planner packs them into fixed blocks of TE edges, each block confined to
  one TR-row output window (hub windows get several consecutive blocks;
  empty windows get none — a per-chunk coverage mask keeps their rows at
  the initial zeros).
* Kernel: per block, build the (TR, TE) one-hot selection matrix
  S[r, e] = [local_row[e] == r] on the fly in VMEM and accumulate the
  window tile as an MXU matmul S @ m_block.  Consecutive blocks of one
  window accumulate into the same live output tile (Pallas keeps an
  output block resident while its index_map target is unchanged).
  Padded slots carry local_row == TR — they match no row and vanish.
* f32 accuracy on the MXU comes from a manual 2-term bf16 split of the
  messages (S is exactly representable): two DEFAULT-precision passes give
  ~2^-16 relative error at 1/3 the cost of Precision.HIGHEST's 6 passes.
* Blocks are grouped into **uniform** chunks driven by one ``lax.scan``:
  a single Mosaic compilation, one gather shape, chunk buffers bounded.
  Chunk results are overlap-added into the output at dynamic row offsets
  (handles hub windows split across chunks).
* Exactly ONE hardware gather per edge: the planner precomposes
  ``src[perm]`` on the host (an int32 index gather costs the same ~7 ns/row
  as a 512 B feature-row gather — the gather engine is issue-rate-bound,
  so every avoided indirection is a full gather saved).
* **Coupled VJP**: dx runs the same kernel over the reverse (src-sorted)
  plan with dout as the node operand; dw is a pure-gather SDDMM — no
  scatter anywhere in the autodiff graph.  This mirrors the reference's
  explicit forward/backward kernel pairs
  (reference: src/kernel/binary_reduce.cc:452,551 BackwardLhs/Rhs).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

DEFAULT_TR = 128      # output rows per window (MXU-aligned)
DEFAULT_TE = 1024     # edges per block (1-D int32 XLA tile = 1024)
DEFAULT_BC = 512      # blocks per chunk  (gathered chunk = BC*TE rows)
DEFAULT_WC = 512      # windows per chunk cap
# flat (single-kernel, scan-free) plans materialise ONE (slots x F)
# gathered message buffer in HBM; cap it so wide-feature ops don't OOM
# (budget is checked again at dispatch time against the actual width)
FLAT_MAX_BYTES = 2 << 30
# slot cap at the default assumed feature width (128 f32 words = 512 B)
FLAT_MAX_SLOTS = FLAT_MAX_BYTES // (128 * 4)


class SegmentPlan(NamedTuple):
    """Host-built uniform blocking plan for one direction.

    gather_idx (C, BC*TE) int32  precomposed node index per slot (pad 0);
                                 BUCKET-LOCAL (idx - grow0[c]) when
                                 gather_rows > 0
    perm       (C, BC*TE) int32  slot -> edge id (sentinel E; for weights)
    local_row  (C, BC, TE) int32 row - window*TR (sentinel TR)
    window     (C, BC)    int32  chunk-rebased window per block, non-decr.
    row0       (C,)       int32  output row offset (w0 * TR) per chunk
    cover      (C, WC)    bool   window has blocks in this chunk
    grow0      (C,)       int32  gather-table row offset per chunk (src
                                 bucketing: chunk c gathers from
                                 x[grow0[c] : grow0[c]+gather_rows])

    gather_rows > 0 marks a SRC-BUCKETED plan: each chunk's sources fall
    in one ``gather_rows``-row bucket and the driver gathers from a
    dynamic_slice of x.  Measured v5e (tools/microbench_bucket.py): the
    gather engine runs 2.07-2.11 ns/row from a <=64 MB slice of a 512 MB
    table (slice start data-dependent) vs 4.68 from the full table — XLA
    gathers at the OPERAND's physical extent, so shrinking the slice is
    a free 2.2x on every gather-bound plan.
    """
    gather_idx: np.ndarray
    perm: np.ndarray
    local_row: np.ndarray
    window: np.ndarray
    row0: np.ndarray
    cover: np.ndarray
    num_rows: int
    tr: int
    te: int
    wc: int
    flat: bool = False
    grow0: Optional[np.ndarray] = None
    gather_rows: int = 0
    # FLAT-bucketed layout (gather_rows > 0 AND flat): kernel-side arrays
    # (local_row / window) are WINDOW-major so the output is written once
    # with no accumulator, while the gathered message buffer stays
    # BUCKET-major (so each bucket's slots are one contiguous gather from
    # one <=64 MB table slice).  ``ordm`` maps window-major grid position
    # -> bucket-major m-block index — an index_map permutation, free at
    # run time.  ``slot_offsets`` (static) give each bucket's slot range.
    ordm: Optional[np.ndarray] = None
    slot_offsets: Optional[Tuple[int, ...]] = None

    @property
    def num_chunks(self) -> int:
        return self.perm.shape[0]

    def device_arrays(self) -> Tuple[Array, ...]:
        g0 = self.grow0 if self.grow0 is not None \
            else np.zeros(self.perm.shape[0], np.int32)
        om = self.ordm if self.ordm is not None \
            else np.zeros((self.perm.shape[0], self.window.shape[1]
                           if self.window.ndim > 1 else 1), np.int32)
        return (jnp.asarray(self.gather_idx), jnp.asarray(self.perm),
                jnp.asarray(self.local_row), jnp.asarray(self.window),
                jnp.asarray(self.row0), jnp.asarray(self.cover),
                jnp.asarray(g0), jnp.asarray(om))

    @property
    def static_meta(self):
        return (self.num_rows, self.tr, self.te, self.wc, self.num_chunks,
                self.flat, self.gather_rows, self.slot_offsets)


N_PLAN_ARRAYS = 8


class PlanInfo(NamedTuple):
    """Static plan provenance appended to ``spmm_plan_meta`` /
    ``spmm_hybrid_meta`` as a third element (hashable — it rides the
    Graph pytree aux and jit static args).

    masked:      plans were built over the REAL edges of a graph that
                 carries an ``edge_mask`` (padded slots never enter the
                 plan; the dispatch layer multiplies edge weights by the
                 mask so AD masks dw automatically).
    flat_width:  the f32-word operand width buckets/budgets were sized at
                 during prepare_spmm — dispatch warns when an op runs at
                 a wider width over src-bucketed plans (the bucket slices
                 then exceed the 64 MB fast-gather regime: silent ~2.2x
                 gather slowdown, KERNELS.md round 3).
    bucket_rows: rows per src bucket (0 = unbucketed).
    rev_inv:     a 17th plan array (edge id -> flat rev-plan slot, with
                 the sentinel one past the last slot) follows the 16
                 direction arrays.  The fused GAT backward uses it to
                 bring per-SLOT kernel outputs into edge order with one
                 GATHER — an XLA row scatter costs ~20 ns/row on TPU
                 (measured round 5), the gather ~4.7.
    der_gidx:    an 18th plan array (fwd-plan slot -> flat rev-plan
                 slot = rev_inv composed through the fwd perm): the GAT
                 backward's der segment-sum becomes a plan reduce
                 DIRECTLY over the rev pass's slot buffer — no edge-
                 order materialisation at all when attention weights
                 are absent (pad slots carry spread indices; their
                 values never enter the one-hot reduce).
    """
    masked: bool = False
    flat_width: int = 128
    bucket_rows: int = 0
    rev_inv: bool = False
    der_gidx: bool = False


def plan_info(plan_meta) -> PlanInfo:
    """PlanInfo of a (fwd_meta, rev_meta[, info]) tuple (default if absent
    — plans built by pre-round-4 callers)."""
    if plan_meta is not None and len(plan_meta) > 2 \
            and isinstance(plan_meta[2], PlanInfo):
        return plan_meta[2]
    return PlanInfo()


def rev_inv_array(rev_perm: np.ndarray, e_full: int) -> np.ndarray:
    """(e_full,) int32: edge id -> flat slot position in the reverse
    plan (chunk-major); edges absent from the plan (masked padding) get
    the sentinel ``rev_perm.size`` — callers append one zero row to the
    flat slot buffer so sentinel gathers read exact zeros."""
    pf = np.asarray(rev_perm).reshape(-1)
    inv = np.full(e_full, pf.size, np.int32)
    valid = pf < e_full
    inv[pf[valid]] = np.nonzero(valid)[0].astype(np.int32)
    return inv


def der_gidx_array(fwd_perm: np.ndarray, rev_inv: np.ndarray,
                   e_full: int, slots_total: int) -> np.ndarray:
    """fwd-plan gather indices into the REV pass's flat slot buffer
    (``slots_total`` slots + one appended zero row): der_gidx =
    rev_inv o fwd_perm, same shape as ``fwd_perm``.  Real edges point
    at their rev slot; pad slots get SPREAD indices (their gathered
    values never enter the reduce — lr sentinel — and same-address pad
    gathers would serialize the engine, KERNELS.md)."""
    p = np.asarray(fwd_perm)
    flat = p.reshape(-1).astype(np.int64)
    ok = flat < e_full
    spread = (np.arange(flat.size, dtype=np.int64)
              * np.int64(2654435761)) % max(slots_total + 1, 1)
    out = np.where(ok, rev_inv[np.minimum(flat, max(e_full - 1, 0))],
                   spread)
    return out.reshape(p.shape).astype(np.int32)


def flat_plans_fit(plan_meta, plan_arrays, width_words: int) -> bool:
    """Dispatch-time guard: False iff either direction's plan is FLAT and
    its (slots x width) message buffer would exceed FLAT_MAX_BYTES — the
    caller then falls back to the composed XLA path instead of OOMing.
    Prepare with ``flat_width`` matching the widest operand (or
    ``flat=False``) to keep the Pallas path for wide features."""
    for meta, off in ((plan_meta[0], 0), (plan_meta[1], N_PLAN_ARRAYS)):
        if len(meta) > 5 and meta[5] and meta[4] > 0:
            bc = plan_arrays[off + 3].shape[1]
            if bc * meta[2] * width_words * 4 > FLAT_MAX_BYTES:
                return False
    return True


def _build_bucketed_plan(row_sorted: np.ndarray, end_ids: np.ndarray,
                         num_rows: int, gather_n: int, tr: int, te: int,
                         bucket_rows: int,
                         flat_max_slots: int = FLAT_MAX_SLOTS
                         ) -> SegmentPlan:
    """Src-bucketed chunked plan: chunk c's sources all fall in ONE
    ``bucket_rows``-row range of the gather table, so the driver gathers
    from a dynamic_slice — the gather engine runs ~2.2x faster from a
    <=64 MB operand (KERNELS.md round-3 bucket study).  Edges are
    bucket-major, dst-window-sorted within each bucket; windows are
    ABSOLUTE and chunks accumulate via the aliased-accumulator kernel.
    Cost: blocks fragment at (bucket x window) granularity — profitable
    when mean edges per non-empty cell >> te/2."""
    E = row_sorted.shape[0]
    B = bucket_rows
    K = max(1, -(-gather_n // B))
    row0s = np.minimum(np.arange(K, dtype=np.int64) * B,
                       max(gather_n - B, 0))
    ends64 = end_ids.astype(np.int64)
    bkt = np.minimum(ends64 // B, K - 1)
    # clamped last bucket: rows in [gather_n - B, gather_n) are covered
    order = np.argsort(bkt, kind="stable")     # rows stay sorted in-bucket
    rows_o = row_sorted[order].astype(np.int64)
    ends_o = ends64[order]
    bkt_o = bkt[order]
    bb = np.searchsorted(bkt_o, np.arange(K + 1))

    blk_win, blk_start, blk_cnt, blk_bkt = [], [], [], []
    for k in range(K):
        lo, hi = int(bb[k]), int(bb[k + 1])
        if hi == lo:
            continue
        w = rows_o[lo:hi] // tr
        uw, idx0, cnt = np.unique(w, return_index=True, return_counts=True)
        nb = -(-cnt // te)
        bw = np.repeat(uw, nb)
        in_w = (np.arange(int(nb.sum()), dtype=np.int64)
                - np.repeat(np.cumsum(nb) - nb, nb))
        blk_win.append(bw)
        blk_start.append(lo + np.repeat(idx0, nb) + in_w * te)
        blk_cnt.append(np.minimum(te, np.repeat(cnt, nb) - in_w * te))
        blk_bkt.append(np.full(len(bw), k, np.int64))
    if not blk_win:
        z = np.zeros((0, te), np.int32)
        return SegmentPlan(z, z, np.zeros((0, 1, te), np.int32),
                           np.zeros((0, 1), np.int32),
                           np.zeros(0, np.int32), np.zeros((0, 1), bool),
                           num_rows, tr, te, 1, False,
                           np.zeros(0, np.int32), B)
    blk_win = np.concatenate(blk_win)
    blk_start = np.concatenate(blk_start)
    blk_cnt = np.concatenate(blk_cnt)
    blk_bkt = np.concatenate(blk_bkt)
    n_blocks = len(blk_win)

    # profitability: bucketing fragments blocks at (bucket x window)
    # granularity; the 2.2x gather-rate win only pays while the slot
    # blow-up stays under ~1.7x the unbucketed plan's.  None -> caller
    # falls through to the unbucketed builder.
    uw_all, cnt_all = np.unique(rows_o // tr, return_counts=True)
    n_blocks_unb = int((-(-cnt_all // te)).sum())
    if n_blocks > 1.7 * max(n_blocks_unb, 1):
        return None

    # per-slot tables for every block at once
    offs = blk_start[:, None] + np.arange(te, dtype=np.int64)[None, :]
    slot_ok = np.arange(te, dtype=np.int64)[None, :] < blk_cnt[:, None]
    offs_c = np.minimum(offs, E - 1)
    perm_all = np.where(slot_ok, order[offs_c], E).astype(np.int32)
    spread = (offs * np.int64(2654435761)) % B
    gidx_all = np.where(slot_ok, ends_o[offs_c] - row0s[blk_bkt][:, None],
                        spread).astype(np.int32)
    lr_all = np.where(slot_ok, rows_o[offs_c] - blk_win[:, None] * tr,
                      tr).astype(np.int32)

    W = max(1, -(-num_rows // tr))
    if n_blocks * te <= flat_max_slots:
        # FLAT-bucketed: one kernel pass, no accumulator.  The m buffer
        # keeps bucket-major block order (contiguous per-bucket gathers
        # from static table slices); the kernel grid walks blocks in
        # WINDOW-major order via the ordm index_map permutation, so each
        # output window is written exactly once (vs K accumulator
        # round-trips in the chunked layout — measured ~10 ms of pure
        # acc traffic at K=8, N=1M, F=128).
        worder = np.argsort(blk_win, kind="stable").astype(np.int32)
        window_k = blk_win[worder].astype(np.int32)
        lr_k = lr_all[worder]
        cover = np.zeros((1, W), bool)
        cover[0, np.unique(blk_win)] = True
        # per-bucket slot ranges (static): (slot_start, table_row0) pairs
        ub, ub0, ubc = np.unique(blk_bkt, return_index=True,
                                 return_counts=True)
        offsets = []
        for c in range(len(ub)):
            offsets.append((int(ub0[c]) * te, int(row0s[ub[c]])))
        offsets.append((n_blocks * te, -1))
        return SegmentPlan(
            gidx_all.reshape(1, -1), perm_all.reshape(1, -1),
            lr_k[None], window_k[None], np.zeros(1, np.int32), cover,
            num_rows, tr, te, W, True,
            np.zeros(1, np.int32), B, worder[None], tuple(offsets))

    # chunk = bucket (only non-empty ones), padded to uniform bc
    ub, ub0, ubc = np.unique(blk_bkt, return_index=True, return_counts=True)
    C = len(ub)
    bc = max(8, -(-int(ubc.max()) // 8) * 8)
    gather_idx = np.zeros((C, bc * te), np.int32)
    perm = np.full((C, bc * te), E, dtype=np.int32)
    local_row = np.full((C, bc, te), tr, dtype=np.int32)
    window = np.zeros((C, bc), dtype=np.int32)
    row0 = np.zeros(C, dtype=np.int32)          # windows are absolute
    cover = np.zeros((C, 1), bool)
    grow0 = row0s[ub].astype(np.int32)
    for c in range(C):
        b0, b1 = int(ub0[c]), int(ub0[c]) + int(ubc[c])
        nb_ = b1 - b0
        window[c, :nb_] = blk_win[b0:b1]
        window[c, nb_:] = int(blk_win[b1 - 1])   # pad blocks: last window
        gather_idx[c, :nb_ * te] = gidx_all[b0:b1].reshape(-1)
        perm[c, :nb_ * te] = perm_all[b0:b1].reshape(-1)
        local_row[c, :nb_] = lr_all[b0:b1]
    W = max(1, -(-num_rows // tr))
    return SegmentPlan(gather_idx, perm, local_row, window, row0, cover,
                       num_rows, tr, te, W, False, grow0, B)


def build_segment_plan(indptr: np.ndarray, row_sorted: np.ndarray,
                       end_ids: np.ndarray, num_rows: int,
                       tr: int = DEFAULT_TR, te: int = DEFAULT_TE,
                       bc: int = DEFAULT_BC, wc: int = DEFAULT_WC,
                       gather_n: Optional[int] = None,
                       flat="auto",
                       flat_max_slots: int = FLAT_MAX_SLOTS,
                       bucket_rows: Optional[int] = None) -> SegmentPlan:
    """Pack row-sorted edges into uniform (window, block, chunk) tiles.

    end_ids: (E,) the *other* endpoint per edge in this direction's sorted
    order — precomposed into gather_idx.

    gather_n: size of the table gather_idx indexes (defaults to
    max(end_ids)+1).  Padding slots get indices SPREAD over [0, gather_n)
    — pointing them all at row 0 serializes the gather engine on one
    address (measured 3x slowdown at 35% padding).

    flat=True emits ONE chunk covering every block with ABSOLUTE window
    ids and row0=0 — the driver then runs a single kernel with no
    overlap-add scan (only valid when the (slots x F) message buffer
    fits memory).  flat="auto" picks flat iff total padded slots stay
    within flat_max_slots (measured: the scan's per-chunk dynamic-slice
    glue costs about as much as the gather itself).
    """
    indptr = np.asarray(indptr)
    row_sorted = np.asarray(row_sorted)
    end_ids = np.asarray(end_ids)
    E = row_sorted.shape[0]
    if gather_n is None:
        gather_n = int(end_ids.max()) + 1 if E else 1
    if bucket_rows is not None and gather_n > bucket_rows and E:
        bp = _build_bucketed_plan(row_sorted, end_ids, num_rows,
                                  gather_n, tr, te, bucket_rows,
                                  flat_max_slots=(flat_max_slots
                                                  if flat else 0))
        if bp is not None:       # None: cell fragmentation unprofitable
            return bp
    W = max(1, -(-num_rows // tr))
    win_starts = indptr[np.minimum(np.arange(W) * tr, num_rows)].astype(np.int64)
    win_ends = indptr[np.minimum((np.arange(W) + 1) * tr, num_rows)].astype(np.int64)
    counts = win_ends - win_starts
    blocks_per_win = -(-counts // te)       # 0 for empty windows

    n_blocks = int(blocks_per_win.sum())
    assert bc % 8 == 0, "blocks-per-chunk must be a multiple of 8"
    if flat == "auto":
        flat = -(-n_blocks // 8) * 8 * te <= flat_max_slots
    if n_blocks == 0:
        z = np.zeros((0, bc * te), np.int32)
        return SegmentPlan(z, z, np.zeros((0, bc, te), np.int32),
                           np.zeros((0, bc), np.int32),
                           np.zeros(0, np.int32), np.zeros((0, wc), bool),
                           num_rows, tr, te, wc, False)

    blk_win = np.repeat(np.arange(W, dtype=np.int64), blocks_per_win)
    in_win_idx = (np.arange(n_blocks, dtype=np.int64)
                  - np.repeat(np.cumsum(blocks_per_win) - blocks_per_win,
                              blocks_per_win))
    blk_start = win_starts[blk_win] + in_win_idx * te
    blk_count = np.minimum(te, counts[blk_win] - in_win_idx * te
                           ).astype(np.int64)

    # per-slot edge positions for every block at once: (n_blocks, te)
    offs = blk_start[:, None] + np.arange(te, dtype=np.int64)[None, :]
    slot_ok = np.arange(te, dtype=np.int64)[None, :] < blk_count[:, None]
    offs_c = np.minimum(offs, E - 1)
    perm_all = np.where(slot_ok, offs, E).astype(np.int32)
    # padding slots gather SPREAD rows, not row 0 (same-address gathers
    # serialize); the gathered values never contribute (sentinel lr)
    spread = (offs * np.int64(2654435761)) % gather_n
    gidx_all = np.where(slot_ok, end_ids[offs_c], spread).astype(np.int32)
    lr_all = np.where(slot_ok,
                      row_sorted[offs_c].astype(np.int64)
                      - blk_win[:, None] * tr,
                      tr).astype(np.int32)

    if flat:
        bc = -(-n_blocks // 8) * 8
        wc = W
        bounds = [0, n_blocks]
    else:
        # chunk boundaries: <= bc blocks AND <= wc window span per chunk
        bounds = [0]
        b0 = 0
        while b0 < n_blocks:
            b1 = min(b0 + bc, n_blocks)
            if blk_win[b1 - 1] - blk_win[b0] + 1 > wc:
                b1 = int(np.searchsorted(blk_win[b0:b1], blk_win[b0] + wc,
                                         side="left") + b0)
            bounds.append(b1)
            b0 = b1
    C = len(bounds) - 1

    gather_idx = np.zeros((C, bc * te), np.int32)
    perm = np.full((C, bc * te), E, dtype=np.int32)
    local_row = np.full((C, bc, te), tr, dtype=np.int32)
    window = np.zeros((C, bc), dtype=np.int32)
    row0 = np.zeros(C, dtype=np.int32)
    cover = np.zeros((C, wc), bool)
    for c in range(C):
        b0, b1 = bounds[c], bounds[c + 1]
        w0 = 0 if flat else int(blk_win[b0])  # flat: absolute windows
        row0[c] = w0 * tr
        wrel = (blk_win[b0:b1] - w0).astype(np.int32)
        window[c, :b1 - b0] = wrel
        # padding blocks at the tail map to the chunk's last window: they
        # contribute zero (sentinel local_row) and are never "first"
        window[c, b1 - b0:] = int(blk_win[b1 - 1] - w0)
        cover[c, wrel] = True
        gather_idx[c, :(b1 - b0) * te] = gidx_all[b0:b1].reshape(-1)
        perm[c, :(b1 - b0) * te] = perm_all[b0:b1].reshape(-1)
        local_row[c, :b1 - b0] = lr_all[b0:b1]
    return SegmentPlan(gather_idx, perm, local_row, window, row0, cover,
                       num_rows, tr, te, wc, bool(flat))


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------
def _block_contrib(window_ref, lr_ref, m_ref, w_ref, *, tr: int, te: int,
                   mode: str, w_kind: str, w_row=None,
                   head_dims=None):
    """Shared block math: one-hot MXU reduce of this block's messages.
    Returns (contrib (TR, FT) f32, is_first-block-of-window pred).
    w_row overrides the scalar-weight row index within its (8, TE)
    fetch (flat-bucketed plans: w shares m's bucket-major layout).

    w_kind='head' (head_dims=(H, D)): w block is the COMPACT (TE, 2H)
    per-edge weights [aw (H) || extra (H)]; each head's aw column
    multiplies its D feature lanes, the extra columns multiply the
    trailing H lanes — expanded in VMEM by an exact one-hot matmul
    (one nonzero per output column, Precision.HIGHEST).  The fused-GAT
    backward uses this to avoid materialising + gathering an
    (E, HD+H)-wide w_rev (~3.3 GB + a 520-lane slot gather at E=1.6M,
    KERNELS.md round 4)."""
    b = pl.program_id(1)
    # lr block is (8, TE) — 8 consecutive blocks' rows share one fetch
    # (2-D int32 tiling allows TE < 1024, unlike 1-D's forced 1024 tile)
    lr = lr_ref[jax.lax.rem(b, 8), :]                    # (TE,) int32
    rows = jax.lax.broadcasted_iota(jnp.int32, (tr, te), 0)
    m = m_ref[:]
    if m.dtype == jnp.uint32:
        # packed bf16 tile: values are bf16-exact, so the single bf16
        # MXU pass below ('fast') loses nothing vs f32x2
        m = _unpack_tile_bf16(m)
        mode = "fast"
    # optional per-edge weight multiplied in VMEM: materialising m*w in
    # HBM costs a full (slots x F) round-trip, and XLA's broadcast of an
    # (E,1) weight into the multiply degrades to per-element gathering
    # (measured 2.7x slower than copy_u at F=512)
    if w_kind == "scalar":
        wr = jax.lax.rem(b, 8) if w_row is None else w_row
        w1 = w_ref[wr, :]                                # (TE,) f32
        m = m * jnp.broadcast_to(w1[:, None], m.shape)
    elif w_kind == "full":
        m = m * w_ref[:]
    elif w_kind == "head":
        H, D = head_dims
        HD = H * D
        ft = m.shape[1]
        f0 = pl.program_id(0) * ft                       # abs lane offset
        w2 = w_ref[:].astype(jnp.float32)                # (TE, 2H)
        lane = f0 + jax.lax.broadcasted_iota(jnp.int32, (2 * H, ft), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (2 * H, ft), 0)
        owner = jnp.where(lane < HD, lane // D, H + (lane - HD))
        R = (row == owner).astype(jnp.float32)           # one 1 per col
        w_exp = jnp.dot(w2, R, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        m = m * w_exp

    if mode == "f32x2":
        # f32 ~= hi + lo with both terms exactly representable in bf16:
        # two DEFAULT MXU passes recover ~2^-16 relative accuracy
        S = (rows == lr[None, :]).astype(jnp.bfloat16)
        hi = m.astype(jnp.bfloat16)
        lo = (m - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        contrib = (
            jnp.dot(S, hi, preferred_element_type=jnp.float32)
            + jnp.dot(S, lo, preferred_element_type=jnp.float32))
    elif mode == "highest":
        S = (rows == lr[None, :]).astype(m.dtype)
        contrib = jnp.dot(S, m, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
    else:  # 'fast' — single bf16 pass
        S = (rows == lr[None, :]).astype(jnp.bfloat16)
        contrib = jnp.dot(S, m.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    prev = window_ref[jnp.maximum(b - 1, 0)]
    is_first = jnp.logical_or(b == 0, window_ref[b] != prev)
    return contrib, is_first


def _reduce_kernel(window_ref, *rest, tr: int, te: int,
                   mode: str, w_kind: str = "none",
                   has_ordm: bool = False, head_dims=None):
    if has_ordm:
        ordm_ref, lr_ref, m_ref, *rest = rest
        w_row = jax.lax.rem(ordm_ref[pl.program_id(1)], 8)
    else:
        lr_ref, m_ref, *rest = rest
        w_row = None
    if w_kind == "none":
        (out_ref,) = rest
        w_ref = None
    else:
        w_ref, out_ref = rest
    contrib, is_first = _block_contrib(window_ref, lr_ref, m_ref, w_ref,
                                       tr=tr, te=te, mode=mode,
                                       w_kind=w_kind, w_row=w_row,
                                       head_dims=head_dims)

    @pl.when(is_first)
    def _():
        out_ref[:] = contrib.astype(out_ref.dtype)

    @pl.when(jnp.logical_not(is_first))
    def _():
        out_ref[:] = out_ref[:] + contrib.astype(out_ref.dtype)


def _reduce_kernel_acc(window_ref, lr_ref, m_ref, *rest, tr: int, te: int,
                       mode: str, w_kind: str = "none", head_dims=None):
    """Accumulating variant: the running accumulator rides in as an
    ALIASED input block with the same index_map as the output, so chunked
    plans add in place — no XLA-side dynamic-slice/update overlap-add
    (that glue measured ~as costly as the gather itself; at wide F the
    old scan path ran at ~156 ns/edge).  First block of a window in this
    chunk seeds out = acc + contrib; revisits accumulate in VMEM."""
    if w_kind == "none":
        acc_ref, out_ref = rest
        w_ref = None
    else:
        w_ref, acc_ref, out_ref = rest
    contrib, is_first = _block_contrib(window_ref, lr_ref, m_ref, w_ref,
                                       tr=tr, te=te, mode=mode,
                                       w_kind=w_kind, head_dims=head_dims)

    @pl.when(is_first)
    def _():
        out_ref[:] = acc_ref[:] + contrib.astype(out_ref.dtype)

    @pl.when(jnp.logical_not(is_first))
    def _():
        out_ref[:] = out_ref[:] + contrib.astype(out_ref.dtype)


def _interpret() -> bool:
    """Pallas compiles only on TPU; CPU tests run in interpreter mode."""
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# max-reduce kernel: segmented shift-scan + exact one-hot select
# ---------------------------------------------------------------------------
# The one-hot MXU matmul computes SUMS; max instead rides the VPU:
# within a block the local rows are non-decreasing (CSC order), so a
# Hillis-Steele max-scan with a same-segment guard (log2(TE) shift steps)
# leaves each row's running max at its last slot, and an exact one-hot
# matmul (Precision.HIGHEST: one-hot x exact 3-term bf16 split of the
# value) moves last-slot values to their output rows.  Exactness matters:
# the VJP recomputes messages in XLA and matches them against the saved
# output by BITWISE equality to find the argmax edges (the reference
# backward does the same comparison, src/kernel/binary_reduce.cc:452).
# Values below MINMAX_NEG are saturated (padding/empty-row fill).
MINMAX_NEG = -1e30


def _block_minmax(window_ref, lr_ref, m_ref, w_ref, *, tr: int, te: int,
                  w_kind: str, w_row=None):
    """Per-block segment max.  Returns (contrib (TR, FT) f32 with
    MINMAX_NEG fill for rows absent from this block, is_first pred).

    Mosaic constraints shape the formulation: no 1-D vector slicing or
    concatenation, so (a) lr moves from lane to sublane layout via an
    exact one-hot matmul against a row-index column (values <= TR fit
    bf16's exact-int range), (b) the segmented Hillis-Steele max-scan
    shifts with pltpu.roll + iota masks, (c) each row's last-slot value
    is extracted by ZEROING non-last slots and summing with the plain
    one-hot matmul — one real value plus exact zeros, so the select is
    bitwise exact (required by the VJP's argmax-by-equality)."""
    b = pl.program_id(1)
    lr = lr_ref[jax.lax.rem(b, 8), :]                    # (TE,) int32 lanes
    m = m_ref[:]
    if m.dtype == jnp.uint32:
        m = _unpack_tile_bf16(m)
    m = m.astype(jnp.float32)
    if w_kind == "scalar":
        wr = jax.lax.rem(b, 8) if w_row is None else w_row
        w1 = w_ref[wr, :]
        m = m * jnp.broadcast_to(w1[:, None], m.shape)
    elif w_kind == "full":
        m = m * w_ref[:].astype(jnp.float32)
    m = jnp.maximum(m, MINMAX_NEG)
    # lane -> sublane transpose of lr: one-hot rows (incl. the TR pad
    # sentinel) x row-index column; iota must be integer-typed on TPU
    tr_ext = tr + 8
    rows_ext = jax.lax.broadcasted_iota(jnp.int32, (tr_ext, te), 0)
    S_ext = (rows_ext == lr[None, :]).astype(jnp.float32)
    rowvals = jax.lax.broadcasted_iota(
        jnp.int32, (tr_ext, 1), 0).astype(jnp.float32)
    lr_sub = jax.lax.dot_general(S_ext, rowvals, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (te, 1), 0)
    # segmented inclusive max-scan along TE (rows sorted within a block,
    # so a same-row guard per shift step keeps segments independent)
    k = 1
    while k < te:
        m_sh = pltpu.roll(m, k, 0)
        lr_sh = pltpu.roll(lr_sub, k, 0)
        same = jnp.logical_and(lr_sh == lr_sub, ridx >= k)
        m = jnp.where(same, jnp.maximum(m, m_sh), m)
        k *= 2
    # keep only each row's last slot; everything else becomes exact 0
    lr_next = jnp.where(ridx == te - 1, -1.0, pltpu.roll(lr_sub, te - 1, 0))
    m_sel = jnp.where(lr_sub != lr_next, m, 0.0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (tr, te), 0)
    S = (rows == lr[None, :]).astype(jnp.float32)
    selected = jnp.dot(S, m_sel, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    cnt = jnp.sum(S, axis=1, keepdims=True)
    contrib = jnp.where(cnt > 0, selected, MINMAX_NEG)
    prev = window_ref[jnp.maximum(b - 1, 0)]
    is_first = jnp.logical_or(b == 0, window_ref[b] != prev)
    return contrib, is_first


def _minmax_kernel(window_ref, *rest, tr: int, te: int,
                   w_kind: str = "none", has_ordm: bool = False):
    if has_ordm:
        ordm_ref, lr_ref, m_ref, *rest = rest
        w_row = jax.lax.rem(ordm_ref[pl.program_id(1)], 8)
    else:
        lr_ref, m_ref, *rest = rest
        w_row = None
    if w_kind == "none":
        (out_ref,) = rest
        w_ref = None
    else:
        w_ref, out_ref = rest
    contrib, is_first = _block_minmax(window_ref, lr_ref, m_ref, w_ref,
                                      tr=tr, te=te, w_kind=w_kind,
                                      w_row=w_row)

    @pl.when(is_first)
    def _():
        out_ref[:] = contrib

    @pl.when(jnp.logical_not(is_first))
    def _():
        out_ref[:] = jnp.maximum(out_ref[:], contrib)


def _minmax_kernel_acc(window_ref, lr_ref, m_ref, *rest, tr: int, te: int,
                       w_kind: str = "none"):
    if w_kind == "none":
        acc_ref, out_ref = rest
        w_ref = None
    else:
        w_ref, acc_ref, out_ref = rest
    contrib, is_first = _block_minmax(window_ref, lr_ref, m_ref, w_ref,
                                      tr=tr, te=te, w_kind=w_kind)

    @pl.when(is_first)
    def _():
        out_ref[:] = jnp.maximum(acc_ref[:], contrib)

    @pl.when(jnp.logical_not(is_first))
    def _():
        out_ref[:] = jnp.maximum(out_ref[:], contrib)


def _pack_tiles_bf16(x: Array, ft: int) -> Array:
    """(N, F) bf16 -> (N, F/2) uint32, packed per ft-wide feature tile:
    within each tile the first half rides the low 16 bits.  LOSSLESS for
    bf16 inputs, and the row gather runs at half the lanes (gather cost
    scales with LANE count — KERNELS.md width law; measured 8.3 vs 16.7
    ns/row at 528 lanes).  Per-tile packing keeps each feature-grid block
    self-contained so the kernel unpacks with one concatenate."""
    N, F = x.shape
    t = x.reshape(N, F // ft, ft)
    lo = jax.lax.bitcast_convert_type(t[:, :, :ft // 2], jnp.uint16)
    hi = jax.lax.bitcast_convert_type(t[:, :, ft // 2:], jnp.uint16)
    p = lo.astype(jnp.uint32) | (hi.astype(jnp.uint32) << 16)
    return p.reshape(N, F // 2)


def _unpack_tile_bf16(mp: Array) -> Array:
    """Kernel-side inverse for ONE tile: (T, ft/2) u32 -> (T, ft) f32
    holding bf16-exact values (two same-width bitcasts; bf16 bits b ==
    f32 bits b<<16 — Mosaic has no bitwidth-changing bitcast)."""
    lo = jax.lax.bitcast_convert_type(mp << 16, jnp.float32)
    hi = jax.lax.bitcast_convert_type(mp & np.uint32(0xFFFF0000),
                                      jnp.float32)
    return jnp.concatenate([lo, hi], axis=1)


def _pick_ft(F: int) -> int:
    for ft in (512, 256, 128):
        if F % ft == 0:
            return ft
    return F


def _reduce_call(m: Array, local_row: Array, window: Array,
                 w: Optional[Array] = None, w_kind: str = "none", *,
                 tr: int, te: int, num_windows: int, num_blocks: int,
                 mode: str = "f32x2", out_width: Optional[int] = None,
                 combine: str = "add",
                 ordm: Optional[Array] = None,
                 head_dims=None) -> Array:
    """ordm (flat-bucketed plans): window-major grid position b reads m
    (and scalar w, which shares m's slot layout) at bucket-major block
    ordm[b] — a second scalar-prefetch operand driving the index_maps."""
    packed = m.dtype == jnp.uint32
    F = out_width if packed else m.shape[1]
    ft = _pick_ft(F)
    m_ft = ft // 2 if packed else ft
    if ordm is None:
        in_specs = [
            pl.BlockSpec((8, te), lambda f, b, win: (b // 8, 0)),
            pl.BlockSpec((te, m_ft), lambda f, b, win: (b, f)),
        ]
    else:
        in_specs = [
            pl.BlockSpec((8, te), lambda f, b, win, om: (b // 8, 0)),
            pl.BlockSpec((te, m_ft), lambda f, b, win, om: (om[b], f)),
        ]
    operands = [local_row, m]
    if w_kind == "scalar":
        in_specs.append(
            pl.BlockSpec((8, te), lambda f, b, win: (b // 8, 0))
            if ordm is None else
            pl.BlockSpec((8, te), lambda f, b, win, om: (om[b] // 8, 0)))
        operands.append(w)
    elif w_kind == "full":
        in_specs.append(
            pl.BlockSpec((te, ft), lambda f, b, win: (b, f))
            if ordm is None else
            pl.BlockSpec((te, ft), lambda f, b, win, om: (om[b], f)))
        operands.append(w)
    elif w_kind == "head":
        ww = w.shape[1]
        in_specs.append(
            pl.BlockSpec((te, ww), lambda f, b, win: (b, 0))
            if ordm is None else
            pl.BlockSpec((te, ww), lambda f, b, win, om: (om[b], 0)))
        operands.append(w)
    if ordm is None:
        out_spec = pl.BlockSpec((tr, ft), lambda f, b, win: (win[b], f))
        prefetch = (window,)
    else:
        out_spec = pl.BlockSpec((tr, ft),
                                lambda f, b, win, om: (win[b], f))
        prefetch = (window, ordm)
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=(max(1, F // ft), num_blocks),
        in_specs=in_specs,
        out_specs=out_spec,
    )
    if combine == "max":
        kernel = functools.partial(_minmax_kernel, tr=tr, te=te,
                                   w_kind=w_kind,
                                   has_ordm=ordm is not None)
    else:
        kernel = functools.partial(_reduce_kernel, tr=tr, te=te, mode=mode,
                                   w_kind=w_kind,
                                   has_ordm=ordm is not None,
                                   head_dims=head_dims)
    return pl.pallas_call(
        kernel,
        grid_spec=grid,
        out_shape=jax.ShapeDtypeStruct((num_windows * tr, F), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=_interpret(),
    )(*prefetch, *operands)


def _reduce_call_acc(acc: Array, m: Array, local_row: Array,
                     window_abs: Array, w: Optional[Array] = None,
                     w_kind: str = "none", *, tr: int, te: int,
                     num_blocks: int, mode: str = "f32x2",
                     out_width: Optional[int] = None,
                     combine: str = "add", head_dims=None) -> Array:
    """One chunk's blocks accumulated IN PLACE into the full-size
    ``acc`` (absolute window ids): the accumulator is an aliased input
    whose blocks ride the same index_map as the output, so only the
    windows this chunk touches move through VMEM — the old XLA
    overlap-add (dynamic_slice + add + dynamic_update_slice of the whole
    padded output per chunk) is gone."""
    packed = m.dtype == jnp.uint32
    F = out_width if packed else m.shape[1]
    ft = _pick_ft(F)
    m_ft = ft // 2 if packed else ft
    in_specs = [
        pl.BlockSpec((8, te), lambda f, b, win: (b // 8, 0)),
        pl.BlockSpec((te, m_ft), lambda f, b, win: (b, f)),
    ]
    operands = [local_row, m]
    if w_kind == "scalar":
        in_specs.append(pl.BlockSpec((8, te), lambda f, b, win: (b // 8, 0)))
        operands.append(w)
    elif w_kind == "full":
        in_specs.append(pl.BlockSpec((te, ft), lambda f, b, win: (b, f)))
        operands.append(w)
    elif w_kind == "head":
        ww = w.shape[1]
        in_specs.append(pl.BlockSpec((te, ww),
                                     lambda f, b, win: (b, 0)))
        operands.append(w)
    in_specs.append(pl.BlockSpec((tr, ft), lambda f, b, win: (win[b], f)))
    operands.append(acc)
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(max(1, F // ft), num_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tr, ft), lambda f, b, win: (win[b], f)),
    )
    if combine == "max":
        kernel = functools.partial(_minmax_kernel_acc, tr=tr, te=te,
                                   w_kind=w_kind)
    else:
        kernel = functools.partial(_reduce_kernel_acc, tr=tr, te=te,
                                   mode=mode, w_kind=w_kind,
                                   head_dims=head_dims)
    # alias indices count the scalar-prefetch operand (window_abs at 0)
    acc_idx = 1 + len(operands)   # prefetch + operands, acc is last
    return pl.pallas_call(
        kernel,
        grid_spec=grid,
        out_shape=jax.ShapeDtypeStruct(acc.shape, jnp.float32),
        input_output_aliases={acc_idx - 1: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=_interpret(),
    )(window_abs, *operands)


# ---------------------------------------------------------------------------
# direction driver: scan uniform chunks, overlap-add into the output
# ---------------------------------------------------------------------------
def _run_direction(plan_arrays: Sequence[Array], static_meta,
                   node_vals: Optional[Array], weights: Optional[Array],
                   E: int, mode: str = "f32x2",
                   combine: str = "add", w_head=None) -> Array:
    """Reduce all chunks via one scanned Pallas call; returns
    (num_rows, F) float32.  combine='max' returns the RAW segment max
    with MINMAX_NEG fill on empty rows (caller zero-fills).

    node_vals=None runs a copy_e reduce: the message is the (E, F)
    ``weights`` array gathered by the plan's edge permutation — no node
    gather at all (used by the sddmm VJPs to reduce edge cotangents)."""
    num_rows, tr, te, wc, C = static_meta[:5]
    flat = bool(static_meta[5]) if len(static_meta) > 5 else False
    gather_rows = int(static_meta[6]) if len(static_meta) > 6 else 0
    slot_offsets = static_meta[7] if len(static_meta) > 7 else None
    (gidx_s, perm_s, lr_s, win_s, row0_s, cover_s, grow0_s,
     ordm_s) = plan_arrays
    F = weights.shape[1] if node_vals is None else node_vals.shape[1]
    fill = jnp.float32(0.0 if combine == "add" else MINMAX_NEG)
    out_len = wc * tr
    if C == 0:
        return jnp.full((num_rows, F), fill, jnp.float32)
    bc = win_s.shape[1]
    full_w = weights is not None and weights.ndim > 1 \
        and weights.shape[-1] != 1
    # bf16 features: gather a u32-packed view (HALF the lanes, lossless —
    # the single bf16 MXU pass the kernel then takes is exact for bf16);
    # DGL_TPU_SPMM_NO_PACK=1 is the measurement/debug escape hatch.
    # Full-width weights pre-multiply below, so packing is skipped there.
    import os
    if node_vals is not None and node_vals.dtype == jnp.bfloat16 \
            and F % 2 == 0 \
            and _pick_ft(F) % 2 == 0 and not full_w \
            and os.environ.get("DGL_TPU_SPMM_NO_PACK") != "1":
        node_vals = _pack_tiles_bf16(node_vals, _pick_ft(F))

    def edge_weights(perm):
        # 1-D element gather — an (E, 1) intermediate would materialise
        # with (8,128)-tile padding (128x expansion: 7.6 GB at E=16M,
        # measured OOM)
        wv = weights.reshape(-1) if weights.ndim > 1 else weights
        return ((wv[jnp.minimum(perm, E - 1)].astype(jnp.float32)
                 * (perm < E)).reshape(-1, te), "scalar")

    def head_weights(perm):
        # compact (E, 2H) per-edge weights, expanded across their D
        # feature lanes IN VMEM (w_kind='head') — replaces the fused-GAT
        # backward's (E, HD+H) w_rev materialisation + 520-lane gather
        wg = (weights[jnp.minimum(perm, E - 1)].astype(jnp.float32)
              * (perm < E)[:, None])
        return wg, "head"

    def apply_full_w(m, perm):
        # (E, F) weights multiply OUTSIDE the kernel: XLA fuses the row
        # gather and the multiply into the one (slots, F) message buffer
        # — HALF the kernel's HBM input traffic vs a separate w operand,
        # and it sidesteps a Mosaic compile hang on the two-input
        # multiply at (1024, ft) blocks (measured: te=1024 w_kind='full'
        # never returns from tpu_compile_helper; te<=256 compiles).
        wv = weights if weights.ndim > 1 else weights[:, None]
        return m * wv[jnp.minimum(perm, E - 1)].astype(jnp.float32)

    if flat and C == 1:
        # single kernel over all blocks, absolute windows, no accumulator
        # (the scan's per-chunk dynamic-slice glue measured ~10 ns/slot —
        # as costly as the gather itself)
        gidx, perm, lr, win, _, cover, _, ordm = (a[0] for a in plan_arrays)
        if node_vals is None:
            wv = weights
            m = wv[jnp.minimum(perm, E - 1)].astype(jnp.float32)
            w_in, w_kind = None, "none"
        else:
            if slot_offsets is not None:
                # FLAT-BUCKETED: per-bucket gathers from STATIC table
                # slices (<=64 MB each -> 2.07 ns/row engine rate); m
                # stays bucket-major, the kernel's ordm index_map walks
                # it window-major
                rows = min(gather_rows, node_vals.shape[0])
                parts = []
                for (s0, r0), (s1, _) in zip(slot_offsets[:-1],
                                             slot_offsets[1:]):
                    tbl = jax.lax.slice(
                        node_vals, (r0, 0),
                        (r0 + rows, node_vals.shape[1]))
                    parts.append(tbl[jax.lax.slice(gidx, (s0,), (s1,))])
                m = jnp.concatenate(parts, 0)
            else:
                m = node_vals[gidx]
            if weights is None:
                w_in, w_kind = None, "none"
            elif w_head is not None:
                w_in, w_kind = head_weights(perm)
            elif full_w:
                m = apply_full_w(m, perm)
                w_in, w_kind = None, "none"
            else:
                w_in, w_kind = edge_weights(perm)
        out = _reduce_call(m, lr, win, w_in, w_kind, tr=tr, te=te,
                           num_windows=wc, num_blocks=bc, mode=mode,
                           out_width=F, combine=combine,
                           ordm=ordm if slot_offsets is not None else None,
                           head_dims=w_head)
        rowmask = jnp.repeat(cover, tr, total_repeat_length=out_len)
        out = jnp.where(rowmask[:, None], out, fill)
        return out[:num_rows]

    # chunked path: in-kernel accumulation into ONE full-size buffer via
    # an aliased accumulator input at ABSOLUTE window ids — no XLA
    # overlap-add glue (measured ~as costly as the gather itself)
    pad_rows = ((num_rows + tr - 1) // tr) * tr
    init = jnp.full((max(pad_rows, tr), F), fill, jnp.float32)

    def body(acc, xs):
        gidx, perm, lr, win, row0, cover, grow0, _om = xs
        if node_vals is None:
            m = weights[jnp.minimum(perm, E - 1)].astype(jnp.float32)
            w_in, w_kind = None, "none"
        else:
            if gather_rows:
                # src-bucketed chunk: gather from a <=64 MB slice — the
                # engine runs at the small-operand rate (2.07 vs 4.68
                # ns/row, microbench_bucket.py); the slice itself rides
                # sequential HBM bandwidth (~0.16 ms per 64 MB)
                tbl = jax.lax.dynamic_slice(
                    node_vals, (grow0, 0),
                    (min(gather_rows, node_vals.shape[0]),
                     node_vals.shape[1]))
                m = tbl[gidx]
            else:
                m = node_vals[gidx]
            if weights is None:
                w_in, w_kind = None, "none"
            elif w_head is not None:
                w_in, w_kind = head_weights(perm)
            elif full_w:
                m = apply_full_w(m, perm)
                w_in, w_kind = None, "none"
            else:
                w_in, w_kind = edge_weights(perm)
        win_abs = win + row0 // tr      # chunk-rebased -> absolute
        acc = _reduce_call_acc(acc, m, lr, win_abs, w_in, w_kind, tr=tr,
                               te=te, num_blocks=bc, mode=mode,
                               out_width=F, combine=combine,
                               head_dims=w_head)
        return acc, None

    if C == 1:
        acc, _ = body(init, tuple(a[0] for a in plan_arrays))
    else:
        acc, _ = jax.lax.scan(body, init, tuple(plan_arrays))
    return acc[:num_rows]


# ---------------------------------------------------------------------------
# public fused op with coupled custom VJP
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _gspmm_fused(meta_fwd, meta_rev, has_w, mode, x, w, src, dst,
                 *plan_arrays):
    out = _run_direction(plan_arrays[:N_PLAN_ARRAYS], meta_fwd, x,
                         w if has_w else None, src.shape[0], mode)
    return out


def _gspmm_fused_fwd(meta_fwd, meta_rev, has_w, mode, x, w, src, dst,
                     *plan_arrays):
    out = _gspmm_fused(meta_fwd, meta_rev, has_w, mode, x, w, src, dst,
                       *plan_arrays)
    return out, (x, w, src, dst, plan_arrays)


def _gspmm_fused_bwd(meta_fwd, meta_rev, has_w, mode, res, g):
    x, w, src, dst, plan_arrays = res
    rev_arrays = plan_arrays[N_PLAN_ARRAYS:2 * N_PLAN_ARRAYS]
    E = src.shape[0]
    # dx[u] = sum_{e=(u,v)} g[v] * w[e] — reduce over the src-major plan
    dx = _run_direction(rev_arrays, meta_rev, g,
                        w if has_w else None, E, mode)
    dx = dx.astype(x.dtype)
    if has_w:
        # dw[e] = <x[src_e], g[dst_e]> (or elementwise for (E, F) weights)
        prod = x[src] * g[dst]
        dw = prod.sum(-1) if w.ndim == 1 else (
            prod.sum(-1, keepdims=True) if w.shape[-1] == 1 else prod)
        dw = dw.astype(w.dtype)
    else:
        dw = jnp.zeros_like(w)
    zeros = tuple(np.zeros(a.shape, jax.dtypes.float0) for a in plan_arrays)
    return (dx, dw,
            np.zeros(src.shape, jax.dtypes.float0),
            np.zeros(dst.shape, jax.dtypes.float0)) + zeros


_gspmm_fused.defvjp(_gspmm_fused_fwd, _gspmm_fused_bwd)

# jit so XLA buffer assignment (not eager async dispatch) owns chunk
# buffer lifetimes
_gspmm_fused_jit = jax.jit(_gspmm_fused, static_argnums=(0, 1, 2, 3))


# ---------------------------------------------------------------------------
# fused segment-MAX with coupled VJP (min = -max(-x) at the caller)
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _gspmm_fused_max(meta_fwd, meta_rev, has_w, mode, x, w, src, dst,
                     *plan_arrays):
    return _run_direction(plan_arrays[:N_PLAN_ARRAYS], meta_fwd, x,
                          w if has_w else None, src.shape[0], mode,
                          combine="max")


def _gspmm_fused_max_fwd(meta_fwd, meta_rev, has_w, mode, x, w, src, dst,
                         *plan_arrays):
    out = _gspmm_fused_max(meta_fwd, meta_rev, has_w, mode, x, w, src, dst,
                           *plan_arrays)
    return out, (x, w, src, dst, out, plan_arrays)


def _gspmm_fused_max_bwd(meta_fwd, meta_rev, has_w, mode, res, g):
    """Argmax-edge gradient: the kernel's max is EXACT (scan compares,
    HIGHEST one-hot select), so recomputing the message in XLA and
    matching it bitwise against the saved output identifies the winning
    edges.  Ties (equal float messages into one dst) all receive the full
    cotangent — measure-zero on real data, documented in KERNELS.md.
    (Reference backward compares the same way,
    src/kernel/binary_reduce.cc:452 BackwardBinaryReduce with max.)"""
    x, w, src, dst, out, plan_arrays = res
    rev_arrays = plan_arrays[N_PLAN_ARRAYS:2 * N_PLAN_ARRAYS]
    E = src.shape[0]
    m = x[src].astype(jnp.float32)
    if has_w:
        wv = w if w.ndim > 1 else w[:, None]
        m = m * wv.astype(jnp.float32)
    m = jnp.maximum(m, MINMAX_NEG)
    mask = (m == out[dst]).astype(jnp.float32)
    g = g.astype(jnp.float32)
    if has_w:
        mw = mask * (w if w.ndim > 1 else w[:, None]).astype(jnp.float32)
    else:
        mw = mask
    dx = _run_direction(rev_arrays, meta_rev, g, mw, E, mode)
    dx = dx.astype(x.dtype)
    if has_w:
        prod = x[src].astype(jnp.float32) * g[dst] * mask
        dw = prod.sum(-1) if w.ndim == 1 else (
            prod.sum(-1, keepdims=True) if w.shape[-1] == 1 else prod)
        dw = dw.astype(w.dtype)
    else:
        dw = jnp.zeros_like(w)
    zeros = tuple(np.zeros(a.shape, jax.dtypes.float0) for a in plan_arrays)
    return (dx, dw,
            np.zeros(src.shape, jax.dtypes.float0),
            np.zeros(dst.shape, jax.dtypes.float0)) + zeros


_gspmm_fused_max.defvjp(_gspmm_fused_max_fwd, _gspmm_fused_max_bwd)

_gspmm_fused_max_jit = jax.jit(_gspmm_fused_max, static_argnums=(0, 1, 2, 3))


class GspmmPlan(NamedTuple):
    """Paired dst-major (forward) and src-major (backward) plans."""
    fwd: SegmentPlan
    rev: SegmentPlan

    @property
    def static_meta(self):
        return (self.fwd.static_meta, self.rev.static_meta)


def build_gspmm_plan(csc_indptr, dst_sorted, src_of_edges, csr_indptr,
                     src_sorted_eids, dst_of_edges, num_src, num_dst,
                     tr: int = DEFAULT_TR, te: int = DEFAULT_TE,
                     bc: int = DEFAULT_BC, wc: int = DEFAULT_WC,
                     flat="auto",
                     flat_max_slots: int = FLAT_MAX_SLOTS,
                     bucket_rows: Optional[int] = None,
                     bucket_rows_rev="same") -> GspmmPlan:
    """Build both direction plans from the Graph's CSC/CSR arrays.

    Forward gathers x by src; reverse gathers dout by dst.  Both perms
    are composed down to internal edge ids so weights index one array.

    ``bucket_rows_rev`` decouples the reverse direction's bucketing:
    src-bucketing is a FORWARD-only win for wide-operand plans (fused
    GAT: the 520-lane rev reduce pays K accumulator round-trips per
    bucket chunk — measured bwd 148 -> 304 ns/edge, KERNELS.md round
    4).  "same" (default) mirrors ``bucket_rows``; None disables.
    """
    fwd = build_segment_plan(csc_indptr, dst_sorted, src_of_edges,
                             num_dst, tr, te, bc, wc,
                             gather_n=num_src, flat=flat,
                             flat_max_slots=flat_max_slots,
                             bucket_rows=bucket_rows)
    eids = np.asarray(src_sorted_eids)
    src_sorted = np.asarray(src_of_edges)[eids]
    dst_in_src_order = np.asarray(dst_of_edges)[eids]
    br_rev = bucket_rows if bucket_rows_rev == "same" else bucket_rows_rev
    rev = build_segment_plan(csr_indptr, src_sorted, dst_in_src_order,
                             num_src, tr, te, bc, wc,
                             gather_n=num_dst, flat=flat,
                             flat_max_slots=flat_max_slots,
                             bucket_rows=br_rev)
    # compose rev perm: positions index src-sorted order -> internal ids
    E = src_sorted.shape[0]
    comp = np.where(rev.perm < E, eids[np.minimum(rev.perm, E - 1)], E)
    rev = rev._replace(perm=comp.astype(np.int32))
    return GspmmPlan(fwd, rev)


def build_gspmm_plan_edges(src_real: np.ndarray, dst_real: np.ndarray,
                           num_src: int, num_dst: int,
                           eids: Optional[np.ndarray] = None,
                           e_full: Optional[int] = None,
                           tr: int = DEFAULT_TR, te: int = DEFAULT_TE,
                           bc: int = DEFAULT_BC, wc: int = DEFAULT_WC,
                           flat="auto",
                           flat_max_slots: int = FLAT_MAX_SLOTS,
                           bucket_rows: Optional[int] = None,
                           gather_n_fwd: Optional[int] = None,
                           gather_n_rev: Optional[int] = None,
                           bucket_rows_rev="same") -> GspmmPlan:
    """Build both direction plans from a REAL-edge list (mask-aware).

    ``src_real``/``dst_real`` are the unpadded edges, dst-sorted.  ``eids``
    maps each real edge's position to its slot in the FULL (padded) edge
    array of length ``e_full`` — plan perms are composed through it so
    edge weights index the caller's padded arrays directly, with the
    sentinel at ``e_full``.  This is how padded graphs (static-shape
    minibatching, spatial partitions) get full-speed Pallas plans: the
    plan simply never visits a masked slot.

    gather_n_fwd/rev override the gather-table sizes (the spatial halo
    path gathers forward from a table smaller than num_src)."""
    src_real = np.asarray(src_real)
    dst_real = np.asarray(dst_real)
    Er = src_real.shape[0]
    if eids is None:
        eids = np.arange(Er, dtype=np.int64)
    if e_full is None:
        e_full = Er
    gf = num_src if gather_n_fwd is None else gather_n_fwd
    gr = num_dst if gather_n_rev is None else gather_n_rev
    csc = np.zeros(num_dst + 1, np.int64)
    np.cumsum(np.bincount(dst_real, minlength=num_dst), out=csc[1:])
    fwd = build_segment_plan(csc, dst_real, src_real, num_dst, tr, te, bc,
                             wc, gather_n=gf, flat=flat,
                             flat_max_slots=flat_max_slots,
                             bucket_rows=bucket_rows)
    order = np.argsort(src_real, kind="stable")
    csr = np.zeros(num_src + 1, np.int64)
    np.cumsum(np.bincount(src_real, minlength=num_src), out=csr[1:])
    br_rev = bucket_rows if bucket_rows_rev == "same" else bucket_rows_rev
    rev = build_segment_plan(csr, src_real[order], dst_real[order],
                             num_src, tr, te, bc, wc, gather_n=gr,
                             flat=flat, flat_max_slots=flat_max_slots,
                             bucket_rows=br_rev)

    def compose(plan, ids):
        comp = np.where(plan.perm < Er,
                        ids[np.minimum(plan.perm, Er - 1)], e_full)
        return plan._replace(perm=comp.astype(np.int32))

    return GspmmPlan(compose(fwd, eids), compose(rev, eids[order]))


def gspmm_pallas(plan_meta, plan_arrays: Sequence[Array], src: Array,
                 dst: Array, x: Array, edge_weight: Optional[Array] = None,
                 reduce_op: str = "sum",
                 in_degrees: Optional[Array] = None,
                 mode: str = "f32x2") -> Array:
    """out[v] = reduce_{e=(u,v)} x[u] (* w[e]); reduce in {sum, mean}.

    plan_meta = GspmmPlan.static_meta; plan_arrays = fwd.device_arrays()
    + rev.device_arrays().  x (N_src, F...); edge_weight (E,), (E,1) or
    (E,F...) in internal edge order.
    """
    meta_fwd, meta_rev = plan_meta[0], plan_meta[1]
    shape = x.shape
    x2 = x.reshape(shape[0], -1)
    w = edge_weight
    if w is not None and w.ndim > 2:
        w = w.reshape(w.shape[0], -1)
    w_arg = w if w is not None else jnp.zeros((0,), x.dtype)
    if reduce_op in ("max", "min"):
        xs = -x2 if reduce_op == "min" else x2
        raw = _gspmm_fused_max_jit(meta_fwd, meta_rev, w is not None, mode,
                                   xs, w_arg, src, dst, *plan_arrays)
        covered = raw > MINMAX_NEG * 0.5
        val = -raw if reduce_op == "min" else raw
        out = jnp.where(covered, val, 0.0).astype(x.dtype)
        return out.reshape((out.shape[0],) + shape[1:])
    out = _gspmm_fused_jit(meta_fwd, meta_rev, w is not None, mode, x2,
                           w_arg, src, dst, *plan_arrays)
    out = out.astype(x.dtype)
    if reduce_op == "mean":
        deg = jnp.maximum(in_degrees.astype(out.dtype), 1.0)
        out = out / deg[:, None]
    elif reduce_op != "sum":
        raise ValueError(f"pallas path supports sum/mean, got {reduce_op}")
    return out.reshape((out.shape[0],) + shape[1:])


# ---------------------------------------------------------------------------
# hybrid dense-hub plan: dense C matmul for hub dst-windows, sparse remainder
# ---------------------------------------------------------------------------
# Power-law graphs concentrate edge mass on few destinations (the load
# imbalance the fork's NbAccess CUDA experiments probe, reference:
# src/kernel/cuda/binary_reduce_impl.cu:445-778).  On TPU the random row
# gather is issue-rate-bound (~7.3 ns/row, KERNELS.md), so for a hot
# 128-row dst window it is cheaper to store a dense count matrix
# C (128, num_src) in bf16 (counts are small ints: exact) and compute the
# whole window as one MXU matmul C @ x — bandwidth-bound on the C read,
# ~0.03 ns/edge for a 9M-edge hub window vs 7.3 ns/edge gathered.  This is
# the GPU HYB (ELL+COO) format idea recast for the MXU: rows above a
# density breakeven go dense, the tail stays on the sparse block plan.
# Applies to unweighted copy_u (GCN/SAGE aggregation): C is static per
# graph.  Weighted ops (u_mul_e) keep the full sparse plan.

GATHER_NS_PER_ROW = 4.68         # measured clean rate (KERNELS.md v2 sweep)
BUCKETED_NS_PER_ROW = 2.1        # <=64 MB operand rate (round-3 bucket study)
HBM_BYTES_PER_S = 819e9          # v5e


def _dense_breakeven(num_src: int, tr: int, passes: int = 1,
                     gather_ns: float = GATHER_NS_PER_ROW) -> int:
    """Edges/window above which reading a dense int8 C row-block beats
    gathering the window's source rows.  passes=1: _dense_matmul reads C
    ONCE (hi||lo concat).  ``gather_ns`` is the competing gather rate:
    4.68 ns/row plain, 2.1 when the remainder plan is src-bucketed
    (the breakeven doubles — fewer dense windows)."""
    read_s = passes * tr * num_src * 2 / HBM_BYTES_PER_S  # bf16 C
    return max(4 * tr, int(read_s / (gather_ns * 1e-9)))


def select_dense_windows(csc_indptr: np.ndarray, num_src: int, num_dst: int,
                         tr: int, threshold: Optional[int] = None,
                         budget_bytes: int = 3 << 30,
                         gather_ns: float = GATHER_NS_PER_ROW) -> np.ndarray:
    """Window ids to densify, heaviest first, within the HBM budget."""
    W = max(1, -(-num_dst // tr))
    bounds = np.minimum(np.arange(W + 1) * tr, num_dst)
    cnt = (csc_indptr[bounds[1:]] - csc_indptr[bounds[:-1]]).astype(np.int64)
    thr = _dense_breakeven(num_src, tr, gather_ns=gather_ns) \
        if threshold is None else threshold
    per_win_bytes = tr * num_src * 2   # bf16 C
    max_wins = int(budget_bytes // max(per_win_bytes, 1))
    cand = np.nonzero(cnt >= max(thr, 1))[0]
    if cand.size == 0 or max_wins == 0:
        return np.zeros(0, np.int64)
    order = cand[np.argsort(cnt[cand])[::-1]]
    return np.sort(order[:max_wins])


def _dense_matmul(C: Array, x: Array, mode: str) -> Array:
    """(R, N) count matrix @ (N, F) features -> (R, F) f32.

    C is stored bf16 (counts are small exact ints).  An int8 store would
    halve the dominant C-read traffic, but feeding an int8->bf16 convert
    into the TPU dot HANGS the remote compile helper (measured round 3:
    even a minimal (256, 100k) int8 @ bf16 dot never returns) — revisit
    if a future compiler accepts it."""
    Cb = C.astype(jnp.bfloat16)
    if mode == "highest":
        return jnp.dot(C.astype(jnp.float32), x.astype(jnp.float32),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    if mode == "fast" or x.dtype == jnp.bfloat16:
        # bf16 features: ONE pass is exact (both operands bf16-
        # representable, f32 accumulation) — no hi||lo concat, half the
        # x-read traffic of the f32 carry (round-5 bf16-carry A/B)
        return jnp.dot(Cb, x.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    xf = x.astype(jnp.float32)
    hi = xf.astype(jnp.bfloat16)
    lo = (xf - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    # one dot over [hi || lo] -> C is read ONCE (it dominates traffic:
    # R x num_src vs num_src x F operand)
    F = x.shape[1]
    d = jnp.dot(Cb, jnp.concatenate([hi, lo], axis=1),
                preferred_element_type=jnp.float32)
    return d[:, :F] + d[:, F:]


def _dense_matmul_t(C: Array, g: Array, mode: str) -> Array:
    """C^T @ g: (R, N)^T @ (R, F) -> (N, F) f32 (backward)."""
    dn = (((0,), (0,)), ((), ()))
    Cb = C.astype(jnp.bfloat16)
    if mode == "highest":
        return jax.lax.dot_general(C.astype(jnp.float32),
                                   g.astype(jnp.float32), dn,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
    if mode == "fast" or g.dtype == jnp.bfloat16:
        return jax.lax.dot_general(Cb, g.astype(jnp.bfloat16), dn,
                                   preferred_element_type=jnp.float32)
    gf = g.astype(jnp.float32)
    hi = gf.astype(jnp.bfloat16)
    lo = (gf - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    F = g.shape[1]
    d = jax.lax.dot_general(Cb, jnp.concatenate([hi, lo], axis=1), dn,
                            preferred_element_type=jnp.float32)
    return d[:, :F] + d[:, F:]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def dense_count_matmul(mode, C, x):
    """Differentiable C @ x with the f32x2 split in BOTH directions.

    Plain AD through _dense_matmul would round the x-cotangent to bf16
    (the hi/lo intermediates are bf16-typed — measured 3e-3 relative
    grad error on the spatial dense-hub path); this pairs the forward
    with the explicit _dense_matmul_t transpose, same as the
    single-chip hybrid's custom VJP."""
    return _dense_matmul(C, x, mode)


def _dcm_fwd(mode, C, x):
    return _dense_matmul(C, x, mode), C


def _dcm_bwd(mode, C, g):
    return (jnp.zeros_like(C), _dense_matmul_t(C, g, mode))


dense_count_matmul.defvjp(_dcm_fwd, _dcm_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _gspmm_hybrid(meta_fwd, meta_rev, mode, x, *arrays):
    rem_fwd = arrays[:N_PLAN_ARRAYS]
    C, rows = arrays[2 * N_PLAN_ARRAYS], arrays[2 * N_PLAN_ARRAYS + 1]
    out = _run_direction(rem_fwd, meta_fwd, x, None, 0, mode)
    d = _dense_matmul(C, x, mode)
    return out.at[rows].add(d.astype(out.dtype))


def _gspmm_hybrid_fwd(meta_fwd, meta_rev, mode, x, *arrays):
    return _gspmm_hybrid(meta_fwd, meta_rev, mode, x, *arrays), (x, arrays)


def _gspmm_hybrid_bwd(meta_fwd, meta_rev, mode, res, g):
    x, arrays = res
    rem_rev = arrays[N_PLAN_ARRAYS:2 * N_PLAN_ARRAYS]
    C, rows = arrays[2 * N_PLAN_ARRAYS], arrays[2 * N_PLAN_ARRAYS + 1]
    g = g.astype(jnp.float32)
    dx = _run_direction(rem_rev, meta_rev, g, None, 0, mode)
    dx = dx + _dense_matmul_t(C, g[rows], mode)
    zeros = tuple(np.zeros(a.shape, jax.dtypes.float0) for a in arrays)
    return (dx.astype(x.dtype),) + zeros


_gspmm_hybrid.defvjp(_gspmm_hybrid_fwd, _gspmm_hybrid_bwd)

_gspmm_hybrid_jit = jax.jit(_gspmm_hybrid, static_argnums=(0, 1, 2))


def gspmm_hybrid(plan_meta, plan_arrays: Sequence[Array], x: Array,
                 reduce_op: str = "sum",
                 in_degrees: Optional[Array] = None,
                 mode: str = "f32x2") -> Array:
    """Unweighted copy_u segment-sum via the hybrid dense-hub plan.

    plan_meta = (rem_fwd_meta, rem_rev_meta); plan_arrays = remainder
    fwd(6) + rev(6) + (C, dense_rows)."""
    meta_fwd, meta_rev = plan_meta[0], plan_meta[1]
    shape = x.shape
    x2 = x.reshape(shape[0], -1)
    out = _gspmm_hybrid_jit(meta_fwd, meta_rev, mode, x2, *plan_arrays)
    out = out.astype(x.dtype)
    if reduce_op == "mean":
        deg = jnp.maximum(in_degrees.astype(out.dtype), 1.0)
        out = out / deg[:, None]
    elif reduce_op != "sum":
        raise ValueError(f"hybrid path supports sum/mean, got {reduce_op}")
    return out.reshape((out.shape[0],) + shape[1:])


def _build_dense_C(g, dense_wins: np.ndarray, tr: int,
                   rows_per_chunk: int = 256) -> Tuple[Array, Array]:
    """Device-side build of the dense count matrix C (R, num_src) bf16
    and the (R,) dense output-row ids.  One-time scatter per row-chunk
    (bounds the f32 staging buffer to rows_per_chunk x num_src)."""
    num_src, num_dst = g.num_src_nodes, g.num_dst_nodes
    row_lists = [np.arange(w * tr, min((w + 1) * tr, num_dst))
                 for w in dense_wins]
    rows_np = np.concatenate(row_lists).astype(np.int32) if row_lists \
        else np.zeros(0, np.int32)
    R = rows_np.shape[0]
    # dst -> dense-local row; non-dense rows get a large POSITIVE
    # out-of-bounds sentinel (negative indices would WRAP in the scatter,
    # mode="drop" only drops out-of-bounds)
    row_map = np.full(num_dst, np.int32(1) << 30, np.int32)
    row_map[rows_np] = np.arange(R, dtype=np.int32)
    r_all = jnp.asarray(row_map)[g.dst]        # (E,) device, -1 = not dense

    @functools.partial(jax.jit, static_argnums=(3,))
    def chunk(r_all, src, r0, cr):
        # rows before this chunk must stay dropped, not wrap negative
        r_rel = jnp.where(r_all >= r0, r_all - r0, np.int32(1) << 30)
        c = jnp.zeros((cr, num_src), jnp.float32)
        return c.at[r_rel, src].add(1.0, mode="drop").astype(jnp.bfloat16)

    parts = []
    for r0 in range(0, R, rows_per_chunk):
        cr = min(rows_per_chunk, R - r0)
        parts.append(chunk(r_all, g.src, r0, cr))
    C = jnp.concatenate(parts, axis=0) if parts \
        else jnp.zeros((0, num_src), jnp.bfloat16)
    return C, jnp.asarray(rows_np)


def build_hybrid_plan(g, dense_wins: np.ndarray, tr: int, te: int,
                      bc: int, wc: int, flat="auto",
                      flat_max_slots: int = FLAT_MAX_SLOTS,
                      bucket_rows: Optional[int] = None):
    """Remainder (non-dense-window) edge plans, both directions."""
    dst = g.host("dst")
    src = g.host("src")
    num_src, num_dst = g.num_src_nodes, g.num_dst_nodes
    W = max(1, -(-num_dst // tr))
    is_dense_win = np.zeros(W, bool)
    is_dense_win[dense_wins] = True
    keep = ~is_dense_win[dst.astype(np.int64) // tr]
    dst_r, src_r = dst[keep], src[keep]        # still CSC (dst-sorted) order
    csc_r = np.zeros(num_dst + 1, np.int64)
    np.cumsum(np.bincount(dst_r, minlength=num_dst), out=csc_r[1:])
    fwd = build_segment_plan(csc_r, dst_r, src_r, num_dst, tr, te, bc, wc,
                             gather_n=num_src, flat=flat,
                             flat_max_slots=flat_max_slots,
                             bucket_rows=bucket_rows)
    order = np.argsort(src_r, kind="stable")
    csr_r = np.zeros(num_src + 1, np.int64)
    np.cumsum(np.bincount(src_r, minlength=num_src), out=csr_r[1:])
    rev = build_segment_plan(csr_r, src_r[order], dst_r[order],
                             num_src, tr, te, bc, wc,
                             gather_n=num_dst, flat=flat,
                             flat_max_slots=flat_max_slots,
                             bucket_rows=bucket_rows)
    return fwd, rev


def _check_dense_exact(g, dense_wins: np.ndarray, tr: int) -> np.ndarray:
    """Drop windows whose per-(dst, src) multiplicity exceeds bf16's
    exact-int range (256) — multigraph safety."""
    if dense_wins.size == 0:
        return dense_wins
    dst = g.host("dst").astype(np.int64)
    src = g.host("src").astype(np.int64)
    win = dst // tr
    keep = []
    for w in dense_wins:
        m = win == w
        key = dst[m] * g.num_src_nodes + src[m]
        _, counts = np.unique(key, return_counts=True)
        if counts.size == 0 or counts.max() <= 256:
            keep.append(w)
    return np.asarray(keep, dtype=np.int64)


# per-chunk gathered-message budget for auto bc: larger chunks amortise
# per-chunk dispatch/pipeline overhead (measured 2277 -> 927 ms at
# F=512/E=16M going from ~170 to 33 chunks) while bounding HBM
MSG_CHUNK_BYTES = 512 << 20


def prepare_spmm(g, tr: int = DEFAULT_TR, te: int = DEFAULT_TE,
                 bc: Optional[int] = None, wc: Optional[int] = None, *,
                 weighted: bool = True, dense_hub: bool = True,
                 dense_threshold: Optional[int] = None,
                 dense_budget: int = 3 << 30, flat="auto",
                 flat_width: int = 128, sddmm: bool = True,
                 bucket_rows="auto", bucket_rows_rev="same"):
    """Attach Pallas gspmm plans to a Graph (returns a new Graph sharing
    all other arrays).  Requires the CSR format (build_csr=True).
    One-time host-side cost per graph, analogous to the reference's lazy
    per-format CSR materialisation (src/graph/unit_graph.cc).

    weighted=True additionally builds the full (all-edge) plan used by
    u_mul_e-style weighted ops; dense_hub=True densifies hub dst-windows
    (see select_dense_windows) for the unweighted copy_u path.
    flat="auto" emits single-kernel scan-free plans when the padded slot
    count fits the FLAT_MAX_BYTES message-buffer budget at an assumed
    operand width of ``flat_width`` f32 words (set it to your widest
    feature dim — e.g. H*D+H for fused GAT); flat=False forces chunked
    plans.  Ops whose actual width would blow the budget fall back to the
    composed XLA path at dispatch (see flat_plans_fit).

    Graphs carrying an ``edge_mask`` (static-shape padding) get
    MASK-AWARE plans built over the real edges only (build_gspmm_plan_
    edges); the dense-hub and sddmm plans are skipped there (their
    device-side builders would count padded slots).  Dispatch handles the
    rest (ops/spmm.py multiplies edge weights by the mask so AD masks dw).
    """
    if g.edge_mask is not None:
        return _prepare_spmm_masked(g, tr=tr, te=te, bc=bc, wc=wc,
                                    flat=flat, flat_width=flat_width,
                                    bucket_rows=bucket_rows)
    if g.csr_indptr is None or g.csr_eids is None:
        raise ValueError("prepare_spmm requires the graph's CSR format")
    if bucket_rows == "auto":
        # the fast-gather regime holds for <=64 MB physical operands
        # (microbench_bucket.py: 2.07 ns/row at 64 MB, 4.67 at 128 MB);
        # bucket when the table is comfortably past the boundary AND the
        # (bucket x window) cell density keeps block padding sane
        B = max(8, min((64 << 20) // (max(flat_width, 1) * 4),
                       196_608) // 8 * 8)  # row-count law cap
        n_tab = max(g.num_src_nodes, g.num_dst_nodes)
        # per-plan profitability (cell fragmentation) is checked inside
        # _build_bucketed_plan; here only gate on table size
        bucket_rows = B if n_tab > 2 * B else None
    if bc is None:
        # width-aware chunk size: the in-kernel-accumulating chunked path
        # has no window-span constraint, so chunks are bounded only by
        # the gathered-message buffer
        bc = max(8, (MSG_CHUNK_BYTES // (te * max(flat_width, 1) * 4))
                 // 8 * 8)
    if wc is None:
        wc = max(1, -(-g.num_dst_nodes // tr))   # unbounded window span
    fms = max(te, FLAT_MAX_BYTES // (max(flat_width, 1) * 4))
    info = PlanInfo(masked=False, flat_width=flat_width,
                    bucket_rows=bucket_rows or 0, rev_inv=True,
                    der_gidx=True)
    E_full = int(g.host("src").shape[0])
    out = g
    if weighted:
        plan = build_gspmm_plan(
            g.host("csc_indptr"), g.host("dst"), g.host("src"),
            g.host("csr_indptr"), g.host("csr_eids"),
            g.host("dst"), g.num_src_nodes, g.num_dst_nodes,
            tr=tr, te=te, bc=bc, wc=wc, flat=flat, flat_max_slots=fms,
            bucket_rows=bucket_rows, bucket_rows_rev=bucket_rows_rev)
        ri = rev_inv_array(plan.rev.perm, E_full)
        dg = der_gidx_array(plan.fwd.perm, ri, E_full,
                            int(plan.rev.perm.size))
        arrays = (plan.fwd.device_arrays() + plan.rev.device_arrays()
                  + (jnp.asarray(ri), jnp.asarray(dg)))
        out = out.replace(spmm_plan_arrays=arrays,
                          spmm_plan_meta=plan.static_meta + (info,))
    if dense_hub and g.edge_mask is None:
        wins = select_dense_windows(
            g.host("csc_indptr"), g.num_src_nodes, g.num_dst_nodes, tr,
            threshold=dense_threshold, budget_bytes=dense_budget,
            gather_ns=(BUCKETED_NS_PER_ROW if bucket_rows
                       else GATHER_NS_PER_ROW))
        wins = _check_dense_exact(g, wins, tr)
        if wins.size:
            fwd, rev = build_hybrid_plan(g, wins, tr, te, bc, wc,
                                         flat=flat, flat_max_slots=fms,
                                         bucket_rows=bucket_rows)
            C, rows = _build_dense_C(g, wins, tr)
            arrays = (fwd.device_arrays() + rev.device_arrays()
                      + (C, rows))
            out = out.replace(
                spmm_hybrid_arrays=arrays,
                spmm_hybrid_meta=(fwd.static_meta, rev.static_meta,
                                  info))
    if not weighted and (out.spmm_hybrid_arrays is None):
        # no dense windows found: fall back to the full sparse plan so
        # copy_u still has a Pallas path
        plan = build_gspmm_plan(
            g.host("csc_indptr"), g.host("dst"), g.host("src"),
            g.host("csr_indptr"), g.host("csr_eids"),
            g.host("dst"), g.num_src_nodes, g.num_dst_nodes,
            tr=tr, te=te, bc=bc, wc=wc, flat=flat, flat_max_slots=fms,
            bucket_rows=bucket_rows, bucket_rows_rev=bucket_rows_rev)
        ri = rev_inv_array(plan.rev.perm, E_full)
        dg = der_gidx_array(plan.fwd.perm, ri, E_full,
                            int(plan.rev.perm.size))
        arrays = (plan.fwd.device_arrays() + plan.rev.device_arrays()
                  + (jnp.asarray(ri), jnp.asarray(dg)))
        out = out.replace(spmm_plan_arrays=arrays,
                          spmm_plan_meta=plan.static_meta + (info,))
    if sddmm and g.edge_mask is None \
            and out.spmm_plan_arrays is not None:
        from .sddmm_kernel import build_sddmm_plan
        sp = build_sddmm_plan(g.host("dst"), g.host("src"),
                              g.num_src_nodes, g.num_dst_nodes, tr=tr)
        out = out.replace(sddmm_plan_arrays=sp.device_arrays(),
                          sddmm_plan_meta=sp.static_meta)
    return out


def _prepare_spmm_masked(g, tr: int, te: int, bc: Optional[int],
                         wc: Optional[int], flat, flat_width: int,
                         bucket_rows):
    """Mask-aware prepare_spmm: plans over the REAL edges of a padded
    graph (edge_mask carries the padding).  Plan perms are composed to
    FULL (padded) edge positions so weighted ops index the caller's
    padded edge arrays unchanged; the sentinel sits at E_full.  Dense-hub
    and sddmm plans are intentionally skipped (their device-side builders
    count every slot).  This is what lets spatial partitions
    (parallel/halo.py local graphs) and padded minibatches ride the full
    Pallas path — the reference serves its distributed path with the same
    kernels as single-GPU (contrib/dis_kvstore.py:670)."""
    mask = g.host("edge_mask").astype(bool)
    src = g.host("src")
    dst = g.host("dst")
    e_full = src.shape[0]
    eids = np.nonzero(mask)[0].astype(np.int64)
    src_r = src[eids].astype(np.int64)
    dst_r = dst[eids].astype(np.int64)
    if bucket_rows == "auto":
        B = max(8, min((64 << 20) // (max(flat_width, 1) * 4),
                       196_608) // 8 * 8)  # row-count law cap
        n_tab = max(g.num_src_nodes, g.num_dst_nodes)
        bucket_rows = B if n_tab > 2 * B else None
    if bc is None:
        bc = max(8, (MSG_CHUNK_BYTES // (te * max(flat_width, 1) * 4))
                 // 8 * 8)
    if wc is None:
        wc = max(1, -(-g.num_dst_nodes // tr))
    fms = max(te, FLAT_MAX_BYTES // (max(flat_width, 1) * 4))
    plan = build_gspmm_plan_edges(
        src_r, dst_r, g.num_src_nodes, g.num_dst_nodes, eids=eids,
        e_full=e_full, tr=tr, te=te, bc=bc, wc=wc, flat=flat,
        flat_max_slots=fms, bucket_rows=bucket_rows)
    info = PlanInfo(masked=True, flat_width=flat_width,
                    bucket_rows=(plan.fwd.gather_rows
                                 or plan.rev.gather_rows or 0),
                    rev_inv=True, der_gidx=True)
    ri = rev_inv_array(plan.rev.perm, e_full)
    dg = der_gidx_array(plan.fwd.perm, ri, e_full,
                        int(plan.rev.perm.size))
    arrays = (plan.fwd.device_arrays() + plan.rev.device_arrays()
              + (jnp.asarray(ri), jnp.asarray(dg)))
    return g.replace(spmm_plan_arrays=arrays,
                     spmm_plan_meta=plan.static_meta + (info,))
