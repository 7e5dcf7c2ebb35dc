"""Pallas TPU kernel: fused gSDDMM with dense dst-window reads.

TPU-native replacement for the reference's edge-output "binary reduce
with reducer=none" kernels (reference: src/kernel/binary_reduce.cc:295
via schedule_apply_edges, runtime/scheduler.py:334).

The composed XLA path pays TWO issue-bound row gathers per edge
(x[src] and y[dst], ~7.3 ns each — KERNELS.md).  The dst side never
needs a gather: edges are dst-SORTED (internal CSC order), so a run of
TE consecutive edges touches at most TE//TR + 1 consecutive dst-row
windows.  The kernel reads those windows DENSELY (span stacked (TR, ft)
blocks at a prefetched window offset — sequential HBM traffic,
~0.5-1.5 ns/edge at F=128 instead of 7.3) and expands rows to edge
slots with an exact one-hot matmul (Precision.HIGHEST; one real value
plus exact zeros per slot).  Blocks are CONTIGUOUS edge tiles — no
padding slots except the global tail — so the per-edge output lands in
internal edge order with no compaction gather.

Ops: add/sub/mul/div (elementwise, y-select exact), dot (VPU multiply +
lane reduce, full f32 accuracy), copy_rhs (pure dense read: ZERO
gathers).  The lhs may be node data ('u', one gather/edge) or edge data
('e', contiguous block read, zero gathers).

Coupled VJP: every cotangent reduction is a plan-kernel reduce
(ops/pallas/spmm_kernel.py _run_direction) over the graph's paired
fwd/rev gspmm plans — no scatter anywhere (reference analogue:
BackwardLhs/Rhs kernels, src/kernel/binary_reduce.cc:452,551).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .spmm_kernel import (N_PLAN_ARRAYS, _interpret, _pick_ft,
                          _run_direction)

Array = jax.Array

SDDMM_TR = 128        # dst-window rows (MXU-aligned)
SDDMM_TE = 256        # edges per contiguous block; span = TE//TR + 1
                      # dense windows per block (VMEM: span*TR x te one-hot).
                      # te=512 with TWO full-width operands hangs
                      # tpu_compile_helper (same Mosaic limit as the spmm
                      # full-width weight multiply — KERNELS.md); te=256
                      # compiles AND halves the one-hot span cost.


class SddmmPlan(NamedTuple):
    """Host-built contiguous-block plan for per-edge outputs.

    gather_idx (nb*te,)   int32  src id per slot (spread pad on the tail)
    local_row  (nb, te)   int32  rank*TR + dst%TR where rank is the
                                 index of the slot's dst window among
                                 the block's DISTINCT windows
                                 (sentinel span*TR for pad/overflow)
    w_ids      (nb*span,) int32  the block's first `span` distinct dst
                                 windows, in order (prefetched)
    ov_pos/src/dst (K,)   int32  overflow edges (window rank >= span —
                                 possible when zero-degree dst gaps make
                                 a te-edge run touch many windows); they
                                 are patched exactly in XLA after the
                                 kernel.  K is 0 on ungappy graphs.
    """
    gather_idx: np.ndarray
    local_row: np.ndarray
    w_ids: np.ndarray
    ov_pos: np.ndarray
    ov_src: np.ndarray
    ov_dst: np.ndarray
    num_edges: int
    num_dst: int
    tr: int
    te: int

    def device_arrays(self) -> Tuple[Array, ...]:
        return (jnp.asarray(self.gather_idx), jnp.asarray(self.local_row),
                jnp.asarray(self.w_ids), jnp.asarray(self.ov_pos),
                jnp.asarray(self.ov_src), jnp.asarray(self.ov_dst))

    @property
    def static_meta(self):
        return (self.num_edges, self.num_dst, self.tr, self.te,
                self.local_row.shape[0])


N_SDDMM_ARRAYS = 6


def build_sddmm_plan(dst_internal: np.ndarray, src_internal: np.ndarray,
                     num_src: int, num_dst: int,
                     tr: int = SDDMM_TR, te: int = SDDMM_TE) -> SddmmPlan:
    """Contiguous te-edge tiles over the internal (dst-sorted) edge order.

    Window addressing is RANK-based: each block prefetches its first
    `span` DISTINCT dst windows (dst-sorted edges visit windows in
    non-decreasing order, so ranks are a prefix).  A te-edge run exceeds
    `span` distinct windows only where nonempty windows hold < te/span
    edges on average (heavily gappy / ultra-sparse stretches); those
    overflow edges are recorded and patched exactly outside the kernel.
    """
    assert te % tr == 0, "sddmm te must be a multiple of tr"
    dst = np.asarray(dst_internal, np.int64)
    src = np.asarray(src_internal, np.int64)
    E = dst.shape[0]
    span = te // tr + 1
    nb = max(8, (-(-max(E, 1) // te) + 7) // 8 * 8)
    slots = nb * te
    # tail pad: spread gather targets (same-address gathers serialize)
    pos = np.arange(slots, dtype=np.int64)
    valid = pos < E
    posc = np.minimum(pos, max(E - 1, 0))
    spread = (pos * np.int64(2654435761)) % max(num_src, 1)
    gather_idx = np.where(valid, src[posc] if E else 0,
                          spread).astype(np.int32)
    w_ids = np.zeros(nb * span, np.int32)
    lr = np.full(slots, span * tr, np.int32)
    ov_pos = np.zeros(0, np.int64)
    if E:
        w = dst // tr                               # (E,) window per edge
        epos = np.arange(E, dtype=np.int64)
        blk = epos // te
        # distinct-window run starts (within each block)
        chg = np.ones(E, bool)
        chg[1:] = w[1:] != w[:-1]
        chg |= (epos % te == 0)
        cid = np.cumsum(chg) - 1                    # global run id
        first_cid = np.zeros(nb, np.int64)
        bstart = np.minimum(np.arange(nb, dtype=np.int64) * te, E - 1)
        first_cid = cid[bstart]
        rank = cid - first_cid[blk]                 # window rank in block
        starts = np.flatnonzero(chg)
        s_ok = starts[rank[starts] < span]
        w_ids[blk[s_ok] * span + rank[s_ok]] = w[s_ok].astype(np.int32)
        ok = rank < span
        lr[: E][ok] = (rank[ok] * tr + dst[ok] % tr).astype(np.int32)
        ov_pos = epos[~ok]
    k = int(ov_pos.shape[0])
    kp = -(-max(k, 1) // 8) * 8 if k else 0
    ovp = np.full(kp, E, np.int64)                  # pad -> OOB (dropped)
    ovp[:k] = ov_pos
    ovs = np.zeros(kp, np.int64)
    ovd = np.zeros(kp, np.int64)
    if k:
        ovs[:k] = src[ov_pos]
        ovd[:k] = dst[ov_pos]
    return SddmmPlan(gather_idx, lr.reshape(nb, te), w_ids,
                     ovp.astype(np.int32), ovs.astype(np.int32),
                     ovd.astype(np.int32), E, num_dst, tr, te)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------
def _sddmm_kernel(wf_ref, lr_ref, *rest, tr: int, te: int, span: int,
                  op: str, lhs_kind: str, dot_d: int = 0):
    """One (feature-tile, block) step.  rest = [m_ref?] + span*[y_ref] +
    [out_ref].  m slots and the y windows combine as
    op(m, S_sel @ Y) where S_sel is the exact one-hot row expansion.

    dot_d: lanes per head for op='dot' (multi-head dot contracts each
    D-lane group separately; the head-sum rides an exact one-hot (ft, H)
    matmul on the MXU — reference broadcast-dot parity,
    src/kernel/binary_reduce.cc:96 CalcBcastInfo)."""
    if lhs_kind == "none":
        y_refs = rest[:span]
        out_ref = rest[span]
        m = None
    else:
        m_ref = rest[0]
        y_refs = rest[1:1 + span]
        out_ref = rest[1 + span]
        m = m_ref[:].astype(jnp.float32)
    b = pl.program_id(1)
    lr = lr_ref[jax.lax.rem(b, 8), :]                 # (te,) int32 lanes
    Y = jnp.concatenate([r[:] for r in y_refs], axis=0)  # (span*tr, ft)
    rows = jax.lax.broadcasted_iota(jnp.int32, (span * tr, te), 0)
    S = (rows == lr[None, :]).astype(jnp.float32)     # (span*tr, te)
    # exact select: every slot sums ONE y row plus exact zeros
    y_sel = jax.lax.dot_general(S, Y.astype(jnp.float32),
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
    if op == "copy_rhs":
        out = y_sel
    elif op == "add":
        out = m + y_sel
    elif op == "sub":
        out = m - y_sel
    elif op == "mul":
        out = m * y_sel
    elif op == "div":
        out = m / y_sel
    elif op == "dot":
        f = pl.program_id(0)
        prod = m * y_sel                                  # (te, ft) f32
        ft = prod.shape[1]
        if dot_d:
            # multi-head: head of lane l (in this tile) = (f*ft + l)//D;
            # exact one-hot (ft, H) matmul sums each head's lanes
            H = out_ref.shape[1]
            lane_h = (f * ft
                      + jax.lax.broadcasted_iota(jnp.int32, (ft, H), 0)
                      ) // dot_d
            head = jax.lax.broadcasted_iota(jnp.int32, (ft, H), 1)
            R = (lane_h == head).astype(jnp.float32)
            part = jnp.dot(prod, R, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        else:
            part = jnp.sum(prod, axis=1, keepdims=True)   # (te, 1) f32

        @pl.when(f == 0)
        def _():
            out_ref[:] = part

        @pl.when(f != 0)
        def _():
            out_ref[:] = out_ref[:] + part
        return
    else:
        raise ValueError(op)
    out_ref[:] = out


def _sddmm_call(meta, lhs: Optional[Array], y: Array, lr: Array,
                w_ids: Array, gather_idx: Array, op: str,
                lhs_kind: str, dot_d: int = 0) -> Array:
    """Run the kernel over all blocks; returns (nb*te, F) or (nb*te, H)
    for dot (H = F // dot_d heads), in slot (== padded internal edge)
    order."""
    E, num_dst, tr, te, nb = meta
    span = te // tr + 1
    F = lhs.shape[1] if lhs_kind != "none" else y.shape[1]
    ft = _pick_ft(F)
    nf = max(1, F // ft)
    wmax = max(1, -(-num_dst // tr))
    H = max(1, F // dot_d) if (op == "dot" and dot_d) else 1

    if lhs_kind == "u":
        m_in = lhs[gather_idx]                       # (nb*te, F)
        m_spec = pl.BlockSpec((te, ft), lambda f, b, wf: (b, f))
    elif lhs_kind == "e":
        # edge data IS slot data (contiguous blocks); pad the tail once
        pad = nb * te - lhs.shape[0]
        m_in = jnp.pad(lhs, ((0, pad), (0, 0))) if pad else lhs
        m_spec = pl.BlockSpec((te, ft), lambda f, b, wf: (b, f))
    else:
        m_in, m_spec = None, None

    # pad y to whole windows with exact zeros: the one-hot select SUMS
    # over all span*tr rows, and 0 x (uninitialised NaN pad) would poison
    # every slot — zero rows are summed harmlessly
    ypad = wmax * tr - y.shape[0]
    if ypad > 0:
        y = jnp.pad(y, ((0, ypad), (0, 0)))

    in_specs = [pl.BlockSpec((8, te), lambda f, b, wf: (b // 8, 0))]
    operands = [lr]
    if m_in is not None:
        in_specs.append(m_spec)
        operands.append(m_in)
    # span stacked dense dst windows at the prefetched DISTINCT window ids
    for k in range(span):
        in_specs.append(pl.BlockSpec(
            (tr, ft),
            functools.partial(
                lambda f, b, wf, k=0: (wf[b * span + k], f), k=k)))
        operands.append(y)
    if op == "dot":
        out_spec = pl.BlockSpec((te, H), lambda f, b, wf: (b, 0))
        out_shape = jax.ShapeDtypeStruct((nb * te, H), jnp.float32)
    else:
        out_spec = pl.BlockSpec((te, ft), lambda f, b, wf: (b, f))
        out_shape = jax.ShapeDtypeStruct((nb * te, F), jnp.float32)
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nf, nb),
        in_specs=in_specs,
        out_specs=out_spec,
    )
    return pl.pallas_call(
        functools.partial(_sddmm_kernel, tr=tr, te=te, span=span, op=op,
                          lhs_kind=lhs_kind,
                          dot_d=dot_d if H > 1 else 0),
        grid_spec=grid,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=_interpret(),
    )(w_ids, *operands)


# ---------------------------------------------------------------------------
# fused op with coupled VJP
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _gsddmm_fused(meta, spmm_meta, op, lhs_kind, mode, dot_d, lhs, y,
                  *arrays):
    gather_idx, lr, w_ids = arrays[:3]
    out = _sddmm_call(meta, lhs if lhs_kind != "none" else None, y, lr,
                      w_ids, gather_idx, op, lhs_kind, dot_d)
    E = meta[0]
    return out[:E]


def _gsddmm_fused_fwd(meta, spmm_meta, op, lhs_kind, mode, dot_d, lhs, y,
                      *arrays):
    out = _gsddmm_fused(meta, spmm_meta, op, lhs_kind, mode, dot_d, lhs,
                        y, *arrays)
    return out, (lhs, y, arrays)


def _gsddmm_fused_bwd(meta, spmm_meta, op, lhs_kind, mode, dot_d, res, g):
    """All reductions ride the gspmm plan kernels (no scatter):
    d_lhs ('u') reduces edge cotangents to src over the REV plan,
    dy reduces to dst over the FWD plan."""
    lhs, y, arrays = res
    spmm_arr = arrays[N_SDDMM_ARRAYS:]
    fwd_arr = spmm_arr[:N_PLAN_ARRAYS]
    rev_arr = spmm_arr[N_PLAN_ARRAYS:2 * N_PLAN_ARRAYS]
    meta_fwd, meta_rev = spmm_meta[0], spmm_meta[1]
    E = meta[0]
    g = g.astype(jnp.float32)

    def rev_reduce(node, w):
        return _run_direction(rev_arr, meta_rev, node, w, E, mode)

    def fwd_reduce(node, w):
        return _run_direction(fwd_arr, meta_fwd, node, w, E, mode)

    yf = y.astype(jnp.float32)
    if op == "copy_rhs":
        dlhs = None
        dy = fwd_reduce(None, g)
    elif op == "add":
        dlhs, dy = g, fwd_reduce(None, g)
    elif op == "sub":
        dlhs, dy = g, -fwd_reduce(None, g)
    elif op == "mul":
        # d_lhs[e] = g[e] * y[dst_e]; dy[v] = sum_{e->v} g[e]*lhs_e
        dlhs = g * _gsddmm_fused(meta, spmm_meta, "copy_rhs", "none",
                                 mode, 0, lhs, y, *arrays)
        dy = (fwd_reduce(lhs, g) if lhs_kind == "u"
              else fwd_reduce(None, g * lhs.astype(jnp.float32)))
    elif op == "div":
        inv = 1.0 / yf
        dlhs = g * _gsddmm_fused(meta, spmm_meta, "copy_rhs", "none",
                                 mode, 0, lhs, inv, *arrays)
        num = (fwd_reduce(lhs, g) if lhs_kind == "u"
               else fwd_reduce(None, g * lhs.astype(jnp.float32)))
        dy = -num * inv * inv
    elif op == "dot":
        # g is (E, H): one scalar per head; expand to lanes (D per head)
        F = y.shape[1]
        gl = g if g.shape[1] == F else jnp.repeat(
            g, dot_d if dot_d else F, axis=1, total_repeat_length=F)
        dlhs = gl * _gsddmm_fused(meta, spmm_meta, "copy_rhs", "none",
                                  mode, 0, lhs, y, *arrays)
        dy = (fwd_reduce(lhs, gl) if lhs_kind == "u"
              else fwd_reduce(None, gl * lhs.astype(jnp.float32)))
    else:
        raise ValueError(op)

    if lhs_kind == "u":
        # reduce per-edge lhs cotangent to src rows over the rev plan
        dlhs_n = rev_reduce(None, dlhs) if dlhs is not None else None
        dlhs_out = (jnp.zeros_like(lhs) if dlhs_n is None
                    else dlhs_n.astype(lhs.dtype))
    else:  # 'e': cotangent already per edge
        dlhs_out = (jnp.zeros_like(lhs) if dlhs is None
                    else dlhs.astype(lhs.dtype))
    dy_out = dy.astype(y.dtype)
    zeros = tuple(np.zeros(a.shape, jax.dtypes.float0) for a in arrays)
    return (dlhs_out, dy_out) + zeros


_gsddmm_fused.defvjp(_gsddmm_fused_fwd, _gsddmm_fused_bwd)

_gsddmm_fused_jit = jax.jit(_gsddmm_fused, static_argnums=(0, 1, 2, 3, 4, 5))


def gsddmm_pallas(g, op: str, lhs_data: Optional[Array], rhs_data: Array,
                  lhs_target: str, mode: str = "f32x2") -> Array:
    """Fused per-edge op with a dst-side ('v') rhs.  Requires
    prepare_spmm (sddmm plan + paired gspmm plans for the VJP).
    Returns internal-order edge values with DGL shapes (dot keeps a
    trailing 1)."""
    meta = g.sddmm_plan_meta
    arrays = g.sddmm_plan_arrays + g.spmm_plan_arrays
    shape_l = lhs_data.shape if lhs_data is not None else None
    shape_r = rhs_data.shape
    y2 = rhs_data.reshape(shape_r[0], -1)
    lhs2 = (lhs_data.reshape(shape_l[0], -1) if lhs_data is not None
            else jnp.zeros((0, y2.shape[1]), y2.dtype))
    lhs_kind = "none" if op == "copy_rhs" else lhs_target
    # multi-head dot: contract the last dim of (N, H, D) operands only
    dot_d = int(shape_r[-1]) if (op == "dot" and len(shape_r) > 2) else 0
    out = _gsddmm_fused_jit(meta, g.spmm_plan_meta, op, lhs_kind, mode,
                            dot_d, lhs2, y2, *arrays)
    E = meta[0]
    ov_pos, ov_src, ov_dst = g.sddmm_plan_arrays[3:6]
    if ov_pos.shape[0]:
        # exact XLA patch for window-rank-overflow edges (kernel wrote
        # zeros-combined values there); differentiable, so cotangents
        # route through this composed path for exactly those edges
        yv = y2[ov_dst].astype(jnp.float32)
        if op == "copy_rhs":
            vals = yv
        else:
            mv = (lhs2[ov_src] if lhs_kind == "u"
                  else lhs2[jnp.minimum(ov_pos, lhs2.shape[0] - 1)]
                  ).astype(jnp.float32)

            def _dot_patch():
                p = mv * yv
                if dot_d:      # per-head contraction
                    return p.reshape(p.shape[0], -1, dot_d).sum(-1)
                return jnp.sum(p, -1, keepdims=True)
            vals = {"add": lambda: mv + yv, "sub": lambda: mv - yv,
                    "mul": lambda: mv * yv, "div": lambda: mv / yv,
                    "dot": _dot_patch,
                    }[op]()
        out = out.at[ov_pos].set(vals, mode="drop")
    if op == "dot":
        out = out.astype(rhs_data.dtype)
        return out.reshape((E,) + shape_r[1:-1] + (1,))
    ref_shape = shape_r[1:] if op == "copy_rhs" else shape_l[1:]
    out = out.astype(rhs_data.dtype if op == "copy_rhs"
                     else lhs_data.dtype)
    return out.reshape((E,) + ref_shape)
