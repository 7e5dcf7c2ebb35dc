"""Fused GAT attention Pallas kernel — flash-softmax in plan order.

TPU-native equivalent of the fork's fused CUDA GAT pair
(gatExpLeakyReluSumKernel / gatSumProdZipDivKernel, reference:
src/kernel/cuda/binary_reduce_impl.cu:52,87 and the custom autograd
bridge in python/dgl/backend/pytorch/tensor.py:291-519).  The unfused
path costs ~8 E-row gather-engine operations per GAT layer forward
(el[src], er[dst], segment max/sum scatters + gathers, x[src], w[e],
final scatter); the gather engine at ~7.3 ns/row is the wall (KERNELS.md).
This kernel does the whole edge phase in ONE gather per edge:

* The host plan (ops/pallas/spmm_kernel.build_segment_plan) already packs
  dst-sorted edges into (window, block, chunk) tiles with a precomposed
  src-index per slot.  We gather the concatenated row z = [Wh_u || el_u]
  once per edge — per-row gather cost is independent of row bytes.
* er[dst] is never gathered: dst rows of one block live in one TR-row
  window, so er_e = onehot(local_row)^T @ er_window — an exact MXU select.
* Softmax is computed online (flash-attention style): a per-window
  running max lives in VMEM scratch; each block rescales the resident
  output tile by exp(m_old - m_new).  The kernel emits, per window,
  the numerator  sum_e p_e * Wh_u  (p = exp(logit - m)), the
  denominator sum_e p_e, and the final max m — softmax output
  num/den is shift-invariant, so one-hot-select rounding on the shift
  cancels exactly between numerator and denominator.
* Chunk-split hub windows are merged with the standard online-softmax
  combine (rescale both sides to the joint max) in XLA during the
  overlap-add scan.
* Attention dropout (an (E, H) multiplier) rides an optional second
  per-slot operand applied to the numerator only — dropout after
  softmax, matching GATConv semantics.

Backward (custom VJP), round-5 IN-KERNEL design (`_gat_bwd_kernel`):
one reverse-plan pass computes the whole backward edge phase.  The rev
plan's windows are src-major, so the z rows the daw dot needs are
exactly the output-window rows — z rides in as a window-indexed
BlockSpec input (contiguous rows, NO per-edge gather) and expands to
slots with the same one-hot matmul; the slot gather carries
node_rev = [dout||er||m||den||sds]; a/daw/dlogit/draw recompute per
slot in VMEM; dz accumulates as S @ [dout*expand(aw) || draw]; compact
per-slot [draw||dw] goes out a second kernel output.  der then reduces
that slot buffer DIRECTLY through the forward plan (der_gidx =
rev_inv o fwd_perm, both composed host-side — an XLA row scatter costs
~20 ns/row, the reason these index compositions exist).  Train step
composed 386 -> 66.3 ns/edge (KERNELS.md round 5); legacy backwards
(compact head-weight / wide / packed-gathers) remain as static-arg A/B
paths.  This is the TPU answer to the fork's fully-fused
fusedGatBackwardGrad* family (src/kernel/cuda/binary_reduce_impl.cu:
124-309) — no materialised per-edge intermediates remain.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .spmm_kernel import N_PLAN_ARRAYS, _interpret, _run_direction

Array = jax.Array

_NEG = np.float32(-1e30)


def _mxu_sel(mask: Array, vals: Array, mode: str) -> Array:
    """mask @ vals where mask is 0/1: exact one-hot select/reduce.

    'f32x2' splits vals into two bf16 terms (each product exact, sum
    ~2^-16 of f32); 'highest' uses full-precision MXU passes; 'fast' is a
    single bf16 pass.
    """
    if mode == "highest":
        return jnp.dot(mask.astype(jnp.float32), vals,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    mb = mask.astype(jnp.bfloat16)
    if mode == "fast":
        return jnp.dot(mb, vals.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    hi = vals.astype(jnp.bfloat16)
    lo = (vals - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (jnp.dot(mb, hi, preferred_element_type=jnp.float32)
            + jnp.dot(mb, lo, preferred_element_type=jnp.float32))


def _mxu_sel_t(vals: Array, mask: Array, mode: str) -> Array:
    """vals @ mask with a 0/1 mask on the right (head->lane expansion)."""
    if mode == "highest":
        return jnp.dot(vals, mask.astype(jnp.float32),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    mb = mask.astype(jnp.bfloat16)
    if mode == "fast":
        return jnp.dot(vals.astype(jnp.bfloat16), mb,
                       preferred_element_type=jnp.float32)
    hi = vals.astype(jnp.bfloat16)
    lo = (vals - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (jnp.dot(hi, mb, preferred_element_type=jnp.float32)
            + jnp.dot(lo, mb, preferred_element_type=jnp.float32))


def _pack_z(z: Array, HD: int) -> Array:
    """(N, HD+H) f32 -> (N, HD/2 + H) uint32 packed z rows.

    The Wh FEATURE half is bf16-quantized with the row's first feature
    half in the low 16 bits and the second half in the high bits —
    half-packing (not pair-packing) keeps the unpacked columns in
    natural order, so the kernel reconstructs with one concatenate.  The
    el LOGIT lanes stay EXACT f32 (same-width bitcast): attention-logit
    gradients are cancellation-sensitive (measured 0.42 rel err on der
    with bf16 logits vs 3e-3 with f32 logits), while the value features
    tolerate bf16.  Gather cost scales with LANE count (KERNELS.md width
    law: measured 8.3 vs 12.0 ns/row at W=528 -> W=264), so the dominant
    z gather runs at ~half the lanes for H << HD.  Requires HD even."""
    feat, el = z[:, :HD], z[:, HD:]
    fb = feat.astype(jnp.bfloat16)
    lo = jax.lax.bitcast_convert_type(fb[:, :HD // 2], jnp.uint16)
    hi = jax.lax.bitcast_convert_type(fb[:, HD // 2:], jnp.uint16)
    fp = lo.astype(jnp.uint32) | (hi.astype(jnp.uint32) << 16)
    elu = jax.lax.bitcast_convert_type(el.astype(jnp.float32), jnp.uint32)
    return jnp.concatenate([fp, elu], axis=1)


def _unpack_z(zp: Array, HD: int, H: int):
    """Kernel-side inverse of _pack_z: (T, HD/2+H) u32 ->
    ((T, HD) f32 features, (T, H) f32 logits).  Two same-width bitcasts
    recover the bf16 halves (bf16 bits b == f32 bits b<<16) — Mosaic has
    no bitwidth-changing bitcast, this avoids needing one."""
    fp = zp[:, :HD // 2]
    lo = jax.lax.bitcast_convert_type(fp << 16, jnp.float32)
    hi = jax.lax.bitcast_convert_type(fp & np.uint32(0xFFFF0000),
                                      jnp.float32)
    el = jax.lax.bitcast_convert_type(zp[:, HD // 2:HD // 2 + H],
                                      jnp.float32)
    return jnp.concatenate([lo, hi], axis=1), el


def _gat_kernel(window_ref, lr_ref, z_ref, er_ref, *rest, tr: int, te: int,
                H: int, D: int, slope: float, mode: str, has_w: bool,
                has_acc: bool = False):
    # has_acc: chunked plans pass the running (num||den||m) accumulator
    # as an ALIASED input at absolute windows; the first block of a
    # window in this chunk merges with it by the online-softmax combine
    # — the XLA-side chunk merge (dynamic slices + rescales) disappears
    rest = list(rest)
    w_ref = rest.pop(0) if has_w else None
    acc_ref = rest.pop(0) if has_acc else None
    out_ref, m_scr = rest
    HD = H * D
    b = pl.program_id(0)
    lr = lr_ref[jax.lax.rem(b, 8), :]                       # (TE,)
    rows = jax.lax.broadcasted_iota(jnp.int32, (tr, te), 0)
    S = rows == lr[None, :]                                  # (TR, TE)
    lr_col = jnp.broadcast_to(lr[:, None], (te, tr))         # i32: 2-D ok
    St = lr_col == jax.lax.broadcasted_iota(jnp.int32, (te, tr), 1)
    validH = jnp.broadcast_to(lr[:, None], (te, H)) < tr     # (TE, H)

    z = z_ref[:]                                  # (TE, HD+H) or packed
    if z.dtype == jnp.uint32:                     # packed: bf16 feats
        zf, el_e = _unpack_z(z, HD, H)
    else:
        zf, el_e = z[:, :HD], z[:, HD:HD + H]
    er_e = _mxu_sel(St, er_ref[:], mode)                     # (TE, H)
    raw = el_e + er_e
    logit = jnp.where(raw >= 0, raw, np.float32(slope) * raw)
    # padded slots carry -1e30: they vanish from the max and exp to 0
    logit = jnp.where(validH, logit, _NEG)

    # exact per-row block max, one masked lane-reduce per head
    bm = jnp.concatenate(
        [jnp.where(S, logit[:, h][None, :], _NEG).max(axis=1)[:, None]
         for h in range(H)], axis=1)                         # (TR, H)

    prev = window_ref[jnp.maximum(b - 1, 0)]
    is_first = jnp.logical_or(b == 0, window_ref[b] != prev)
    if has_acc:
        # prior chunks' running max participates from the start
        m_old = jnp.where(is_first, acc_ref[:, HD + H:], m_scr[:])
        new_m = jnp.maximum(m_old, bm)
    else:
        m_old = m_scr[:]                                     # garbage if first
        new_m = jnp.where(is_first, bm, jnp.maximum(m_old, bm))
    m_scr[:] = new_m

    nm_e = _mxu_sel(St, new_m, mode)                         # (TE, H)
    p = jnp.exp(logit - nm_e)                                # pad slots -> 0
    pw = p * w_ref[:] if has_w else p                        # (TE, H)

    # expand head weights across their D lanes: pw @ kron(I_H, 1_D)
    lane_h = jax.lax.broadcasted_iota(jnp.int32, (H, HD), 1) // D
    head_h = jax.lax.broadcasted_iota(jnp.int32, (H, HD), 0)
    R = lane_h == head_h                                     # (H, HD) 0/1
    p_exp = _mxu_sel_t(pw, R, mode)                          # (TE, HD)
    wz = zf * p_exp

    num_c = _mxu_sel(S, wz, mode)                            # (TR, HD)
    den_c = _mxu_sel(S, p, mode)                             # (TR, H)

    def _merge(cur):
        scale = jnp.exp(m_old - new_m)                       # (TR, H)
        scale_exp = _mxu_sel_t(scale, R, mode)               # (TR, HD)
        return jnp.concatenate(
            [cur[:, :HD] * scale_exp + num_c,
             cur[:, HD:HD + H] * scale + den_c,
             new_m], axis=1)

    @pl.when(is_first)
    def _():
        if has_acc:
            out_ref[:] = _merge(acc_ref[:])
        else:
            out_ref[:] = jnp.concatenate([num_c, den_c, new_m], axis=1)

    @pl.when(jnp.logical_not(is_first))
    def _():
        out_ref[:] = _merge(out_ref[:])


def _gat_kernel_shift(window_ref, lr_ref, z_ref, ec_ref, *rest, tr: int,
                      te: int, H: int, D: int, slope: float, mode: str,
                      has_w: bool, has_acc: bool = False):
    """Shift-mode variant: subtract the precomputed dense upper bound
    c[v] = leaky(max(el) + er[v]) instead of the online max.  Softmax is
    shift-invariant, so the result is exact (bar exp underflow for
    per-dst logit spreads > ~80); no scratch, no rescale — plain
    accumulation like the spmm kernel.  This matches the reference
    fork's fused GAT, which subtracts no max at all (reference:
    src/kernel/cuda/binary_reduce_impl.cu:52)."""
    rest = list(rest)
    w_ref = rest.pop(0) if has_w else None
    acc_ref = rest.pop(0) if has_acc else None
    (out_ref,) = rest
    HD = H * D
    b = pl.program_id(0)
    lr = lr_ref[jax.lax.rem(b, 8), :]                       # (TE,)
    rows = jax.lax.broadcasted_iota(jnp.int32, (tr, te), 0)
    S = rows == lr[None, :]                                  # (TR, TE)
    lr_col = jnp.broadcast_to(lr[:, None], (te, tr))
    St = lr_col == jax.lax.broadcasted_iota(jnp.int32, (te, tr), 1)
    validH = jnp.broadcast_to(lr[:, None], (te, H)) < tr     # (TE, H)

    z = z_ref[:]                                  # (TE, HD+H) or packed
    if z.dtype == jnp.uint32:                     # packed: bf16 feats
        zf, el_e = _unpack_z(z, HD, H)
    else:
        zf, el_e = z[:, :HD], z[:, HD:HD + H]
    ec = _mxu_sel(St, ec_ref[:], mode)                       # (TE, 2H)
    er_e, c_e = ec[:, :H], ec[:, H:]
    raw = el_e + er_e
    logit = jnp.where(raw >= 0, raw, np.float32(slope) * raw)
    logit = jnp.where(validH, logit, _NEG)
    p = jnp.exp(logit - c_e)                                 # <= 1; pad -> 0
    pw = p * w_ref[:] if has_w else p

    lane_h = jax.lax.broadcasted_iota(jnp.int32, (H, HD), 1) // D
    head_h = jax.lax.broadcasted_iota(jnp.int32, (H, HD), 0)
    R = lane_h == head_h
    p_exp = _mxu_sel_t(pw, R, mode)                          # (TE, HD)
    wz = zf * p_exp
    contrib = jnp.concatenate(
        [_mxu_sel(S, wz, mode), _mxu_sel(S, p, mode)], axis=1)

    prev = window_ref[jnp.maximum(b - 1, 0)]
    is_first = jnp.logical_or(b == 0, window_ref[b] != prev)

    @pl.when(is_first)
    def _():
        out_ref[:] = (acc_ref[:] + contrib) if has_acc else contrib

    @pl.when(jnp.logical_not(is_first))
    def _():
        out_ref[:] = out_ref[:] + contrib


def _gat_chunk_call(win: Array, lr: Array, z_g: Array, er_chunk: Array,
                    w_g: Optional[Array], *, tr: int, te: int, bc: int,
                    wc: int, H: int, D: int, slope: float, mode: str,
                    softmax: str, acc: Optional[Array] = None) -> Array:
    """acc != None: chunked mode — the full-size accumulator is an
    aliased input and ``win`` carries ABSOLUTE window ids; the kernel
    merges per window (online-softmax combine in 'exact', plain add in
    'shift'), replacing the old XLA overlap-add scan glue."""
    width_in = z_g.shape[1]
    er_w = er_chunk.shape[1]                 # H (exact) or 2H ([er||c])
    out_w = H * D + (2 * H if softmax == "exact" else H)
    has_w = w_g is not None
    in_specs = [
        pl.BlockSpec((8, te), lambda b, w: (b // 8, 0)),
        pl.BlockSpec((te, width_in), lambda b, w: (b, 0)),
        pl.BlockSpec((tr, er_w), lambda b, w: (w[b], 0)),
    ]
    operands = [lr, z_g, er_chunk]
    if has_w:
        in_specs.append(pl.BlockSpec((te, H), lambda b, w: (b, 0)))
        operands.append(w_g)
    aliases = {}
    if acc is not None:
        in_specs.append(pl.BlockSpec((tr, out_w), lambda b, w: (w[b], 0)))
        operands.append(acc)
        # alias indices count the scalar-prefetch operand (win at 0)
        aliases = {len(operands): 0}
        out_shape = jax.ShapeDtypeStruct(acc.shape, jnp.float32)
    else:
        out_shape = jax.ShapeDtypeStruct((wc * tr, out_w), jnp.float32)
    kern = _gat_kernel if softmax == "exact" else _gat_kernel_shift
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bc,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tr, out_w), lambda b, w: (w[b], 0)),
        scratch_shapes=([pltpu.VMEM((tr, H), jnp.float32)]
                        if softmax == "exact" else []),
    )
    return pl.pallas_call(
        functools.partial(kern, tr=tr, te=te, H=H, D=D, slope=slope,
                          mode=mode, has_w=has_w, has_acc=acc is not None),
        grid_spec=grid,
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(win, *operands)


def _run_gat_fwd(plan_arrays: Sequence[Array], meta, z: Array, er: Array,
                 w: Optional[Array], E: int, slope: float, mode: str,
                 softmax: str, packed: bool = False):
    """Scan chunks; merge chunk-split windows (online-softmax combine in
    'exact' mode, plain add in 'shift' mode).  Returns
    (rst (N_dst, HD), den (N_dst, H), shift (N_dst, H)) where shift is
    the per-dst subtrahend the backward pass must reuse."""
    num_rows, tr, te, wc, C = meta[:5]
    flat = bool(meta[5]) if len(meta) > 5 else False
    gather_rows = int(meta[6]) if len(meta) > 6 else 0
    (gidx_s, perm_s, lr_s, win_s, row0_s, cover_s, grow0_s,
     ordm_s) = plan_arrays
    H = er.shape[1]
    HD = z.shape[1] - H
    D = HD // H
    exact = softmax == "exact"
    out_w = HD + (2 * H if exact else H)
    out_len = wc * tr
    pad_rows = max(((num_rows + tr - 1) // tr) * tr, tr)
    erf = er.astype(jnp.float32)
    if packed:
        # ~half the gather lanes (KERNELS.md width law): bf16 features,
        # exact-f32 logits
        ztab = _pack_z(z, HD)
    else:
        ztab = z
    if not exact:
        # dense upper bound: logit <= leaky(max_u el[u] + er[v]) (leaky
        # monotone) => exp(logit - c) <= 1; softmax is shift-invariant
        elmax = jnp.max(z[:, HD:], axis=0) if z.shape[0] else \
            jnp.zeros((H,), jnp.float32)
        craw = elmax[None, :] + erf
        c = jnp.where(craw >= 0, craw, np.float32(slope) * craw)
    if C == 0:
        zero = jnp.zeros((num_rows, HD), jnp.float32)
        return (zero, jnp.zeros((num_rows, H), jnp.float32),
                c if not exact else jnp.full((num_rows, H), _NEG))
    bc = win_s.shape[1]
    if exact:
        init = jnp.concatenate(
            [jnp.zeros((pad_rows, HD + H), jnp.float32),
             jnp.full((pad_rows, H), _NEG)], axis=1)
        er_in = erf
    else:
        init = jnp.zeros((pad_rows, out_w), jnp.float32)
        er_in = jnp.concatenate([erf, c], axis=1)
    er_pad = jnp.zeros((max(pad_rows, out_len), er_in.shape[1]),
                       jnp.float32).at[:er.shape[0]].set(er_in)

    if flat and C == 1:
        # scan-free single-kernel path (flat plan: absolute windows,
        # row0 = 0, wc covers all output windows)
        gidx, perm, lr, win, _, cover, _, _ = (a[0] for a in plan_arrays)
        zg = ztab[gidx]
        wg = None
        if w is not None:
            wg = (w[jnp.minimum(perm, E - 1)].astype(jnp.float32)
                  * (perm < E)[:, None])
        out = _gat_chunk_call(win, lr, zg, er_pad[:out_len], wg, tr=tr,
                              te=te, bc=bc, wc=wc, H=H, D=D, slope=slope,
                              mode=mode, softmax=softmax)
        rowmask = jnp.repeat(cover, tr, total_repeat_length=out_len)[:, None]
        if exact:
            empty = jnp.concatenate(
                [jnp.zeros((1, HD + H), jnp.float32),
                 jnp.full((1, H), _NEG)], axis=1)
            acc = jnp.where(rowmask, out, empty)
        else:
            acc = jnp.where(rowmask, out, 0.0)
        acc = acc[:num_rows]
        num, den = acc[:, :HD], acc[:, HD:HD + H]
        shift = acc[:, HD + H:] if exact else c
        rst = num / jnp.repeat(jnp.where(den > 0, den, 1.0), D, axis=1,
                               total_repeat_length=HD)
        return rst, den, shift

    # chunked path: in-kernel merge into the full-size aliased
    # accumulator at ABSOLUTE windows (online-softmax combine in 'exact',
    # plain add in 'shift') — no XLA overlap-add glue
    er_full = er_pad[:pad_rows]

    def body(acc, xs):
        gidx, perm, lr, win, row0, cover, grow0, _om = xs
        if gather_rows:
            # src-bucketed chunk: gather z from a small slice (fast-gather
            # regime, see spmm_kernel.SegmentPlan docstring)
            ztbl = jax.lax.dynamic_slice(
                ztab, (grow0, 0),
                (min(gather_rows, ztab.shape[0]), ztab.shape[1]))
            zg = ztbl[gidx]
        else:
            zg = ztab[gidx]
        wg = None
        if w is not None:
            wg = (w[jnp.minimum(perm, E - 1)].astype(jnp.float32)
                  * (perm < E)[:, None])
        win_abs = win + row0 // tr
        acc = _gat_chunk_call(win_abs, lr, zg, er_full, wg, tr=tr, te=te,
                              bc=bc, wc=wc, H=H, D=D, slope=slope,
                              mode=mode, softmax=softmax, acc=acc)
        return acc, None

    if C == 1:
        acc, _ = body(init, tuple(a[0] for a in plan_arrays))
    else:
        acc, _ = jax.lax.scan(body, init, tuple(plan_arrays))
    acc = acc[:num_rows]
    num, den = acc[:, :HD], acc[:, HD:HD + H]
    shift = acc[:, HD + H:] if exact else c
    rst = num / jnp.repeat(jnp.where(den > 0, den, 1.0), D, axis=1,
                           total_repeat_length=HD)
    return rst, den, shift


# ---------------------------------------------------------------------------
# in-kernel fused backward (round 5): aw/draw computed per slot in VMEM
# ---------------------------------------------------------------------------
def _gat_bwd_kernel(window_ref, lr_ref, nrev_ref, z_ref, *rest, tr: int,
                    te: int, H: int, D: int, slope: float, mode: str,
                    has_w: bool, has_acc: bool):
    """One reverse-plan pass computing the WHOLE GAT backward edge phase.

    The reverse plan's windows are src-major, so the (HD+H)-wide z rows
    the daw dot needs (fs = Wh[src], el[src]) are exactly this block's
    OUTPUT-window rows: z rides in as a window-indexed BlockSpec input
    (contiguous rows — no gather) and is expanded to slots by the same
    one-hot MXU matmul the forward uses.  The slot gather carries
    node_rev = [dout || er || m || den || sds] (HD+4H lanes; +3H over the
    round-4 [dout || 1], ~free by the width law).  Per slot the kernel
    recomputes a, daw, dlogit, draw and

      * accumulates dz contributions  S @ [dout * expand(aw) || draw]
        into the src-window output (same accumulate discipline as the
        forward kernels), and
      * emits compact per-slot [draw || dw] (2H lanes) for the XLA-side
        der segment-sum / dw scatter.

    This removes the round-4 backward's two wide per-edge gathers
    (zsrc at HD+H, zdst at HD+4H lanes) and the materialised per-edge
    daw/premultiply passes (KERNELS.md round-4 design note).  Mirrors the
    reference's fully-fused backward family
    (src/kernel/cuda/binary_reduce_impl.cu:124-309 BackwardGatFused*).
    """
    rest = list(rest)
    w_ref = rest.pop(0) if has_w else None
    acc_ref = rest.pop(0) if has_acc else None
    if len(rest) == 2:
        dz_ref, e_ref = rest
    else:
        (dz_ref,), e_ref = rest, None       # measurement-only variant
    HD = H * D
    b = pl.program_id(0)
    lr = lr_ref[jax.lax.rem(b, 8), :]                        # (TE,)
    rows = jax.lax.broadcasted_iota(jnp.int32, (tr, te), 0)
    S = rows == lr[None, :]                                  # (TR, TE)
    lr_col = jnp.broadcast_to(lr[:, None], (te, tr))
    St = lr_col == jax.lax.broadcasted_iota(jnp.int32, (te, tr), 1)
    validH = jnp.broadcast_to(lr[:, None], (te, H)) < tr     # (TE, H)

    # slot-expand this window's z rows: fs (TE, HD), el_s (TE, H)
    fe = _mxu_sel(St, z_ref[:], mode)
    fs, el_s = fe[:, :HD], fe[:, HD:]
    nv = nrev_ref[:]                                         # (TE, HD+4H)
    do_d = nv[:, :HD]
    er_d = nv[:, HD:HD + H]
    m_d = nv[:, HD + H:HD + 2 * H]
    l_d = nv[:, HD + 2 * H:HD + 3 * H]
    sds_d = nv[:, HD + 3 * H:]

    raw = el_s + er_d
    logit = jnp.where(raw >= 0, raw, np.float32(slope) * raw)
    # real edges have logit <= m (m is the softmax max/upper bound); pad
    # slots gather SPREAD table rows (garbage) — clamp the exponent so
    # exp stays finite, then mask.  Padded dst rows carry m = -1e30.
    a = jnp.exp(jnp.minimum(logit - m_d, np.float32(60.0)))
    a = a / jnp.where(l_d > 0, l_d, 1.0)
    a = jnp.where(validH, a, 0.0)

    # daw[e, h] = <fs_eh, dout_dst(e)h>: lane-reduce per head via one-hot
    lane_r = jax.lax.broadcasted_iota(jnp.int32, (HD, H), 0) // D
    head_r = jax.lax.broadcasted_iota(jnp.int32, (HD, H), 1)
    Rt = lane_r == head_r                                    # (HD, H)
    daw = _mxu_sel_t(fs * do_d, Rt, mode)                    # (TE, H)
    if has_w:
        wv = w_ref[:]
        aw, da, dwv = a * wv, daw * wv, a * daw
    else:
        aw, da, dwv = a, daw, jnp.zeros_like(a)
    dlogit = a * (da - sds_d)
    draw = dlogit * jnp.where(raw >= 0, 1.0, np.float32(slope))
    draw = jnp.where(validH, draw, 0.0)
    if e_ref is not None:
        e_ref[:] = jnp.concatenate([draw, dwv], axis=1)      # (TE, 2H)

    # dz contribution: [dout * expand_D(aw) || draw] reduced to src rows
    lane_h = jax.lax.broadcasted_iota(jnp.int32, (H, HD), 1) // D
    head_h = jax.lax.broadcasted_iota(jnp.int32, (H, HD), 0)
    R = lane_h == head_h                                     # (H, HD)
    aw_exp = _mxu_sel_t(aw, R, mode)                         # (TE, HD)
    msg = jnp.concatenate([do_d * aw_exp, draw], axis=1)     # (TE, HD+H)
    contrib = _mxu_sel(S, msg, mode)                         # (TR, HD+H)

    prev = window_ref[jnp.maximum(b - 1, 0)]
    is_first = jnp.logical_or(b == 0, window_ref[b] != prev)

    @pl.when(is_first)
    def _():
        dz_ref[:] = (acc_ref[:] + contrib) if has_acc else contrib

    @pl.when(jnp.logical_not(is_first))
    def _():
        dz_ref[:] = dz_ref[:] + contrib


def _gat_bwd_call(win: Array, lr: Array, nrev: Array, z_pad: Array,
                  w_slot: Optional[Array], *, tr: int, te: int, bc: int,
                  wc: int, H: int, D: int, slope: float, mode: str,
                  acc: Optional[Array] = None, emit_edges: bool = True):
    """One chunk of the fused backward.  Returns (dz_acc, edge_out) where
    edge_out is (bc*te, 2H) per-slot [draw || dw].  ``win`` carries
    ABSOLUTE window ids (both the flat and the accumulating chunked plans
    do); z_pad is the full (padded) z table, block-indexed per window."""
    HD = H * D
    zw = HD + H
    nw = nrev.shape[1]
    in_specs = [
        pl.BlockSpec((8, te), lambda b, w: (b // 8, 0)),
        pl.BlockSpec((te, nw), lambda b, w: (b, 0)),
        pl.BlockSpec((tr, zw), lambda b, w: (w[b], 0)),
    ]
    operands = [lr, nrev, z_pad]
    if w_slot is not None:
        in_specs.append(pl.BlockSpec((te, H), lambda b, w: (b, 0)))
        operands.append(w_slot)
    aliases = {}
    if acc is not None:
        in_specs.append(pl.BlockSpec((tr, zw), lambda b, w: (w[b], 0)))
        operands.append(acc)
        # alias indices count the scalar-prefetch operand (win at 0)
        aliases = {len(operands): 0}
        dz_shape = jax.ShapeDtypeStruct(acc.shape, jnp.float32)
    else:
        dz_shape = jax.ShapeDtypeStruct((wc * tr, zw), jnp.float32)
    out_specs = [pl.BlockSpec((tr, zw), lambda b, w: (w[b], 0))]
    out_shape = [dz_shape]
    if emit_edges:
        out_specs.append(pl.BlockSpec((te, 2 * H), lambda b, w: (b, 0)))
        out_shape.append(
            jax.ShapeDtypeStruct((bc * te, 2 * H), jnp.float32))
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bc,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    out = pl.pallas_call(
        functools.partial(_gat_bwd_kernel, tr=tr, te=te, H=H, D=D,
                          slope=slope, mode=mode,
                          has_w=w_slot is not None, has_acc=acc is not None),
        grid_spec=grid,
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(win, *operands)
    return out if emit_edges else (out[0], None)


def _run_gat_bwd_fused(plan_arrays: Sequence[Array], meta, node_rev: Array,
                       z: Array, w: Optional[Array], E: int, slope: float,
                       mode: str, H: int, D: int, variant: str = "full",
                       rev_inv: Optional[Array] = None):
    """Drive the fused backward over the reverse plan (flat or chunked,
    optionally src-bucketed).  Returns (dz (N_src, HD+H) f32,
    draw_e (E, H) f32 in edge order, dw_e (E, H) f32 in edge order).

    Per-slot [draw || dw] kernel outputs come back to EDGE order via one
    GATHER through ``rev_inv`` (edge -> flat slot, prepare_spmm's 17th
    plan array) — an XLA row scatter costs ~20 ns/row on TPU (measured
    round 5: it alone made the fused backward SLOWER than compact,
    115.8 vs 38.4 ns/edge driver-level) while the gather runs at the
    engine's ~4.7.  Without rev_inv a single post-hoc scatter is used
    (measurement / legacy path only — dispatch falls back to 'compact').

    variant: measurement-only knobs for the component accounting —
    'noscatter' emits the per-slot edge output but skips the edge-order
    reorder; 'noemit' drops the second kernel output entirely (both
    return zero draw/dw)."""
    emit = variant != "noemit"
    reorder = variant == "full"
    slots_out = variant == "slots"   # return the flat slot buffer +
    # appended zero row (the der-plan path reduces it directly)
    if slots_out:
        emit, reorder = True, False
    num_rows, tr, te, wc, C = meta[:5]
    flat = bool(meta[5]) if len(meta) > 5 else False
    gather_rows = int(meta[6]) if len(meta) > 6 else 0
    HD = H * D
    zw = HD + H
    de = jnp.zeros((E, 2 * H), jnp.float32)
    if C == 0 or E == 0:
        dz0 = jnp.zeros((num_rows, zw), jnp.float32)
        if slots_out:
            return dz0, jnp.zeros((1, 2 * H), jnp.float32)
        return dz0, de[:, :H], de[:, H:]

    def slot_w(perm):
        if w is None:
            return None
        return (w[jnp.minimum(perm, E - 1)].astype(jnp.float32)
                * (perm < E)[:, None])

    def edge_order(eflat, perm_all):
        # eflat: (slots_total, 2H) per-slot values, chunk-major
        if rev_inv is not None:
            ep = jnp.concatenate(
                [eflat, jnp.zeros((1, 2 * H), jnp.float32)], axis=0)
            return ep[rev_inv]          # sentinel -> the zero row
        return de.at[perm_all].set(eflat, mode="drop")

    bc = plan_arrays[3].shape[1]
    if flat and C == 1:
        out_len = wc * tr
        z_pad = jnp.zeros((out_len, zw), jnp.float32).at[:z.shape[0]].set(z)
        gidx, perm, lr, win, _, cover, _, _ = (a[0] for a in plan_arrays)
        nrev_g = node_rev[gidx]
        out, eout = _gat_bwd_call(win, lr, nrev_g, z_pad, slot_w(perm),
                                  tr=tr, te=te, bc=bc, wc=wc, H=H, D=D,
                                  slope=slope, mode=mode, emit_edges=emit)
        rowmask = jnp.repeat(cover, tr, total_repeat_length=out_len)[:, None]
        dz = jnp.where(rowmask, out, 0.0)[:num_rows]
        if slots_out:
            return dz, jnp.concatenate(
                [eout, jnp.zeros((1, 2 * H), jnp.float32)], axis=0)
        if reorder:
            de = edge_order(eout, perm)
        return dz, de[:, :H], de[:, H:]

    pad_rows = max(((num_rows + tr - 1) // tr) * tr, tr)
    z_pad = jnp.zeros((pad_rows, zw), jnp.float32).at[:z.shape[0]].set(z)
    init = jnp.zeros((pad_rows, zw), jnp.float32)

    def body(acc, xs):
        gidx, perm, lr, win, row0, cover, grow0, _om = xs
        if gather_rows:
            tbl = jax.lax.dynamic_slice(
                node_rev, (grow0, 0),
                (min(gather_rows, node_rev.shape[0]), node_rev.shape[1]))
            nrev_g = tbl[gidx]
        else:
            nrev_g = node_rev[gidx]
        win_abs = win + row0 // tr
        acc, eout = _gat_bwd_call(win_abs, lr, nrev_g, z_pad, slot_w(perm),
                                  tr=tr, te=te, bc=bc, wc=wc, H=H, D=D,
                                  slope=slope, mode=mode, acc=acc,
                                  emit_edges=emit)
        if eout is None:
            eout = jnp.zeros((0, 2 * H), jnp.float32)
        return acc, eout

    if C == 1:
        acc, eout = body(init, tuple(a[0] for a in plan_arrays))
        eflat = eout
        perm_flat = plan_arrays[1][0]
    else:
        acc, eouts = jax.lax.scan(body, init, tuple(plan_arrays))
        eflat = eouts.reshape(-1, 2 * H) if emit else None
        perm_flat = plan_arrays[1].reshape(-1)
    if slots_out:
        return acc[:num_rows], jnp.concatenate(
            [eflat, jnp.zeros((1, 2 * H), jnp.float32)], axis=0)
    if reorder:
        de = edge_order(eflat, perm_flat)
    return acc[:num_rows], de[:, :H], de[:, H:]


# ---------------------------------------------------------------------------
# custom VJP
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(0, 1, 2, 3, 4, 5, 6, 7))
def _gat_fused(meta_fwd, meta_rev, slope, has_w, mode, softmax, packed,
               bwd_impl, z, er, w, src, dst, mask, rev_inv, der_gidx,
               *plan_arrays):
    # mask: (E,) f32 edge mask (padded graphs; zero-size = no mask).  The
    # forward never reads it (mask-aware plans skip padded slots); the
    # backward zeroes padded-edge logit grads before the dense segment sum
    rst, _, _ = _run_gat_fwd(plan_arrays[:N_PLAN_ARRAYS], meta_fwd, z, er,
                             w if has_w else None, src.shape[0], slope,
                             mode, softmax, packed)
    return rst


def _gat_fused_fwd(meta_fwd, meta_rev, slope, has_w, mode, softmax, packed,
                   bwd_impl, z, er, w, src, dst, mask, rev_inv, der_gidx,
                   *plan_arrays):
    rst, den, m = _run_gat_fwd(plan_arrays[:N_PLAN_ARRAYS], meta_fwd, z, er,
                               w if has_w else None, src.shape[0], slope,
                               mode, softmax, packed)
    return rst, (z, er, w, src, dst, mask, rev_inv, der_gidx, plan_arrays,
                 rst, den, m)


def _gat_fused_bwd(meta_fwd, meta_rev, slope, has_w, mode, softmax, packed,
                   bwd_impl, res, g):
    (z, er, w, src, dst, mask, rev_inv, der_gidx, plan_arrays, rst, den,
     m) = res
    E = src.shape[0]
    H = er.shape[1]
    HD = z.shape[1] - H
    D = HD // H
    N_dst = er.shape[0]
    dout = g.astype(jnp.float32)

    # sds[v] = sum_h' <rst_vh, dout_vh> per head (dense)
    sds = (rst.reshape(N_dst, H, D) * dout.reshape(N_dst, H, D)).sum(-1)

    if bwd_impl == "fused":
        # in-kernel aw/draw backward (round 5): no per-edge z gathers, no
        # materialised per-edge passes — one reverse-plan kernel computes
        # everything and emits compact [draw || dw] for der/dw
        zt = z
        if packed:
            # differentiate the bf16-feature function the forward ran
            zt = jnp.concatenate(
                [z[:, :HD].astype(jnp.bfloat16).astype(jnp.float32),
                 z[:, HD:]], axis=1)
        node_rev = jnp.concatenate(
            [dout, er.astype(jnp.float32), m, den, sds], axis=1)
        if not has_w and der_gidx.shape[0]:
            # der-plan path: der reduces the rev pass's SLOT buffer
            # directly through the fwd plan (gidx = rev_inv o fwd_perm,
            # precomputed host-side) — no (E, 2H) edge-order
            # materialisation, no dense segment-sum.  Padded edges of
            # masked graphs are absent from BOTH plans by construction.
            dz_f, eflat = _run_gat_bwd_fused(
                plan_arrays[N_PLAN_ARRAYS:2 * N_PLAN_ARRAYS], meta_rev,
                node_rev, zt, None, E, slope, mode, H, D,
                variant="slots")
            fwd_arr = plan_arrays[:N_PLAN_ARRAYS]
            der_arr = (der_gidx,) + tuple(fwd_arr[1:])
            meta_der = tuple(meta_fwd[:5]) + (
                bool(meta_fwd[5]) if len(meta_fwd) > 5 else False,
                0, None)
            der_full = _run_direction(der_arr, meta_der, eflat, None, 0,
                                      mode)
            der = der_full[:, :H].astype(er.dtype)
            dw = jnp.zeros_like(w)
        else:
            dz_f, draw_e, dw_e = _run_gat_bwd_fused(
                plan_arrays[N_PLAN_ARRAYS:2 * N_PLAN_ARRAYS], meta_rev,
                node_rev, zt, w if has_w else None, E, slope, mode, H, D,
                rev_inv=rev_inv if rev_inv.shape[0] else None)
            if mask.shape[0]:
                draw_e = draw_e * mask[:, None]
            der = jax.ops.segment_sum(
                draw_e, dst, N_dst,
                indices_are_sorted=True).astype(er.dtype)
            dw = dw_e.astype(w.dtype) if has_w else jnp.zeros_like(w)
        zeros = tuple(np.zeros(a_.shape, jax.dtypes.float0)
                      for a_ in plan_arrays)
        return (dz_f.astype(z.dtype), der, dw,
                np.zeros(src.shape, jax.dtypes.float0),
                np.zeros(dst.shape, jax.dtypes.float0),
                np.zeros(mask.shape, jax.dtypes.float0),
                np.zeros(rev_inv.shape, jax.dtypes.float0),
                np.zeros(der_gidx.shape, jax.dtypes.float0)) + zeros

    # legacy paths (A/B): two fused edge gathers; cost scales with LANE
    # count (width law), so 'pack' bf16-packs the HD FEATURE lanes of
    # both gathers into u32 pairs (fs and do_d feed only the daw dot —
    # the features-tolerate-bf16 argument of the packed forward applied
    # to the backward; every logit/softmax-stat lane stays exact f32 via
    # same-width bitcast).  520 -> 292 and 544 -> 288 lanes at H=8/D=64.
    bwd_pack = bwd_impl == "pack" and HD % 2 == 0
    if packed and not bwd_pack:
        # the forward consumed bf16-quantized FEATURES (logits stayed
        # f32): differentiate that function (straight-through).  The
        # packed-gather path quantizes identically inside _pack_z.
        z = jnp.concatenate(
            [z[:, :HD].astype(jnp.bfloat16).astype(jnp.float32),
             z[:, HD:]], axis=1)
    if bwd_pack:
        fs, el_s = _unpack_z(_pack_z(z, HD)[src], HD, H)
        nd = jnp.concatenate(
            [dout, er.astype(jnp.float32), m, den, sds], axis=1)
        do_d, tail = _unpack_z(_pack_z(nd, HD)[dst], HD, 4 * H)
        er_d = tail[:, :H]
        m_d = tail[:, H:2 * H]
        l_d = tail[:, 2 * H:3 * H]
        sds_d = tail[:, 3 * H:]
    else:
        zsrc = z[src].astype(jnp.float32)                     # (E, HD+H)
        zdst = jnp.concatenate(
            [dout, er.astype(jnp.float32), m, den, sds], axis=1)[dst]
        fs, el_s = zsrc[:, :HD], zsrc[:, HD:]
        do_d = zdst[:, :HD]
        er_d = zdst[:, HD:HD + H]
        m_d = zdst[:, HD + H:HD + 2 * H]
        l_d = zdst[:, HD + 2 * H:HD + 3 * H]
        sds_d = zdst[:, HD + 3 * H:]

    raw = el_s + er_d
    logit = jnp.where(raw >= 0, raw, np.float32(slope) * raw)
    a = jnp.exp(logit - m_d) / jnp.where(l_d > 0, l_d, 1.0)   # (E, H)
    daw = (fs.reshape(E, H, D) * do_d.reshape(E, H, D)).sum(-1)
    if has_w:
        wf = w.astype(jnp.float32)
        aw, da, dw = a * wf, daw * wf, (a * daw).astype(w.dtype)
    else:
        aw, da, dw = a, daw, jnp.zeros_like(w)
    dlogit = a * (da - sds_d)
    draw = dlogit * jnp.where(raw >= 0, 1.0, np.float32(slope))
    if mask.shape[0]:
        # padded edges carry garbage (src/dst point at filler rows); the
        # plan-driven reductions skip them by construction, but der's
        # dense segment sum below must not see them
        draw = draw * mask[:, None]

    # der[v] = sum_{e->v} draw_e  (dst-sorted segment sum)
    der = jax.ops.segment_sum(draw, dst, N_dst,
                              indices_are_sorted=True).astype(er.dtype)

    # one reverse-plan pass: [d(Wh) || d(el)] = reduce_u [dout || 1] * [aw || draw]
    node_rev = jnp.concatenate(
        [dout, jnp.ones((N_dst, H), jnp.float32)], axis=1)
    if bwd_impl == "wide":
        # legacy wide path (A/B): materialise (E, HD+H) w_rev and let
        # the kernel gather it at full width
        w_rev = jnp.concatenate(
            [jnp.repeat(aw, D, axis=1, total_repeat_length=HD), draw],
            axis=1)
        out_rev = _run_direction(
            plan_arrays[N_PLAN_ARRAYS:2 * N_PLAN_ARRAYS], meta_rev,
            node_rev, w_rev, E, mode)
    else:
        # compact (E, 2H) weights, expanded across D lanes IN VMEM
        # (w_kind='head') — skips the 3.3 GB w_rev materialisation and
        # the 520-lane slot gather (KERNELS.md round 4)
        w_compact = jnp.concatenate([aw, draw], axis=1)       # (E, 2H)
        out_rev = _run_direction(
            plan_arrays[N_PLAN_ARRAYS:2 * N_PLAN_ARRAYS], meta_rev,
            node_rev, w_compact, E, mode, w_head=(H, D))
    dz = out_rev.astype(z.dtype)

    zeros = tuple(np.zeros(a_.shape, jax.dtypes.float0) for a_ in plan_arrays)
    return (dz, der, dw,
            np.zeros(src.shape, jax.dtypes.float0),
            np.zeros(dst.shape, jax.dtypes.float0),
            np.zeros(mask.shape, jax.dtypes.float0),
            np.zeros(rev_inv.shape, jax.dtypes.float0),
            np.zeros(der_gidx.shape, jax.dtypes.float0)) + zeros


_gat_fused.defvjp(_gat_fused_fwd, _gat_fused_bwd)

_gat_fused_jit = jax.jit(_gat_fused,
                         static_argnums=(0, 1, 2, 3, 4, 5, 6, 7))


def gat_attention_pallas(plan_meta, plan_arrays: Sequence[Array],
                         src: Array, dst: Array, fsrc: Array, el: Array,
                         er: Array, attn_w: Optional[Array] = None,
                         negative_slope: float = 0.2,
                         mode: str = "f32x2",
                         softmax: str = "shift",
                         packed: bool = False,
                         edge_mask: Optional[Array] = None,
                         bwd_impl: str = "auto") -> Array:
    """Fused GAT edge phase: softmax_dst(leaky_relu(el[u]+er[v])) * Wh[u],
    summed over incoming edges.

    fsrc (N_src, H, D); el (N_src, H); er (N_dst, H);
    attn_w optional (E, H) post-softmax multiplier (attention dropout) in
    internal edge order.  Returns (N_dst, H, D) in fsrc.dtype.

    bwd_impl picks the backward: 'fused' (in-kernel aw/draw, default),
    'compact' (round-4 w_kind='head'), 'wide', 'pack' — 'auto' resolves
    from the DGL_TPU_GAT_BWD_* env flags HERE (a static jit argument, so
    flipping the flag between calls retraces instead of silently reusing
    the old backward — the round-4 footgun the advisor flagged).
    """
    meta_fwd, meta_rev = plan_meta[0], plan_meta[1]
    N_src, H, D = fsrc.shape
    if bwd_impl == "auto":
        from ...utils.env import get_config
        bwd_impl = get_config().gat_bwd
    if bwd_impl == "fused" and len(meta_rev) > 7 and meta_rev[7] is not None:
        # flat-BUCKETED rev plans keep the m buffer bucket-major (ordm
        # walk) — not wired into the fused backward; use the round-4 path
        bwd_impl = "compact"
    # the 17th/18th plan arrays (prepare_spmm round 5): edge -> rev slot
    # (turns the fused backward's edge-order reorder into a GATHER; an
    # XLA row scatter costs ~20 ns/row) and the fwd-plan der gather
    # indices (der reduces the rev slot buffer directly).  Fall back to
    # the round-4 compact path when absent.
    rev_inv = (plan_arrays[2 * N_PLAN_ARRAYS]
               if len(plan_arrays) > 2 * N_PLAN_ARRAYS else None)
    der_gidx = (plan_arrays[2 * N_PLAN_ARRAYS + 1]
                if len(plan_arrays) > 2 * N_PLAN_ARRAYS + 1 else None)
    plan_arrays = plan_arrays[:2 * N_PLAN_ARRAYS]
    if bwd_impl == "fused" and rev_inv is None:
        bwd_impl = "compact"
    if rev_inv is None:
        rev_inv = jnp.zeros((0,), jnp.int32)
    if der_gidx is None:
        der_gidx = jnp.zeros((0,), jnp.int32)
    z = jnp.concatenate(
        [fsrc.reshape(N_src, H * D).astype(jnp.float32),
         el.astype(jnp.float32)], axis=1)
    packed = packed and (H * D) % 2 == 0   # feature half-pack needs even HD
    has_w = attn_w is not None
    w = attn_w if has_w else jnp.zeros((0, H), fsrc.dtype)
    mk = jnp.zeros((0,), jnp.float32) if edge_mask is None \
        else edge_mask.astype(jnp.float32)
    rst = _gat_fused_jit(meta_fwd, meta_rev, float(negative_slope), has_w,
                         mode, softmax, packed, bwd_impl, z,
                         er.astype(jnp.float32),
                         w, src, dst, mk, rev_inv, der_gidx, *plan_arrays)
    return rst.astype(fsrc.dtype).reshape(-1, H, D)
