"""Fused GAT attention op with automatic Pallas/XLA dispatch.

One public function covers the fork's fused-GAT feature
(gatExpLeakyReluSum + gatSumProdZipDiv, reference:
src/kernel/cuda/binary_reduce_impl.cu:52,87): when the graph carries a
Pallas block plan (``prepare_spmm``) and the shape fits, the flash-softmax
kernel (ops/pallas/gat_kernel.py) runs the whole edge phase in one gather
per edge; otherwise the composed XLA path (gsddmm + edge_softmax + gspmm)
is used.  Both are differentiable and agree to kernel tolerance.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .edge_softmax import edge_softmax
from .sddmm import gsddmm
from .spmm import gspmm

Array = jax.Array

# VMEM guard: per-block z tile is TE x (H*D+H) f32, double-buffered
_MAX_FUSED_WIDTH = 2048


def _fused_eligible(g, fsrc, el, er) -> bool:
    from ..utils.env import dispatch_log, get_config
    if get_config().disable_pallas:
        return False
    if getattr(g, "spmm_plan_arrays", None) is None:
        return False
    from .pallas.spmm_kernel import flat_plans_fit, plan_info
    if g.edge_mask is not None and not plan_info(g.spmm_plan_meta).masked:
        # padded graph with non-mask-aware plans: the kernel would reduce
        # padding slots; composed path handles the mask
        return False
    if fsrc.ndim != 3 or el.ndim != 2 or er.ndim != 2:
        return False
    H, D = fsrc.shape[1], fsrc.shape[2]
    if H * D + 2 * H > _MAX_FUSED_WIDTH:
        return False
    if not flat_plans_fit(g.spmm_plan_meta, g.spmm_plan_arrays,
                          H * D + 2 * H):
        dispatch_log("gat", "composed",
                     "flat plan message buffer over budget at z width "
                     f"{H * D + 2 * H}; prepare with flat=False")
        return False
    # flat-BUCKETED plans (window-major ordm layout) are not wired into
    # the GAT kernel's flat path; prepare with flat=False for bucketed
    # GAT (the chunked-bucketed layout is the measured-faster one there
    # anyway — KERNELS.md round 3)
    for m in g.spmm_plan_meta[:2]:
        if len(m) > 7 and m[7] is not None:
            dispatch_log("gat", "composed",
                         "flat-bucketed plan not supported by the fused "
                         "kernel; prepare with flat=False")
            return False
    return all(jnp.issubdtype(jnp.result_type(t), jnp.floating)
               for t in (fsrc, el, er))


def gat_attention(g, fsrc: Array, el: Array, er: Array,
                  negative_slope: float = 0.2,
                  attn_w: Optional[Array] = None) -> Array:
    """out[v] = sum_{e=(u,v)} softmax_v(leaky_relu(el[u] + er[v]))_e
    * attn_w[e] * fsrc[u].

    fsrc (N_src, H, D), el (N_src, H), er (N_dst, H); ``attn_w`` is an
    optional post-softmax per-edge multiplier (attention dropout) of shape
    (E, H) in internal edge order.  Returns (N_dst, H, D).
    """
    if _fused_eligible(g, fsrc, el, er):
        from ..utils.env import dispatch_log, get_config
        from .pallas.gat_kernel import gat_attention_pallas
        from .pallas.spmm_kernel import plan_info
        from .spmm import _plan_kind, _warn_bucket_width
        cfg = get_config()
        H, D = fsrc.shape[1], fsrc.shape[2]
        zw = H * D + 2 * H
        _warn_bucket_width(g.spmm_plan_meta, plan_info(g.spmm_plan_meta),
                           jnp.zeros((1, zw), jnp.float32), "gat_attention")
        dispatch_log("gat", _plan_kind("fused", g.spmm_plan_meta),
                     f"H={H} D={D} softmax={cfg.gat_softmax} "
                     f"packed={cfg.gat_packed}")
        if attn_w is not None and g.edge_mask is not None:
            attn_w = attn_w * g.edge_mask[:, None].astype(attn_w.dtype)
        return gat_attention_pallas(
            g.spmm_plan_meta, g.spmm_plan_arrays, g.src, g.dst, fsrc, el,
            er, attn_w, negative_slope, mode=cfg.spmm_mode,
            softmax=cfg.gat_softmax, packed=cfg.gat_packed,
            edge_mask=g.edge_mask)
    from ..utils.env import dispatch_log
    dispatch_log("gat", "composed", "no eligible plan")
    # composed XLA fallback (also the test oracle)
    e = gsddmm(g, "add", el[:, :, None], er[:, :, None], "u", "v")
    e = jax.nn.leaky_relu(e, negative_slope)
    a = edge_softmax(g, e)                                   # (E, H, 1)
    if attn_w is not None:
        a = a * attn_w[:, :, None]
    return gspmm(g, "mul", "sum", fsrc, a, "u", "e")
