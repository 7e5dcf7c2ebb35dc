"""gSDDMM — sampled dense-dense ops producing per-edge values.

TPU-native replacement for the reference's edge-output "binary reduce with
reducer=none" path (reference: src/kernel/binary_reduce.cc:295 with
``reducer="none"``; scheduled via schedule_apply_edges,
python/dgl/runtime/scheduler.py:334).  The classic instance is the GAT
attention-logit computation ``u_add_v`` (reference:
nn/pytorch/conv/gatconv.py:152).

Dst-side ('v') operands dispatch to the fused Pallas kernel
(ops/pallas/sddmm_kernel.py) when the graph carries plans
(prepare_spmm): the dst rows are read DENSELY per window instead of
gathered per edge — half the issue-bound gather traffic for u-op-v, and
ZERO gathers for e-op-v / copy_v.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .common import apply_binary, gather_edge_operand

Array = jax.Array

_PALLAS_OPS = ("add", "sub", "mul", "div", "dot", "copy_rhs")


def _pallas_sddmm_eligible(g, op, lhs_data, rhs_data, lhs_target) -> bool:
    from ..utils.env import get_config
    cfg = get_config()
    if cfg.disable_pallas or not cfg.sddmm_kernel:
        # OFF by default: measured on v5e, XLA's composed path (gathers
        # fused with the combine and the (E, F) write) beats the fused
        # dense-window kernel across its eligible range — copy_v 1.75 vs
        # 5.88, u_add_v 3.72 vs 7.89, u_dot_v 5.18 vs 7.22 ns/edge at
        # N=200k/E=3.2M (KERNELS.md round 3).  DGL_TPU_SDDMM_KERNEL=1
        # re-enables for study.
        return False
    if getattr(g, "sddmm_plan_arrays", None) is None \
            or g.edge_mask is not None:
        return False
    if op not in _PALLAS_OPS or lhs_target not in ("u", "e", None):
        return False
    if not jnp.issubdtype(jnp.result_type(rhs_data), jnp.floating):
        return False
    if op != "copy_rhs":
        if not jnp.issubdtype(jnp.result_type(lhs_data), jnp.floating):
            return False
        # the kernel combines equal-width operands (no broadcast logic)
        if lhs_data.shape[1:] != rhs_data.shape[1:]:
            return False
        if op == "dot" and lhs_data.ndim not in (2, 3):
            return False          # (N, H, D) multi-head handled in-kernel
    # gathered-message buffer budget (the 'u' slot gather is (nb*te, F))
    from .pallas.spmm_kernel import FLAT_MAX_BYTES
    from ..utils.env import dispatch_log
    width = int(np.prod(rhs_data.shape[1:])) if rhs_data.ndim > 1 else 1
    nb = g.sddmm_plan_meta[4]
    te = g.sddmm_plan_meta[3]
    if nb * te * max(width, 1) * 4 > FLAT_MAX_BYTES:
        # this fallback used to be SILENT and once made an A/B surface
        # bench measure the composed path against itself (KERNELS.md
        # round 3 "16.8 == 16.8") — always say so now
        dispatch_log("gsddmm", "composed",
                     f"kernel requested but (nb*te, {width}) message "
                     "buffer exceeds the 2 GB budget")
        return False
    return True


def gsddmm(g, op: str,
           lhs_data: Optional[Array] = None,
           rhs_data: Optional[Array] = None,
           lhs_target: str = "u", rhs_target: str = "v",
           out_order: str = "internal") -> Array:
    """out[e=(u,v)] = op(lhs[lhs_target], rhs[rhs_target]).

    Returns per-edge values in internal (CSC) order by default — ready to
    feed gspmm / edge_softmax without a permutation.  Pass
    ``out_order='eid'`` to get user insertion order (DGL parity).
    """
    # normalise so a 'v' operand (if any) sits on the rhs
    swap_op, swap_sign = None, False
    if lhs_target == "v" and rhs_target != "v":
        if op in ("add", "mul", "dot"):
            swap_op = op
        elif op == "sub":
            swap_op, swap_sign = "sub", True     # v-u = -(u-v)
        elif op == "copy_lhs":
            swap_op = "copy_rhs"
        if swap_op is not None:
            lhs_data, rhs_data = rhs_data, lhs_data
            lhs_target, rhs_target = rhs_target, "v"
            op = swap_op
    if rhs_target == "v" and _pallas_sddmm_eligible(
            g, op, lhs_data, rhs_data, lhs_target):
        from .pallas.sddmm_kernel import gsddmm_pallas
        from ..utils.env import dispatch_log, get_config
        dispatch_log("gsddmm", "kernel", f"{op} {lhs_target}-op-v")
        out = gsddmm_pallas(g, op, None if op == "copy_rhs" else lhs_data,
                            rhs_data, lhs_target,
                            mode=get_config().spmm_mode)
        if swap_sign:
            out = -out
        if out_order == "eid" and g.int2user is not None:
            out = out[g.user2int]
        return out
    if swap_sign:
        # undo the normalisation for the composed path
        lhs_data, rhs_data = rhs_data, lhs_data
        lhs_target, rhs_target = "v", lhs_target
    lhs = None if op == "copy_rhs" else gather_edge_operand(g, lhs_data, lhs_target)
    rhs = None if op == "copy_lhs" else gather_edge_operand(g, rhs_data, rhs_target)
    out = apply_binary(op, lhs, rhs)
    if out_order == "eid" and g.int2user is not None:
        out = out[g.user2int]
    return out
