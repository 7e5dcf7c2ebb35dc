"""Environment configuration.

Reference: DGL's env-var config surface (docs/source/env_var.rst:
DGLBACKEND, DGL_LIBRARY_PATH, DGL_DOWNLOAD_DIR, DGL_REPO).  TPU-native
equivalents:

  DGL_TPU_DOWNLOAD_DIR / DGL_DOWNLOAD_DIR  dataset cache directory
  DGL_TPU_SPMM_MODE    pallas gspmm precision: f32x2 | fast | highest
  DGL_TPU_DISABLE_PALLAS  "1" forces the XLA segment-op path
  DGL_TPU_GAT_SOFTMAX  fused-GAT shift strategy: shift | exact.  'shift'
      (default) subtracts the dense upper bound leaky(max(el)+er[v]) —
      softmax output is shift-invariant, so the result is exact unless
      per-dst logit spread exceeds ~80 (exp underflow); it matches the
      reference fork's fused GAT (no max subtraction at all) and skips
      the online-max machinery.  'exact' runs the flash-style running
      max (robust to any logit spread).
"""
from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass
class Config:
    download_dir: str
    spmm_mode: str = "f32x2"
    disable_pallas: bool = False
    gat_softmax: str = "shift"
    gat_packed: bool = False
    gat_bwd: str = "fused"
    no_rewrite: bool = False
    sddmm_kernel: bool = False
    debug_dispatch: bool = False


def get_config() -> Config:
    return Config(
        download_dir=os.environ.get(
            "DGL_TPU_DOWNLOAD_DIR",
            os.environ.get("DGL_DOWNLOAD_DIR",
                           os.path.join(os.path.expanduser("~"),
                                        ".dgl_tpu"))),
        spmm_mode=os.environ.get("DGL_TPU_SPMM_MODE", "f32x2"),
        disable_pallas=os.environ.get("DGL_TPU_DISABLE_PALLAS", "0") == "1",
        gat_softmax=os.environ.get("DGL_TPU_GAT_SOFTMAX", "shift"),
        # bf16-packed z gather in the fused GAT kernel: ~1.45x on the
        # dominant gather (KERNELS.md width law) at bf16 input precision
        gat_packed=os.environ.get("DGL_TPU_GAT_PACKED", "0") == "1",
        # fused-GAT backward implementation (resolved to ONE static string
        # so it rides the jit cache key instead of being read at trace
        # time — the round-4 env-flag footgun).  Default 'fused': the
        # in-kernel aw/draw backward (round 5).  Legacy A/B paths:
        #   DGL_TPU_GAT_BWD_FUSED=0  -> 'compact' (round-4 w_kind='head')
        #   DGL_TPU_GAT_BWD_WIDE=1   -> 'wide'    (materialised w_rev)
        #   DGL_TPU_GAT_BWD_PACK=1   -> 'pack'    (compact + packed gathers)
        gat_bwd=("wide" if os.environ.get("DGL_TPU_GAT_BWD_WIDE") == "1"
                 else "pack" if os.environ.get("DGL_TPU_GAT_BWD_PACK") == "1"
                 else "compact"
                 if os.environ.get("DGL_TPU_GAT_BWD_FUSED") == "0"
                 else "fused"),
        # DGL_TPU_NO_REWRITE=1 disables the algebraic v-side gspmm
        # decomposition (debug/measurement escape hatch)
        no_rewrite=os.environ.get("DGL_TPU_NO_REWRITE", "0") == "1",
        # fused dense-window sddmm kernel: measured SLOWER than XLA's
        # fully-fused composed gathers across its eligible range on v5e
        # (copy_v 5.9 vs 1.75, u_add_v 7.9 vs 3.7 ns/edge at N=200k —
        # KERNELS.md round 3), so the composed path is the default;
        # opt in for study/regression with DGL_TPU_SDDMM_KERNEL=1
        sddmm_kernel=os.environ.get("DGL_TPU_SDDMM_KERNEL", "0") == "1",
        # DGL_TPU_DEBUG_DISPATCH=1 prints one line per op-dispatch decision
        # (which path ran: hybrid / pallas-flat / pallas-bucketed /
        # composed / kernel, and WHY on fallbacks) — silent fallbacks like
        # the sddmm 2 GB-budget case become observable.  The TPU analogue
        # of the reference's SelectFormat logging
        # (src/graph/unit_graph.h:211-217).
        debug_dispatch=os.environ.get("DGL_TPU_DEBUG_DISPATCH", "0") == "1",
    )


def dispatch_log(op: str, path: str, detail: str = "") -> None:
    """One-line trace-time dispatch record (env-gated).

    Printed while the op is being TRACED (dispatch decisions are static),
    so each jitted graph/op combination logs once per compilation, not per
    step."""
    if get_config().debug_dispatch:
        msg = f"[dgl-tpu dispatch] {op}: {path}"
        if detail:
            msg += f" ({detail})"
        print(msg, flush=True)
