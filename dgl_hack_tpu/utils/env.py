"""Environment configuration.

Reference: DGL's env-var config surface (docs/source/env_var.rst:
DGLBACKEND, DGL_LIBRARY_PATH, DGL_DOWNLOAD_DIR, DGL_REPO).  TPU-native
equivalents:

  DGL_TPU_DOWNLOAD_DIR / DGL_DOWNLOAD_DIR  dataset cache directory
  DGL_TPU_SPMM_MODE    pallas gspmm precision: f32x2 | fast | highest
  DGL_TPU_DISABLE_PALLAS  "1" forces the XLA segment-op path
"""
from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass
class Config:
    download_dir: str
    spmm_mode: str = "f32x2"
    disable_pallas: bool = False


def get_config() -> Config:
    return Config(
        download_dir=os.environ.get(
            "DGL_TPU_DOWNLOAD_DIR",
            os.environ.get("DGL_DOWNLOAD_DIR",
                           os.path.join(os.path.expanduser("~"),
                                        ".dgl_tpu"))),
        spmm_mode=os.environ.get("DGL_TPU_SPMM_MODE", "f32x2"),
        disable_pallas=os.environ.get("DGL_TPU_DISABLE_PALLAS", "0") == "1",
    )
