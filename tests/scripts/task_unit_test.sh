#!/usr/bin/env bash
# Unit-test task (reference: tests/scripts/task_unit_test.sh — env-driven
# backend/device matrix; here one backend (JAX) and DGL_TPU_TESTDEV
# selects cpu|tpu).  CPU runs use 8 virtual devices (tests/conftest.py).
set -e
DEV="${DGL_TPU_TESTDEV:-cpu}"
cd "$(dirname "$0")/../.."
if [ "$DEV" = "cpu" ]; then
    # DGL_TPU_FAST=1 -> fast subset (drops the slow example smokes;
    # fits a 10-minute budget)
    if [ "${DGL_TPU_FAST:-0}" = "1" ]; then
        exec python -m pytest tests/ -x -q -m "not slow" "$@"
    fi
    exec python -m pytest tests/ -x -q "$@"
else
    # real-TPU smoke: the kernels' on-hardware checks (one process!)
    timeout 580 python tools/smoke_gat_tpu.py
    timeout 580 python bench.py
fi
