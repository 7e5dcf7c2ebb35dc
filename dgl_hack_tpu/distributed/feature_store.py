"""Host-resident feature store with per-batch device pull.

Reference: the shared-memory graph store (contrib/graph_store.py:270
SharedMemoryStoreServer — whole-graph ndata in POSIX shm, workers attach)
and the KVStore pull path for features too big for device memory
(dis_kvstore.py, --mix_cpu_gpu in DGL-KE).  TPU version: features stay in
host RAM (optionally memory-mapped npy, the shm analogue — multiple
processes can map the same file); minibatch rows are gathered on host and
device_put per batch, overlapped by the prefetcher.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np


class FeatureStore:
    """dict of host arrays with row-pull API."""

    def __init__(self, arrays: Optional[Dict[str, np.ndarray]] = None):
        self._arrays: Dict[str, np.ndarray] = dict(arrays or {})

    @classmethod
    def from_mmap(cls, paths: Dict[str, str]) -> "FeatureStore":
        """Memory-map .npy files — the shared-memory multi-process
        analogue (several worker processes map the same pages)."""
        return cls({k: np.load(p, mmap_mode="r") for k, p in paths.items()})

    def add(self, name: str, arr: np.ndarray) -> None:
        self._arrays[name] = arr

    def save(self, prefix: str) -> Dict[str, str]:
        paths = {}
        for k, v in self._arrays.items():
            paths[k] = f"{prefix}.{k}.npy"
            np.save(paths[k], np.asarray(v))
        return paths

    def pull(self, name: str, rows: np.ndarray, to_device: bool = True):
        """Gather rows on host; optionally device_put (the KVClient.pull
        successor — a local gather instead of partition-book routing)."""
        out = np.asarray(self._arrays[name])[np.asarray(rows)]
        return jax.device_put(out) if to_device else out

    def push_add(self, name: str, rows: np.ndarray, values) -> None:
        """Sparse-row accumulate (KVClient.push 'sum' handler analogue,
        reference: dis_kvstore.py:956)."""
        arr = self._arrays[name]
        if not arr.flags.writeable:
            raise ValueError(f"feature {name!r} is read-only (mmap'ed)")
        np.add.at(arr, np.asarray(rows), np.asarray(values))

    def __contains__(self, name):
        return name in self._arrays

    def __getitem__(self, name):
        return self._arrays[name]


# ---------------------------------------------------------------------------
# shared graph STRUCTURE store (reference: ImmutableGraph::CopyToSharedMem,
# include/dgl/immutable_graph.h:942 + SharedMemoryDGLGraph workers,
# contrib/graph_store.py:517)
# ---------------------------------------------------------------------------
_GRAPH_FIELDS = ("src", "dst", "csc_indptr", "csr_indptr", "csr_eids",
                 "int2user", "user2int")


def save_shared_graph(prefix: str, g) -> Dict[str, str]:
    """Write the graph's structure arrays as .npy files for multi-process
    page sharing (the mmap analogue of the reference's named-shm CSR).
    Returns {field: path} plus a 'meta' entry."""
    import json
    paths: Dict[str, str] = {}
    for f in _GRAPH_FIELDS:
        v = getattr(g, f)
        if v is not None:
            paths[f] = f"{prefix}.{f}.npy"
            np.save(paths[f], g.host(f) if hasattr(g, "host")
                    else np.asarray(v))
    meta_path = f"{prefix}.graphmeta.json"
    with open(meta_path, "w") as fh:
        json.dump({"num_src": g.num_src_nodes, "num_dst": g.num_dst_nodes,
                   "is_block": g.is_block,
                   "fields": sorted(paths)}, fh)
    paths["meta"] = meta_path
    return paths


def attach_shared_graph(prefix: str):
    """Attach to a saved graph WITHOUT copying: every structure array is a
    read-only mmap, shared page-cache across sampler processes (the
    SharedMemoryDGLGraph worker role).  The returned Graph is host-backed
    (numpy fields + primed host cache) — exactly what samplers, planners
    and transforms consume; move to device with jnp.asarray when needed."""
    import json
    from ..core.graph import Graph
    with open(f"{prefix}.graphmeta.json") as fh:
        meta = json.load(fh)
    arrays = {f: np.load(f"{prefix}.{f}.npy", mmap_mode="r")
              for f in meta["fields"]}
    g = Graph(num_src=meta["num_src"], num_dst=meta["num_dst"],
              is_block=meta["is_block"],
              src=arrays["src"], dst=arrays["dst"],
              csc_indptr=arrays["csc_indptr"],
              csr_indptr=arrays.get("csr_indptr"),
              csr_eids=arrays.get("csr_eids"),
              int2user=arrays.get("int2user"),
              user2int=arrays.get("user2int"))
    object.__setattr__(g, "_np_cache", dict(arrays))
    return g
