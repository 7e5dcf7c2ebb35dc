"""Graph (de)serialization.

Reference: python/dgl/data/graph_serialize.py + src/graph/graph_serialize.cc
(dmlc-stream binary format).  TPU-native replacement: a plain ``.npz``
container — structure arrays + feature frames — portable and
mmap-friendly; no custom C++ stream layer needed.
"""
from __future__ import annotations

import json
from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..core.graph import Graph, _build


def save_graphs(path: str, graphs: Sequence[Graph],
                labels: Dict[str, np.ndarray] | None = None) -> None:
    """Save a list of graphs (+ optional label arrays) to ``path``."""
    if isinstance(graphs, Graph):
        graphs = [graphs]
    payload: Dict[str, np.ndarray] = {}
    meta = []
    for i, g in enumerate(graphs):
        s, d = g.host_edges()
        payload[f"g{i}_src"] = s
        payload[f"g{i}_dst"] = d
        gm = {"num_src": g.num_src_nodes, "num_dst": g.num_dst_nodes,
              "is_block": g.is_block,
              "ndata": sorted(g._node_frames[0].keys()),
              "edata": sorted(g._edge_frame.keys())}
        for k in gm["ndata"]:
            payload[f"g{i}_n_{k}"] = np.asarray(g._node_frames[0][k])
        for k in gm["edata"]:
            payload[f"g{i}_e_{k}"] = np.asarray(g.edata[k])
        meta.append(gm)
    if labels:
        for k, v in labels.items():
            payload[f"label_{k}"] = np.asarray(v)
    payload["__meta__"] = np.frombuffer(
        json.dumps({"graphs": meta,
                    "labels": sorted(labels.keys()) if labels else []}
                   ).encode(), dtype=np.uint8)
    np.savez_compressed(path, **payload)


def load_graphs(path: str) -> Tuple[List[Graph], Dict[str, np.ndarray]]:
    with np.load(path if str(path).endswith(".npz") else str(path) + ".npz",
                 allow_pickle=False) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        graphs = []
        for i, gm in enumerate(meta["graphs"]):
            g = _build(z[f"g{i}_src"], z[f"g{i}_dst"], gm["num_src"],
                       gm["num_dst"], is_block=gm["is_block"])
            for k in gm["ndata"]:
                g._node_frames[0][k] = np.asarray(z[f"g{i}_n_{k}"])
            for k in gm["edata"]:
                g.edata[k] = z[f"g{i}_e_{k}"]
            graphs.append(g)
        labels = {k: z[f"label_{k}"] for k in meta["labels"]}
    return graphs, labels
