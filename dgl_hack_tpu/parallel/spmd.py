"""Multi-chip SPMD training via jax.sharding + GSPMD.

The reference's distributed story is process-level: METIS partitions +
TCP KVStore pulls for halo features (reference: python/dgl/contrib/
dis_kvstore.py:103,670; src/graph/network.cc:705 FastPull) and PyTorch DDP
for gradients.  The TPU-native successor expresses the same decomposition
declaratively: pick a Mesh, annotate shardings, let XLA insert the
collectives over ICI/DCN ("scaling-book" recipe):

* **node axis ('node')** — dst-node row sharding of features and all
  node-level activations: the GNN analogue of sequence/spatial
  parallelism.  Gathers of src features across shards lower to
  all-to-all/all-gather — the compiled equivalent of the reference's
  KVStore halo pulls.
* **tp axis ('tp')** — feature/weight-column sharding of the dense
  layers (embedding-table model parallelism in DGL-KE terms,
  reference: apps/kg partition_book sharding).
* gradients — psum'd by GSPMD automatically where params are replicated.

``shard_params``/``shard_dataset`` produce NamedSharding-annotated pytrees;
``make_spmd_train_step`` jits the full step over the mesh.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.graph import Graph


def make_mesh(n_devices: Optional[int] = None, tp: int = 1,
              devices=None) -> Mesh:
    """Mesh over ('node', 'tp').  With tp=1 this is pure spatial/data
    parallelism."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    assert n_devices % tp == 0
    return Mesh(devices.reshape(n_devices // tp, tp), ("node", "tp"))


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_graph(mesh: Mesh, g: Graph) -> Graph:
    """Edge arrays sharded over the node axis (edges are dst-sorted, so an
    even edge split approximates a dst-contiguous partition); indptr and
    frames replicated."""
    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    rep = P()
    edge = P("node")
    kw = dict(
        src=put(g.src, edge), dst=put(g.dst, edge),
        csc_indptr=put(g.csc_indptr, rep))
    for name in ("csr_indptr", "csr_eids", "int2user", "user2int",
                 "edge_mask"):
        v = getattr(g, name)
        if v is not None:
            kw[name] = put(v, edge if name != "csr_indptr" else rep)
    out = g.replace(**kw)
    for frame in out._node_frames:
        for k in list(frame):
            frame[k] = put(frame[k], P("node"))
    for k in list(out._edge_frame):
        out._edge_frame[k] = put(out._edge_frame[k], edge)
    return out


def shard_params(mesh: Mesh, params):
    """Dense kernels column-sharded over 'tp'; everything else
    replicated."""
    def spec_for(path, leaf):
        if leaf.ndim == 2 and leaf.shape[1] % mesh.shape["tp"] == 0 \
                and mesh.shape["tp"] > 1:
            return P(None, "tp")
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(
            leaf, NamedSharding(mesh, spec_for(path, leaf))), params)


def shard_rows(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P("node")))


def make_spmd_train_step(model, tx, mesh: Mesh, model_args: tuple = ()):
    """Jitted full training step over the mesh: forward (sharded gather +
    segment reduce), masked CE loss, adamw update."""
    from ..models.training import masked_cross_entropy

    @jax.jit
    def step(params, opt_state, g, feats, labels, mask, key):
        def loss_fn(p):
            logits = model.apply(p, g, *model_args, feats,
                                 deterministic=False, rngs={"dropout": key})
            return masked_cross_entropy(logits, labels, mask)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step
