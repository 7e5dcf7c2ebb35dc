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


def stack_shards(trees):
    """Stack per-device pytrees (identical structure/static shapes) along
    a new leading device axis — e.g. the per-device block lists of a
    multi-chip sampled minibatch."""
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                        *trees)


def sample_sharded_batch(g: Graph, sampler, seed_shards, features,
                         labels):
    """Host-side: sample one padded block stack per device and stack them.

    ``seed_shards`` is a (P, B) array of seed node ids (one row per
    device).  Returns (blocks_stacked, x_stacked, labels_stacked) ready
    for ``make_sampled_dp_step``.  Static shapes are guaranteed because
    the sampler pads every layer (sampling/neighbor.py
    MultiLayerNeighborSampler), so all devices share one jit cache entry.

    Reference: examples/pytorch/graphsage/train_sampling_multi_gpu.py —
    there each GPU process runs its own DataLoader; here one host feeds
    the mesh.
    """
    per_dev = []
    for seeds in seed_shards:
        blocks, input_nodes, seeds_out = sampler.sample_blocks(g, seeds)
        x = jnp.asarray(np.asarray(features)[input_nodes])
        y = jnp.asarray(np.asarray(labels)[seeds_out])
        per_dev.append((blocks, x, y))
    blocks = stack_shards([b for b, _, _ in per_dev])
    xs = jnp.stack([x for _, x, _ in per_dev])
    ys = jnp.stack([y for _, _, y in per_dev])
    return blocks, xs, ys


def make_sampled_dp_step(model, tx, mesh: Mesh, axis: str = "node"):
    """Multi-chip sampled-minibatch training: seeds sharded across the
    mesh, one padded block stack per device, gradients psum'd over ICI —
    the compiled successor of the reference's multi-GPU sampled GraphSAGE
    (examples/pytorch/graphsage/train_sampling_multi_gpu.py: per-process
    DataLoader + DDP allreduce).

    step(params, opt_state, blocks_stacked, x_stacked, labels_stacked)
    -> (params, opt_state, mean_loss).  blocks_stacked is a per-layer
    list of block Graphs whose every leaf has a leading device dim (see
    ``stack_shards``).
    """
    import optax as _optax
    from jax.sharding import PartitionSpec as _P

    def local_loss(params, blocks, x, labels):
        blocks = jax.tree.map(lambda a: a[0], blocks)
        x, labels = x[0], labels[0]

        def loss_fn(p):
            logits = model.apply(p, blocks, x)
            logp = jax.nn.log_softmax(logits)
            nll = -jnp.take_along_axis(
                logp, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
            return nll.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        loss = jax.lax.pmean(loss, axis)
        grads = jax.lax.pmean(grads, axis)
        return loss, grads

    mapped = jax.shard_map(local_loss, mesh=mesh,
                           in_specs=(_P(), _P(axis), _P(axis), _P(axis)),
                           out_specs=(_P(), _P()))

    @jax.jit
    def step(params, opt_state, blocks, x, labels):
        loss, grads = mapped(params, blocks, x, labels)
        updates, opt_state = tx.update(grads, opt_state, params)
        return _optax.apply_updates(params, updates), opt_state, loss

    return step


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
