"""Molecular property-prediction model zoo (TPU-native).

Re-derivations of the reference's chem model zoo
(reference: python/dgl/model_zoo/chem/ — classifiers.py, gnn.py,
schnet.py, mgcn.py, mpnn.py, attentive_fp.py, layers.py) as pure traced
flax modules over the framework's gspmm/gsddmm/edge_softmax/readout
primitives.  Every model is a single jittable function of
(params, batched_graph, features): molecule batches ride the standard
padded static-shape graph batching, so the whole forward (including the
per-graph readouts) lowers to one XLA computation — there is no per-layer
kernel zoo and no degree bucketing.

DGMG (autoregressive graph generation) lives in models/dgmg.py as a
static-shape scan reformulation.  Out of scope: JTNN (jtnn/ —
junction-tree VAE requiring RDKit tree decomposition of real molecules);
its compute kernels (message passing, GRU cells, readouts) are all
present here.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.graph import Graph
from ..ops import readout
from ..ops.edge_softmax import edge_softmax
from ..ops.sddmm import gsddmm
from ..ops.spmm import gspmm
from ..nn.conv import GATConv, GraphConv, NNConv
from ..nn.glob import Set2Set, SumPooling, WeightAndSum

Array = jax.Array


# ---------------------------------------------------------------------------
# shared small pieces (reference: model_zoo/chem/layers.py)
# ---------------------------------------------------------------------------
def softplus_beta(x: Array, beta: float = 1.0) -> Array:
    """1/beta * log(1 + exp(beta x)) (torch Softplus semantics)."""
    return jax.nn.softplus(beta * x) / beta


def shifted_softplus(x: Array, beta: float = 1.0, shift: float = 2.0) -> Array:
    """ShiftSoftplus (reference: layers.py ShiftSoftplus):
    softplus(x; beta) - log(shift)."""
    return softplus_beta(x, beta) - float(np.log(shift))


class RBFExpansion(nn.Module):
    """Radial basis expansion of scalar edge distances
    (reference: layers.py RBFLayer): e_k(d) = exp(-(d - mu_k)^2 / gap).
    """
    low: float = 0.0
    high: float = 30.0
    gap: float = 0.1

    @property
    def fan_out(self) -> int:
        return int(np.ceil((self.high - self.low) / self.gap))

    @nn.compact
    def __call__(self, dist: Array) -> Array:
        centers = np.linspace(self.low, self.high, self.fan_out)
        gap = centers[1] - centers[0] if self.fan_out > 1 else self.gap
        radial = dist.reshape(-1, 1) - jnp.asarray(centers, dist.dtype)
        return jnp.exp((-1.0 / float(gap)) * radial ** 2)


class AtomEmbedding(nn.Module):
    """Atomic-number embedding table (reference: layers.py AtomEmbedding)."""
    dim: int = 128
    type_num: int = 100

    @nn.compact
    def __call__(self, atom_types: Array) -> Array:
        return nn.Embed(self.type_num, self.dim)(atom_types)


def pair_edge_types(g: Graph, atom_types: Array) -> Array:
    """Unordered Szudzik-style pairing of endpoint atomic numbers into one
    edge-type id (reference: layers.py EdgeEmbedding.generate_edge_type:
    x*y + (|x-y| - 1)^2 // 4), internal edge order."""
    t = atom_types.astype(jnp.int32)
    x, y = t[g.src], t[g.dst]
    return x * y + (jnp.abs(x - y) - 1) ** 2 // 4


class EdgeEmbedding(nn.Module):
    """Edge-type embedding keyed on the unordered endpoint-type pair
    (reference: layers.py EdgeEmbedding)."""
    dim: int = 128
    edge_num: int = 3000

    @nn.compact
    def __call__(self, g: Graph, atom_types: Array) -> Array:
        return nn.Embed(self.edge_num, self.dim)(pair_edge_types(g, atom_types))


# ---------------------------------------------------------------------------
# SchNet (reference: model_zoo/chem/schnet.py + layers.py CFConv/Interaction)
# ---------------------------------------------------------------------------
class CFConv(nn.Module):
    """Continuous-filter convolution (reference: layers.py CFConv):
    per-edge filters from an RBF-projection MLP, u_mul_e + sum gspmm."""
    dim: int = 64
    act: Callable = lambda x: softplus_beta(x, 0.5)

    @nn.compact
    def __call__(self, g: Graph, node_weight: Array, rbf_out: Array) -> Array:
        e = nn.Dense(self.dim)(self.act(nn.Dense(self.dim)(rbf_out)))
        return gspmm(g, "mul", "sum", node_weight, e)


class SchNetInteraction(nn.Module):
    """Residual interaction block (reference: layers.py Interaction)."""
    rbf_dim: int
    dim: int

    @nn.compact
    def __call__(self, g: Graph, n_feat: Array, rbf_out: Array) -> Array:
        act = lambda x: softplus_beta(x, 0.5)
        n_weight = nn.Dense(self.dim, use_bias=False)(n_feat)
        h = CFConv(self.dim, act)(g, n_weight, rbf_out)
        h = nn.Dense(self.dim)(act(nn.Dense(self.dim)(h)))
        return n_feat + h


class SchNet(nn.Module):
    """SchNet for molecular property regression
    (reference: model_zoo/chem/schnet.py SchNet).

    __call__(g, atom_types (N,) int, edge_distances (E,) or (E,1) float in
    internal edge order) -> (num_graphs, output_dim).
    """
    dim: int = 64
    cutoff: float = 5.0
    output_dim: int = 1
    width: float = 1.0
    n_conv: int = 3
    norm: bool = False
    mean: float = 0.0
    std: float = 1.0

    @nn.compact
    def __call__(self, g: Graph, atom_types: Array,
                 edge_distances: Array) -> Array:
        rbf = RBFExpansion(0.0, self.cutoff, self.width)
        h = AtomEmbedding(self.dim)(atom_types)
        rbf_out = rbf(edge_distances)
        for _ in range(self.n_conv):
            h = SchNetInteraction(rbf.fan_out, self.dim)(g, h, rbf_out)
        h = nn.Dense(self.output_dim)(shifted_softplus(nn.Dense(64)(h)))
        if self.norm:
            h = h * self.std + self.mean
        return SumPooling()(g, h)


# ---------------------------------------------------------------------------
# MGCN (reference: model_zoo/chem/mgcn.py + layers.py VEConv/MultiLevel*)
# ---------------------------------------------------------------------------
class VEConv(nn.Module):
    """Vertex-edge convolution (reference: layers.py VEConv): summed
    u_mul_e(rbf-filter) messages plus summed raw edge features."""
    dim: int = 64
    update_edge: bool = True

    @nn.compact
    def __call__(self, g: Graph, n_feat: Array, e_feat: Array,
                 rbf_out: Array) -> Tuple[Array, Array]:
        act = lambda x: softplus_beta(x, 0.5)
        rbf_out = nn.Dense(self.dim)(act(nn.Dense(self.dim)(rbf_out)))
        if self.update_edge:
            e_feat = nn.Dense(self.dim)(e_feat)
        m0 = gspmm(g, "mul", "sum", n_feat, rbf_out)
        m1 = gspmm(g, "copy_rhs", "sum", None, e_feat)
        return m0 + m1, e_feat


class MultiLevelInteraction(nn.Module):
    """Multilevel interaction block (reference: layers.py
    MultiLevelInteraction)."""
    rbf_dim: int
    dim: int

    @nn.compact
    def __call__(self, g: Graph, n_feat: Array, e_feat: Array,
                 rbf_out: Array) -> Tuple[Array, Array]:
        act = lambda x: softplus_beta(x, 0.5)
        h = nn.Dense(self.dim)(n_feat)
        h, e_feat = VEConv(self.dim)(g, h, e_feat, rbf_out)
        h = nn.Dense(self.dim)(act(nn.Dense(self.dim)(h)))
        n_feat = n_feat + h
        e_feat = act(nn.Dense(self.dim)(e_feat))
        return n_feat, e_feat


class MGCN(nn.Module):
    """Multilevel graph conv net (reference: model_zoo/chem/mgcn.py
    MGCNModel): concatenates the per-level atom representations."""
    dim: int = 128
    width: float = 1.0
    cutoff: float = 5.0
    edge_dim: int = 128
    output_dim: int = 1
    n_conv: int = 3
    norm: bool = False
    mean: float = 0.0
    std: float = 1.0

    @nn.compact
    def __call__(self, g: Graph, atom_types: Array,
                 edge_distances: Array) -> Array:
        rbf = RBFExpansion(0.0, self.cutoff, self.width)
        h = AtomEmbedding(self.dim)(atom_types)
        e = EdgeEmbedding(self.edge_dim)(g, atom_types)
        rbf_out = rbf(edge_distances)
        levels = [h]
        for _ in range(self.n_conv):
            h, e = MultiLevelInteraction(rbf.fan_out, self.dim)(
                g, h, e, rbf_out)
            levels.append(h)
        h = jnp.concatenate(levels, axis=1)
        h = nn.Dense(self.output_dim)(softplus_beta(nn.Dense(64)(h)))
        if self.norm:
            h = h * self.std + self.mean
        return SumPooling()(g, h)


# ---------------------------------------------------------------------------
# MPNN (reference: model_zoo/chem/mpnn.py MPNNModel)
# ---------------------------------------------------------------------------
class MPNN(nn.Module):
    """Neural message passing for quantum chemistry: NNConv edge-network
    message passing unrolled with a GRU, Set2Set readout
    (reference: model_zoo/chem/mpnn.py)."""
    node_input_dim: int = 15
    edge_input_dim: int = 5
    output_dim: int = 12
    node_hidden_dim: int = 64
    edge_hidden_dim: int = 128
    num_step_message_passing: int = 6
    num_step_set2set: int = 6

    @nn.compact
    def __call__(self, g: Graph, n_feat: Array, e_feat: Array) -> Array:
        h = nn.relu(nn.Dense(self.node_hidden_dim)(n_feat))
        edge_net = nn.Sequential([
            nn.Dense(self.edge_hidden_dim), nn.relu,
            nn.Dense(self.node_hidden_dim * self.node_hidden_dim)])
        conv = NNConv(self.node_hidden_dim, edge_func=edge_net,
                      aggregator_type="sum")
        gru = nn.GRUCell(self.node_hidden_dim)
        state = h
        for _ in range(self.num_step_message_passing):
            m = nn.relu(conv(g, h, e_feat))
            state, h = gru(state, m)
        out = Set2Set(self.node_hidden_dim,
                      n_iters=self.num_step_set2set)(g, h)
        out = nn.relu(nn.Dense(self.node_hidden_dim)(out))
        return nn.Dense(self.output_dim)(out)


# ---------------------------------------------------------------------------
# GCN / GAT property classifiers (reference: classifiers.py + gnn.py)
# ---------------------------------------------------------------------------
class MLPBinaryClassifier(nn.Module):
    """Two-layer MLP head (reference: classifiers.py MLPBinaryClassifier;
    LayerNorm replaces BatchNorm1d — batch statistics over a padded
    molecule batch are ill-defined, and LN keeps the head a pure
    function)."""
    hidden_feats: int
    n_tasks: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, h: Array, deterministic: bool = True) -> Array:
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.LayerNorm()(nn.relu(nn.Dense(self.hidden_feats)(h)))
        return nn.Dense(self.n_tasks)(h)


class GCNLayer(nn.Module):
    """GraphConv + residual (reference: gnn.py GCNLayer; norm off)."""
    out_feats: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, g: Graph, feats: Array,
                 deterministic: bool = True) -> Array:
        h = GraphConv(self.out_feats, norm="none", activation=nn.relu)(
            g, feats)
        h = h + nn.relu(nn.Dense(self.out_feats)(feats))
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.LayerNorm()(h)


class GATLayer(nn.Module):
    """GATConv with flatten/mean head aggregation (reference: gnn.py
    GATLayer)."""
    out_feats: int
    num_heads: int
    dropout: float = 0.0
    agg_mode: str = "flatten"
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, g: Graph, feats: Array,
                 deterministic: bool = True) -> Array:
        h = GATConv(self.out_feats, self.num_heads, feat_drop=self.dropout,
                    attn_drop=self.dropout, residual=True)(
            g, feats, deterministic=deterministic)
        h = h.reshape(h.shape[0], -1) if self.agg_mode == "flatten" \
            else h.mean(axis=1)
        return self.activation(h) if self.activation is not None else h


class _GNNClassifier(nn.Module):
    """WeightAndSum ++ max readout -> MLP (reference: classifiers.py
    BaseGNNClassifier.forward)."""
    n_tasks: int
    classifier_hidden_feats: int = 128
    dropout: float = 0.0

    def gnn(self, g, feats, deterministic):  # overridden
        raise NotImplementedError

    @nn.compact
    def __call__(self, g: Graph, feats: Array,
                 deterministic: bool = True) -> Array:
        feats = self.gnn(g, feats, deterministic)
        h_sum = WeightAndSum()(g, feats)
        h_max = readout.max_nodes(g, feats)
        h_g = jnp.concatenate([h_sum, h_max], axis=1)
        return MLPBinaryClassifier(self.classifier_hidden_feats,
                                   self.n_tasks, self.dropout)(
            h_g, deterministic)


class GCNClassifier(_GNNClassifier):
    """Multi-task molecular classifier over stacked GCN layers
    (reference: classifiers.py GCNClassifier)."""
    gcn_hidden_feats: Sequence[int] = (64, 64)

    def gnn(self, g, feats, deterministic):
        for out_feats in self.gcn_hidden_feats:
            feats = GCNLayer(out_feats, self.dropout)(g, feats,
                                                      deterministic)
        return feats


class GATClassifier(_GNNClassifier):
    """Multi-task molecular classifier over stacked GAT layers
    (reference: classifiers.py GATClassifier)."""
    gat_hidden_feats: Sequence[int] = (32, 32)
    num_heads: Sequence[int] = (4, 4)

    def gnn(self, g, feats, deterministic):
        n = len(self.num_heads)
        for i in range(n):
            last = i == n - 1
            feats = GATLayer(self.gat_hidden_feats[i], self.num_heads[i],
                             self.dropout,
                             agg_mode="mean" if last else "flatten",
                             activation=None if last else nn.elu)(
                g, feats, deterministic)
        return feats


# ---------------------------------------------------------------------------
# AttentiveFP (reference: model_zoo/chem/attentive_fp.py)
# ---------------------------------------------------------------------------
class AttentiveGRU1(nn.Module):
    """Edge-attention context + GRU node update
    (reference: attentive_fp.py AttentiveGRU1)."""
    edge_hidden_size: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, g: Graph, edge_logits: Array, edge_feats: Array,
                 node_feats: Array, deterministic: bool = True) -> Array:
        e = nn.Dense(self.edge_hidden_size)(
            nn.Dropout(self.dropout, deterministic=deterministic)(edge_feats))
        e = edge_softmax(g, edge_logits) * e
        context = nn.elu(gspmm(g, "copy_rhs", "sum", None, e))
        new_node, _ = nn.GRUCell(node_feats.shape[-1])(node_feats, context)
        return nn.relu(new_node)


class AttentiveGRU2(nn.Module):
    """Node-projection attention context + GRU node update
    (reference: attentive_fp.py AttentiveGRU2)."""
    edge_hidden_size: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, g: Graph, edge_logits: Array, node_feats: Array,
                 deterministic: bool = True) -> Array:
        a = edge_softmax(g, edge_logits)
        hv = nn.Dense(self.edge_hidden_size)(
            nn.Dropout(self.dropout, deterministic=deterministic)(node_feats))
        context = nn.elu(gspmm(g, "mul", "sum", hv, a))
        new_node, _ = nn.GRUCell(node_feats.shape[-1])(node_feats, context)
        return nn.relu(new_node)


class GetContext(nn.Module):
    """Initial context layer mixing raw node+edge features
    (reference: attentive_fp.py GetContext)."""
    graph_feat_size: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, g: Graph, node_feats: Array, edge_feats: Array,
                 deterministic: bool = True) -> Array:
        hv_new = nn.leaky_relu(nn.Dense(self.graph_feat_size)(node_feats),
                               negative_slope=0.01)
        # he1 = leaky_relu(W [x_src || e])
        he1 = jnp.concatenate(
            [gsddmm(g, "copy_lhs", node_feats, None, "u"), edge_feats],
            axis=1)
        he1 = nn.leaky_relu(nn.Dense(self.graph_feat_size)(he1),
                            negative_slope=0.01)
        # logits = leaky_relu(W [hv_new_dst || he1])
        he2 = jnp.concatenate(
            [gsddmm(g, "copy_lhs", hv_new, None, "v"), he1], axis=1)
        he2 = nn.Dropout(self.dropout, deterministic=deterministic)(he2)
        logits = nn.leaky_relu(nn.Dense(1)(he2), negative_slope=0.01)
        return AttentiveGRU1(self.graph_feat_size, self.dropout)(
            g, logits, he1, hv_new, deterministic)


class AttentiveGNNLayer(nn.Module):
    """One AttentiveFP message-passing layer
    (reference: attentive_fp.py GNNLayer)."""
    graph_feat_size: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, g: Graph, node_feats: Array,
                 deterministic: bool = True) -> Array:
        he = jnp.concatenate(
            [gsddmm(g, "copy_lhs", node_feats, None, "v"),
             gsddmm(g, "copy_lhs", node_feats, None, "u")], axis=1)
        he = nn.Dropout(self.dropout, deterministic=deterministic)(he)
        logits = nn.leaky_relu(nn.Dense(1)(he), negative_slope=0.01)
        return AttentiveGRU2(self.graph_feat_size, self.dropout)(
            g, logits, node_feats, deterministic)


class AttentiveFPReadout(nn.Module):
    """One super-node attention timestep over the molecule
    (reference: attentive_fp.py GlobalPool)."""
    graph_feat_size: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, g: Graph, node_feats: Array, g_feats: Array,
                 deterministic: bool = True):
        z = jnp.concatenate(
            [readout.broadcast_nodes(g, nn.relu(g_feats)), node_feats],
            axis=1)
        z = nn.leaky_relu(nn.Dense(1)(z), negative_slope=0.01)
        a = readout.softmax_nodes(g, z)
        hv = nn.Dense(self.graph_feat_size)(
            nn.Dropout(self.dropout, deterministic=deterministic)(node_feats))
        context = nn.elu(readout.sum_nodes(g, hv, weight=a[:, 0]))
        g_feats, _ = nn.GRUCell(self.graph_feat_size)(g_feats, context)
        return g_feats, a


class AttentiveFP(nn.Module):
    """AttentiveFP molecular fingerprint model
    (reference: attentive_fp.py AttentiveFP)."""
    num_layers: int = 2
    num_timesteps: int = 2
    graph_feat_size: int = 200
    output_size: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, g: Graph, node_feats: Array, edge_feats: Array,
                 deterministic: bool = True,
                 get_node_weight: bool = False):
        node_feats = GetContext(self.graph_feat_size, self.dropout)(
            g, node_feats, edge_feats, deterministic)
        for _ in range(self.num_layers - 1):
            node_feats = AttentiveGNNLayer(self.graph_feat_size,
                                           self.dropout)(
                g, node_feats, deterministic)
        g_feats = readout.sum_nodes(g, node_feats)
        weights = []
        for _ in range(self.num_timesteps):
            g_feats, a = AttentiveFPReadout(self.graph_feat_size,
                                            self.dropout)(
                g, node_feats, g_feats, deterministic)
            weights.append(a)
        out = nn.Dense(self.output_size)(
            nn.Dropout(self.dropout, deterministic=deterministic)(g_feats))
        if get_node_weight:
            return out, weights
        return out


# ---------------------------------------------------------------------------
# ACNN (reference: model_zoo/chem/acnn.py + nn/pytorch/conv/atomicconv.py)
# ---------------------------------------------------------------------------
class ACNNPredictor(nn.Module):
    """Shared per-atom energy MLP (reference: acnn.py ACNNPredictor):
    the SAME network scores ligand, protein and complex atoms; the
    prediction is the complex energy minus the fragment energies."""
    hidden_sizes: Sequence[int] = (32, 16)
    dropouts: Sequence[float] = (0.0, 0.0)
    num_tasks: int = 1

    @nn.compact
    def __call__(self, feats: Array, deterministic: bool = True) -> Array:
        h = feats
        for size, p in zip(self.hidden_sizes, self.dropouts):
            h = nn.relu(nn.Dense(size)(h))
            h = nn.Dropout(p, deterministic=deterministic)(h)
        return nn.Dense(self.num_tasks)(h)


class ACNN(nn.Module):
    """Atomic convolutional network for protein-ligand binding affinity
    (reference: acnn.py ACNN): three AtomicConv towers (ligand, protein,
    complex) + a shared energy head; output = E(complex) - E(ligand) -
    E(protein), per graph in the batch."""
    hidden_sizes: Sequence[int] = (32, 16)
    dropouts: Sequence[float] = (0.0, 0.0)
    features_to_use: Optional[tuple] = None
    interaction_cutoffs: tuple = (12.0,)
    rbf_kernel_means: tuple = (0.0, 2.0, 4.0, 6.0, 8.0)
    rbf_kernel_scaling: tuple = (4.0,)
    num_tasks: int = 1

    def _tower(self, name):
        from ..nn.conv_extra import AtomicConv
        return AtomicConv(self.interaction_cutoffs, self.rbf_kernel_means,
                          self.rbf_kernel_scaling, self.features_to_use,
                          name=name)

    @nn.compact
    def __call__(self, ligand_g: Graph, protein_g: Graph,
                 complex_g: Graph, complex_ligand_mask: Array,
                 deterministic: bool = True) -> Array:
        """Graphs are batched (B pairs); each carries ndata
        'atomic_number' (V,1) and edata 'distance' (E,1).
        complex_ligand_mask (V_complex,) marks the ligand atoms inside
        the batched complex (the frag index arrays of the reference)."""
        pred = ACNNPredictor(tuple(self.hidden_sizes),
                             tuple(self.dropouts), self.num_tasks)

        def conv_energy(g, tower, weight=None):
            feats = tower(g, g.ndata["atomic_number"],
                          g.edata_internal["distance"])
            atom_e = pred(feats, deterministic)
            return readout.sum_nodes(g, atom_e, weight=weight)

        lig = conv_energy(ligand_g, self._tower("ligand_conv"))
        prot = conv_energy(protein_g, self._tower("protein_conv"))
        tower_c = self._tower("complex_conv")
        mask = complex_ligand_mask.astype(jnp.float32)
        c_lig = conv_energy(complex_g, tower_c, weight=mask)
        # reuse the SAME complex tower for the protein part
        feats_c = tower_c(complex_g, complex_g.ndata["atomic_number"],
                          complex_g.edata_internal["distance"])
        atom_e_c = pred(feats_c, deterministic)
        c_prot = readout.sum_nodes(complex_g, atom_e_c,
                                   weight=1.0 - mask)
        return (c_lig + c_prot) - (lig + prot)


class WeavePredictor(nn.Module):
    """Weave property predictor: WeaveGNN node/edge dual updates +
    WeightAndSum ++ max readout -> task MLP (reference:
    apps/life_sci/python/dgllife/model/model_zoo/weave_predictor.py,
    gnn half at .../gnn/weave.py:11; readout follows the house
    classifier pattern above)."""
    n_tasks: int
    num_layers: int = 2
    hidden_feats: int = 32
    classifier_hidden_feats: int = 64
    dropout: float = 0.0

    @nn.compact
    def __call__(self, g: Graph, node_feats: Array, edge_feats: Array,
                 deterministic: bool = True) -> Array:
        from ..nn.conv_extra import WeaveGNN
        h = WeaveGNN(num_layers=self.num_layers,
                     hidden_feats=self.hidden_feats)(
            g, node_feats, edge_feats, node_only=True)
        h_sum = WeightAndSum()(g, h)
        h_max = readout.max_nodes(g, h)
        h_g = jnp.concatenate([h_sum, h_max], axis=1)
        return MLPBinaryClassifier(self.classifier_hidden_feats,
                                   self.n_tasks, self.dropout)(
            h_g, deterministic)


class WLNPredictor(nn.Module):
    """WLN property predictor: shared-parameter WLN encoder + the same
    readout head (reference: the WLN reaction-center encoder,
    apps/life_sci/python/dgllife/model/gnn/wln.py:75 — the reaction
    model scores atom pairs; for property prediction the encoder feeds
    the standard readout)."""
    n_tasks: int
    node_out_feats: int = 32
    n_layers: int = 2
    classifier_hidden_feats: int = 64
    dropout: float = 0.0

    @nn.compact
    def __call__(self, g: Graph, node_feats: Array, edge_feats: Array,
                 deterministic: bool = True) -> Array:
        from ..nn.conv_extra import WLN
        h = WLN(node_out_feats=self.node_out_feats,
                n_layers=self.n_layers)(g, node_feats, edge_feats)
        h_sum = WeightAndSum()(g, h)
        h_max = readout.max_nodes(g, h)
        h_g = jnp.concatenate([h_sum, h_max], axis=1)
        return MLPBinaryClassifier(self.classifier_hidden_feats,
                                   self.n_tasks, self.dropout)(
            h_g, deterministic)
