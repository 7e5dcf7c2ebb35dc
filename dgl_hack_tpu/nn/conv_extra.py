"""Additional conv layers completing the reference zoo
(reference: python/dgl/nn/pytorch/conv/__init__.py:1-28)."""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.graph import Graph
from ..ops import segment
from ..ops.sddmm import gsddmm
from ..ops.spmm import gspmm

Array = jax.Array
xavier = nn.initializers.glorot_uniform()


class GMMConv(nn.Module):
    """Gaussian mixture model conv / MoNet (reference: gmmconv.py).

    Edge pseudo-coordinates are scored under K learned gaussians; messages
    are weighted by the kernel responsibilities.
    """
    out_feats: int
    dim: int
    n_kernels: int
    aggregator_type: str = "sum"
    residual: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, g: Graph, feat, pseudo: Array):
        """pseudo: (E, dim) edge pseudo-coordinates (user order)."""
        from .conv import _split_feat
        feat_src, feat_dst = _split_feat(feat)
        if g.int2user is not None:
            pseudo = jnp.asarray(pseudo)[g.int2user]
        mu = self.param("mu", nn.initializers.normal(0.1),
                        (self.n_kernels, self.dim), feat_src.dtype)
        inv_sigma = self.param("inv_sigma", nn.initializers.ones,
                               (self.n_kernels, self.dim), feat_src.dtype)
        proj = nn.Dense(self.n_kernels * self.out_feats, use_bias=False,
                        kernel_init=xavier, name="fc")(feat_src)
        proj = proj.reshape(-1, self.n_kernels, self.out_feats)
        # gaussian weights per edge/kernel
        diff = pseudo[:, None, :] - mu[None]                 # (E, K, dim)
        w = jnp.exp(-0.5 * ((diff * inv_sigma[None]) ** 2).sum(-1))
        msg = (proj[g.src] * w[..., None]).sum(1)            # (E, out)
        rst = segment.segment_reduce(self.aggregator_type, msg, g.dst,
                                     g.num_dst_nodes,
                                     indices_are_sorted=True,
                                     mask=g.edge_mask)
        if self.residual:
            rst = rst + nn.Dense(self.out_feats, use_bias=False,
                                 kernel_init=xavier,
                                 name="res_fc")(feat_dst)
        if self.use_bias:
            rst = rst + self.param("bias", nn.initializers.zeros,
                                   (self.out_feats,), rst.dtype)
        return rst


class DenseSAGEConv(nn.Module):
    """SAGE on a dense adjacency (reference: densesageconv.py)."""
    out_feats: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, adj: Array, feat: Array):
        """adj (..., N, N) — works batched (DiffPool-style (B, N, N))."""
        in_deg = jnp.maximum(adj.sum(-1, keepdims=True), 1.0)
        h_neigh = (adj @ feat + feat) / (in_deg + 1)
        return nn.Dense(self.out_feats, use_bias=self.use_bias,
                        kernel_init=xavier, name="fc")(h_neigh)


class DenseChebConv(nn.Module):
    """Chebyshev conv on dense adjacency (reference: densechebconv.py)."""
    out_feats: int
    k: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, adj: Array, feat: Array, lambda_max: float = 2.0):
        n = adj.shape[0]
        deg = jnp.maximum(adj.sum(1), 1.0)
        dnorm = jax.lax.rsqrt(deg)
        a_hat = adj * dnorm[:, None] * dnorm[None, :]
        L = jnp.eye(n, dtype=feat.dtype) - a_hat
        Lt = (2.0 / lambda_max) * L - jnp.eye(n, dtype=feat.dtype)
        Xs = [feat]
        if self.k > 1:
            Xs.append(Lt @ feat)
        for _ in range(2, self.k):
            Xs.append(2 * (Lt @ Xs[-1]) - Xs[-2])
        h = jnp.concatenate(Xs, axis=-1)
        return nn.Dense(self.out_feats, use_bias=self.use_bias,
                        kernel_init=xavier, name="fc")(h)


class KNNGraph(nn.Module):
    """Layer-style kNN graph factory (reference: nn factory.py KNNGraph).

    Host-side construction; returns a Graph for downstream conv layers.
    """
    k: int

    def __call__(self, x) -> Graph:
        import numpy as np
        from ..core.transform import knn_graph
        return knn_graph(np.asarray(x), self.k)


class SegmentedKNNGraph(nn.Module):
    """kNN per graph segment (reference: factory.py SegmentedKNNGraph)."""
    k: int

    def __call__(self, x, segs) -> Graph:
        import numpy as np
        from ..core.graph import _build
        x = np.asarray(x)
        offs = np.concatenate([[0], np.cumsum(segs)])
        srcs, dsts = [], []
        for i in range(len(segs)):
            xi = x[offs[i]:offs[i + 1]]
            d2 = ((xi[:, None] - xi[None]) ** 2).sum(-1)
            nbr = np.argsort(d2, axis=1)[:, :self.k]
            dsts.append(np.repeat(np.arange(len(xi)), self.k) + offs[i])
            srcs.append(nbr.reshape(-1) + offs[i])
        return _build(np.concatenate(srcs).astype(np.int32),
                      np.concatenate(dsts).astype(np.int32),
                      int(offs[-1]), int(offs[-1]), is_block=False)


class AtomicConv(nn.Module):
    """Atomic convolution (reference: nn/pytorch/conv/atomicconv.py —
    RadialPooling + per-atom-type neighbor pooling, used by the ACNN
    protein-ligand model).

    e^k_ij = exp(-gamma_k (r_ij - r_k)^2) * cutoff_k(r_ij) with the
    cosine cutoff; each atom pools e^k over neighbors of each atomic
    type t: out[i, k*T + t] = sum_{j in N(i), z_j = t} e^k_ij.
    cutoffs/means/scaling are learnable (K,) parameters, initialized
    from the given options (the reference stores them the same way).
    """
    interaction_cutoffs: tuple = (12.0,)
    rbf_kernel_means: tuple = (0.0, 2.0, 4.0, 6.0, 8.0)
    rbf_kernel_scaling: tuple = (4.0,)
    features_to_use: Optional[tuple] = None

    @nn.compact
    def __call__(self, g: Graph, feat, distances):
        """feat (V, 1) atomic numbers; distances (E, 1) internal order;
        returns (V, K*T) float32."""
        import itertools
        import numpy as np
        radial = list(itertools.product(self.interaction_cutoffs,
                                        self.rbf_kernel_means,
                                        self.rbf_kernel_scaling))
        K = len(radial)
        init = lambda col: lambda *a: jnp.asarray(
            np.array([r[col] for r in radial], np.float32))
        cut = self.param("interaction_cutoffs", init(0))
        mean = self.param("rbf_kernel_means", init(1))
        scale = self.param("rbf_kernel_scaling", init(2))
        d = distances.reshape(-1, 1).astype(jnp.float32)        # (E, 1)
        rbf = jnp.exp(-scale[None, :] * (d - mean[None, :]) ** 2)
        cos = 0.5 * (jnp.cos(jnp.pi * d / cut[None, :]) + 1.0)
        e = rbf * jnp.where(d <= cut[None, :], cos, 0.0)        # (E, K)
        if self.features_to_use is not None:
            types = jnp.asarray(self.features_to_use,
                                feat.dtype)                     # (T,)
            hv = (feat.reshape(-1, 1) == types[None, :]) \
                .astype(jnp.float32)                            # (V, T)
        else:
            hv = jnp.ones((g.num_src_nodes, 1), jnp.float32)
        hsrc = gsddmm(g, "copy_lhs", hv, None, "u")             # (E, T)
        m = (e[:, :, None] * hsrc[:, None, :]).reshape(e.shape[0], -1)
        return gspmm(g, "copy_rhs", "sum", None, m)             # (V, K*T)


class WeaveLayer(nn.Module):
    """Single Weave layer ("Molecular Graph Convolutions", Kearnes et al.
    2016).  Node<->edge dual updates as plain gspmm/gsddmm compositions
    (reference: apps/life_sci/python/dgllife/model/gnn/weave.py:11).

    Node update: [W_nn h_v || sum_{e->v} W_en h_e] -> W_u; edge update:
    [act(W_l h_u + W_r h_v) || act(W_r h_u + W_l h_v) || W_ee h_e] ->
    W_ue.  Edge features are per-edge in USER (eid) order like the
    reference; the copy_e reduce runs in internal order (one permute).
    """
    node_out_feats: int = 50
    edge_out_feats: int = 50
    node_node_hidden_feats: int = 50
    edge_node_hidden_feats: int = 50
    node_edge_hidden_feats: int = 50
    edge_edge_hidden_feats: int = 50
    activation: Callable = jax.nn.relu

    @nn.compact
    def __call__(self, g: Graph, node_feats: Array, edge_feats: Array,
                 node_only: bool = False):
        act = self.activation
        ef_int = edge_feats if g.int2user is None \
            else jnp.asarray(edge_feats)[g.int2user]

        # node update: self projection + incoming-edge projection sum
        nn_feats = act(nn.Dense(self.node_node_hidden_feats,
                                kernel_init=xavier,
                                name="node_to_node")(node_feats))
        e2n = act(nn.Dense(self.edge_node_hidden_feats, kernel_init=xavier,
                           name="edge_to_node")(ef_int))
        en_feats = gspmm(g, "copy_rhs", "sum", None, e2n, "u", "e")
        new_node = act(nn.Dense(self.node_out_feats, kernel_init=xavier,
                                name="update_node")(
            jnp.concatenate([nn_feats, en_feats], axis=-1)))
        if node_only:
            return new_node

        # edge update: both src/dst orderings of the left/right
        # projections + the edge self projection
        left = nn.Dense(self.node_edge_hidden_feats, kernel_init=xavier,
                        name="left_node_to_edge")(node_feats)
        right = nn.Dense(self.node_edge_hidden_feats, kernel_init=xavier,
                         name="right_node_to_edge")(node_feats)
        first = act(gsddmm(g, "add", left, right, "u", "v",
                           out_order="eid"))
        second = act(gsddmm(g, "add", right, left, "u", "v",
                            out_order="eid"))
        third = act(nn.Dense(self.edge_edge_hidden_feats,
                             kernel_init=xavier,
                             name="edge_to_edge")(edge_feats))
        new_edge = act(nn.Dense(self.edge_out_feats, kernel_init=xavier,
                                name="update_edge")(
            jnp.concatenate([first, second, third], axis=-1)))
        return new_node, new_edge


class WeaveGNN(nn.Module):
    """Stacked Weave layers (reference: weave.py WeaveGNN).  Returns
    updated node feats (and edge feats when node_only=False)."""
    num_layers: int = 2
    hidden_feats: int = 50
    activation: Callable = jax.nn.relu

    @nn.compact
    def __call__(self, g: Graph, node_feats: Array, edge_feats: Array,
                 node_only: bool = True):
        for i in range(self.num_layers - 1):
            node_feats, edge_feats = WeaveLayer(
                node_out_feats=self.hidden_feats,
                edge_out_feats=self.hidden_feats,
                node_node_hidden_feats=self.hidden_feats,
                edge_node_hidden_feats=self.hidden_feats,
                node_edge_hidden_feats=self.hidden_feats,
                edge_edge_hidden_feats=self.hidden_feats,
                activation=self.activation,
                name=f"layer{i}")(g, node_feats, edge_feats)
        return WeaveLayer(
            node_out_feats=self.hidden_feats,
            edge_out_feats=self.hidden_feats,
            node_node_hidden_feats=self.hidden_feats,
            edge_node_hidden_feats=self.hidden_feats,
            node_edge_hidden_feats=self.hidden_feats,
            edge_edge_hidden_feats=self.hidden_feats,
            activation=self.activation,
            name=f"layer{self.num_layers - 1}")(
                g, node_feats, edge_feats, node_only=node_only)


def _wln_init(key, shape, dtype=jnp.float32):
    """WLN weight init: normal with std min(1/sqrt(in), 0.1)
    (reference: wln.py WLNLinear.reset_parameters)."""
    in_feats = shape[0]
    std = min(1.0 / float(np.sqrt(in_feats)), 0.1)
    return std * jax.random.normal(key, shape, dtype)


class WLN(nn.Module):
    """Weisfeiler-Lehman Network encoder ("Predicting Organic Reaction
    Outcomes with WLN", Jin et al. 2017) — the reaction-center model's
    GNN (reference: apps/life_sci/python/dgllife/model/gnn/wln.py:75).

    n_layers of SHARED-parameter message passing: per edge
    he = relu(W_m [h_src || e]); h_v' = relu(W_n [h_v || sum he]);
    final pairwise features h_nbr(v) * W_s h_v with
    h_nbr = sum_{e->v} (W_nm h_src) * (W_em e).  Edge features arrive in
    USER order (reference parity); messages run internal-order.
    """
    node_out_feats: int = 300
    n_layers: int = 3

    @nn.compact
    def __call__(self, g: Graph, node_feats: Array, edge_feats: Array):
        H = self.node_out_feats
        ef_int = edge_feats if g.int2user is None \
            else jnp.asarray(edge_feats)[g.int2user]
        h = jax.nn.relu(nn.Dense(H, use_bias=False, kernel_init=_wln_init,
                                 name="project_node_in_feats")(node_feats))
        msg_dense = nn.Dense(H, kernel_init=_wln_init,
                             name="project_concatenated_messages")
        upd_dense = nn.Dense(H, kernel_init=_wln_init,
                             name="get_new_node_feats")
        for _ in range(self.n_layers):         # SHARED params across layers
            h_src = gsddmm(g, "copy_lhs", h, None, "u", "e")  # (E, H) int
            he = jax.nn.relu(msg_dense(
                jnp.concatenate([h_src, ef_int], axis=-1)))
            agg = gspmm(g, "copy_rhs", "sum", None, he, "u", "e")
            h = jax.nn.relu(upd_dense(
                jnp.concatenate([h, agg], axis=-1)))
        hv = nn.Dense(H, use_bias=False, kernel_init=_wln_init,
                      name="project_node_messages")(h)
        he = nn.Dense(H, use_bias=False, kernel_init=_wln_init,
                      name="project_edge_messages")(ef_int)
        h_nbr = gspmm(g, "mul", "sum", hv, he, "u", "e")
        h_self = nn.Dense(H, use_bias=False, kernel_init=_wln_init,
                          name="project_self")(h)
        return h_nbr * h_self
