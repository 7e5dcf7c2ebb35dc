"""Additional conv layers completing the reference zoo
(reference: python/dgl/nn/pytorch/conv/__init__.py:1-28)."""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

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
        in_deg = jnp.maximum(adj.sum(1, keepdims=True), 1.0)
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
