"""DGMG — deep generative model of graphs, TPU-native.

Reference: python/dgl/model_zoo/chem/dgmg.py (GraphEmbed:168,
GraphProp:211, AddNode:308, AddEdge:413, ChooseDestAndUpdate:490,
DGMG:630).  The reference interleaves Python control flow with graph
mutation — one network call per decision, a dynamic DGLGraph grown
node-by-node.  That shape is untraceable on TPU, so this module
re-derives the SAME probabilistic model as a single ``lax.scan``:

* the decision sequence is flattened into a padded, static-shape action
  trace (``build_action_trace``) — step types ADD_NODE / ADD_EDGE /
  CHOOSE_DEST with teacher labels;
* graph state is a fixed-capacity pytree (hv (V,H), edge endpoints +
  one-hot bond features (2*Emax, ·), live counts) updated with masked
  dynamic writes;
* every scan step evaluates the three decision heads and accumulates the
  log-likelihood of the labelled action; message passing (GraphProp's
  per-round Linear + GRU over incoming [h_u, x_uv] messages) runs masked
  over the padded edge arrays after each CHOOSE_DEST step.

Training therefore compiles to ONE XLA computation per (V, Emax, steps)
bucket, and a minibatch of molecules is just ``jax.vmap`` over traces.
``generate`` runs the same scan as a sampling state machine
(mode register: next-decision kind) with ``jax.random.categorical``.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

ADD_NODE, ADD_EDGE, CHOOSE_DEST, PAD = 0, 1, 2, 3


def build_action_trace(node_types: np.ndarray, src: np.ndarray,
                       dst: np.ndarray, bond_types: np.ndarray,
                       max_steps: int) -> Tuple[np.ndarray, np.ndarray]:
    """Flatten a molecule into DGMG's canonical decision sequence
    (reference: DGMG.forward teacher forcing path, dgmg.py:791):
    for each node v — ADD_NODE(type); then for each bond (u < v) in
    increasing u — ADD_EDGE(bond), CHOOSE_DEST(u); then ADD_EDGE(stop);
    finally ADD_NODE(stop).

    src/dst/bond_types list each undirected bond once (u < v).  Returns
    (step_types (S,), labels (S,)) padded with PAD.
    """
    n = len(node_types)
    by_new: Dict[int, List[Tuple[int, int]]] = {}
    for u, v, b in zip(src, dst, bond_types):
        u, v = (int(u), int(v)) if u < v else (int(v), int(u))
        by_new.setdefault(v, []).append((u, int(b)))
    steps, labels = [], []
    for v in range(n):
        steps.append(ADD_NODE)
        labels.append(int(node_types[v]))
        for u, b in sorted(by_new.get(v, [])):
            steps.append(ADD_EDGE)
            labels.append(b)
            steps.append(CHOOSE_DEST)
            labels.append(u)
        steps.append(ADD_EDGE)
        labels.append(-1)        # stop sentinel, mapped to n_bonds
    steps.append(ADD_NODE)
    labels.append(-1)            # stop sentinel, mapped to n_types
    if len(steps) > max_steps:
        raise ValueError(f"trace needs {len(steps)} steps > {max_steps}")
    st = np.full(max_steps, PAD, np.int32)
    lb = np.zeros(max_steps, np.int32)
    st[:len(steps)] = steps
    lb[:len(labels)] = labels
    return st, lb


class DGMG(nn.Module):
    """Deep generative model of graphs (Li et al. 2018), the reference's
    chem DGMG (dgmg.py:630) on static shapes.

    __call__(step_types (S,), labels (S,)) -> negative log-likelihood of
    the action trace.  generate(rng) -> (node_types, src, dst, bonds,
    n_nodes, n_edges) padded arrays.
    """
    n_node_types: int
    n_bond_types: int
    node_hidden_size: int = 128
    num_prop_rounds: int = 2
    max_nodes: int = 32
    max_edges: int = 64          # undirected capacity; stored both ways
    dropout: float = 0.0

    def setup(self):
        H = self.node_hidden_size
        G = 2 * H                             # graph embed size (paper)
        self.node_gating = nn.Dense(1)
        self.node_to_graph = nn.Dense(G)
        self.add_node_mlp = [nn.Dense(G), nn.Dense(self.n_node_types + 1)]
        self.node_type_embed = nn.Embed(self.n_node_types, H)
        self.initialize_hv = nn.Dense(H)
        self.add_edge_mlp = [nn.Dense(G + H),
                             nn.Dense(self.n_bond_types + 1)]
        self.choose_dest_mlp = [nn.Dense(2 * H + self.n_bond_types),
                                nn.Dense(1)]
        self.msg_fns = [nn.Dense(2 * H) for _ in range(self.num_prop_rounds)]
        self.upd_fns = [nn.GRUCell(H) for _ in range(self.num_prop_rounds)]

    # -- pieces ---------------------------------------------------------------
    def _graph_embed(self, hv: Array, node_mask: Array) -> Array:
        """Gated sum over live nodes (reference: GraphEmbed.forward)."""
        gate = jax.nn.sigmoid(self.node_gating(hv))
        contrib = gate * self.node_to_graph(hv)
        return (contrib * node_mask[:, None]).sum(0)

    def _prop(self, hv, esrc, edst, he, edge_mask):
        """num_prop_rounds of [h_u, x_uv] -> Linear -> sum_v -> GRU
        (reference: GraphProp.forward; the UDF msg/reduce pair becomes a
        masked gather + segment-sum)."""
        V = self.max_nodes
        for t in range(self.num_prop_rounds):
            m = jnp.concatenate([hv[esrc], he], axis=1)
            m = jnp.concatenate([hv[edst], m], axis=1)   # [h_v, h_u, x_uv]
            act = self.msg_fns[t](m) * edge_mask[:, None]
            a = jax.ops.segment_sum(act, edst, num_segments=V)
            new_hv, _ = self.upd_fns[t](hv, a)
            hv = new_hv
        return hv

    def _heads(self, hv, node_mask, n_nodes, bond_label):
        """Logits of the three decision heads on the current state."""
        H = self.node_hidden_size
        g_embed = self._graph_embed(hv, node_mask)
        # AddNode: MLP(graph_embed) over n_types+1
        h = self.add_node_mlp[1](nn.relu(self.add_node_mlp[0](g_embed)))
        # AddEdge: MLP([graph_embed, h_src]) over n_bonds+1
        src_idx = jnp.maximum(n_nodes - 1, 0)
        h_src = hv[src_idx]
        e = self.add_edge_mlp[1](nn.relu(self.add_edge_mlp[0](
            jnp.concatenate([g_embed, h_src]))))
        # ChooseDest: score every possible dest < src
        bond_1h = jax.nn.one_hot(bond_label, self.n_bond_types)
        feats = jnp.concatenate(
            [hv, jnp.broadcast_to(h_src, hv.shape),
             jnp.broadcast_to(bond_1h, (self.max_nodes,
                                        self.n_bond_types))], axis=1)
        d = self.choose_dest_mlp[1](
            nn.relu(self.choose_dest_mlp[0](feats)))[:, 0]
        dest_mask = jnp.arange(self.max_nodes) < src_idx
        d = jnp.where(dest_mask, d, -1e9)
        return h, e, d, src_idx, bond_1h

    def _apply_add_node(self, hv, node_mask, n_nodes, label, g_embed):
        # the label is only meaningful on (masked-in) ADD_NODE steps; on
        # other steps it may be a dest node id or the stop index —
        # clamp before embedding (an out-of-range gather poisons the
        # embedding/init grads with NaN even though the result is
        # discarded by the step mask)
        emb = self.node_type_embed(
            jnp.clip(label, 0, self.n_node_types - 1))
        hv_init = self.initialize_hv(jnp.concatenate([emb, g_embed]))
        hv = hv.at[n_nodes].set(hv_init)
        node_mask = node_mask.at[n_nodes].set(1.0)
        return hv, node_mask, n_nodes + 1

    def _apply_choose_dest(self, state, dest, bond_1h):
        hv, esrc, edst, he, edge_mask, n_nodes, n_edges = state
        src = jnp.maximum(n_nodes - 1, 0)
        # both directions (reference: ChooseDestAndUpdate src/dest lists)
        esrc = esrc.at[n_edges].set(src).at[n_edges + 1].set(dest)
        edst = edst.at[n_edges].set(dest).at[n_edges + 1].set(src)
        he = he.at[n_edges].set(bond_1h).at[n_edges + 1].set(bond_1h)
        edge_mask = edge_mask.at[n_edges].set(1.0).at[n_edges + 1].set(1.0)
        hv = self._prop(hv, esrc, edst, he, edge_mask)
        return (hv, esrc, edst, he, edge_mask, n_nodes, n_edges + 2)

    def _init_state(self):
        V, E2 = self.max_nodes, 2 * self.max_edges
        H = self.node_hidden_size
        return (jnp.zeros((V, H)), jnp.zeros(E2, jnp.int32),
                jnp.zeros(E2, jnp.int32),
                jnp.zeros((E2, self.n_bond_types)), jnp.zeros(E2),
                jnp.int32(0), jnp.int32(0))

    # -- teacher-forced NLL -----------------------------------------------------
    def __call__(self, step_types: Array, labels: Array) -> Array:
        """Negative log-likelihood of one action trace (sum over steps)."""
        state = self._init_state()
        node_mask0 = jnp.zeros(self.max_nodes)
        # nn.scan: params broadcast across steps (flax lifted transform —
        # a raw lax.scan over bound methods leaks tracers)
        scan = nn.scan(lambda mdl, c, xs: mdl._tf_step(c, xs),
                       variable_broadcast="params",
                       split_rngs={"params": False})
        (state, _, nll, _), _ = scan(
            self, (state, node_mask0, jnp.float32(0.0), jnp.int32(0)),
            (step_types, labels))
        return nll

    def _tf_step(self, carry, xs):
            (hv, esrc, edst, he, edge_mask, n_nodes, n_edges), \
                node_mask, nll, pending_bond = carry
            st, lb = xs
            h_logits, e_logits, d_logits, src_idx, bond_1h = self._heads(
                hv, node_mask, n_nodes, pending_bond)
            # labelled log-probs; stop sentinel -1 -> last class
            an_lb = jnp.where(lb < 0, self.n_node_types, lb)
            ae_lb = jnp.where(lb < 0, self.n_bond_types, lb)
            logp_an = jax.nn.log_softmax(h_logits)[an_lb]
            logp_ae = jax.nn.log_softmax(e_logits)[ae_lb]
            # choose-dest over <src dests; with one candidate logp = 0
            # (reference skips it when nelement <= 1)
            logp_cd = jnp.where(
                src_idx > 1,
                jax.nn.log_softmax(d_logits)[jnp.minimum(
                    lb, self.max_nodes - 1)],
                0.0)
            nll = nll - jnp.where(
                st == ADD_NODE, logp_an,
                jnp.where(st == ADD_EDGE, logp_ae,
                          jnp.where(st == CHOOSE_DEST, logp_cd, 0.0)))

            # masked state transitions
            g_embed = self._graph_embed(hv, node_mask)
            do_add = jnp.logical_and(st == ADD_NODE, lb >= 0)
            hv_a, mask_a, n_a = self._apply_add_node(
                hv, node_mask, n_nodes, lb, g_embed)
            hv = jnp.where(do_add, hv_a, hv)
            node_mask = jnp.where(do_add, mask_a, node_mask)
            n_nodes = jnp.where(do_add, n_a, n_nodes)

            do_dest = st == CHOOSE_DEST
            new_state = self._apply_choose_dest(
                (hv, esrc, edst, he, edge_mask, n_nodes, n_edges),
                jnp.minimum(jnp.maximum(lb, 0), self.max_nodes - 1),
                bond_1h)
            state = tuple(
                jnp.where(do_dest, a, b) for a, b in zip(
                    new_state,
                    (hv, esrc, edst, he, edge_mask, n_nodes, n_edges)))
            # remember the bond type of an ADD_EDGE decision for the
            # following CHOOSE_DEST step's features/edge init
            pending_bond = jnp.where(
                jnp.logical_and(st == ADD_EDGE, lb >= 0), lb, pending_bond)
            return (state, node_mask, nll, pending_bond), None

    # -- ancestral sampling -----------------------------------------------------
    def generate(self, rng: Array, max_steps: Optional[int] = None):
        """Sample a graph; the decision-kind register replaces the
        reference's Python while-loops (DGMG.rollout path)."""
        S = max_steps or (2 * self.max_nodes + 2 * self.max_edges + 2)
        state = self._init_state()
        node_mask0 = jnp.zeros(self.max_nodes)
        types0 = jnp.zeros(self.max_nodes, jnp.int32)
        bonds0 = jnp.zeros(2 * self.max_edges, jnp.int32)
        keys = jax.random.split(rng, S)
        carry = (state, node_mask0, jnp.int32(ADD_NODE), jnp.bool_(False),
                 types0, bonds0, jnp.int32(0))
        scan = nn.scan(lambda mdl, c, k: mdl._gen_step(c, k),
                       variable_broadcast="params",
                       split_rngs={"params": False})
        carry, _ = scan(self, carry, keys)
        types, bonds = carry[4], carry[5]
        hv, esrc, edst, he, edge_mask, n_nodes, n_edges = carry[0]
        return {"node_types": types, "src": esrc, "dst": edst,
                "bond_types": bonds, "num_nodes": n_nodes,
                "num_edges": n_edges, "edge_mask": edge_mask}

    def _gen_step(self, carry, key):
            (hv, esrc, edst, he, edge_mask, n_nodes, n_edges), node_mask, \
                mode, done, types, bonds, pending_bond = carry
            h_logits, e_logits, d_logits, src_idx, _ = self._heads(
                hv, node_mask, n_nodes, pending_bond)
            k1, k2, k3 = jax.random.split(key, 3)
            an = jax.random.categorical(k1, h_logits)
            ae = jax.random.categorical(k2, e_logits)
            cd = jax.random.categorical(k3, d_logits)

            g_embed = self._graph_embed(hv, node_mask)
            # ADD_NODE transition
            full = n_nodes >= self.max_nodes
            add_ok = jnp.logical_and(
                jnp.logical_and(mode == ADD_NODE, an < self.n_node_types),
                jnp.logical_and(jnp.logical_not(done),
                                jnp.logical_not(full)))
            hv_a, mask_a, n_a = self._apply_add_node(
                hv, node_mask, n_nodes, an, g_embed)
            hv = jnp.where(add_ok, hv_a, hv)
            node_mask = jnp.where(add_ok, mask_a, node_mask)
            types = jnp.where(add_ok, types.at[n_nodes].set(an), types)
            n_nodes = jnp.where(add_ok, n_a, n_nodes)
            done = jnp.where(
                jnp.logical_and(mode == ADD_NODE,
                                jnp.logical_or(an >= self.n_node_types,
                                               full)),
                True, done)

            # ADD_EDGE decision: stop -> back to ADD_NODE; else remember
            # the bond type and move to CHOOSE_DEST
            efull = n_edges + 2 > 2 * self.max_edges
            e_go = jnp.logical_and(
                jnp.logical_and(mode == ADD_EDGE, ae < self.n_bond_types),
                jnp.logical_and(src_idx >= 1, jnp.logical_not(efull)))
            pending_bond = jnp.where(e_go, ae, pending_bond)

            # CHOOSE_DEST transition
            do_dest = mode == CHOOSE_DEST
            bond_1h = jax.nn.one_hot(pending_bond, self.n_bond_types)
            new_state = self._apply_choose_dest(
                (hv, esrc, edst, he, edge_mask, n_nodes, n_edges),
                cd, bond_1h)
            bonds = jnp.where(do_dest,
                              bonds.at[n_edges].set(pending_bond)
                              .at[n_edges + 1].set(pending_bond), bonds)
            (hv, esrc, edst, he, edge_mask, n_nodes, n_edges) = tuple(
                jnp.where(do_dest, a, b) for a, b in zip(
                    new_state,
                    (hv, esrc, edst, he, edge_mask, n_nodes, n_edges)))

            mode = jnp.where(
                done, PAD,
                jnp.where(mode == ADD_NODE,
                          jnp.where(add_ok, ADD_EDGE, PAD),
                          jnp.where(mode == ADD_EDGE,
                                    jnp.where(e_go, CHOOSE_DEST, ADD_NODE),
                                    ADD_EDGE)))  # after dest: more edges?
            carry = ((hv, esrc, edst, he, edge_mask, n_nodes, n_edges),
                     node_mask, mode, done, types, bonds, pending_bond)
            return carry, None
