"""Knowledge-graph embeddings — DGL-KE capabilities, TPU-native.

Reference: apps/kg (KEModel, apps/kg/models/general_models.py:52; score
functions apps/kg/models/pytorch/score_fun.py; chunked negative sampling
apps/kg/dataloader/sampler.py:383,422).  The reference shards entity
embeddings across TCP KVStore servers with async sparse-row push/pull
(general_models.py:474-502, dis_kvstore.py); here the embedding table is
a jax.Array sharded over the mesh's devices (PartitionSpec row sharding)
and the "pull" is the compiled gather XLA emits — the
collectives ride ICI instead of sockets.

Scores are computed in DGL-KE's chunked layout: positives (B,), negatives
as (num_chunks, chunk_size, neg_sample_size) dense batched matmuls/dists
— MXU-shaped by construction.
"""
from __future__ import annotations

import functools
from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

Array = jax.Array


# ---------------------------------------------------------------------------
# score functions — positive (per-edge) and chunked-negative forms
# (reference: score_fun.py edge_func / create_neg per class)
# ---------------------------------------------------------------------------
def batched_l2_dist(a: Array, b: Array) -> Array:
    """(C, m, D) x (C, n, D) -> (C, m, n) pairwise l2 (reference:
    score_fun.py:26 baddbmm formulation — one batched matmul)."""
    a2 = (a * a).sum(-1)
    b2 = (b * b).sum(-1)
    sq = a2[..., :, None] - 2 * jnp.einsum("cmd,cnd->cmn", a, b) \
        + b2[..., None, :]
    return jnp.sqrt(jnp.maximum(sq, 1e-30))


def batched_l1_dist(a: Array, b: Array) -> Array:
    return jnp.abs(a[..., :, None, :] - b[..., None, :, :]).sum(-1)


class ScoreFunction(NamedTuple):
    """pos(head, rel, tail) -> (B,); neg_head/neg_tail score chunked
    negatives: (pos ents (C, S, D), rels (C, S, D), neg ents (C, N, D))
    -> (C, S, N)."""
    pos: Callable
    neg_head: Callable
    neg_tail: Callable
    relation_dim_mult: int = 1   # relation emb dim multiplier vs entity dim


def transe_score(gamma: float, dist: str = "l2") -> ScoreFunction:
    ndist = batched_l2_dist if dist == "l2" else batched_l1_dist
    order = 2 if dist == "l2" else 1

    def pos(h, r, t):
        s = h + r - t
        return gamma - jnp.linalg.norm(s, ord=order, axis=-1)

    def neg_tail(h, r, t_neg):
        return gamma - ndist(h + r, t_neg)

    def neg_head(t, r, h_neg):
        return gamma - ndist(t - r, h_neg)

    return ScoreFunction(pos, neg_head, neg_tail)


def distmult_score() -> ScoreFunction:
    def pos(h, r, t):
        return (h * r * t).sum(-1)

    def neg_tail(h, r, t_neg):
        return jnp.einsum("csd,cnd->csn", h * r, t_neg)

    def neg_head(t, r, h_neg):
        return jnp.einsum("csd,cnd->csn", t * r, h_neg)

    return ScoreFunction(pos, neg_head, neg_tail)


def complex_score() -> ScoreFunction:
    """ComplEx (reference: score_fun.py ComplExScore): emb = [re || im]."""
    def split(x):
        d = x.shape[-1] // 2
        return x[..., :d], x[..., d:]

    def pos(h, r, t):
        hr, hi = split(h)
        rr, ri = split(r)
        tr, ti = split(t)
        return ((hr * rr - hi * ri) * tr + (hr * ri + hi * rr) * ti).sum(-1)

    def neg_tail(h, r, t_neg):
        hr, hi = split(h)
        rr, ri = split(r)
        re = hr * rr - hi * ri
        im = hr * ri + hi * rr
        return jnp.einsum("csd,cnd->csn", jnp.concatenate([re, im], -1),
                          t_neg)

    def neg_head(t, r, h_neg):
        tr, ti = split(t)
        rr, ri = split(r)
        re = tr * rr + ti * ri
        im = ti * rr - tr * ri
        return jnp.einsum("csd,cnd->csn", jnp.concatenate([re, im], -1),
                          h_neg)

    return ScoreFunction(pos, neg_head, neg_tail)


def rescal_score(entity_dim: int, relation_dim: int) -> ScoreFunction:
    """RESCAL (reference: score_fun.py RESCALScore): r is a (D, D) matrix
    flattened in the relation table."""
    def pos(h, r, t):
        R = r.reshape(r.shape[:-1] + (entity_dim, entity_dim))
        return (h * jnp.einsum("...ij,...j->...i", R, t)).sum(-1)

    def neg_tail(h, r, t_neg):
        R = r.reshape(r.shape[:-1] + (entity_dim, entity_dim))
        hr = jnp.einsum("csi,csij->csj", h, R)
        return jnp.einsum("csd,cnd->csn", hr, t_neg)

    def neg_head(t, r, h_neg):
        R = r.reshape(r.shape[:-1] + (entity_dim, entity_dim))
        tr = jnp.einsum("csij,csj->csi", R, t)
        return jnp.einsum("csd,cnd->csn", tr, h_neg)

    return ScoreFunction(pos, neg_head, neg_tail,
                         relation_dim_mult=entity_dim)


def rotate_score(gamma: float, emb_init: float) -> ScoreFunction:
    """RotatE (reference: score_fun.py RotatEScore): entity = [re || im],
    relation = phase."""
    def split(x):
        d = x.shape[-1] // 2
        return x[..., :d], x[..., d:]

    def rot(h, r):
        hr, hi = split(h)
        phase = r / (emb_init / np.pi)
        rr, ri = jnp.cos(phase), jnp.sin(phase)
        return hr * rr - hi * ri, hr * ri + hi * rr

    def pos(h, r, t):
        rr, ri = rot(h, r)
        tr, ti = split(t)
        d = jnp.sqrt(jnp.maximum((rr - tr) ** 2 + (ri - ti) ** 2, 1e-30))
        return gamma - d.sum(-1)

    def neg_tail(h, r, t_neg):
        rr, ri = rot(h, r)
        hrot = jnp.concatenate([rr, ri], -1)            # (C, S, D)
        diff = hrot[:, :, None, :] - t_neg[:, None, :, :]
        re, im = split(diff)
        return gamma - jnp.sqrt(
            jnp.maximum(re ** 2 + im ** 2, 1e-30)).sum(-1)

    def neg_head(t, r, h_neg):
        # rotate negatives forward by r for each positive: use inverse
        # rotation on t instead: h ~ rot^{-1}(t)
        tr_, ti_ = split(t)
        phase = r / (emb_init / np.pi)
        rr, ri = jnp.cos(phase), -jnp.sin(phase)
        ir = tr_ * rr - ti_ * ri
        ii = tr_ * ri + ti_ * rr
        tinv = jnp.concatenate([ir, ii], -1)
        diff = tinv[:, :, None, :] - h_neg[:, None, :, :]
        re, im = split(diff)
        return gamma - jnp.sqrt(
            jnp.maximum(re ** 2 + im ** 2, 1e-30)).sum(-1)

    return ScoreFunction(pos, neg_head, neg_tail)


def transr_score(gamma: float, entity_dim: int,
                 relation_dim: int) -> ScoreFunction:
    """TransR (reference: score_fun.py TransRScore): entities projected
    into the relation space by a per-relation matrix before the TransE
    distance.  The projection matrices live in the 'projection' parameter
    table (the reference's projection_emb ExternalEmbedding)."""
    # NOTE: callers pass the flattened projection alongside r as
    # r = concat([r_vec (dr,), proj (de*dr,)]) so the ScoreFunction
    # signature stays uniform.
    dr, de = relation_dim, entity_dim

    def split_r(r):
        return r[..., :dr], r[..., dr:].reshape(r.shape[:-1] + (de, dr))

    def pos(h, r, t):
        rv, pr = split_r(r)
        hp = jnp.einsum("...e,...ed->...d", h, pr)
        tp = jnp.einsum("...e,...ed->...d", t, pr)
        return gamma - jnp.abs(hp + rv - tp).sum(-1)

    def neg_tail(h, r, t_neg):
        rv, pr = split_r(r)                          # (C,S,dr),(C,S,de,dr)
        hp = jnp.einsum("cse,csed->csd", h, pr) + rv
        tp = jnp.einsum("cne,csed->csnd", t_neg, pr)
        return gamma - jnp.abs(hp[:, :, None, :] - tp).sum(-1)

    def neg_head(t, r, h_neg):
        rv, pr = split_r(r)
        tp = jnp.einsum("cse,csed->csd", t, pr) - rv
        hp = jnp.einsum("cne,csed->csnd", h_neg, pr)
        return gamma - jnp.abs(tp[:, :, None, :] - hp).sum(-1)

    return ScoreFunction(pos, neg_head, neg_tail)


SCORE_FUNCS = {
    "TransE": lambda args: transe_score(args["gamma"], "l2"),
    "TransE_l1": lambda args: transe_score(args["gamma"], "l1"),
    "TransE_l2": lambda args: transe_score(args["gamma"], "l2"),
    "DistMult": lambda args: distmult_score(),
    "ComplEx": lambda args: complex_score(),
    "RESCAL": lambda args: rescal_score(args["hidden_dim"],
                                        args["hidden_dim"] ** 2),
    "RotatE": lambda args: rotate_score(args["gamma"], args["emb_init"]),
    "TransR": lambda args: transr_score(args["gamma"], args["hidden_dim"],
                                        args["hidden_dim"]),
}


# ---------------------------------------------------------------------------
# KEModel
# ---------------------------------------------------------------------------
class KEModel:
    """TPU-native KEModel (reference: general_models.py:52).

    Entity/relation tables are plain arrays in the optimizer state;
    `shard()` places the entity table row-sharded over a mesh (the
    KVStore-partition successor).  Training uses DGL-KE's loss:
    logsigmoid pairwise loss with optional self-adversarial negative
    weighting (general_models.py:371-399).
    """

    def __init__(self, num_entities: int, num_relations: int,
                 hidden_dim: int, score_func: str = "TransE_l2",
                 gamma: float = 12.0, double_entity_dim: bool = False,
                 seed: int = 0):
        self.num_entities = num_entities
        self.num_relations = num_relations
        args = {"gamma": gamma, "hidden_dim": hidden_dim,
                "emb_init": (gamma + 2.0) / hidden_dim}
        self.score = SCORE_FUNCS[score_func](args)
        self.score_name = score_func
        ent_dim = hidden_dim * (2 if score_func in ("ComplEx", "RotatE")
                                else 1)
        rel_dim = hidden_dim * (2 if score_func == "ComplEx" else 1)
        if score_func == "RESCAL":
            rel_dim = hidden_dim * hidden_dim
        if score_func == "TransR":
            # relation vector + flattened per-relation projection matrix
            # (reference: TransRScore projection_emb)
            rel_dim = hidden_dim + ent_dim * hidden_dim
        self.emb_init = args["emb_init"]
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        self.params = {
            "entity": jax.random.uniform(
                k1, (num_entities, ent_dim), jnp.float32,
                -self.emb_init, self.emb_init),
            "relation": jax.random.uniform(
                k2, (num_relations, rel_dim), jnp.float32,
                -self.emb_init, self.emb_init),
        }

    def shard(self, mesh) -> None:
        """Row-shard the entity table over the mesh (model parallelism for
        the embedding table, reference: KVStore partition_book)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        axis = mesh.axis_names[0]
        self.params = {
            "entity": jax.device_put(
                self.params["entity"],
                NamedSharding(mesh, P(axis, None))),
            "relation": jax.device_put(
                self.params["relation"], NamedSharding(mesh, P())),
        }

    # -- loss ---------------------------------------------------------------
    def loss_fn(self, params, heads, rels, tails, neg_ents, neg_is_head,
                chunk_size: int, neg_adversarial_sampling: bool = False,
                adversarial_temperature: float = 1.0,
                regularization_coef: float = 0.0):
        """heads/rels/tails (B,); neg_ents (C, N); B = C * chunk_size."""
        ent, rel = params["entity"], params["relation"]
        return self.loss_from_rows(
            ent[heads], rel[rels], ent[tails], ent[neg_ents], neg_is_head,
            chunk_size, neg_adversarial_sampling, adversarial_temperature,
            regularization_coef)

    def loss_from_rows(self, h, r, t, nc, neg_is_head, chunk_size: int,
                       neg_adversarial_sampling: bool = False,
                       adversarial_temperature: float = 1.0,
                       regularization_coef: float = 0.0):
        """Loss on pre-gathered embedding rows — differentiating wrt the
        rows themselves yields the sparse per-row gradients the
        reference's ExternalEmbedding.update consumes
        (apps/kg/models/pytorch/tensor_models.py adagrad update)."""
        pos_score = self.score.pos(h, r, t)                        # (B,)

        C = nc.shape[0]
        S = chunk_size
        hc = h.reshape(C, S, -1)
        rc = r.reshape(C, S, -1)
        tc = t.reshape(C, S, -1)
        neg_score = jnp.where(
            neg_is_head,
            self.score.neg_head(tc, rc, nc),
            self.score.neg_tail(hc, rc, nc))                       # (C, S, N)

        pos_l = jax.nn.log_sigmoid(pos_score)
        if neg_adversarial_sampling:
            w = jax.nn.softmax(neg_score * adversarial_temperature, axis=-1)
            w = jax.lax.stop_gradient(w)
            neg_l = (w * jax.nn.log_sigmoid(-neg_score)).sum(-1)
        else:
            neg_l = jax.nn.log_sigmoid(-neg_score).mean(-1)
        loss = -(pos_l.mean() + neg_l.mean()) / 2
        if regularization_coef > 0:
            reg = (jnp.abs(h) ** 3).mean() + (jnp.abs(t) ** 3).mean() \
                + (jnp.abs(r) ** 3).mean()
            loss = loss + regularization_coef * reg
        return loss

    # -- evaluation ---------------------------------------------------------
    def predict_all_tails(self, params, heads, rels,
                          batch: int = 1024) -> Array:
        """(B, num_entities) scores against every entity — eval ranking."""
        ent, rel = params["entity"], params["relation"]
        h = ent[heads][:, None, :]          # (B,1,D) as chunks of 1
        r = rel[rels][:, None, :]
        return self.score.neg_tail(h, r,
                                   jnp.broadcast_to(ent[None],
                                                    (h.shape[0],) + ent.shape)
                                   )[:, 0, :]


def eval_ranks(model: KEModel, params, heads, rels, tails,
               filter_dict=None, batch: int = 512) -> Dict[str, float]:
    """MRR / MR / HITS@k for tail prediction (reference: apps/kg eval.py
    protocol; 'raw' setting unless filter_dict given)."""
    ranks = []
    n = len(heads)
    for i in range(0, n, batch):
        hb = jnp.asarray(heads[i:i + batch])
        rb = jnp.asarray(rels[i:i + batch])
        tb = np.asarray(tails[i:i + batch])
        scores = np.asarray(model.predict_all_tails(params, hb, rb))
        if filter_dict is not None:
            for j in range(len(tb)):
                known = filter_dict.get((int(heads[i + j]),
                                         int(rels[i + j])), ())
                mask = [k for k in known if k != tb[j]]
                scores[j, mask] = -np.inf
        target = scores[np.arange(len(tb)), tb]
        rank = (scores > target[:, None]).sum(1) + 1
        ranks.append(rank)
    ranks = np.concatenate(ranks).astype(np.float64)
    return {"MRR": float((1.0 / ranks).mean()),
            "MR": float(ranks.mean()),
            "HITS@1": float((ranks <= 1).mean()),
            "HITS@3": float((ranks <= 3).mean()),
            "HITS@10": float((ranks <= 10).mean())}


def make_train_step(model: KEModel, tx, chunk_size: int,
                    neg_adversarial_sampling: bool = False,
                    adversarial_temperature: float = 1.0,
                    regularization_coef: float = 0.0):
    @jax.jit
    def step(params, opt_state, heads, rels, tails, neg_ents, neg_is_head):
        def lf(p):
            return model.loss_fn(
                p, heads, rels, tails, neg_ents, neg_is_head, chunk_size,
                neg_adversarial_sampling, adversarial_temperature,
                regularization_coef)
        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss
    return step


# ---------------------------------------------------------------------------
# Sparse-row Adagrad (reference: ExternalEmbedding,
# apps/kg/models/pytorch/tensor_models.py — grad_sum = (g*g).mean(1),
# emb[idx] -= lr * g / (sqrt(state[idx]) + 1e-10)) with the fork's
# --async_update semantics (one-step-stale application overlapped with
# the next batch, general_models.py:474-479 async_update processes).
# ---------------------------------------------------------------------------
def init_sparse_state(model: KEModel):
    """Per-row Adagrad accumulators for both embedding tables."""
    return {"ent_sum": jnp.zeros((model.num_entities,), jnp.float32),
            "rel_sum": jnp.zeros((model.num_relations,), jnp.float32)}


def _coalesce(rows: Array, grads: Array):
    """Sum gradient rows with duplicate indices (the analogue of torch
    sparse-tensor coalescing the reference relies on).  Returns (rows,
    grads) of the same static length; duplicate slots become (row 0,
    zero-grad) no-ops."""
    K = rows.shape[0]
    order = jnp.argsort(rows)
    rs, gs = rows[order], grads[order]
    new = jnp.concatenate([jnp.ones((1,), bool), rs[1:] != rs[:-1]])
    sid = jnp.cumsum(new) - 1
    gco = jax.ops.segment_sum(gs, sid, num_segments=K)
    rco = jax.ops.segment_max(rs, sid, num_segments=K)
    return jnp.clip(rco, 0, None), gco


def _adagrad_rows(table: Array, state_sum: Array, rows: Array,
                  grads: Array, lr: float):
    rows, grads = _coalesce(rows, grads)
    state_sum = state_sum.at[rows].add((grads * grads).mean(-1))
    std = jnp.sqrt(state_sum[rows]) + 1e-10
    table = table.at[rows].add(-lr * grads / std[:, None])
    return table, state_sum


def make_sparse_train_step(model: KEModel, lr: float, chunk_size: int,
                           neg_adversarial_sampling: bool = False,
                           adversarial_temperature: float = 1.0,
                           regularization_coef: float = 0.0,
                           async_update: bool = False):
    """DGL-KE-style sparse-row Adagrad train step.

    Gradients exist only for the rows a batch touches; the update
    scatters into the tables like the reference's
    ``ExternalEmbedding.update``.  With ``async_update=True`` the step
    returns this batch's row-updates as ``pending`` and applies the
    PREVIOUS call's ``pending`` first — one step of staleness, letting
    XLA overlap the scatter with the host preparing the next batch
    (the TPU-native reading of the fork's async updater processes).

    Returns ``step(params, state, heads, rels, tails, neg_ents,
    neg_is_head[, pending]) -> (params, state, loss[, pending])`` and,
    for the async form, ``empty_pending(batch_size, neg_shape)``.
    """
    def row_loss(h, r, t, n, neg_is_head):
        return model.loss_from_rows(
            h, r, t, n, neg_is_head, chunk_size,
            neg_adversarial_sampling, adversarial_temperature,
            regularization_coef)

    def compute(params, heads, rels, tails, neg_ents, neg_is_head):
        ent, rel = params["entity"], params["relation"]
        h, r, t = ent[heads], rel[rels], ent[tails]
        n = ent[neg_ents]
        loss, (gh, gr, gt, gn) = jax.value_and_grad(
            row_loss, argnums=(0, 1, 2, 3))(h, r, t, n, neg_is_head)
        ent_rows = jnp.concatenate([heads, tails, neg_ents.reshape(-1)])
        ent_grads = jnp.concatenate(
            [gh, gt, gn.reshape(-1, gn.shape[-1])])
        return loss, (ent_rows, ent_grads, rels, gr)

    def apply(params, state, upd):
        ent_rows, ent_grads, rel_rows, rel_grads = upd
        ent, es = _adagrad_rows(params["entity"], state["ent_sum"],
                                ent_rows, ent_grads, lr)
        rel, rs = _adagrad_rows(params["relation"], state["rel_sum"],
                                rel_rows, rel_grads, lr)
        return ({"entity": ent, "relation": rel},
                {"ent_sum": es, "rel_sum": rs})

    if not async_update:
        @jax.jit
        def step(params, state, heads, rels, tails, neg_ents, neg_is_head):
            loss, upd = compute(params, heads, rels, tails, neg_ents,
                                neg_is_head)
            params, state = apply(params, state, upd)
            return params, state, loss
        return step

    @jax.jit
    def step_async(params, state, heads, rels, tails, neg_ents,
                   neg_is_head, pending):
        params, state = apply(params, state, pending)
        loss, upd = compute(params, heads, rels, tails, neg_ents,
                            neg_is_head)
        return params, state, loss, upd

    def empty_pending(batch_size: int, neg_shape, ent_dim: int,
                      rel_dim: int):
        k = batch_size * 2 + int(np.prod(neg_shape))
        return (jnp.zeros((k,), jnp.int32),
                jnp.zeros((k, ent_dim), jnp.float32),
                jnp.zeros((batch_size,), jnp.int32),
                jnp.zeros((batch_size, rel_dim), jnp.float32))

    return step_async, empty_pending


def save_emb(path_prefix: str, params) -> None:
    """numpy checkpoint (reference: general_models.py:150 save_emb)."""
    np.save(path_prefix + ".entity.npy", np.asarray(params["entity"]))
    np.save(path_prefix + ".relation.npy", np.asarray(params["relation"]))


def load_emb(path_prefix: str) -> Dict[str, Array]:
    return {"entity": jnp.asarray(np.load(path_prefix + ".entity.npy")),
            "relation": jnp.asarray(np.load(path_prefix + ".relation.npy"))}
