"""Knowledge-graph embedding tests (reference: apps/kg tests +
configs).  Chunked negative scores are checked against naive per-pair
positive scoring; TransE training on a tiny synthetic KG must push MRR
far above the random baseline."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from dgl_hack_tpu.models.kg import (
    KEModel, SCORE_FUNCS, eval_ranks, make_train_step, save_emb, load_emb,
)


@pytest.mark.parametrize("name", ["TransE_l2", "TransE_l1", "DistMult",
                                  "ComplEx", "RotatE", "TransR", "RESCAL"])
def test_neg_scores_match_pos(name, rng):
    """score.neg_*(chunked) must equal score.pos evaluated pairwise."""
    model = KEModel(50, 7, 16, score_func=name, gamma=10.0, seed=0)
    C, S, N = 2, 3, 5
    h = rng.integers(0, 50, C * S)
    r = rng.integers(0, 7, C * S)
    neg = rng.integers(0, 50, (C, N)).astype(np.int32)
    p = model.params
    ent, rel = p["entity"], p["relation"]
    hc = ent[jnp.asarray(h)].reshape(C, S, -1)
    rc = rel[jnp.asarray(r)].reshape(C, S, -1)
    nc = ent[jnp.asarray(neg)]
    out = np.asarray(model.score.neg_tail(hc, rc, nc))   # (C, S, N)
    for c in range(C):
        for s_ in range(S):
            for n_ in range(N):
                ref = model.score.pos(
                    ent[h[c * S + s_]][None],
                    rel[r[c * S + s_]][None],
                    ent[neg[c, n_]][None])
                np.testing.assert_allclose(out[c, s_, n_], float(ref[0]),
                                           rtol=2e-3, atol=2e-3)


def _toy_kg(rng, n_ent=40, n_rel=4, n_edges=400):
    """Relations are consistent permutation offsets -> learnable."""
    offsets = rng.integers(1, n_ent, n_rel)
    h = rng.integers(0, n_ent, n_edges)
    r = rng.integers(0, n_rel, n_edges)
    t = (h + offsets[r]) % n_ent
    return h.astype(np.int32), r.astype(np.int32), t.astype(np.int32)


def test_transe_training_improves_mrr(rng):
    h, r, t = _toy_kg(rng)
    model = KEModel(40, 4, 24, "TransE_l2", gamma=6.0, seed=0)
    tx = optax.adagrad(0.1)
    opt_state = tx.init(model.params)
    step = make_train_step(model, tx, chunk_size=8)
    params = model.params
    base = eval_ranks(model, params, h[:100], r[:100], t[:100])
    rngs = np.random.default_rng(0)
    for it in range(400):
        sel = rngs.integers(0, len(h), 64)
        neg = rngs.integers(0, 40, (8, 16)).astype(np.int32)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(h[sel]), jnp.asarray(r[sel]),
            jnp.asarray(t[sel]), jnp.asarray(neg),
            jnp.asarray(False))
    final = eval_ranks(model, params, h[:100], r[:100], t[:100])
    # TransE learns modular-offset structure slowly; assert clear progress
    assert final["MRR"] > 1.3 * base["MRR"], (base, final)
    assert float(loss) < 0.72


def test_adversarial_loss_finite(rng):
    model = KEModel(30, 3, 8, "DistMult", seed=0)
    loss = model.loss_fn(
        model.params, jnp.arange(8), jnp.zeros(8, jnp.int32),
        jnp.arange(8), jnp.zeros((2, 6), jnp.int32), jnp.asarray(True),
        chunk_size=4, neg_adversarial_sampling=True,
        adversarial_temperature=0.5, regularization_coef=1e-7)
    assert np.isfinite(float(loss))


def test_save_load_emb(tmp_path, rng):
    model = KEModel(10, 2, 4, seed=0)
    save_emb(str(tmp_path / "ckpt"), model.params)
    params = load_emb(str(tmp_path / "ckpt"))
    np.testing.assert_allclose(np.asarray(params["entity"]),
                               np.asarray(model.params["entity"]))


def test_sharded_entity_table(rng):
    """Entity table row-sharded over the 8-device mesh; a train step runs
    and produces finite loss (the KVStore-sharding successor)."""
    from jax.sharding import Mesh
    model = KEModel(64, 4, 16, "DistMult", seed=0)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("node",))
    model.shard(mesh)
    tx = optax.adagrad(0.1)
    opt_state = tx.init(model.params)
    step = make_train_step(model, tx, chunk_size=4)
    with mesh:
        params, opt_state, loss = step(
            model.params, opt_state, jnp.arange(8), jnp.zeros(8, jnp.int32),
            jnp.arange(8, 16), jnp.zeros((2, 5), jnp.int32),
            jnp.asarray(False))
    assert np.isfinite(float(loss))


def _batch(rng, n_ent, B=8, C=2, N=5):
    heads = jnp.asarray(rng.integers(0, n_ent, B).astype(np.int32))
    rels = jnp.asarray(rng.integers(0, 3, B).astype(np.int32))
    tails = jnp.asarray(rng.integers(0, n_ent, B).astype(np.int32))
    negs = jnp.asarray(rng.integers(0, n_ent, (C, N)).astype(np.int32))
    return heads, rels, tails, negs


def test_sparse_adagrad_matches_dense_oracle(rng):
    """One sparse-row step == dense autodiff + the reference's adagrad
    formula (grad_sum=(g*g).mean(1), row -= lr*g/(sqrt(sum)+1e-10))."""
    from dgl_hack_tpu.models.kg import (init_sparse_state,
                                        make_sparse_train_step)
    model = KEModel(30, 3, 8, "DistMult", seed=1)
    heads, rels, tails, negs = _batch(rng, 30)
    step = make_sparse_train_step(model, lr=0.1, chunk_size=4)
    state = init_sparse_state(model)
    p1, s1, loss = step(dict(model.params), state, heads, rels, tails,
                        negs, True)

    # dense oracle
    def lf(p):
        return model.loss_fn(p, heads, rels, tails, negs, True, 4)
    g = jax.grad(lf)(dict(model.params))
    for name, key, table in (("entity", "ent_sum", "entity"),
                             ("relation", "rel_sum", "relation")):
        gd = np.asarray(g[name], np.float64)
        touched = np.nonzero(np.abs(gd).sum(1))[0]
        sum_new = np.zeros(gd.shape[0])
        sum_new[touched] = (gd[touched] ** 2).mean(1)
        upd = np.zeros_like(gd)
        upd[touched] = -0.1 * gd[touched] / (
            np.sqrt(sum_new[touched]) + 1e-10)[:, None]
        want = np.asarray(model.params[table]) + upd
        np.testing.assert_allclose(np.asarray(p1[table]), want,
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(s1[key])[touched], sum_new[touched],
            rtol=2e-4, atol=1e-7)


def test_sparse_async_update_trains(rng):
    """async_update applies one-step-stale row updates; loss falls and
    the first (zero) pending is a no-op."""
    from dgl_hack_tpu.models.kg import (init_sparse_state,
                                        make_sparse_train_step)
    model = KEModel(40, 3, 12, "TransE_l2", gamma=6.0, seed=0)
    step, empty_pending = make_sparse_train_step(
        model, lr=0.5, chunk_size=4, async_update=True)
    params, state = dict(model.params), init_sparse_state(model)
    p0 = np.asarray(params["entity"]).copy()
    pending = empty_pending(8, (2, 5), params["entity"].shape[1],
                            params["relation"].shape[1])
    losses = []
    r = np.random.default_rng(3)
    for i in range(25):
        heads, rels, tails, negs = _batch(r, 40)
        params, state, loss, pending = step(params, state, heads, rels,
                                            tails, negs, (i % 2 == 0),
                                            pending)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    assert not np.allclose(np.asarray(params["entity"]), p0)
