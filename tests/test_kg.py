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
