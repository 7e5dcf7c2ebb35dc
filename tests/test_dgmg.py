"""DGMG generative model tests (reference: model_zoo/chem/dgmg.py —
here the scan-based TPU reformulation: teacher-forced NLL, padding
invariance, overfit, and structurally valid sampling)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dgl_hack_tpu.models.dgmg import (ADD_EDGE, ADD_NODE, CHOOSE_DEST, DGMG,
                                      PAD, build_action_trace)


def triangle_trace(max_steps=24):
    return build_action_trace(np.array([0, 1, 0]), np.array([0, 1, 0]),
                              np.array([1, 2, 2]), np.array([0, 1, 0]),
                              max_steps)


@pytest.fixture(scope="module")
def model_and_params():
    st, lb = triangle_trace()
    m = DGMG(n_node_types=3, n_bond_types=2, node_hidden_size=16,
             num_prop_rounds=2, max_nodes=8, max_edges=8)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(st), jnp.asarray(lb))
    return m, params


def test_action_trace_structure():
    st, lb = triangle_trace()
    live = st[st != PAD]
    # 3 add-node + 1 stop, 3 add-edge + 3 stops, 3 choose-dest
    assert (live == ADD_NODE).sum() == 4
    assert (live == ADD_EDGE).sum() == 6
    assert (live == CHOOSE_DEST).sum() == 3
    # node 0 has no incident earlier edges: first two steps are
    # add_node(0) then add_edge stop
    assert st[0] == ADD_NODE and lb[0] == 0
    assert st[1] == ADD_EDGE and lb[1] == -1
    with pytest.raises(ValueError):
        build_action_trace(np.zeros(9, np.int64), np.zeros(0), np.zeros(0),
                           np.zeros(0), max_steps=4)


def test_nll_finite_and_padding_invariant(model_and_params):
    m, params = model_and_params
    st, lb = triangle_trace(max_steps=24)
    st2, lb2 = triangle_trace(max_steps=40)
    a = float(m.apply(params, jnp.asarray(st), jnp.asarray(lb)))
    b = float(m.apply(params, jnp.asarray(st2), jnp.asarray(lb2)))
    assert np.isfinite(a) and abs(a - b) < 1e-4


def test_dgmg_overfits_single_graph(model_and_params):
    m, params = model_and_params
    st, lb = triangle_trace()
    st, lb = jnp.asarray(st), jnp.asarray(lb)
    opt = optax.adam(5e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        nll, g = jax.value_and_grad(lambda p: m.apply(p, st, lb))(p)
        up, s = opt.update(g, s)
        return optax.apply_updates(p, up), s, nll

    first = None
    for _ in range(40):
        params, state, nll = step(params, state)
        if first is None:
            first = float(nll)
    assert float(nll) < 0.5 * first


def test_generate_structurally_valid(model_and_params):
    m, params = model_and_params
    for seed in range(3):
        out = m.apply(params, jax.random.PRNGKey(seed),
                      method=DGMG.generate)
        n, e = int(out["num_nodes"]), int(out["num_edges"])
        assert 0 <= n <= 8 and 0 <= e <= 16 and e % 2 == 0
        em = np.asarray(out["edge_mask"])
        assert em.sum() == e
        src = np.asarray(out["src"])[:e]
        dst = np.asarray(out["dst"])[:e]
        if e:
            assert src.max() < n and dst.max() < n
            assert np.all(src != dst)
        types = np.asarray(out["node_types"])[:n]
        if n:
            assert types.max() < 3
