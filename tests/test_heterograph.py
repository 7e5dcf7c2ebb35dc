"""Heterograph tests (counterpart of reference tests/compute/test_heterograph.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dgl_hack_tpu as dgl
from dgl_hack_tpu import fn


@pytest.fixture
def hg(rng):
    return dgl.heterograph({
        ("user", "follows", "user"): ([0, 1, 2], [1, 2, 3]),
        ("user", "plays", "game"): ([0, 1, 1, 3], [0, 0, 1, 1]),
        ("developer", "develops", "game"): ([0, 1], [0, 1]),
    })


def test_schema(hg):
    assert set(hg.ntypes) == {"user", "game", "developer"}
    assert hg.num_nodes("user") == 4
    assert hg.num_nodes("game") == 2
    assert hg.num_edges("plays") == 4
    assert hg.to_canonical_etype("develops") == \
        ("developer", "develops", "game")


def test_update_all_single_etype(hg):
    hg.nodes_data("user")["h"] = jnp.arange(4.0)[:, None]
    hg.update_all(fn.copy_u("h", "m"), fn.sum("m", "agg"), etype="plays")
    out = np.asarray(hg.nodes_data("game")["agg"])
    np.testing.assert_allclose(out, [[0.0 + 1.0], [1.0 + 3.0]])


def test_multi_update_all(hg):
    hg.nodes_data("user")["h"] = jnp.ones((4, 2))
    hg.nodes_data("developer")["h"] = 2 * jnp.ones((2, 2))
    hg.multi_update_all({
        "plays": (fn.copy_u("h", "m"), fn.sum("m", "agg")),
        "develops": (fn.copy_u("h", "m"), fn.sum("m", "agg")),
    }, "sum")
    out = np.asarray(hg.nodes_data("game")["agg"])
    # game0: 2 users + 1 dev*2 = 4; game1: 2 users + 2 = 4
    np.testing.assert_allclose(out, [[4.0, 4.0], [4.0, 4.0]])


def test_multi_update_all_stack(hg):
    hg.nodes_data("user")["h"] = jnp.ones((4, 2))
    hg.nodes_data("developer")["h"] = jnp.ones((2, 2))
    hg.multi_update_all({
        "plays": (fn.copy_u("h", "m"), fn.sum("m", "agg")),
        "develops": (fn.copy_u("h", "m"), fn.sum("m", "agg")),
    }, "stack")
    assert hg.nodes_data("game")["agg"].shape == (2, 2, 2)


def test_pytree_roundtrip(hg):
    hg.nodes_data("user")["h"] = jnp.ones((4, 3))
    leaves, treedef = jax.tree_util.tree_flatten(hg)
    hg2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert hg2.canonical_etypes == hg.canonical_etypes
    assert "h" in hg2.nodes_data("user")

    @jax.jit
    def f(h):
        h.update_all(fn.copy_u("h", "m"), fn.sum("m", "out"), etype="follows")
        return h.nodes_data("user")["out"]

    out = f(hg)
    assert out.shape == (4, 3)


def test_to_homogeneous(hg):
    g, info = dgl.to_homogeneous(hg)
    assert g.num_nodes() == 4 + 2 + 2
    assert g.num_edges() == 3 + 4 + 2
    assert len(info["edge_types"]) == 9


def test_hetero_conv(hg, rng):
    import dgl_hack_tpu.nn as gnn
    mods = {
        "follows": gnn.SAGEConv(out_feats=5),
        "plays": gnn.SAGEConv(out_feats=5),
        "develops": gnn.SAGEConv(out_feats=5),
    }
    conv = gnn.HeteroGraphConv(mods=mods, aggregate="sum")
    inputs = {
        "user": jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32)),
        "game": jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32)),
        "developer": jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32)),
    }
    params = conv.init(jax.random.PRNGKey(0), hg, inputs)
    out = conv.apply(params, hg, inputs)
    assert out["game"].shape == (2, 5)
    assert out["user"].shape == (4, 5)


def test_heterograph_serialization(hg, tmp_path):
    from dgl_hack_tpu.data import save_heterograph, load_heterograph
    hg.nodes_data("user")["h"] = jnp.ones((4, 2))
    save_heterograph(str(tmp_path / "hg"), hg)
    hg2 = load_heterograph(str(tmp_path / "hg"))
    assert set(hg2.canonical_etypes) == set(hg.canonical_etypes)
    assert hg2.num_nodes("user") == 4
    np.testing.assert_allclose(np.asarray(hg2.nodes_data("user")["h"]),
                               np.ones((4, 2)))
    s1, d1 = hg.relations[("user", "plays", "game")].host_edges()
    s2, d2 = hg2.relations[("user", "plays", "game")].host_edges()
    np.testing.assert_array_equal(s1, s2)


def _mk_hetero(rng, seed_off=0):
    r = np.random.default_rng(42 + seed_off)
    nu, ng = int(r.integers(3, 7)), int(r.integers(2, 5))
    hg = dgl.heterograph({
        ("user", "follows", "user"): (r.integers(0, nu, 6), r.integers(0, nu, 6)),
        ("user", "plays", "game"): (r.integers(0, nu, 5), r.integers(0, ng, 5)),
    }, num_nodes_dict={"user": nu, "game": ng})
    hg.nodes_data("user")["h"] = jnp.asarray(
        r.normal(size=(nu, 4)).astype(np.float32))
    hg.edges_data("plays")["w"] = jnp.asarray(
        r.normal(size=(5, 2)).astype(np.float32))
    return hg


def test_batch_hetero_roundtrip(rng):
    gs = [_mk_hetero(rng, i) for i in range(3)]
    bg = dgl.batch_hetero(gs)
    assert bg.batch_size == 3
    assert bg.batch_num_nodes("user") == tuple(g.num_nodes("user") for g in gs)
    assert bg.batch_num_edges("plays") == tuple(g.num_edges("plays") for g in gs)
    assert bg.num_nodes("user") == sum(g.num_nodes("user") for g in gs)
    # message passing on the batched graph == blockdiag of components
    for g in gs + [bg]:
        g.multi_update_all(
            {"plays": (fn.copy_u("h", "m"), fn.sum("m", "out"))}, "sum")
    got = np.asarray(bg.nodes_data("game")["out"])
    want = np.concatenate([np.asarray(g.nodes_data("game")["out"])
                           for g in gs])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # unbatch restores structure and features
    parts = dgl.unbatch_hetero(bg)
    assert len(parts) == 3
    for p, g in zip(parts, gs):
        assert p.num_nodes("user") == g.num_nodes("user")
        np.testing.assert_allclose(np.asarray(p.nodes_data("user")["h"]),
                                   np.asarray(g.nodes_data("user")["h"]))
        np.testing.assert_allclose(np.asarray(p.edges_data("plays")["w"]),
                                   np.asarray(g.edges_data("plays")["w"]))
        s_p, d_p = p.relations[("user", "plays", "game")].host_edges()
        s_g, d_g = g.relations[("user", "plays", "game")].host_edges()
        np.testing.assert_array_equal(s_p, s_g)
        np.testing.assert_array_equal(d_p, d_g)


def test_hetero_api_extras(rng):
    """Reference: heterograph.py apply_nodes / type subgraphs /
    local_var/local_scope."""
    import dgl_hack_tpu as dgl
    hg = dgl.heterograph({
        ("user", "follows", "user"): ([0, 1], [1, 2]),
        ("user", "plays", "game"): ([0, 2], [0, 1]),
    })
    assert hg.number_of_nodes("user") == 3
    assert hg.number_of_edges("plays") == 2

    hg.nodes_data("user")["h"] = np.ones((3, 2), np.float32)
    hg.apply_nodes(lambda nb: {"h2": nb.data["h"] * 2}, ntype="user")
    assert np.allclose(np.asarray(hg.nodes_data("user")["h2"]), 2.0)

    sub = hg.node_type_subgraph(["user"])
    assert sub.canonical_etypes == (("user", "follows", "user"),)
    sub2 = hg.edge_type_subgraph(["plays"])
    assert set(sub2.ntypes) == {"game", "user"}
    assert sub2.num_edges() == 2

    with hg.local_scope():
        hg.nodes_data("game")["x"] = np.zeros((2, 1), np.float32)
        assert "x" in hg.nodes_data("game")
    assert "x" not in hg.nodes_data("game")
    lv = hg.local_var()
    lv.nodes_data("user")["y"] = np.zeros((3, 1), np.float32)
    assert "y" not in hg.nodes_data("user")


def test_multi_update_all_udf_reducer(hg, rng):
    """UDF reducers in multi_update_all run over the padded mailbox per
    relation and must match per-etype update_all + manual cross-combine
    (reference: python/dgl/heterograph.py:3570 degree-bucketing path)."""
    hu = rng.normal(size=(4, 3)).astype(np.float32)
    hd = rng.normal(size=(2, 3)).astype(np.float32)
    hg.nodes_data("user")["h"] = jnp.asarray(hu)
    hg.nodes_data("developer")["h"] = jnp.asarray(hd)

    def udf_reduce(nodes):
        # masked mean over the mailbox — exercises mask + degrees
        m = nodes.mailbox["m"]
        w = nodes.mask[..., None].astype(m.dtype)
        return {"agg": (m * w).sum(1) /
                jnp.maximum(nodes.degrees, 1)[:, None]}

    hg.multi_update_all({
        "plays": (fn.copy_u("h", "m"), udf_reduce),
        "develops": (fn.copy_u("h", "m"), udf_reduce),
    }, "sum")
    got = np.asarray(hg.nodes_data("game")["agg"])

    # oracle: builtin mean per etype + manual sum
    hg2 = dgl.heterograph({
        ("user", "follows", "user"): ([0, 1, 2], [1, 2, 3]),
        ("user", "plays", "game"): ([0, 1, 1, 3], [0, 0, 1, 1]),
        ("developer", "develops", "game"): ([0, 1], [0, 1]),
    })
    hg2.nodes_data("user")["h"] = jnp.asarray(hu)
    hg2.nodes_data("developer")["h"] = jnp.asarray(hd)
    hg2.update_all(fn.copy_u("h", "m"), fn.mean("m", "a1"), etype="plays")
    hg2.update_all(fn.copy_u("h", "m"), fn.mean("m", "a2"),
                   etype="develops")
    want = np.asarray(hg2.nodes_data("game")["a1"]) + \
        np.asarray(hg2.nodes_data("game")["a2"])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_multi_update_all_udf_apply_node(hg):
    hg.nodes_data("user")["h"] = jnp.ones((4, 2))
    hg.nodes_data("developer")["h"] = 2 * jnp.ones((2, 2))
    hg.multi_update_all({
        "plays": (fn.copy_u("h", "m"), fn.sum("m", "agg")),
        "develops": (fn.copy_u("h", "m"), fn.sum("m", "agg")),
    }, "sum", apply_node_func=lambda nodes: {"agg": nodes.data["agg"] * 10})
    out = np.asarray(hg.nodes_data("game")["agg"])
    np.testing.assert_allclose(out, [[40.0, 40.0], [40.0, 40.0]])
