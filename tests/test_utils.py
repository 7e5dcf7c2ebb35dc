"""Utils tests: checkpointing + partition save/load roundtrip."""
import numpy as np
import jax.numpy as jnp

import dgl_hack_tpu as dgl
from dgl_hack_tpu.utils import save_checkpoint, load_checkpoint


def test_checkpoint_roundtrip(tmp_path, rng):
    state = {"params": {"w": jnp.asarray(rng.normal(size=(4, 3)))},
             "opt": [jnp.zeros(3), jnp.ones(2)]}
    save_checkpoint(str(tmp_path / "ck"), state, step=7)
    out = load_checkpoint(str(tmp_path))
    assert out["step"] == 7
    np.testing.assert_allclose(np.asarray(out["state"]["params"]["w"]),
                               np.asarray(state["params"]["w"]))


def test_partition_save_load(tmp_path, rng):
    from dgl_hack_tpu.partition import (partition, partition_graph_with_halo,
                                        save_partitions, load_partition)
    src = rng.integers(0, 40, 200).astype(np.int32)
    dst = rng.integers(0, 40, 200).astype(np.int32)
    g = dgl.graph((src, dst), num_nodes=40)
    parts = partition(g, 4, method="fennel")
    partitions = partition_graph_with_halo(g, parts, num_hops=1)
    assert sum(p.inner_node.sum() for p in partitions) == 40
    # all inner edges covered exactly once
    assert sum(p.inner_edge.sum() for p in partitions) == 200
    save_partitions(str(tmp_path / "g"), partitions)
    p0 = load_partition(str(tmp_path / "g"), 0)
    assert p0.graph.num_nodes() == partitions[0].graph.num_nodes()
    np.testing.assert_array_equal(p0.node_map, partitions[0].node_map)


def test_fennel_beats_random_cut(rng):
    """Fennel should find a much smaller edge-cut than random on a
    community-structured graph (the METIS-quality sanity check)."""
    from dgl_hack_tpu.data import planted_partition
    from dgl_hack_tpu.partition import fennel_partition, random_partition
    ds = planted_partition(400, 4, 8, avg_degree=8.0, homophily=0.95,
                           seed=0)
    g = ds.graph
    s, d = g.host_edges()
    pf = fennel_partition(g, 4, seed=0)
    # NB: seed must differ from the dataset's — same default_rng stream
    # would exactly reproduce the class labels
    pr = random_partition(g, 4, seed=1234)
    cut_f = (pf[s] != pf[d]).mean()
    cut_r = (pr[s] != pr[d]).mean()
    assert cut_f < 0.7 * cut_r, (cut_f, cut_r)


def test_fennel_edge_balance_powerlaw(rng):
    """The weighted Fennel objective (balance_edges=True, the 'fennel'
    default) must bound per-part OWNED-EDGE imbalance on a power-law
    graph — the spatial plan pads every part to the max part's edge
    count, so this is the padded-compute tax (round-2 SCALING_CPU.json
    measured edge_pad_factor 2.39 at P=8 with the node-only objective)."""
    from dgl_hack_tpu.core.graph import graph as make_graph
    from dgl_hack_tpu.partition import fennel_partition

    n, E, k = 5000, 40000, 8
    deg = np.clip(rng.pareto(1.1, n) + 1, 1, None)
    dst = rng.choice(n, E, p=deg / deg.sum()).astype(np.int32)
    src = rng.integers(0, n, E).astype(np.int32)
    g = make_graph((src, dst), num_nodes=n, build_csr=True)
    p = fennel_partition(g, k, seed=0, balance_edges=True)
    ecnt = np.bincount(p[np.asarray(g.host("dst"))], minlength=k)
    assert ecnt.max() * k / E <= 1.3, ecnt
    # node balance must not collapse either (n_owned_max padding)
    ncnt = np.bincount(p, minlength=k)
    assert ncnt.max() * k / n <= 2.0, ncnt
