"""Distributed-support tests (reference: tests/compute/test_kvstore.py,
test_dis_sampler.py, tests/distributed/test_shared_mem_store.py — their
localhost-socket patterns become in-process equivalents here)."""
import numpy as np
import pytest

from dgl_hack_tpu.distributed import (
    ThreadedPrefetcher, FeatureStore, read_ip_config,
)


def test_prefetcher_order_and_device(rng):
    items = [np.full((4,), i, np.float32) for i in range(10)]
    out = list(ThreadedPrefetcher(items, capacity=3))
    assert len(out) == 10
    for i, o in enumerate(out):
        np.testing.assert_array_equal(np.asarray(o), items[i])


def test_prefetcher_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("boom")
    with pytest.raises(RuntimeError):
        list(ThreadedPrefetcher(gen(), device_put=False))


def test_feature_store_pull_push(rng, tmp_path):
    fs = FeatureStore({"emb": rng.normal(size=(20, 4)).astype(np.float32)})
    rows = np.array([3, 7, 3])
    out = fs.pull("emb", rows, to_device=False)
    np.testing.assert_allclose(out, fs["emb"][rows])
    before = fs["emb"][3].copy()
    fs.push_add("emb", np.array([3, 3]), np.ones((2, 4), np.float32))
    np.testing.assert_allclose(fs["emb"][3], before + 2.0, rtol=1e-6)
    # mmap roundtrip (the shm analogue)
    paths = fs.save(str(tmp_path / "store"))
    fs2 = FeatureStore.from_mmap(paths)
    np.testing.assert_allclose(np.asarray(fs2["emb"]),
                               np.asarray(fs["emb"]))
    with pytest.raises(ValueError):
        fs2.push_add("emb", rows[:1], np.ones((1, 4)))


def test_read_ip_config(tmp_path):
    p = tmp_path / "ip_config.txt"
    p.write_text("10.0.0.1 30050 1\n10.0.0.2 30050 1\n")
    hosts = read_ip_config(str(p))
    assert hosts == [("10.0.0.1", 30050), ("10.0.0.2", 30050)]


def test_sampler_with_prefetch(rng):
    """Sampler pipeline end-to-end through the prefetcher (the reference's
    dis_sampler send/recv loop, in-process)."""
    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.sampling import MultiLayerNeighborSampler, NodeDataLoader
    src = rng.integers(0, 60, 500).astype(np.int32)
    dst = rng.integers(0, 60, 500).astype(np.int32)
    g = dgl.graph((src, dst), num_nodes=60)
    sampler = MultiLayerNeighborSampler([3, 3], replace=True, seed=0)
    loader = NodeDataLoader(g, np.arange(60), sampler, batch_size=20, seed=0)
    n = 0
    for input_nodes, seeds, blocks in ThreadedPrefetcher(iter(loader),
                                                         device_put=False):
        assert len(blocks) == 2
        n += 1
    assert n == 3
