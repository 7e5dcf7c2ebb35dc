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


# ---------------------------------------------------------------------------
# KVStore (reference: tests/compute/test_kvstore.py — server+client over
# 127.0.0.1; here both the native TCP transport and the loopback fallback)
# ---------------------------------------------------------------------------
def _run_kvstore_scenario(server_t, client_t, num_servers=2, num_clients=2):
    import threading
    import numpy as np
    from dgl_hack_tpu.distributed import KVServer, KVClient

    N, F = 40, 4
    book = (np.arange(N) >= N // 2).astype(np.int64)  # range partition
    shards = [np.zeros((N // 2, F), np.float32) for _ in range(num_servers)]

    def serve(i):
        sv = KVServer(i, num_clients, transport=server_t(i))
        sv.init_data("emb", shards[i], offset=i * (N // 2))
        sv.start()

    threads = [threading.Thread(target=serve, args=(i,), daemon=True)
               for i in range(num_servers)]
    for t in threads:
        t.start()

    clients = []
    def connect(i):
        c = KVClient(i, num_servers, transport=client_t(i))
        c.set_partition_book("emb", book)
        clients.append(c)
    cts = [threading.Thread(target=connect, args=(i,))
           for i in range(num_clients)]
    for t in cts:
        t.start()
    for t in cts:
        t.join()

    clients.sort(key=lambda c: c.client_id)
    c0, c1 = clients[0], clients[1]
    ids = np.array([0, 3, 25, 39, 3])
    c0.push("emb", ids, np.ones((5, F), np.float32))
    # a barrier completes only when EVERY client enters it — run them
    # concurrently (each client is its own process in the reference)
    bt = threading.Thread(target=c1.barrier)
    bt.start()
    c0.barrier()
    bt.join()
    got = c1.pull("emb", np.array([3, 25, 1]))
    assert np.allclose(got[0], 2.0)     # id 3 pushed twice
    assert np.allclose(got[1], 1.0)
    assert np.allclose(got[2], 0.0)
    # cross-partition pull in one call, including repeats
    got2 = c0.pull("emb", np.array([39, 0, 39]))
    assert np.allclose(got2[0], 1.0) and np.allclose(got2[2], 1.0)
    for c in clients:
        c.shutdown()
    for t in threads:
        t.join(timeout=10)
        assert not t.is_alive()


def test_kvstore_loopback():
    from dgl_hack_tpu.distributed.kvstore import make_transports
    st, ct = make_transports(2, 2, base_port=0)
    _run_kvstore_scenario(st, ct)


def test_kvstore_native_tcp():
    from dgl_hack_tpu.native import get_net_lib
    if get_net_lib() is None:
        import pytest
        pytest.skip("native netcomm unavailable")
    import socket
    from dgl_hack_tpu.distributed.kvstore import make_transports
    # find a free port block
    s = socket.socket(); s.bind(("127.0.0.1", 0))
    base = s.getsockname()[1]
    s.close()
    if base > 64000:
        base = 23000
    st, ct = make_transports(2, 2, base_port=base, use_native=True)
    _run_kvstore_scenario(st, ct)


def test_kvstore_fastpull_local_shard():
    """FastPull: a co-located shard is read without network round-trips."""
    import threading
    import numpy as np
    from dgl_hack_tpu.distributed import KVServer, KVClient
    from dgl_hack_tpu.distributed.kvstore import make_transports

    st, ct = make_transports(1, 1)
    N, F = 10, 2
    shard = np.arange(N * F, dtype=np.float32).reshape(N, F)

    sv = KVServer(0, 1, transport=st(0))
    sv.init_data("x", shard.copy())
    th = threading.Thread(target=sv.start, daemon=True)
    th.start()
    c = KVClient(0, 1, transport=ct(0))
    c.set_partition_book("x", np.zeros(N, np.int64))
    c.set_local_shard("x", 0, shard)     # all rows local
    got = c.pull("x", np.array([2, 7]))
    assert np.allclose(got, shard[[2, 7]])
    c.shutdown()
    th.join(timeout=5)


def test_kvstore_custom_push_handler():
    """KGEServer pattern (reference: apps/kg/kvserver.py:35): override the
    push handler — here a sparse-Adagrad-style scaled update."""
    import threading
    import numpy as np
    from dgl_hack_tpu.distributed import KVServer, KVClient
    from dgl_hack_tpu.distributed.kvstore import make_transports

    class AdaServer(KVServer):
        def _push_handler(self, name, local_ids, data):
            state = self._data[name + "_state"]
            np.add.at(state, local_ids, (data ** 2).sum(-1))
            scale = 1.0 / np.sqrt(state[local_ids] + 1e-10)
            np.add.at(self._data[name], local_ids, -0.1 * data
                      * scale[:, None])

    st, ct = make_transports(1, 1)
    N, F = 6, 3
    sv = AdaServer(0, 1, transport=st(0))
    sv.init_data("w", np.zeros((N, F), np.float32))
    sv.init_data("w_state", np.zeros(N, np.float32))
    th = threading.Thread(target=sv.start, daemon=True)
    th.start()
    c = KVClient(0, 1, transport=ct(0))
    c.set_partition_book("w", np.zeros(N, np.int64))
    g = np.ones((2, F), np.float32)
    c.push("w", np.array([1, 4]), g)
    c.barrier()
    got = c.pull("w", np.array([1, 4, 0]))
    assert np.all(got[:2] < 0) and np.allclose(got[2], 0.0)
    c.shutdown()
    th.join(timeout=5)


# ---------------------------------------------------------------------------
# Distributed sampler service (reference: tests/compute/test_dis_sampler.py)
# ---------------------------------------------------------------------------
def test_sampler_serialize_roundtrip():
    import numpy as np
    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.sampling import MultiLayerNeighborSampler
    from dgl_hack_tpu.distributed import serialize_sample, deserialize_sample

    rng = np.random.default_rng(0)
    g = dgl.graph((rng.integers(0, 50, 300), rng.integers(0, 50, 300)),
                  num_nodes=50)
    sampler = MultiLayerNeighborSampler([3, 2], seed=0)
    blocks, inp, seeds = sampler.sample_blocks(g, np.arange(8))
    b2, i2, s2 = deserialize_sample(serialize_sample(blocks, inp, seeds))
    assert np.array_equal(i2, inp) and np.array_equal(s2, seeds)
    assert len(b2) == len(blocks)
    for a, b in zip(blocks, b2):
        assert a.num_src_nodes == b.num_src_nodes
        assert a.num_dst_nodes == b.num_dst_nodes
        sa, da = a.host_edges(); sb, db = b.host_edges()
        assert np.array_equal(sa, sb) and np.array_equal(da, db)
        if a.edge_mask is not None:
            assert b.edge_mask is not None
            ea = np.asarray(a.edge_mask); eb = np.asarray(b.edge_mask)
            assert np.array_equal(ea, eb)


def test_sampler_service_end_to_end():
    """Two sampler workers stream batches to one trainer over the
    native transport (loopback fallback if no toolchain)."""
    import threading
    import numpy as np
    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.sampling import MultiLayerNeighborSampler
    from dgl_hack_tpu.distributed import SamplerSender, SamplerReceiver
    from dgl_hack_tpu.distributed.kvstore import (LoopbackTransport,
                                                  NativeTransport)
    from dgl_hack_tpu.native import get_net_lib

    rng = np.random.default_rng(1)
    g = dgl.graph((rng.integers(0, 40, 200), rng.integers(0, 40, 200)),
                  num_nodes=40)

    if get_net_lib() is not None:
        import socket
        s = socket.socket(); s.bind(("127.0.0.1", 0))
        base = min(s.getsockname()[1], 25000); s.close()
        def recv_t():
            return NativeTransport(0, base, [], num_inbound=2)
        def send_t(i):
            return NativeTransport(i, base + 1 + i, [("127.0.0.1", base)],
                                   num_inbound=0)
    else:
        def recv_t():
            return LoopbackTransport(0, "trainer", [])
        def send_t(i):
            return LoopbackTransport(i, f"sampler{i}", ["trainer"])

    recv_holder = {}
    def trainer_setup():
        recv_holder["r"] = SamplerReceiver(recv_t(), num_senders=2)
    rt = threading.Thread(target=trainer_setup); rt.start()

    def work(i):
        sampler = MultiLayerNeighborSampler([2], seed=i)
        sender = SamplerSender(send_t(i))
        for _ in range(3):
            blocks, inp, seeds = sampler.sample_blocks(
                g, rng.integers(0, 40, 4))
            sender.send(blocks, inp, seeds)
        sender.signal_end()

    ws = [threading.Thread(target=work, args=(i,), daemon=True)
          for i in range(1, 3)]
    for w in ws:
        w.start()
    rt.join()
    got = list(recv_holder["r"])
    assert len(got) == 6
    for blocks, inp, seeds in got:
        assert len(blocks) == 1 and seeds.shape[0] == 4
        assert blocks[0].num_dst_nodes == 4
    for w in ws:
        w.join(timeout=5)
    recv_holder["r"].close()
