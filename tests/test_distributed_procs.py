"""True multi-PROCESS distributed tests over real loopback TCP — the
process-boundary behaviors (fork/spawn safety, pickling, port binding)
the in-process tests cannot exercise (reference runs its kvstore/sampler
tests over 127.0.0.1 the same way, tests/compute/test_kvstore.py,
tests/distributed/test_shared_mem_store.py:20-60)."""
import multiprocessing as mp
import socket

import numpy as np
import pytest

N, F = 40, 4
NUM_SERVERS = 2
NUM_CLIENTS = 2


def _free_port_block():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    base = s.getsockname()[1]
    s.close()
    return base if base < 60000 else 24000


def _pin_cpu():
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")


def _server_main(server_id, base_port, q):
    _pin_cpu()
    from dgl_hack_tpu.distributed import KVServer
    from dgl_hack_tpu.distributed.kvstore import NativeTransport
    t = NativeTransport(
        server_id, base_port + server_id,
        [("127.0.0.1", base_port + 100 + c) for c in range(NUM_CLIENTS)],
        num_inbound=NUM_CLIENTS)
    sv = KVServer(server_id, NUM_CLIENTS, transport=t)
    sv.init_data("emb", np.zeros((N // NUM_SERVERS, F), np.float32),
                 offset=server_id * (N // NUM_SERVERS))
    sv.start()                      # returns after all clients shut down
    q.put(("server_done", server_id))


def _client_main(client_id, base_port, q):
    _pin_cpu()
    from dgl_hack_tpu.distributed import KVClient
    from dgl_hack_tpu.distributed.kvstore import NativeTransport
    t = NativeTransport(
        client_id, base_port + 100 + client_id,
        [("127.0.0.1", base_port + s) for s in range(NUM_SERVERS)],
        num_inbound=NUM_SERVERS)
    c = KVClient(client_id, NUM_SERVERS, transport=t)
    book = (np.arange(N) >= N // 2).astype(np.int64)
    c.set_partition_book("emb", book)
    if client_id == 0:
        c.push("emb", np.array([0, 3, 25, 39, 3]),
               np.ones((5, F), np.float32))
    c.barrier()
    got = c.pull("emb", np.array([3, 25, 1, 39]))
    q.put(("pull", client_id, got))
    c.barrier()
    c.shutdown()


def _native_available():
    from dgl_hack_tpu.native import get_net_lib
    return get_net_lib() is not None


@pytest.mark.skipif(not _native_available(),
                    reason="native netcomm unavailable")
def test_kvstore_multiprocess():
    """2 server processes + 2 client processes over real TCP: push from
    one client is visible to the other after a barrier; cross-partition
    pulls route correctly across process boundaries."""
    ctx = mp.get_context("spawn")
    base = _free_port_block()
    q = ctx.Queue()
    procs = [ctx.Process(target=_server_main, args=(i, base, q),
                         daemon=True) for i in range(NUM_SERVERS)]
    procs += [ctx.Process(target=_client_main, args=(i, base, q),
                          daemon=True) for i in range(NUM_CLIENTS)]
    for p in procs:
        p.start()
    pulls, server_done = {}, 0
    for _ in range(NUM_CLIENTS + NUM_SERVERS):
        msg = q.get(timeout=60)
        if msg[0] == "pull":
            pulls[msg[1]] = msg[2]
        else:
            server_done += 1
    for p in procs:
        p.join(timeout=30)
        assert p.exitcode == 0, p
    assert server_done == NUM_SERVERS
    for cid, got in pulls.items():
        np.testing.assert_allclose(got[0], 2.0)   # id 3 pushed twice
        np.testing.assert_allclose(got[1], 1.0)   # id 25
        np.testing.assert_allclose(got[2], 0.0)   # id 1 untouched
        np.testing.assert_allclose(got[3], 1.0)   # id 39 (other shard)


# ---------------------------------------------------------------------------
# SamplerPool in process mode: spawned samplers stream blocks over TCP to
# the trainer process (reference: dis_sampler.py SamplerPool fork +
# SamplerSender/Receiver)
# ---------------------------------------------------------------------------
_SAMPLER_BASE_PORT = [0]


def _sampler_worker(worker_id):
    # runs in a spawned process: rebuild graph, sample, stream, end-signal
    import os
    base = int(os.environ["DGL_TPU_TEST_SAMPLER_PORT"])
    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.distributed.dis_sampler import SamplerSender
    from dgl_hack_tpu.distributed.kvstore import NativeTransport
    from dgl_hack_tpu.sampling import MultiLayerNeighborSampler
    rng = np.random.default_rng(worker_id)
    src = rng.integers(0, 50, 300).astype(np.int32)
    dst = rng.integers(0, 50, 300).astype(np.int32)
    g = dgl.graph((src, dst), num_nodes=50)
    sampler = MultiLayerNeighborSampler([2, 2], replace=True,
                                        seed=worker_id)
    t = NativeTransport(worker_id, base + 10 + worker_id,
                        [("127.0.0.1", base)], num_inbound=0)
    snd = SamplerSender(t)
    for start in range(0, 20, 10):
        blocks, input_nodes, seeds = sampler.sample_blocks(
            g, np.arange(start, start + 10))
        snd.send(blocks, input_nodes, seeds)
    snd.signal_end()
    snd.close()


@pytest.mark.skipif(not _native_available(),
                    reason="native netcomm unavailable")
def test_sampler_pool_process_mode(monkeypatch):
    from dgl_hack_tpu.distributed.dis_sampler import (SamplerPool,
                                                      SamplerReceiver)
    from dgl_hack_tpu.distributed.kvstore import NativeTransport
    base = _free_port_block()
    monkeypatch.setenv("DGL_TPU_TEST_SAMPLER_PORT", str(base))
    recv_t = NativeTransport(0, base, [], num_inbound=2)
    pool = SamplerPool(2, _sampler_worker, mode="process")
    pool.start()
    rcv = SamplerReceiver(recv_t, num_senders=2)
    samples = list(rcv)
    pool.join(timeout=60)
    rcv.close()
    assert len(samples) == 4          # 2 workers x 2 batches
    for blocks, input_nodes, seeds in samples:
        assert len(blocks) == 2
        assert seeds.shape == (10,)
        assert np.asarray(blocks[0].csc_indptr)[-1] == \
            blocks[0].num_edges()


# ---------------------------------------------------------------------------
# shared graph structure across processes (reference:
# ImmutableGraph::CopyToSharedMem + SharedMemoryDGLGraph workers)
# ---------------------------------------------------------------------------
def _shared_graph_worker(args):
    prefix, seeds = args
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from dgl_hack_tpu.distributed import attach_shared_graph
    from dgl_hack_tpu.sampling import sample_neighbors
    g = attach_shared_graph(prefix)
    # structure arrays must be read-only mmaps (shared pages, no copy)
    assert not g.host("src").flags.writeable
    frontier, eids = sample_neighbors(
        g, seeds, 3, replace=True, rng=np.random.default_rng(0))
    fs, fd = frontier.host_edges()
    return np.asarray(fs), np.asarray(fd), np.asarray(eids)


def test_shared_graph_multiprocess(tmp_path):
    """Parent saves the graph structure once; spawned sampler workers
    attach via mmap (no copy) and sample identically to the parent."""
    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.distributed import save_shared_graph
    from dgl_hack_tpu.sampling import sample_neighbors
    rng = np.random.default_rng(0)
    src = rng.integers(0, 80, 600).astype(np.int32)
    dst = rng.integers(0, 80, 600).astype(np.int32)
    g = dgl.graph((src, dst), num_nodes=80)
    prefix = str(tmp_path / "g")
    save_shared_graph(prefix, g)

    seeds = np.arange(20)
    ctx = mp.get_context("spawn")
    with ctx.Pool(2) as pool:
        results = pool.map(_shared_graph_worker,
                           [(prefix, seeds)] * 2)
    ref_f, ref_e = sample_neighbors(g, seeds, 3, replace=True,
                                    rng=np.random.default_rng(0))
    rs, rd = ref_f.host_edges()
    for fs, fd, eids in results:
        np.testing.assert_array_equal(fs, rs)
        np.testing.assert_array_equal(fd, rd)
        np.testing.assert_array_equal(eids, np.asarray(ref_e))
