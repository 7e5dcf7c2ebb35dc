"""Distributed sampler service: sampler machines produce minibatch block
lists, trainer machines consume them as an iterator.

Reference: python/dgl/contrib/sampling/dis_sampler.py — SamplerSender:63
(serializes NodeFlows over TCP, _CAPI_SenderSendNodeFlow
src/graph/network.cc:275), SamplerReceiver:146 (blocking iterator),
SamplerPool (forked sampling workers), and the end-signal protocol
(_CAPI_SenderSendSamplerEndSignal, network.cc:359).

TPU shape: samples are the padded static-shape block lists of
sampling/neighbor.py (one compiled executable per shape bucket on the
trainer), serialized as flat int32 arrays over the native TCP transport
(native/netcomm.cpp); a trainer overlaps recv with device compute via
distributed/prefetch.py.
"""
from __future__ import annotations

import json
import threading
from typing import Callable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..core.graph import Graph, _build
from .kvstore import _pack, _unpack

MSG_SAMPLE, MSG_END = 20, 21

Sample = Tuple[List[Graph], np.ndarray, np.ndarray]


def serialize_sample(blocks: Sequence[Graph], input_nodes: np.ndarray,
                     seeds: np.ndarray) -> bytes:
    """Flatten a (blocks, input_nodes, seeds) sample into one message."""
    meta = []
    arrays: List[np.ndarray] = [np.asarray(input_nodes, np.int32),
                                np.asarray(seeds, np.int32)]
    for b in blocks:
        s, d = b.host_edges()
        has_mask = b.edge_mask is not None
        meta.append({"ns": b.num_src_nodes, "nd": b.num_dst_nodes,
                     "mask": has_mask})
        arrays.append(np.asarray(s, np.int32))
        arrays.append(np.asarray(d, np.int32))
        if has_mask:
            # mask in USER edge order to pair with (s, d)
            em = np.asarray(b.edge_mask)
            if b.int2user is not None:
                em = em[np.asarray(b.user2int)]
            arrays.append(em.astype(np.bool_))
    return _pack(MSG_SAMPLE, json.dumps(meta), arrays)


def deserialize_sample(buf: bytes) -> Sample:
    msg_type, meta_s, arrays, _ = _unpack(buf)
    assert msg_type == MSG_SAMPLE
    meta = json.loads(meta_s)
    input_nodes, seeds = arrays[0], arrays[1]
    blocks: List[Graph] = []
    i = 2
    for m in meta:
        s, d = arrays[i], arrays[i + 1]
        i += 2
        em = None
        if m["mask"]:
            em = arrays[i]
            i += 1
        blocks.append(_build(s, d, m["ns"], m["nd"], is_block=True,
                             edge_mask=em))
    return blocks, input_nodes, seeds


class SamplerSender:
    """Sampler-side endpoint (reference: dis_sampler.py SamplerSender)."""

    def __init__(self, transport):
        self.net = transport

    def send(self, blocks: Sequence[Graph], input_nodes, seeds,
             recv_idx: int = 0) -> None:
        self.net.send(recv_idx, serialize_sample(blocks, input_nodes, seeds))

    def signal_end(self, recv_idx: int = 0) -> None:
        """End-of-epoch signal (reference: network.cc:359)."""
        self.net.send(recv_idx, _pack(MSG_END, ""))

    def close(self) -> None:
        self.net.close()


class SamplerReceiver:
    """Trainer-side blocking iterator over incoming samples; one epoch
    ends when every sender has signalled (reference: dis_sampler.py
    SamplerReceiver.__iter__/__next__:146-188)."""

    def __init__(self, transport, num_senders: int):
        self.net = transport
        self.num_senders = num_senders

    def __iter__(self) -> Iterator[Sample]:
        ended = 0
        while ended < self.num_senders:
            _, buf = self.net.recv()
            msg_type = buf[0]
            if msg_type == MSG_END:
                ended += 1
                continue
            yield deserialize_sample(buf)

    def close(self) -> None:
        self.net.close()


def _process_worker_bootstrap(worker_fn, i):
    """Module-level spawn target: pin the child to the CPU backend BEFORE
    any jax-importing module loads (two processes on one TPU chip wedge
    the device — CLAUDE.md), then run the user's worker."""
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    worker_fn(i)


class SamplerPool:
    """Run ``num_workers`` sampling workers, each executing
    ``worker_fn(worker_id)`` to completion, then end-signal
    (reference: dis_sampler.py SamplerPool — forked processes there).

    mode='thread' (default): threads — the numpy/native samplers release
    the GIL.  mode='process': spawned processes like the reference;
    ``worker_fn`` must be picklable (module-level) and build its own
    transport/graph (spawn semantics), and children are pinned to the
    CPU jax backend (one TPU process at a time)."""

    def __init__(self, num_workers: int, worker_fn: Callable[[int], None],
                 mode: str = "thread"):
        if mode == "thread":
            self.workers = [threading.Thread(target=worker_fn, args=(i,),
                                             daemon=True)
                            for i in range(num_workers)]
        elif mode == "process":
            import multiprocessing as mp
            ctx = mp.get_context("spawn")
            self.workers = [
                ctx.Process(target=_process_worker_bootstrap,
                            args=(worker_fn, i), daemon=True)
                for i in range(num_workers)]
        else:
            raise ValueError(mode)

    def start(self) -> None:
        for t in self.workers:
            t.start()

    def join(self, timeout: Optional[float] = None) -> None:
        for t in self.workers:
            t.join(timeout)

    @property
    def threads(self):     # backward-compat alias
        return self.workers
