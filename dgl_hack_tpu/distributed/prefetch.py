"""Sampler -> device prefetch pipeline.

Reference: the prefetching sampler wrappers (python/dgl/contrib/sampling/
sampler.py:44-133 ThreadPrefetchingWrapper) and the remote sampler
machines (contrib/sampling/dis_sampler.py SamplerSender/Receiver over TCP).
On TPU the sampler stays host-side; this pipeline overlaps host sampling
+ H2D transfer with device compute using a background thread — the
single-machine successor of the sampler/trainer process split.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

import jax


class ThreadedPrefetcher:
    """Wrap any iterator; a worker thread keeps ``capacity`` batches ready,
    optionally device_put-ing them ahead of use."""

    _SENTINEL = object()

    def __init__(self, iterable: Iterable, capacity: int = 2,
                 device_put: bool = True):
        self._iterable = iterable
        self._capacity = capacity
        self._device_put = device_put

    def __iter__(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self._capacity)
        err = []

        def worker():
            try:
                for item in self._iterable:
                    if self._device_put:
                        # ONE batched transfer for the whole sample tree
                        # (per-leaf device_put pays a tunnel round trip
                        # per array on axon — round-5 pipeline profile)
                        item = jax.device_put(item)
                    q.put(item)
            except Exception as e:      # propagate to consumer
                err.append(e)
            finally:
                q.put(self._SENTINEL)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is self._SENTINEL:
                if err:
                    raise err[0]
                return
            yield item


def prefetch_to_device(loader: Iterable, capacity: int = 2):
    """Convenience wrapper mirroring the reference's usage pattern."""
    return ThreadedPrefetcher(loader, capacity=capacity, device_put=True)


class PooledPrefetcher:
    """``num_workers`` sampling workers (SamplerPool mode='thread') each
    iterate their OWN loader into one bounded queue; the trainer consumes
    the merged stream.  The single-machine form of the reference's
    sampler-pool / trainer split (contrib/sampling/dis_sampler.py
    SamplerPool): the numpy/native samplers release the GIL (the hot
    path is the OpenMP rowwise sampler + numpy vector ops), so workers
    overlap with each other on multi-core hosts and with device compute
    everywhere.

    ``make_loader(worker_id)`` builds worker i's iterable (give each its
    own seed shard and its own sampler — np.random.Generator is not
    thread-safe)."""

    _SENTINEL = object()

    def __init__(self, make_loader: Callable[[int], Iterable],
                 num_workers: int = 2, capacity: int = 4,
                 device_put: bool = True):
        self._make = make_loader
        self._num_workers = num_workers
        self._capacity = capacity
        self._device_put = device_put

    def __iter__(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self._capacity)
        err = []

        def worker(i):
            try:
                for item in self._make(i):
                    if self._device_put:
                        item = jax.device_put(item)
                    q.put(item)
            except Exception as e:          # propagate to consumer
                err.append(e)
            finally:
                q.put(self._SENTINEL)

        from .dis_sampler import SamplerPool
        pool = SamplerPool(self._num_workers, worker, mode="thread")
        pool.start()
        done = 0
        while done < self._num_workers:
            item = q.get()
            if item is self._SENTINEL:
                done += 1
                continue
            yield item
        if err:
            raise err[0]
