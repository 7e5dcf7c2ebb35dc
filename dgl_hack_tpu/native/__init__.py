"""ctypes loader for the native host kernels (fastgraph.cpp).

Compiled lazily with g++ -O3 -fopenmp on first import; every caller has a
pure-numpy fallback, so the framework works without a toolchain.  This is
the C-ABI replacement for the reference's ctypes FFI + libdgl.so
(python/dgl/_ffi/) — scoped to the host-side loops that actually warrant
native code on TPU (sampling, compaction).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libfastgraph.so")
_SRC = os.path.join(_HERE, "fastgraph.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-fopenmp",
           _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        try:  # retry without OpenMP
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                            _SRC, "-o", _SO],
                           check=True, capture_output=True, timeout=120)
            return True
        except Exception:
            return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The compiled library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("DGL_TPU_DISABLE_NATIVE") == "1":
            return None
        if not os.path.exists(_SO) or \
                os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.rowwise_sample.restype = ctypes.c_int64
        lib.rowwise_sample.argtypes = [i32p, i32p, i32p, ctypes.c_int64,
                                       ctypes.c_int32, ctypes.c_uint64,
                                       i64p, i32p]
        lib.rowwise_sample_replace.restype = ctypes.c_int64
        lib.rowwise_sample_replace.argtypes = [i32p, i32p, ctypes.c_int64,
                                               ctypes.c_int32,
                                               ctypes.c_uint64, i64p, i32p]
        lib.compact_block.restype = ctypes.c_int64
        lib.compact_block.argtypes = [i32p, i32p, ctypes.c_int64, i32p,
                                      ctypes.c_int64, i64p, i32p, i32p,
                                      i32p]
        lib.fennel_partition.restype = None
        lib.fennel_partition.argtypes = [i32p, i32p, i32p, i32p, i32p,
                                         ctypes.c_int64, ctypes.c_int64,
                                         ctypes.c_int32, ctypes.c_double,
                                         ctypes.c_double, ctypes.c_int32,
                                         i32p]
        lib.fennel_partition_w.restype = None
        lib.fennel_partition_w.argtypes = [i32p, i32p, i32p, i32p, i32p,
                                           i32p, ctypes.c_int64,
                                           ctypes.c_int64, ctypes.c_int32,
                                           ctypes.c_double, ctypes.c_double,
                                           ctypes.c_int32, i32p]
        _lib = lib
        return _lib


_NET_SO = os.path.join(_HERE, "libnetcomm.so")
_NET_SRC = os.path.join(_HERE, "netcomm.cpp")
_net_lib: Optional[ctypes.CDLL] = None
_net_tried = False


def get_net_lib() -> Optional[ctypes.CDLL]:
    """The native TCP transport (netcomm.cpp), or None if unavailable.

    The distributed KVStore falls back to an in-process loopback queue
    when native sockets can't be built, so tests/import never hard-fail.
    """
    global _net_lib, _net_tried
    with _lock:
        if _net_lib is not None or _net_tried:
            return _net_lib
        _net_tried = True
        if os.environ.get("DGL_TPU_DISABLE_NATIVE") == "1":
            return None
        if not os.path.exists(_NET_SO) or \
                os.path.getmtime(_NET_SO) < os.path.getmtime(_NET_SRC):
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     _NET_SRC, "-o", _NET_SO, "-lpthread"],
                    check=True, capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_NET_SO)
        except OSError:
            return None
        c = ctypes
        lib.nc_receiver_create.restype = c.c_int64
        lib.nc_receiver_create.argtypes = [c.c_int, c.c_int]
        lib.nc_receiver_wait_connected.restype = c.c_int
        lib.nc_receiver_wait_connected.argtypes = [c.c_int64, c.c_int]
        lib.nc_recv.restype = c.c_int64
        # void* out-pointer: c_char_p would stop at the first NUL byte
        lib.nc_recv.argtypes = [c.c_int64, c.POINTER(c.c_void_p),
                                c.POINTER(c.c_int)]
        lib.nc_free.restype = None
        lib.nc_free.argtypes = [c.c_void_p]
        lib.nc_receiver_destroy.restype = None
        lib.nc_receiver_destroy.argtypes = [c.c_int64]
        lib.nc_sender_create.restype = c.c_int64
        lib.nc_sender_create.argtypes = [c.POINTER(c.c_char_p),
                                         c.POINTER(c.c_int), c.c_int,
                                         c.c_int, c.c_int]
        lib.nc_send.restype = c.c_int
        lib.nc_send.argtypes = [c.c_int64, c.c_int, c.c_char_p, c.c_int64]
        lib.nc_sender_destroy.restype = None
        lib.nc_sender_destroy.argtypes = [c.c_int64]
        _net_lib = lib
        return _net_lib


def _ptr(a, typ):
    return a.ctypes.data_as(typ)


def rowwise_sample_native(indptr, src, seeds, fanout: int, replace: bool,
                          seed: int):
    """Returns (positions (total,), counts (num_seeds,)) or None if the
    native lib is unavailable."""
    import numpy as np
    lib = get_lib()
    if lib is None:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    seeds = np.ascontiguousarray(seeds, np.int32)
    indptr = np.ascontiguousarray(indptr, np.int32)
    n = len(seeds)
    out_pos = np.empty(n * fanout, np.int64)
    out_counts = np.empty(n, np.int32)
    if replace:
        lib.rowwise_sample_replace(
            _ptr(indptr, i32p), _ptr(seeds, i32p), n, fanout, seed,
            _ptr(out_pos, i64p), _ptr(out_counts, i32p))
    else:
        src = np.ascontiguousarray(src, np.int32)
        lib.rowwise_sample(
            _ptr(indptr, i32p), _ptr(src, i32p), _ptr(seeds, i32p), n,
            fanout, seed, _ptr(out_pos, i64p), _ptr(out_counts, i32p))
    # pack: keep the first count[i] entries per row
    keep = (np.arange(fanout)[None, :]
            < out_counts[:, None]).reshape(-1)
    return out_pos[keep], out_counts


def fennel_native(indptr_in, src, indptr_out, dst_by_src, order, E: int,
                  k: int, gamma: float, slack: float, num_passes: int,
                  node_weights=None):
    """Native Fennel partition; returns parts array or None.

    node_weights (int32, optional) switches to the vertex-weighted
    objective + weighted hard cap (edge-count balance when weights are
    1 + in-degree — see fennel_partition_w in fastgraph.cpp)."""
    import numpy as np
    lib = get_lib()
    if lib is None:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    n = len(order)
    arrs = [np.ascontiguousarray(a, np.int32)
            for a in (indptr_in, src, indptr_out, dst_by_src, order)]
    parts = np.full(n, -1, np.int32)
    if node_weights is not None:
        vw = np.ascontiguousarray(node_weights, np.int32)
        lib.fennel_partition_w(*(_ptr(a, i32p) for a in arrs),
                               _ptr(vw, i32p), n, E, k, gamma, slack,
                               num_passes, _ptr(parts, i32p))
    else:
        lib.fennel_partition(*(_ptr(a, i32p) for a in arrs), n, E, k,
                             gamma, slack, num_passes, _ptr(parts, i32p))
    return parts
