"""Multi-host bootstrap.

Reference: the KVStore's ip_config file + socket bring-up
(python/dgl/contrib/dis_kvstore.py:24 read_ip_config; servers/clients
handshake over raw TCP, src/graph/network/socket_communicator.cc).
TPU-native: ``jax.distributed.initialize`` over DCN — one call replaces
the whole server/client topology; collectives then ride ICI/DCN via the
compiled program, not a socket layer.
"""
from __future__ import annotations

import os
from typing import List, Optional, Tuple


def read_ip_config(filename: str) -> List[Tuple[str, int]]:
    """Parse the reference's ip_config.txt format: `ip port [count]`
    per line (reference: dis_kvstore.py:24)."""
    out = []
    with open(filename) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                out.append((parts[0], int(parts[1])))
    return out


def initialize_from_env(coordinator: Optional[str] = None,
                        num_processes: Optional[int] = None,
                        process_id: Optional[int] = None) -> None:
    """Initialise jax.distributed from env vars or an ip-config file.

    Env: DGL_TPU_COORDINATOR (ip:port), DGL_TPU_NUM_PROC, DGL_TPU_PROC_ID,
    or DGL_TPU_IP_CONFIG pointing at a reference-style ip_config.txt
    (first entry = coordinator).
    """
    import jax

    if coordinator is None:
        cfg = os.environ.get("DGL_TPU_IP_CONFIG")
        if cfg and os.path.exists(cfg):
            hosts = read_ip_config(cfg)
            coordinator = f"{hosts[0][0]}:{hosts[0][1]}"
            num_processes = num_processes or len(hosts)
        else:
            coordinator = os.environ.get("DGL_TPU_COORDINATOR")
    if coordinator is None:
        return  # single-process
    num_processes = num_processes or int(os.environ["DGL_TPU_NUM_PROC"])
    process_id = process_id if process_id is not None \
        else int(os.environ["DGL_TPU_PROC_ID"])
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
