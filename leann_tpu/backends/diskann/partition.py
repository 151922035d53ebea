"""LDG-style balanced graph partitioning.

Parity with the reference's GraphPartitioner (graph_partition.py:18-299),
which shells out to C++ ``partitioner --ldg_times 10 --mode 1`` +
``index_relayout``. Purpose there: co-locate graph neighborhoods on disk
pages. Purpose here: co-locate neighborhoods on *devices* — the partition id
becomes the shard assignment for the multi-chip sharded search path
(SURVEY.md §7 step 8), so frontier expansion mostly hits local HBM and the
cross-ICI all-gather stays small.

Linear Deterministic Greedy (LDG): stream nodes, place each in the partition
maximizing |neighbors already there| * (1 - size/capacity); refine over
several passes (reference default gp_times=10).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libldg_partition.so")
_lib_lock = threading.Lock()
_lib = None
_build_failed = False


def _load_lib():
    """Build-on-demand ctypes loader (same pattern as runtime/passage_store)."""
    global _lib, _build_failed
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        try:
            from ...runtime.native import ensure_built

            ensure_built("ldg_partition")
        except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
                FileNotFoundError, OSError) as e:
            logger.warning("native LDG build failed (%s); using Python fallback", e)
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.ldg_partition.restype = ctypes.c_int
            lib.ldg_partition.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_int32),
            ]
        except (OSError, AttributeError) as e:
            logger.warning("could not load %s: %s", _LIB_PATH, e)
            _build_failed = True
            return None
        _lib = lib
        return _lib


def ldg_partition(neighbors: np.ndarray, n_parts: int, passes: int = 10, seed: int = 0) -> np.ndarray:
    """neighbors i32[N, R] (-1 padded) -> part id i32[N], balanced.

    Dispatches to the native core (csrc/ldg_partition.cpp — the reference's
    ``partitioner`` exe equivalent, graph_partition.py:174-204) and falls
    back to the pure-Python sweep below when the toolchain is unavailable."""
    n = neighbors.shape[0]
    if n_parts <= 1:
        return np.zeros(n, np.int32)
    lib = _load_lib()
    if lib is not None:
        nb = np.ascontiguousarray(neighbors, dtype=np.int32)
        out = np.empty(n, np.int32)
        rc = lib.ldg_partition(
            nb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int64(n), ctypes.c_int64(nb.shape[1]),
            ctypes.c_int32(n_parts), ctypes.c_int32(passes), ctypes.c_uint64(seed),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc >= 0:
            return out
        logger.warning("native LDG returned %d; using Python fallback", rc)
    return _ldg_partition_py(neighbors, n_parts, passes, seed)


def _ldg_partition_py(neighbors: np.ndarray, n_parts: int, passes: int = 10, seed: int = 0) -> np.ndarray:
    n = neighbors.shape[0]
    cap = int(np.ceil(n / n_parts)) + 1
    rng = np.random.default_rng(seed)
    assign = rng.integers(0, n_parts, size=n).astype(np.int32)
    sizes = np.bincount(assign, minlength=n_parts).astype(np.int64)
    valid = neighbors >= 0
    for p in range(passes):
        order = rng.permutation(n)
        moved = 0
        for u in order:
            nbrs = neighbors[u][valid[u]]
            if nbrs.size == 0:
                continue
            counts = np.bincount(assign[nbrs], minlength=n_parts).astype(np.float64)
            score = counts * (1.0 - sizes / cap)
            best = int(np.argmax(score))
            cur = assign[u]
            if best != cur and sizes[best] < cap:
                sizes[cur] -= 1
                sizes[best] += 1
                assign[u] = best
                moved += 1
        logger.debug("ldg pass %d: moved %d", p, moved)
        if moved == 0:
            break
    # hard rebalance: every partition must hold at least floor(n/n_parts)
    # nodes (greedy alone can starve partitions on tiny graphs)
    target_lo = n // n_parts
    while sizes.min() < target_lo:
        donor = int(np.argmax(sizes))
        recv = int(np.argmin(sizes))
        donor_nodes = np.flatnonzero(assign == donor)
        # move the donor node with the fewest local edges
        local = np.array(
            [np.sum(assign[neighbors[u][valid[u]]] == donor) for u in donor_nodes]
        )
        u = donor_nodes[int(np.argmin(local))]
        assign[u] = recv
        sizes[donor] -= 1
        sizes[recv] += 1
    return assign


def edge_locality(neighbors: np.ndarray, assign: np.ndarray) -> float:
    """Fraction of graph edges whose endpoints share a partition."""
    valid = neighbors >= 0
    src = np.repeat(np.arange(neighbors.shape[0]), neighbors.shape[1])[valid.ravel()]
    dst = neighbors.ravel()[valid.ravel()]
    if dst.size == 0:
        return 1.0
    return float(np.mean(assign[src] == assign[dst]))
