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

import logging

import numpy as np

logger = logging.getLogger(__name__)


def ldg_partition(neighbors: np.ndarray, n_parts: int, passes: int = 10, seed: int = 0) -> np.ndarray:
    """neighbors i32[N, R] (-1 padded) -> part id i32[N], balanced."""
    n = neighbors.shape[0]
    if n_parts <= 1:
        return np.zeros(n, np.int32)
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
