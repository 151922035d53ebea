"""Locality relabeling: renumber graph nodes so neighbor ids are numerically
close, shrinking the packed graph (storage.py pack_neighbors stores sorted
row deltas — delta entropy is log2(window), so clustering ids cuts bytes/edge
roughly in half at 10M) and improving HBM gather locality during traversal.

The reference gets the same effect from its DiskANN fork's ``index_relayout``
(graph_partition.py:207-226) — there for disk-page locality, here for delta
entropy + HBM pages. TPU-native form: coarse k-means cells over the corpus
geometry (embeddings when stored, PQ-decoded vectors otherwise — decoding
runs in the ROTATED space for OPQ-factorized indexes, which is isometric, so
cell structure is unchanged), cells ordered by a greedy nearest-centroid
chain, nodes numbered cell-by-cell. Graph neighbors are near in embedding
space by construction, so they land in the same or an adjacent cell.

Applied by ``leann repack --relabel`` (repack.py relabel_index) to existing
indexes, or at build time for single-partition builds.
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


@functools.partial(jax.jit, static_argnames=("block",))
def _assign_block(x: jnp.ndarray, cent: jnp.ndarray, block: int) -> jnp.ndarray:
    from .graph import _assign_clusters

    return _assign_clusters(x, cent, block)


def decoded_source(codes: np.ndarray, codebooks: np.ndarray) -> Callable:
    """Block source reconstructing vectors from plain-PQ codes on host: the
    recompute index stores no embedding matrix, but cell assignment only
    needs coarse geometry and the PQ reconstruction preserves exactly that."""
    cb = np.asarray(codebooks, np.float32)  # [M, K, ds]
    m, _, ds = cb.shape

    def src(s: int, e: int) -> np.ndarray:
        blk = codes[s:e]
        out = np.empty((e - s, m * ds), np.float32)
        for j in range(m):
            out[:, j * ds : (j + 1) * ds] = cb[j][blk[:, j]]
        return out

    return src


def matrix_source(emb: np.ndarray) -> Callable:
    def src(s: int, e: int) -> np.ndarray:
        return np.asarray(emb[s:e], np.float32)

    return src


def chain_rank(cent: np.ndarray) -> np.ndarray:
    """Greedy nearest-centroid chain -> rank i64[K]: consecutive ranks are
    nearby cells, so adjacent id blocks stay adjacent in space."""
    k = cent.shape[0]
    c = np.asarray(cent, np.float32)
    n2 = (c * c).sum(1)
    visited = np.zeros(k, bool)
    order = np.empty(k, np.int64)
    cur = 0
    for i in range(k):
        order[i] = cur
        visited[cur] = True
        d = n2 - 2.0 * (c @ c[cur])
        d[visited] = np.inf
        cur = int(np.argmin(d)) if i < k - 1 else cur
    rank = np.empty(k, np.int64)
    rank[order] = np.arange(k)
    return rank


def locality_order(
    source: Callable, n: int, d: int, n_cells: int = 0,
    sample: int = 65536, seed: int = 0, block: int = 1 << 17,
) -> np.ndarray:
    """-> order i64[N]: new row j holds old row order[j]. Stable within a
    cell (original relative order preserved), cells chained by proximity."""
    from .graph import _bucket_rows, _kmeans_full, _pad_rows

    if n_cells <= 0:
        n_cells = int(np.clip(n // 2048, 64, 8192))
    if n < 4 * n_cells:
        return np.arange(n, dtype=np.int64)  # too small to benefit
    rng = np.random.default_rng(seed)
    t0 = time.time()

    s_size = min(n, sample)
    s_size = 1 << (s_size.bit_length() - 1)  # pow2: bucketed compile shapes
    samp_idx = np.sort(rng.choice(n, s_size, replace=False))
    samp = _gather_sample(source, samp_idx, n)
    init = samp[rng.choice(samp.shape[0], n_cells, replace=False)]
    km_block = 4096
    s_pad = _bucket_rows(samp.shape[0], km_block)
    cent = _kmeans_full(jnp.asarray(_pad_rows(samp, s_pad)), jnp.asarray(init),
                        jnp.int32(samp.shape[0]), 8, block=km_block)
    logger.info("relabel: %d cells trained on %d samples (%.1fs)",
                n_cells, samp.shape[0], time.time() - t0)

    assign = np.empty(n, np.int32)
    for bi, s in enumerate(range(0, n, block)):
        e = min(s + block, n)
        rows = source(s, e)
        pad = _bucket_rows(rows.shape[0], 8192)
        # bf16 upload: the tunnel is ~17 MB/s and assignment is a coarse
        # argmin — halving the transfer halves the dominant cost at 10M+
        a = np.asarray(_assign_block(
            jnp.asarray(_pad_rows(rows.astype(jnp.bfloat16), pad)), cent, 8192))
        assign[s:e] = a[: e - s]
        if bi % 16 == 15:
            logger.info("relabel assign: %d/%d rows (%.0fs)", e, n, time.time() - t0)
    rank = chain_rank(np.asarray(cent))
    order = np.argsort(rank[assign], kind="stable").astype(np.int64)
    logger.info("relabel: %d rows assigned + ordered (%.1fs)", n, time.time() - t0)
    return order


def _gather_sample(source: Callable, idx: np.ndarray, n: int) -> np.ndarray:
    """Gather sample rows through the block source in contiguous runs (a
    per-row source() call at 64K samples costs 64K python round-trips)."""
    out = []
    step = 1 << 18
    for s in range(0, n, step):
        e = min(s + step, n)
        sel = idx[(idx >= s) & (idx < e)]
        if sel.size:
            blk = source(s, e)
            out.append(blk[sel - s])
    return np.concatenate(out)


def edge_locality(neighbors: np.ndarray, window: int = 1 << 16) -> float:
    """Fraction of real edges whose |dst - src| < window — the quantity the
    sorted-delta packer's size tracks."""
    n = neighbors.shape[0]
    src = np.repeat(np.arange(n, dtype=np.int64), neighbors.shape[1])
    dst = neighbors.reshape(-1).astype(np.int64)
    valid = dst >= 0
    if not valid.any():
        return 0.0
    return float((np.abs(dst[valid] - src[valid]) < window).mean())
