"""Graph construction: batched exact k-NN + Vamana-style robust pruning.

TPU-native replacement for the reference's sequential C++ builders
(faiss ``IndexHNSWFlat.add`` — hnsw_backend.py:83-89 — and DiskANN's
``build_disk_float_index`` — diskann_backend.py:254-268). Sequential
point-by-point insertion is hostile to the MXU; instead the whole graph is
built in a few *batched* phases, each a large matmul or a vmapped scan:

  1. exact k-NN over corpus tiles (blocked distance matmuls + running top-k)
  2. α-robust-prune (Vamana/DiskANN style) vmapped over node blocks — keeps a
     diverse degree-R out-neighborhood, which preserves hub reachability the
     way the reference's high-degree-preserving CSR conversion does
     (convert_to_csr.py:487-548)
  3. reverse-edge augmentation with degree cap (host-side pass)

Graph layout is fixed-degree ``i32[N, R]`` padded with -1 — the TPU-friendly
equivalent of the reference's CSR (SURVEY.md §7 design delta 2): every gather
is rectangular, so frontier expansion is a single dynamic-gather.

Diversity pruning uses (squared) L2 geometry; for cosine the vectors are
pre-normalized so this is monotone in cosine distance. (MIPS corpora are
handled via the same proxy; spherical augmentation is a later refinement.)
"""

from __future__ import annotations

import functools
import logging
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

INF = jnp.float32(3.4e38)
EXACT_KNN_MAX_N = 65536  # beyond this, build_graph switches to NN-descent


@functools.partial(jax.jit, static_argnames=("k",))
def _tile_topk(qe: jnp.ndarray, te: jnp.ndarray, tile_off: jnp.ndarray, run_d: jnp.ndarray, run_i: jnp.ndarray, k: int):
    """Merge one corpus tile into the running top-k. qe [B,D], te [Tn,D]."""
    dots = jax.lax.dot_general(
        qe.astype(jnp.bfloat16), te.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    qn = jnp.sum(jnp.square(qe), axis=1, keepdims=True)
    tn = jnp.sum(jnp.square(te), axis=1)
    d = qn + tn[None, :] - 2.0 * dots  # [B, Tn] squared l2
    ids = tile_off + jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    all_d = jnp.concatenate([run_d, d], axis=1)
    all_i = jnp.concatenate([run_i, ids], axis=1)
    neg_top, pos = jax.lax.top_k(-all_d, k)
    return -neg_top, jnp.take_along_axis(all_i, pos, axis=1)


def exact_knn(
    emb: np.ndarray, k: int, query_block: int = 1024, tile: int = 131072
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact k-NN (squared L2) of every row against the corpus, self excluded.
    -> (ids i32[N, k], dists f32[N, k]). Blocked so HBM holds only
    [query_block, tile] distance panels."""
    n, d = emb.shape
    dev_emb = jnp.asarray(emb)
    ids_out = np.empty((n, k), np.int32)
    dist_out = np.empty((n, k), np.float32)
    kk = k + 1  # room to drop self
    for qs in range(0, n, query_block):
        qe = dev_emb[qs : qs + min(query_block, n - qs)]
        run_d = jnp.full((qe.shape[0], kk), INF)
        run_i = jnp.full((qe.shape[0], kk), -1, jnp.int32)
        for ts in range(0, n, tile):
            te = dev_emb[ts : ts + min(tile, n - ts)]
            run_d, run_i = _tile_topk(qe, te, jnp.int32(ts), run_d, run_i, kk)
        rd, ri = np.asarray(run_d), np.asarray(run_i)
        # drop self-match (guaranteed to be present with dist ~0)
        rows = np.arange(qe.shape[0])[:, None]
        self_mask = ri == (np.arange(qs, qs + qe.shape[0])[:, None])
        # push self to the end, keep first k
        order = np.argsort(self_mask, axis=1, kind="stable")
        ri = ri[rows, order][:, :k]
        rd = rd[rows, order][:, :k]
        ids_out[qs : qs + qe.shape[0]] = ri
        dist_out[qs : qs + qe.shape[0]] = rd
    return ids_out, dist_out


@functools.partial(jax.jit, static_argnames=("k",))
def _block_cand_topk(pe: jnp.ndarray, cand_ids: jnp.ndarray, cand_emb: jnp.ndarray, k: int):
    """pe [B, D], cand_ids [B, C] (-1/dup slots masked), cand_emb [B, C, D]
    -> (ids [B, k], dists [B, k]) closest candidates per row (squared l2)."""
    d = jnp.sum(jnp.square(cand_emb - pe[:, None, :]), axis=-1)
    d = jnp.where(cand_ids >= 0, d, INF)
    neg, pos = jax.lax.top_k(-d, k)
    return jnp.take_along_axis(cand_ids, pos, axis=1), -neg


def _reverse_sample(nbrs: np.ndarray, cap: int, rng: np.random.Generator) -> np.ndarray:
    """Sampled reverse edges: for each node up to ``cap`` nodes that list it.
    Vectorized host pass over the edge list."""
    n, k = nbrs.shape
    src = np.repeat(np.arange(n, dtype=np.int32), k)
    dst = nbrs.ravel()
    keep = dst >= 0
    src, dst = src[keep], dst[keep]
    order = rng.permutation(src.size)
    src, dst = src[order], dst[order]
    sort_i = np.argsort(dst, kind="stable")
    dst_s, src_s = dst[sort_i], src[sort_i]
    # rank within each dst group
    first = np.r_[True, dst_s[1:] != dst_s[:-1]]
    group_start = np.maximum.accumulate(np.where(first, np.arange(dst_s.size), 0))
    rank = np.arange(dst_s.size) - group_start
    out = np.full((n, cap), -1, np.int32)
    sel = rank < cap
    out[dst_s[sel], rank[sel]] = src_s[sel]
    return out


def nn_descent(
    emb: np.ndarray,
    k: int,
    n_iters: int = 6,
    block: int = 2048,
    seed: int = 0,
    min_update_frac: float = 0.001,
) -> Tuple[np.ndarray, np.ndarray]:
    """Approximate k-NN graph by NN-descent — O(N·C·D) per iteration instead
    of the exact O(N²·D), with every distance batch an MXU einsum. Candidates
    per round: current neighbors + sampled reverse edges + sampled 2-hop.
    -> (ids i32[N, k], dists f32[N, k])."""
    n, d = emb.shape
    rng = np.random.default_rng(seed)
    dev = jnp.asarray(emb)
    nbrs = rng.integers(0, n - 1, size=(n, k)).astype(np.int32)
    nbrs = np.where(nbrs >= np.arange(n)[:, None], nbrs + 1, nbrs)  # avoid self
    dists = np.full((n, k), np.float32(3.4e38))
    # 2-hop width: full local join for small k, sampled columns for large k
    hop_cols = min(k, max(2, 256 // max(k, 1)))
    for it in range(n_iters):
        rev = _reverse_sample(nbrs, k, rng)
        cols = rng.choice(k, size=hop_cols, replace=False)
        hop_seed = np.concatenate([nbrs[:, cols], rev[:, cols]], axis=1)  # [n, 2h]
        two = nbrs[np.clip(hop_seed, 0, n - 1)].reshape(n, 2 * hop_cols * k)
        two = np.where((hop_seed < 0).repeat(k, axis=1), -1, two)
        # a few random candidates per round escape local minima on corpora
        # with weak cluster structure
        rand = rng.integers(0, n, size=(n, max(4, k // 4))).astype(np.int32)
        cand = np.concatenate([nbrs, rev, two, rand], axis=1)
        cand[cand == np.arange(n, dtype=np.int32)[:, None]] = -1
        # dedup: candidate ORDER is irrelevant to the top-k, so sort values
        # in place and blank repeats (far cheaper than argsort+scatter at
        # N x C = hundreds of millions of slots)
        cand.sort(axis=1)
        cand[:, 1:][cand[:, 1:] == cand[:, :-1]] = -1
        updated = 0
        new_nbrs = np.empty_like(nbrs)
        new_dists = np.empty_like(dists)
        for s in range(0, n, block):
            e = min(s + block, n)
            cid = jnp.asarray(cand[s:e])
            cemb = dev[jnp.clip(cid, 0, n - 1)]
            ids_b, d_b = _block_cand_topk(dev[s:e], cid, cemb, k)
            new_nbrs[s:e] = np.asarray(ids_b)
            new_dists[s:e] = np.asarray(d_b)
        # membership change, not slot order (top_k reorders equal-quality
        # neighbors freely — slotwise comparison never converges)
        updated = int((np.sort(new_nbrs, axis=1) != np.sort(nbrs, axis=1)).sum())
        nbrs, dists = new_nbrs, new_dists
        logger.info("nn_descent iter %d: %.3f%% membership changed", it, 100 * updated / (n * k))
        if updated < min_update_frac * n * k:
            break
    return nbrs, dists


@functools.partial(jax.jit, static_argnames=("r", "alpha", "keep_closest"))
def _robust_prune_block(
    p_emb: jnp.ndarray,  # [B, D] node embeddings
    cand_ids: jnp.ndarray,  # [B, C] candidate ids (-1 = invalid)
    cand_emb: jnp.ndarray,  # [B, C, D]
    r: int,
    alpha: float,
    keep_closest: int = 0,
):
    """Vamana robust prune, batched over B nodes -> selected ids i32[B, R].

    The first ``keep_closest`` picks skip the occlusion rule: tightly clustered
    corpora (near-duplicate chunks) otherwise lose their nearest neighbors to
    diversity pruning, which measurably hurts top-k recall — keeping the
    closest quarter restores it while α-pruning still supplies long-range
    edges (the reference's high-degree/hub-preservation concern,
    convert_to_csr.py:487-548, solved TPU-style)."""
    B, C, D = cand_emb.shape
    d_pc = jnp.sum(jnp.square(cand_emb - p_emb[:, None, :]), axis=-1)  # [B, C]
    d_pc = jnp.where(cand_ids >= 0, d_pc, INF)
    # pairwise candidate-candidate distances
    cc_dots = jnp.einsum("bcd,bed->bce", cand_emb, cand_emb, preferred_element_type=jnp.float32)
    nrm = jnp.sum(jnp.square(cand_emb), axis=-1)
    d_cc = nrm[:, :, None] + nrm[:, None, :] - 2.0 * cc_dots  # [B, C, C]

    def step(carry, t):
        alive, dpc = carry
        j = jnp.argmin(jnp.where(alive, dpc, INF), axis=1)  # [B]
        ok = jnp.take_along_axis(alive, j[:, None], axis=1)[:, 0] & (
            jnp.take_along_axis(dpc, j[:, None], axis=1)[:, 0] < INF
        )
        sel = jnp.where(ok, jnp.take_along_axis(cand_ids, j[:, None], axis=1)[:, 0], -1)
        # occlusion: drop x with alpha * d(c, x) <= d(p, x)
        d_jx = jnp.take_along_axis(d_cc, j[:, None, None], axis=1)[:, 0, :]  # [B, C]
        occl = alpha * d_jx <= dpc
        alive = jnp.where(t >= keep_closest, alive & ~occl, alive)
        alive = alive.at[jnp.arange(B), j].set(False)
        return (alive, dpc), sel

    alive0 = cand_ids >= 0
    (_, _), sels = jax.lax.scan(step, (alive0, d_pc), jnp.arange(r))
    return sels.T  # [B, R]


def build_graph(
    emb: np.ndarray,
    r: int = 32,
    candidate_factor: int = 2,
    alpha: float = 1.2,
    keep_closest: int = -1,  # -1 = auto (r // 4)
    query_block: int = 1024,
    prune_block: int = 512,
) -> Tuple[np.ndarray, int]:
    """Build a fixed-degree navigable graph. -> (neighbors i32[N, R], medoid).

    knn(C=r*candidate_factor) → α-prune to ≤R (keeping the closest
    ``keep_closest`` unconditionally) → reverse-edge fill to R.
    """
    n, d = emb.shape
    r = min(r, max(n - 1, 1))
    c = min(r * candidate_factor, max(n - 1, 1))
    if keep_closest < 0:
        keep_closest = r // 4
    import time as _time

    t0 = _time.time()
    if n > EXACT_KNN_MAX_N:
        # O(N²) exact pass stops scaling; NN-descent gets ~the same candidate
        # quality in O(N·C·D·iters)
        knn_ids, _ = nn_descent(emb, c)
    else:
        knn_ids, _ = exact_knn(emb, c, query_block=query_block)
    logger.info("build_graph knn phase: %.1fs", _time.time() - t0)
    t0 = _time.time()
    dev_emb = jnp.asarray(emb)
    neighbors = np.empty((n, r), np.int32)
    for s in range(0, n, prune_block):
        e = min(s + prune_block, n)
        cid = jnp.asarray(knn_ids[s:e])
        cemb = dev_emb[jnp.clip(cid, 0, n - 1)] * (cid >= 0)[:, :, None]
        sel = _robust_prune_block(dev_emb[s:e], cid, cemb, r, float(alpha), keep_closest)
        neighbors[s:e] = np.asarray(sel)
    logger.info("build_graph prune phase: %.1fs", _time.time() - t0)
    out = _fill_reverse_edges(neighbors, np.random.default_rng(0))
    medoid = compute_medoid(emb)
    logger.info("graph built: N=%d R=%d avg_deg=%.1f medoid=%d", n, r, (out >= 0).mean() * r, medoid)
    return out, medoid


def _fill_reverse_edges(neighbors: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Fill pruned (-1) slots with sampled in-edges — vectorized host pass
    (python loops don't scale to millions of nodes). Out-edges keep priority;
    reverse edges pack into the remaining slots."""
    n, r = neighbors.shape
    rev = _reverse_sample(neighbors, r, rng)
    cand = np.concatenate([neighbors, rev], axis=1)  # [n, 2r]
    cand = np.where(cand == np.arange(n, dtype=np.int64)[:, None], -1, cand)
    # dedup keeping the first (leftmost) occurrence
    srt_i = np.argsort(cand, axis=1, kind="stable")
    srt = np.take_along_axis(cand, srt_i, axis=1)
    dup_sorted = np.concatenate([np.zeros((n, 1), bool), (srt[:, 1:] == srt[:, :-1]) & (srt[:, 1:] >= 0)], axis=1)
    dup = np.empty_like(dup_sorted)
    np.put_along_axis(dup, srt_i, dup_sorted, axis=1)
    cand = np.where(dup, -1, cand)
    # left-compact valid entries, preserving column order
    key = np.where(cand < 0, 1 << 30, np.arange(2 * r, dtype=np.int64)[None, :])
    order = np.argsort(key, axis=1, kind="stable")
    return np.take_along_axis(cand, order, axis=1)[:, :r].astype(np.int32)


def compute_medoid(emb: np.ndarray) -> int:
    mean = jnp.mean(jnp.asarray(emb), axis=0, keepdims=True)
    d = jnp.sum(jnp.square(jnp.asarray(emb) - mean), axis=1)
    return int(jnp.argmin(d))
