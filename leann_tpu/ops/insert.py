"""Incremental index updates: Vamana-style batched insertion.

The reference has NO incremental updates — adding one chunk means a full
rebuild (SURVEY.md §5 "No incremental/streaming build"). This module adds
them, TPU-style: a whole batch of new nodes is inserted with three batched
device programs instead of per-node sequential insertion:

  1. discovery — beam-search the live index for each new vector's top-C
     neighborhood (exact distances; recompute traversal on compact indexes)
  2. robust prune — `robust_prune_explicit` selects each new node's diverse
     degree-R out-neighborhood from the discovered candidates
  3. reverse repair — every touched existing node j re-prunes {current
     neighbors of j} ∪ {new nodes that chose j} back down to R, which is
     exactly Vamana's insert-side repair, batched over all touched nodes

Embeddings of existing nodes are never stored on compact indexes; they are
recomputed from the token store on demand (the same recompute machinery the
query path uses).
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .graph import robust_prune_explicit

logger = logging.getLogger(__name__)


def _bucket_pow2(n: int, lo: int = 8) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def node_embeddings(searcher, ids: np.ndarray, new_emb: Optional[np.ndarray] = None,
                    n_old: int = 0) -> np.ndarray:
    """Embeddings for node ``ids`` (any shape) -> f32 [..., D].

    Stored-embedding indexes slice the matrix; compact indexes re-encode from
    the token store (pow2-bucketed batches to bound compiles). Ids >= n_old
    address rows of ``new_emb`` (the batch being inserted); -1 rows are zeros.
    """
    flat = ids.reshape(-1)
    uniq, inv = np.unique(flat, return_inverse=True)
    if n_old == 0:
        n_old = int(searcher.neighbors.shape[0])
    old_mask = (uniq >= 0) & (uniq < n_old)
    old_ids = uniq[old_mask]
    if searcher.emb.shape[0] > 1:  # stored matrix
        emb_np = np.asarray(searcher.emb)
        d = emb_np.shape[1]
        out_u = np.zeros((uniq.shape[0], d), np.float32)
        out_u[old_mask] = emb_np[old_ids]
    else:  # recompute from tokens
        if not searcher.has_tokens:
            raise RuntimeError("compact index without token store: cannot insert")
        toks = np.asarray(searcher.tokens)[old_ids]
        lens = np.asarray(searcher.lengths)[old_ids]
        enc = searcher._encoder()
        d = enc.dim
        out_u = np.zeros((uniq.shape[0], d), np.float32)
        if old_ids.size:
            got = np.empty((old_ids.size, d), np.float32)
            bs = 512
            for s in range(0, old_ids.size, bs):
                tb = toks[s : s + bs]
                lb = lens[s : s + bs]
                b = _bucket_pow2(tb.shape[0])
                if b > tb.shape[0]:
                    tb = np.concatenate([tb, np.zeros((b - tb.shape[0], tb.shape[1]), tb.dtype)])
                    lb = np.concatenate([lb, np.ones((b - lb.shape[0],), lb.dtype)])
                mask = (np.arange(tb.shape[1])[None, :] < lb[:, None]).astype(np.int32)
                e = enc.encode_token_batch(tb.astype(np.int32), mask)
                got[s : s + bs] = e[: min(bs, old_ids.size - s)]
            out_u[old_mask] = got
    if new_emb is not None:
        new_mask = uniq >= n_old
        if new_mask.any():
            out_u[new_mask] = new_emb[uniq[new_mask] - n_old]
    if getattr(searcher, "metric", "") == "cosine":
        out_u = out_u / np.maximum(np.linalg.norm(out_u, axis=1, keepdims=True), 1e-12)
    return out_u[inv].reshape(ids.shape + (d,))


def _prune_batch(p_emb: np.ndarray, cand_ids: np.ndarray, cand_emb: np.ndarray,
                 r: int, alpha: float) -> np.ndarray:
    """pow2-padded wrapper over robust_prune_explicit -> i32 [B, R]."""
    real_b = p_emb.shape[0]
    b = _bucket_pow2(real_b)
    if b > real_b:
        pad = b - real_b
        p_emb = np.concatenate([p_emb, np.zeros((pad, p_emb.shape[1]), p_emb.dtype)])
        cand_ids = np.concatenate([cand_ids, np.full((pad, cand_ids.shape[1]), -1, cand_ids.dtype)])
        cand_emb = np.concatenate([cand_emb, np.zeros((pad,) + cand_emb.shape[1:], cand_emb.dtype)])
    sel = robust_prune_explicit(
        jnp.asarray(p_emb), jnp.asarray(cand_ids.astype(np.int32)), jnp.asarray(cand_emb),
        r, float(alpha), max(1, r // 4),
    )
    return np.asarray(sel)[:real_b]


def insert_batch(
    searcher,
    new_emb: np.ndarray,      # [B, D] f32, already metric-normalized
    ef: int = 64,
    alpha: float = 1.2,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Insert a batch of new nodes into the graph held by ``searcher``.

    -> (new_rows i32[B, R], touched_ids i32[A], touched_rows i32[A, R]):
    the new nodes' neighbor rows plus the repaired rows of every existing
    node that gained an in-edge.
    """
    n_old, r = searcher.neighbors.shape
    b_new = new_emb.shape[0]
    c = min(max(2 * r, 16), n_old)

    # 1. discovery: exact top-C via the live search path
    out = searcher.search(
        new_emb, c,
        complexity=max(ef, c),
        beam_width=max(4, min(8, ef // 8)),
        recompute_embeddings=bool(searcher.has_tokens),
        prune_ratio=0.0,
    )
    cand = np.asarray(out["labels"], np.int32)  # [B, C]

    # 2. robust prune each new node's candidates
    cand_emb = node_embeddings(searcher, np.clip(cand, 0, n_old - 1)) * (cand >= 0)[..., None]
    new_rows = _prune_batch(new_emb, cand, cand_emb, r, alpha)  # [B, R]

    # 3. reverse repair: every existing node chosen by a new node re-prunes
    # {its current row} ∪ {incoming new ids}
    nbrs_np = np.asarray(searcher.neighbors)
    src = np.repeat(np.arange(b_new, dtype=np.int32), r)
    dst = new_rows.reshape(-1)
    keep = dst >= 0
    src, dst = src[keep], dst[keep]
    touched = np.unique(dst)
    a = touched.shape[0]
    if a == 0:
        return new_rows, touched, np.zeros((0, r), np.int32)
    # incoming new ids per touched node (bounded fan-in keeps shapes static)
    max_in = min(b_new, 8)
    incoming = np.full((a, max_in), -1, np.int32)
    order = np.argsort(dst, kind="stable")
    ds, ss = dst[order], src[order]
    first = np.r_[True, ds[1:] != ds[:-1]]
    group = np.cumsum(first) - 1
    rank = np.arange(ds.size) - np.maximum.accumulate(np.where(first, np.arange(ds.size), 0))
    ok = rank < max_in
    incoming[group[ok], rank[ok]] = n_old + ss[ok]
    cand_j = np.concatenate([nbrs_np[touched], incoming], axis=1)  # [A, R+max_in]
    # self-reference guard (a node never lists itself)
    cand_j[cand_j == touched[:, None]] = -1
    cand_j_emb = node_embeddings(
        searcher, np.clip(cand_j, 0, n_old + b_new - 1), new_emb=new_emb, n_old=n_old
    ) * (cand_j >= 0)[..., None]
    p_emb = node_embeddings(searcher, touched)
    touched_rows = _prune_batch(p_emb, cand_j, cand_j_emb, r, alpha)
    logger.info("insert_batch: %d new nodes, %d repaired rows", b_new, a)
    return new_rows, touched, touched_rows
