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
    knn_ids, _ = exact_knn(emb, c, query_block=query_block)
    dev_emb = jnp.asarray(emb)
    neighbors = np.empty((n, r), np.int32)
    for s in range(0, n, prune_block):
        e = min(s + prune_block, n)
        cid = jnp.asarray(knn_ids[s:e])
        cemb = dev_emb[jnp.clip(cid, 0, n - 1)] * (cid >= 0)[:, :, None]
        sel = _robust_prune_block(dev_emb[s:e], cid, cemb, r, float(alpha), keep_closest)
        neighbors[s:e] = np.asarray(sel)
    # reverse-edge augmentation: fill empty (-1) slots with in-edges
    adj = [list(row[row >= 0]) for row in neighbors]
    in_edges: list = [[] for _ in range(n)]
    for u in range(n):
        for v in adj[u]:
            in_edges[v].append(u)
    for v in range(n):
        have = set(adj[v])
        for u in in_edges[v]:
            if len(adj[v]) >= r:
                break
            if u != v and u not in have:
                adj[v].append(u)
                have.add(u)
    out = np.full((n, r), -1, np.int32)
    for v in range(n):
        out[v, : len(adj[v])] = adj[v][:r]
    medoid = compute_medoid(emb)
    logger.info("graph built: N=%d R=%d avg_deg=%.1f medoid=%d", n, r, (out >= 0).mean() * r, medoid)
    return out, medoid


def compute_medoid(emb: np.ndarray) -> int:
    mean = jnp.mean(jnp.asarray(emb), axis=0, keepdims=True)
    d = jnp.sum(jnp.square(jnp.asarray(emb) - mean), axis=1)
    return int(jnp.argmin(d))
