"""Fused graph beam search — the signature query path, as one jitted program.

This replaces the reference's entire query-time stack: the forked-faiss C++
beam search (hnsw_backend.py:241-248), the per-hop ZMQ "distance request" to a
Python embedding server (hnsw_embedding_server.py:147-211, call stack
SURVEY.md §3.2 "PROCESS BOUNDARY #3 — THE latency bottleneck"), and DiskANN's
PQ traversal + deferred exact rerank (diskann_backend.py:452-467). Here the
whole thing — frontier selection, fixed-degree neighbor gather, visited-bitmap
dedup, PQ-ADC screening, batched encoder recompute of survivors, candidate
pool merge — is a single `lax.while_loop` vmapped over the query batch, so the
hot loop never leaves the chip.

TPU shape discipline (SURVEY.md §7 "hard parts"):
  * data-dependent termination -> `lax.while_loop` + convergence flag
    (the reference's `check_relative_distance` early-exit, hnsw_backend.py:209)
  * ragged neighbor sets -> fixed-degree graph rows padded with -1 + masking
  * dynamic recompute batches -> static `prune_keep` survivors per hop
    (the reference's `pq_pruning_ratio` / global pruning strategy,
    hnsw_backend.py:220-231)
  * visited set -> per-query bitmap of u32 words in HBM, updated with
    scatter-add of fresh bits (add == bitwise-or because each added bit is
    provably unset)

Traversal distance modes:
  * ``stored``     exact distances from an HBM-resident embedding matrix
                   (non-compact indexes, is_recompute=False parity)
  * ``recompute``  exact distances by *re-encoding passages on-chip*: gather
                   token rows -> jitted encoder forward -> distance. With
                   ``prune_keep`` set, PQ-ADC screens all candidates and only
                   the best ``prune_keep`` are re-encoded (two-tier scheme).
  * ``pq``         PQ-ADC approximate distances only (DiskANN-style); combine
                   with ``rerank`` for the final exact recompute pass.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..embeddings.encoder import EncoderConfig, encode_tokens
from .pq import adc_distances, adc_lut

INF = jnp.float32(3.4e38)
BIG = jnp.float32(1e37)


class GraphData(NamedTuple):
    """Device-resident index state. Unused fields hold (1,1)-shaped dummies."""

    neighbors: jnp.ndarray  # i32[N, R], -1 padded
    entry_ids: jnp.ndarray  # i32[E]
    emb: jnp.ndarray  # f32[N, D] | dummy
    tokens: jnp.ndarray  # i32[N, T] | dummy
    lengths: jnp.ndarray  # i32[N]   | dummy
    codes: jnp.ndarray  # u8[N, M]  | dummy
    codebooks: jnp.ndarray  # f32[M, K, ds] | dummy
    # entry-pool embeddings, row-aligned with entry_ids (bf16[E, D] | None).
    # At ~3% of rows they keep the index compact but make seed selection an
    # exact MXU matvec instead of PQ-ADC gathers — better seeds AND faster
    # screening of large pools.
    entry_emb: Optional[jnp.ndarray] = None


@dataclass(frozen=True)
class BeamConfig:
    metric: str = "l2"
    k: int = 10
    complexity: int = 64  # candidate pool size L (efSearch parity)
    beam: int = 4  # nodes expanded per hop (beam_width parity)
    max_steps: int = 64
    traversal: str = "stored"  # stored | recompute | pq
    prune_keep: int = 0  # >0: PQ-screen, re-encode only top-K per hop
    # candidate-selection strategy for the PQ screen (reference
    # hnsw_backend.py:222-231 global/local/proportional):
    #   global        top prune_keep by ADC across the whole expansion set
    #   local         per-source-node fairness: each expanded node's best
    #                 neighbors get recompute slots first (per-row ADC rank)
    #   proportional  exact-distance budget scales with the number of FRESH
    #                 candidates this hop (prune_keep * num_new / fanout)
    prune_strategy: str = "global"
    rerank: int = 0  # >0: final exact recompute of top-K pool entries
    rerank_source: str = "recompute"  # recompute | stored
    n_entries: int = 16  # starting points taken from the entry pool
    normalize: bool = False  # L2-normalize recomputed embeddings (cosine)
    enc_cfg: Optional[EncoderConfig] = None


def _metric_dists(q: jnp.ndarray, e: jnp.ndarray, metric: str) -> jnp.ndarray:
    """q [D], e [C, D] -> dists [C] (lower = closer).

    f32 on purpose: this matvec is tiny (C·D per hop), and bf16 rounding
    (~1e-3 relative) flips near-ties — on tie-dense corpora that alone
    costs tens of recall points against an f32 oracle."""
    dots = jnp.dot(e.astype(jnp.float32), q.astype(jnp.float32), preferred_element_type=jnp.float32)
    if metric in ("mips", "cosine"):
        return -dots
    return jnp.sum(jnp.square(q)) + jnp.sum(jnp.square(e.astype(jnp.float32)), axis=1) - 2.0 * dots


def _recompute_embeddings(g: GraphData, ids: jnp.ndarray, cfg: BeamConfig, enc_params) -> jnp.ndarray:
    """Re-encode passages for node ``ids`` [C] on-chip -> [C, D] f32."""
    safe = jnp.clip(ids, 0, g.tokens.shape[0] - 1)
    toks = g.tokens[safe]  # [C, T]
    t = toks.shape[1]
    mask = (jax.lax.broadcasted_iota(jnp.int32, (ids.shape[0], t), 1) < g.lengths[safe][:, None]).astype(jnp.int32)
    e = encode_tokens(enc_params, toks, mask, cfg.enc_cfg)
    if cfg.normalize and not cfg.enc_cfg.normalize:
        e = e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12)
    return e


def _exact_dists(q, g: GraphData, ids, valid, cfg: BeamConfig, enc_params, source: str):
    if source == "stored":
        e = g.emb[jnp.clip(ids, 0, g.emb.shape[0] - 1)]
    else:
        e = _recompute_embeddings(g, ids, cfg, enc_params)
    return jnp.where(valid, _metric_dists(q, e, cfg.metric), INF)


def _traversal_dists(q, g: GraphData, ids, valid, lut, cfg: BeamConfig, enc_params,
                     per_source: int = 0):
    """-> (dists [C], n_exact i32): traversal distances for candidate ``ids``
    plus how many received an EXACT (recomputed/stored) distance — the
    recompute-count telemetry the pruning strategies trade against recall.

    ``per_source``: when >0 the flat ids have [per_source, R] row structure
    (the beam-expansion case), enabling the per-source "local" strategy; 0
    (entry seeding) falls back to global selection."""
    nv = jnp.sum(valid.astype(jnp.int32))
    if cfg.traversal == "stored":
        return _exact_dists(q, g, ids, valid, cfg, enc_params, "stored"), nv
    if cfg.traversal == "pq":
        ad = adc_distances(g.codes[jnp.clip(ids, 0, g.codes.shape[0] - 1)], lut)
        return jnp.where(valid, ad, INF), jnp.int32(0)
    # recompute, optionally PQ-screened
    f = ids.shape[0]
    if cfg.prune_keep and cfg.prune_keep < f:
        ad = adc_distances(g.codes[jnp.clip(ids, 0, g.codes.shape[0] - 1)], lut)
        ad = jnp.where(valid, ad, INF)
        if cfg.prune_strategy == "local" and per_source > 0:
            # rank each candidate within its source node's row (double
            # argsort); selecting by rank hands recompute slots round-robin
            # across source nodes instead of by global ADC comparison
            adm = ad.reshape(per_source, f // per_source)
            rank = jnp.argsort(jnp.argsort(adm, axis=1), axis=1).reshape(f)
            sel = jnp.where(ad >= BIG, INF, rank.astype(jnp.float32))
        else:
            sel = ad
        _, keep_pos = jax.lax.top_k(-sel, cfg.prune_keep)
        keep_ids = ids[keep_pos]
        keep_valid = valid[keep_pos]
        if cfg.prune_strategy == "proportional":
            # budget scales with the fresh-candidate count this hop: a hop
            # that uncovers few new nodes spends few exact distances
            budget = jnp.clip(
                (cfg.prune_keep * nv + f - 1) // f, 1, cfg.prune_keep
            ).astype(jnp.int32)
            keep_valid &= jax.lax.iota(jnp.int32, cfg.prune_keep) < budget
        ed = _exact_dists(q, g, keep_ids, keep_valid, cfg, enc_params, "recompute")
        n_exact = jnp.sum(keep_valid.astype(jnp.int32))
        # non-recomputed survivors keep their ADC estimate
        ed = jnp.where(keep_valid, ed, ad[keep_pos])
        return ad.at[keep_pos].set(ed), n_exact
    return _exact_dists(q, g, ids, valid, cfg, enc_params, "recompute"), nv


def _merge_pool(ids_a, dist_a, flag_a, ids_b, dist_b, flag_b, l: int):
    ids = jnp.concatenate([ids_a, ids_b])
    dist = jnp.concatenate([dist_a, dist_b])
    flag = jnp.concatenate([flag_a, flag_b]).astype(jnp.int32)
    dist, ids, flag = jax.lax.sort((dist, ids, flag), num_keys=1)
    return ids[:l], dist[:l], flag[:l].astype(bool)


def _dedup_mask(nbrs: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """valid with within-batch duplicates knocked out (first occurrence wins).
    The O(f^2) pairwise test runs on the VPU at beam*R scale (f=512 -> 262K
    bool lanes/hop; per-hop cost profiled in docs/profile_fused_loop.md via
    benchmarks/profile_fused_loop.py) and keeps ORIGINAL order — required by
    the per-source 'local' prune strategy's [beam, R] row structure. Shared by
    the single-chip loop and the SPMD twin (parallel/sharded_search.py)."""
    f = nbrs.shape[0]
    ii = jax.lax.broadcasted_iota(jnp.int32, (f, f), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (f, f), 1)
    dup = jnp.any((nbrs[:, None] == nbrs[None, :]) & (ii > jj) & valid[None, :], axis=1)
    return valid & ~dup


def _search_one(q: jnp.ndarray, g: GraphData, cfg: BeamConfig, enc_params):
    n, r = g.neighbors.shape
    l = cfg.complexity
    f = cfg.beam * r
    nw = (n + 31) // 32

    lut = None
    if cfg.traversal == "pq" or (cfg.traversal == "recompute" and cfg.prune_keep):
        lut = adc_lut(q, g.codebooks, cfg.metric)

    # ---- init: query-aware entry seeding ----------------------------------
    # Replaces HNSW's upper hierarchy layers: the build stores a large strided
    # entry pool; per query, a cheap screen (exact for stored mode, PQ-ADC
    # otherwise) picks the n_entries best starting points. Removes the
    # fixed-entry sensitivity a static entry set has.
    ne = min(cfg.n_entries, g.entry_ids.shape[0], l)
    if g.entry_ids.shape[0] > ne:
        pool = g.entry_ids
        if cfg.traversal == "stored":
            pd = _metric_dists(q, g.emb[pool], cfg.metric)
        elif g.entry_emb is not None and g.entry_emb.shape[0] == pool.shape[0]:
            pd = _metric_dists(q, g.entry_emb, cfg.metric)  # exact, one matvec
        elif g.codes.shape[0] > 1:
            plut = lut if lut is not None else adc_lut(q, g.codebooks, cfg.metric)
            pd = adc_distances(g.codes[pool], plut)
        else:  # no screen available: fall back to the pool head
            pd = jax.lax.broadcasted_iota(jnp.float32, (pool.shape[0], 1), 0)[:, 0]
        _, pidx = jax.lax.top_k(-pd, ne)
        e_ids = pool[pidx]
    else:
        e_ids = g.entry_ids[:ne]
    visited = jnp.zeros((nw,), jnp.uint32)
    bit = jnp.uint32(1) << (e_ids & 31).astype(jnp.uint32)
    visited = visited.at[e_ids >> 5].add(bit)  # entry ids are unique by construction
    e_valid = jnp.ones((ne,), bool)
    e_dist, n_exact = _traversal_dists(q, g, e_ids, e_valid, lut, cfg, enc_params)
    pad = l - ne
    cand_ids = jnp.concatenate([e_ids, jnp.full((pad,), -1, jnp.int32)])
    cand_dist = jnp.concatenate([e_dist, jnp.full((pad,), INF)])
    cand_flag = jnp.concatenate([jnp.zeros((ne,), bool), jnp.ones((pad,), bool)])
    cand_dist, cand_ids, flag_i = jax.lax.sort((cand_dist, cand_ids, cand_flag.astype(jnp.int32)), num_keys=1)
    cand_flag = flag_i.astype(bool)

    def cond(state):
        _, _, _, _, step, _, done = state
        return (step < cfg.max_steps) & ~done

    def body(state):
        cand_ids, cand_dist, cand_flag, visited, step, n_exact, done = state
        # 1. select the `beam` closest unexpanded candidates
        sel_score = jnp.where(cand_flag, INF, cand_dist)
        neg, pos = jax.lax.top_k(-sel_score, cfg.beam)
        sel_valid = -neg < BIG
        sel_ids = jnp.where(sel_valid, cand_ids[pos], 0)
        cand_flag = cand_flag.at[pos].set(True)
        # 2. expand: gather fixed-degree neighbor rows
        nbrs = g.neighbors[sel_ids].reshape(f)  # [beam*R]
        valid = (nbrs >= 0) & jnp.repeat(sel_valid, r, total_repeat_length=f)
        # 3. dedup within the batch
        valid = _dedup_mask(nbrs, valid)
        # 4. visited-bitmap test + mark (scatter-add of provably-unset bits)
        safe = jnp.clip(nbrs, 0, n - 1)
        wi = safe >> 5
        bit = jnp.uint32(1) << (safe & 31).astype(jnp.uint32)
        is_new = ((visited[wi] & bit) == 0) & valid
        visited = visited.at[wi].add(jnp.where(is_new, bit, jnp.uint32(0)))
        # 5. distances for fresh candidates
        new_dist, hop_exact = _traversal_dists(
            q, g, safe, is_new, lut, cfg, enc_params, per_source=cfg.beam
        )
        new_ids = jnp.where(is_new, nbrs, -1)
        # 6. merge into the sorted pool
        cand_ids, cand_dist, cand_flag = _merge_pool(
            cand_ids, cand_dist, cand_flag, new_ids, new_dist, ~is_new, l
        )
        # 7. convergence (efSearch semantics): stop only when the closest
        # unexpanded candidate is farther than the WORST entry of the full
        # L-pool — comparing against the kth result instead terminates far
        # too early and caps recall regardless of complexity
        best_unexp = jnp.min(jnp.where(cand_flag, INF, cand_dist))
        worst_pool = cand_dist[l - 1]
        done = (best_unexp > worst_pool) | (best_unexp >= BIG)
        return cand_ids, cand_dist, cand_flag, visited, step + 1, n_exact + hop_exact, done

    state = (cand_ids, cand_dist, cand_flag, visited, jnp.int32(0), n_exact, jnp.bool_(False))
    cand_ids, cand_dist, cand_flag, visited, steps, n_exact, _ = jax.lax.while_loop(cond, body, state)

    # ---- optional exact rerank (DiskANN deferred-fetch parity) ------------
    if cfg.rerank:
        rr = min(cfg.rerank, l)
        top_ids = cand_ids[:rr]
        top_valid = top_ids >= 0
        exact = _exact_dists(
            q, g, jnp.clip(top_ids, 0, n - 1), top_valid, cfg, enc_params, cfg.rerank_source
        )
        exact, top_ids = jax.lax.sort((exact, top_ids), num_keys=1)
        n_exact = n_exact + jnp.sum(top_valid.astype(jnp.int32))
        return top_ids[: cfg.k], exact[: cfg.k], steps, n_exact
    return cand_ids[: cfg.k], cand_dist[: cfg.k], steps, n_exact


def pack_results(labels: jnp.ndarray, dists: jnp.ndarray) -> jnp.ndarray:
    """labels i32[B, k] + dists f32[B, k] -> i32[B, 2k], fused into the jitted
    program. Every device->host sync pays a full tunnel RTT (~28 ms on a
    tunneled TPU), so fetching labels and distances as two separate
    ``np.asarray`` calls doubles query latency; one packed buffer crosses in a
    single transfer. Distances are *bitcast* (exact bits), recovered by
    :func:`unpack_results`."""
    return jnp.concatenate([labels, jax.lax.bitcast_convert_type(dists, jnp.int32)], axis=1)


def unpack_results(packed) -> tuple:
    """Host-side inverse of :func:`pack_results` -> (labels i32, dists f32)."""
    import numpy as np

    arr = np.asarray(packed)
    k = arr.shape[1] // 2
    return arr[:, :k], np.ascontiguousarray(arr[:, k:]).view(np.float32)


def pack_results_full(labels, dists, steps, n_exact) -> jnp.ndarray:
    """Like :func:`pack_results` but also carries the per-lane telemetry the
    adaptive two-phase search needs on host: i32[B, 2k+2] =
    [labels | bitcast(dists) | steps | n_exact]. Still one transfer."""
    return jnp.concatenate(
        [
            labels,
            jax.lax.bitcast_convert_type(dists, jnp.int32),
            steps[:, None],
            n_exact[:, None],
        ],
        axis=1,
    )


def unpack_results_full(packed) -> tuple:
    """Inverse of :func:`pack_results_full` ->
    (labels i32[B,k], dists f32[B,k], steps i32[B], n_exact i32[B]).
    Always writable (np.asarray of a device array may be read-only, and the
    adaptive search scatters escalated lanes back in place)."""
    import numpy as np

    arr = np.asarray(packed)
    if not arr.flags.writeable:
        arr = arr.copy()
    k = (arr.shape[1] - 2) // 2
    labels = arr[:, :k]
    dists = np.ascontiguousarray(arr[:, k : 2 * k]).view(np.float32)
    return labels, dists, arr[:, 2 * k], arr[:, 2 * k + 1]


@functools.partial(jax.jit, static_argnames=("cfg",))
def beam_search_batch(q: jnp.ndarray, g: GraphData, cfg: BeamConfig, enc_params=None):
    """q [B, D] -> (labels i32[B, k], dists f32[B, k], steps i32[B],
    n_exact i32[B] — exact-distance evaluations per query, the recompute-count
    telemetry the pruning strategies trade against recall)."""
    if enc_params is None:
        enc_params = {"_": jnp.zeros((1,), jnp.float32)}
    return jax.vmap(lambda qi: _search_one(qi, g, cfg, enc_params))(q)


@functools.partial(jax.jit, static_argnames=("cfg",))
def beam_search_batch_packed(q: jnp.ndarray, g: GraphData, cfg: BeamConfig, enc_params=None):
    """Like :func:`beam_search_batch` but returns one packed i32[B, 2k] buffer
    (single device->host transfer; see :func:`pack_results`)."""
    if enc_params is None:
        enc_params = {"_": jnp.zeros((1,), jnp.float32)}
    labels, dists, _, _ = jax.vmap(lambda qi: _search_one(qi, g, cfg, enc_params))(q)
    return pack_results(labels, dists)


@functools.partial(jax.jit, static_argnames=("cfg",))
def beam_search_batch_packed_full(q: jnp.ndarray, g: GraphData, cfg: BeamConfig, enc_params=None):
    """Like :func:`beam_search_batch_packed` but the packed buffer also carries
    per-lane steps and n_exact (see :func:`pack_results_full`) — the telemetry
    transfer the adaptive two-phase search decides escalation from."""
    if enc_params is None:
        enc_params = {"_": jnp.zeros((1,), jnp.float32)}
    labels, dists, steps, n_exact = jax.vmap(lambda qi: _search_one(qi, g, cfg, enc_params))(q)
    return pack_results_full(labels, dists, steps, n_exact)


def beam_search_adaptive(q, g: GraphData, cfg: BeamConfig, enc_params=None, first_steps: int = 0):
    """Two-phase batched search (host orchestration, two device dispatches).

    A vmapped ``while_loop`` runs every lane until the SLOWEST lane converges,
    so one hard query in a large batch at high complexity drags the whole
    batch (measured: 26 -> 358 ms/q going cx1024 -> cx2048 at 10M scale,
    because a few lanes need 4x the median step count). Fix: run the full
    batch with ``max_steps`` capped at ``first_steps``, fetch the per-lane
    step counts (one packed transfer), then re-dispatch ONLY the lanes that
    hit the cap — padded to a pow2 bucket — with the full step budget.

    Result parity is exact: a lane that converged under the cap is
    deterministic and identical to the uncapped run; a capped lane is rerun
    from scratch at full budget. The reference has no batched path at all
    (every query is a separate C++ search; SURVEY.md §3.2).

    Keep ``first_steps`` a pow2-ish constant per deployment — every distinct
    value compiles a separate program per batch shape.

    Returns numpy ``(labels i32[B,k], dists f32[B,k], steps i32[B],
    n_exact i32[B])``; escalated lanes report their full-run telemetry.
    """
    import dataclasses

    import numpy as np

    if enc_params is None:
        enc_params = {"_": jnp.zeros((1,), jnp.float32)}
    qh = np.ascontiguousarray(np.asarray(q), dtype=np.float32)
    if first_steps <= 0 or first_steps >= cfg.max_steps:
        return unpack_results_full(beam_search_batch_packed_full(jnp.asarray(qh), g, cfg, enc_params))
    cfg1 = dataclasses.replace(cfg, max_steps=int(first_steps))
    labels, dists, steps, n_exact = unpack_results_full(
        beam_search_batch_packed_full(jnp.asarray(qh), g, cfg1, enc_params)
    )
    # steps == cap means truncated OR converged exactly at the cap; escalate
    # both (the latter rerun is wasted but rare and correct)
    esc = np.nonzero(steps >= first_steps)[0]
    if esc.size == 0:
        return labels, dists, steps, n_exact
    b2 = 1 << int(esc.size - 1).bit_length() if esc.size > 1 else 1
    idx = np.resize(esc, b2)  # cyclic repeats keep pad lanes realistic
    l2, d2, s2, ne2 = unpack_results_full(
        beam_search_batch_packed_full(jnp.asarray(qh[idx]), g, cfg, enc_params)
    )
    m = esc.size
    labels[esc], dists[esc], steps[esc], n_exact[esc] = l2[:m], d2[:m], s2[:m], ne2[:m]
    return labels, dists, steps, n_exact


@functools.partial(jax.jit, static_argnames=("cfg",))
def beam_search_text_batch(q_ids: jnp.ndarray, q_mask: jnp.ndarray, g: GraphData,
                           cfg: BeamConfig, enc_params):
    """Fused query-encode + search: tokens in, results out, ONE device
    dispatch per query batch (host<->device round-trips cost tens of ms
    through a TPU tunnel; the reference pays a ZMQ hop here instead)."""
    q = encode_tokens(enc_params, q_ids, q_mask, cfg.enc_cfg)
    if cfg.normalize and not cfg.enc_cfg.normalize:
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    return jax.vmap(lambda qi: _search_one(qi, g, cfg, enc_params))(q)


@functools.partial(jax.jit, static_argnames=("cfg",))
def beam_search_text_batch_packed(q_ids: jnp.ndarray, q_mask: jnp.ndarray, g: GraphData,
                                  cfg: BeamConfig, enc_params):
    """Fused encode+search returning one packed i32[B, 2k] buffer (single
    device->host transfer; see :func:`pack_results`)."""
    q = encode_tokens(enc_params, q_ids, q_mask, cfg.enc_cfg)
    if cfg.normalize and not cfg.enc_cfg.normalize:
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    labels, dists, _, _ = jax.vmap(lambda qi: _search_one(qi, g, cfg, enc_params))(q)
    return pack_results(labels, dists)


@functools.partial(jax.jit, static_argnames=("k", "metric", "normalize", "enc_cfg"))
def rerank_tokens_batch(q, toks, lens, ids, k: int, metric: str, normalize: bool,
                        enc_cfg, enc_params):
    """Host-deferred exact rerank: re-encode HOST-GATHERED token rows on-chip
    and return the exact top-k. q [B,D] f32, toks [B,RR,T] i32, lens [B,RR]
    i32, ids [B,RR] i32 (-1 padded) -> packed i32[B, 2k].

    This is the second dispatch of the beyond-HBM search path (DiskANN's
    disk-deferred fetch, reference diskann_backend.py:444-467, re-designed
    for a TPU whose HBM cannot hold the token store at 60M chunks): the PQ
    traversal runs entirely on-chip against codes+graph, only the top-L pool
    ids cross to the host, the host gathers L token rows from its RAM/mmap
    store, and this program produces exact distances. Two dispatches total —
    the reference pays a ZMQ round-trip per rerank batch instead."""
    rr, t = toks.shape[1], toks.shape[2]

    def one(qi, ti, li, ii):
        mask = (jax.lax.broadcasted_iota(jnp.int32, (rr, t), 1) < li[:, None]).astype(jnp.int32)
        e = encode_tokens(enc_params, ti, mask, enc_cfg)
        if normalize and not enc_cfg.normalize:
            e = e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12)
        d = jnp.where(ii >= 0, _metric_dists(qi, e, metric), INF)
        d, ii = jax.lax.sort((d, ii), num_keys=1)
        return ii[:k], d[:k]

    labels, dists = jax.vmap(one)(q, toks, lens, ids)
    return pack_results(labels, dists)


def make_dummy(shape=(1, 1), dtype=jnp.float32):
    return jnp.zeros(shape, dtype)
