"""Multi-chip sharded beam search (shard_map over a ``gp`` device mesh).

The reference has no distributed execution at all (SURVEY.md §2.5) — this is
the new capability BASELINE.json's north star asks for: shard the graph, PQ
codes, and token rows across devices (block partition: node ``i`` lives on
device ``i // S``), keep the per-query candidate pool replicated, and combine
per-hop contributions with XLA collectives over ICI:

  * neighbor-row fetch: each device contributes rows it owns; one psum of the
    masked rows reassembles the frontier's adjacency (+1/-1 trick for the -1
    padding).
  * PQ screening: each device runs ADC on its local codes for owned
    candidates; a psum of masked distances yields the replicated approx
    distances.
  * recompute: each device re-encodes only the best ``keep_local`` *owned*
    survivors (static shape → no load imbalance recompiles), then scatters
    (exact - approx) deltas into the frontier vector and psums — so encoder
    FLOPs scale 1/ndev while the wire carries only [f] floats per hop.

The LDG partition (backends/diskann/partition.py) can permute node ids so
graph neighborhoods are device-local; with block partition the psum'd row
fetch is still exact either way.

Visited bitmaps and pool state are replicated and updated identically on
every device — no divergent control flow, so the whole while_loop stays SPMD.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..embeddings.encoder import encode_tokens
from ..ops.beam_search import (
    BIG,
    INF,
    BeamConfig,
    _dedup_mask,
    _merge_pool,
    pack_results,
    unpack_results,
)
from ..ops.pq import adc_distances, adc_lut

try:  # jax>=0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


class ShardedGraph(NamedTuple):
    """Device-sharded index state. Row-sharded fields are padded so N divides
    the mesh size; unused fields hold dummies (replicated)."""

    neighbors: jnp.ndarray  # i32[N, R]   P(gp, None)
    entry_ids: jnp.ndarray  # i32[E]      replicated
    emb: jnp.ndarray  # f32[N, D]   P(gp, None) | dummy
    tokens: jnp.ndarray  # i32[N, T]   P(gp, None) | dummy
    lengths: jnp.ndarray  # i32[N]      P(gp)      | dummy
    codes: jnp.ndarray  # u8[N, M]    P(gp, None) | dummy
    codebooks: jnp.ndarray  # f32[M,K,ds] replicated
    entry_emb: jnp.ndarray  # bf16[E, D] replicated | dummy (1,1) — exact seed screen


def _psum_rows_i32(local_vals, owned, axis):
    """Reassemble integer values (≥ -1) owned by exactly one device; ``owned``
    must broadcast elementwise against ``local_vals``."""
    return jax.lax.psum(jnp.where(owned, local_vals + 1, 0), axis) - 1


def _psum_vals(local_vals, owned, axis):
    return jax.lax.psum(jnp.where(owned, local_vals, 0.0), axis)


def _local_metric_dists(q, e, metric):
    # f32 like ops/beam_search._metric_dists: bf16 flips near-ties
    dots = jnp.dot(e.astype(jnp.float32), q.astype(jnp.float32), preferred_element_type=jnp.float32)
    if metric in ("mips", "cosine"):
        return -dots
    return jnp.sum(jnp.square(q)) + jnp.sum(jnp.square(e.astype(jnp.float32)), axis=1) - 2.0 * dots


def _sharded_search_one(q, g: ShardedGraph, cfg: BeamConfig, enc_params, keep_local: int, axis: str = "gp"):
    """Runs on each device over its row-shard; pool state replicated."""
    s, r = g.neighbors.shape  # local shard rows
    ndev = jax.lax.psum(1, axis)
    n = s * ndev
    my = jax.lax.axis_index(axis)
    lo = my * s
    l = cfg.complexity
    f = cfg.beam * r
    nw = (n + 31) // 32

    use_pq = cfg.traversal == "pq" or (cfg.traversal == "recompute" and keep_local > 0)
    lut = adc_lut(q, g.codebooks, cfg.metric) if use_pq else None

    def local_ids(ids):
        owned = (ids >= lo) & (ids < lo + s)
        return jnp.where(owned, ids - lo, 0), owned

    def approx_dists(ids, valid):
        li, owned = local_ids(ids)
        ad = adc_distances(g.codes[li], lut)
        full = _psum_vals(ad, owned & valid, axis)
        return jnp.where(valid, full, INF)

    def stored_dists(ids, valid):
        li, owned = local_ids(ids)
        d = _local_metric_dists(q, g.emb[li], cfg.metric)
        full = _psum_vals(d, owned & valid, axis)
        return jnp.where(valid, full, INF)

    def recompute_local(ids, sel_mask, per_source):
        """Re-encode ``keep_local`` owned candidates -> (positions, exact, ok).

        Pruning strategies stay in lockstep with ops/beam_search.py
        _traversal_dists (global/local/proportional), with per-device
        ownership layered on top: "global" is approximated by the union of
        per-device top ``keep_local`` ADC picks — measured cost of the
        approximation on an adversarial cluster-contiguous corpus is within
        ~1 recall point of true global selection, and usually ABOVE it
        (tests/test_sharded_backend.py
        TestShardedGlobalPruningApproximation); "local" ranks candidates
        within their source node's row (on the replicated psum'd ADC) before
        the per-device pick; "proportional" scales each device's accepted
        budget with the fresh-candidate count this hop."""
        c = ids.shape[0]
        kl = min(keep_local, c)
        li, owned = local_ids(ids)
        if cfg.prune_strategy == "local" and per_source > 0:
            adm = approx_cache.reshape(per_source, c // per_source)
            rank = jnp.argsort(jnp.argsort(adm, axis=1), axis=1).reshape(c)
            base = jnp.where(approx_cache >= BIG, INF, rank.astype(jnp.float32))
        else:
            base = approx_cache
        score = jnp.where(owned & sel_mask, base, INF)
        neg, pos = jax.lax.top_k(-score, kl)  # positions into [f]
        ok = -neg < BIG
        if cfg.prune_strategy == "proportional" and per_source > 0:
            nv = jnp.sum(sel_mask.astype(jnp.int32))
            budget = jnp.clip((kl * nv + c - 1) // c, 1, kl).astype(jnp.int32)
            ok &= jax.lax.iota(jnp.int32, kl) < budget
        kept_li = jnp.where(ok, li[pos], 0)
        toks = g.tokens[kept_li]
        t = toks.shape[1]
        lens = g.lengths[kept_li]
        mask = (jax.lax.broadcasted_iota(jnp.int32, (kl, t), 1) < lens[:, None]).astype(jnp.int32)
        e = encode_tokens(enc_params, toks, mask, cfg.enc_cfg)
        if cfg.normalize and not cfg.enc_cfg.normalize:
            e = e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12)
        return pos, _local_metric_dists(q, e, cfg.metric), ok

    approx_cache = None  # bound per-hop below

    def traversal_dists(ids, valid, per_source=0):
        nonlocal approx_cache
        if cfg.traversal == "stored":
            return stored_dists(ids, valid)
        ad = approx_dists(ids, valid)
        if cfg.traversal == "pq":
            return ad
        # recompute: PQ-screen locally, re-encode owned survivors, psum deltas
        approx_cache = ad
        pos, exact, ok = recompute_local(ids, valid, per_source)
        delta = jnp.zeros((ids.shape[0],), jnp.float32).at[pos].add(
            jnp.where(ok, exact - ad[pos], 0.0)
        )
        return ad + jax.lax.psum(delta, axis)

    # ---- init: query-aware entry seeding (see ops/beam_search.py) ---------
    ne = min(cfg.n_entries, g.entry_ids.shape[0], l)
    if g.entry_ids.shape[0] > ne:
        pool = g.entry_ids
        ones = jnp.ones((pool.shape[0],), bool)
        if cfg.traversal == "stored":
            pd = stored_dists(pool, ones)
        elif g.entry_emb.shape[0] == pool.shape[0] and g.entry_emb.shape[1] == q.shape[-1]:
            pd = _local_metric_dists(q, g.entry_emb, cfg.metric)  # exact, replicated
        elif g.codes.shape[1] > 1 or g.codebooks.shape[0] > 1:
            plut = lut if lut is not None else adc_lut(q, g.codebooks, cfg.metric)
            li, owned = local_ids(pool)
            pd = _psum_vals(adc_distances(g.codes[li], plut), owned, axis)
        else:
            pd = jax.lax.broadcasted_iota(jnp.float32, (pool.shape[0], 1), 0)[:, 0]
        _, pidx = jax.lax.top_k(-pd, ne)
        e_ids = pool[pidx]
    else:
        e_ids = g.entry_ids[:ne]
    visited = jnp.zeros((nw,), jnp.uint32)
    visited = visited.at[e_ids >> 5].add(jnp.uint32(1) << (e_ids & 31).astype(jnp.uint32))
    e_dist = traversal_dists(e_ids, jnp.ones((ne,), bool))
    pad = l - ne
    cand_ids = jnp.concatenate([e_ids, jnp.full((pad,), -1, jnp.int32)])
    cand_dist = jnp.concatenate([e_dist, jnp.full((pad,), INF)])
    cand_flag = jnp.concatenate([jnp.zeros((ne,), bool), jnp.ones((pad,), bool)])
    cand_dist, cand_ids, fi = jax.lax.sort((cand_dist, cand_ids, cand_flag.astype(jnp.int32)), num_keys=1)
    cand_flag = fi.astype(bool)

    def cond(state):
        return (state[4] < cfg.max_steps) & ~state[5]

    def body(state):
        cand_ids, cand_dist, cand_flag, visited, step, done = state
        sel_score = jnp.where(cand_flag, INF, cand_dist)
        neg, pos = jax.lax.top_k(-sel_score, cfg.beam)
        sel_valid = -neg < BIG
        sel_ids = jnp.where(sel_valid, cand_ids[pos], 0)
        cand_flag = cand_flag.at[pos].set(True)
        # frontier adjacency via owner-psum
        li, owned = local_ids(sel_ids)
        nbrs = _psum_rows_i32(
            g.neighbors[li].reshape(cfg.beam * r),
            jnp.repeat(owned, r, total_repeat_length=f),
            axis,
        )
        valid = (nbrs >= 0) & jnp.repeat(sel_valid, r, total_repeat_length=f)
        valid = _dedup_mask(nbrs, valid)
        safe = jnp.clip(nbrs, 0, n - 1)
        wi = safe >> 5
        bit = jnp.uint32(1) << (safe & 31).astype(jnp.uint32)
        is_new = ((visited[wi] & bit) == 0) & valid
        visited = visited.at[wi].add(jnp.where(is_new, bit, jnp.uint32(0)))
        new_dist = traversal_dists(safe, is_new, per_source=cfg.beam)
        new_ids = jnp.where(is_new, nbrs, -1)
        cand_ids, cand_dist, cand_flag = _merge_pool(
            cand_ids, cand_dist, cand_flag, new_ids, new_dist, ~is_new, l
        )
        # efSearch convergence: compare against the worst of the full pool
        # (see ops/beam_search.py)
        best_unexp = jnp.min(jnp.where(cand_flag, INF, cand_dist))
        worst_pool = cand_dist[l - 1]
        done = (best_unexp > worst_pool) | (best_unexp >= BIG)
        return cand_ids, cand_dist, cand_flag, visited, step + 1, done

    state = (cand_ids, cand_dist, cand_flag, visited, jnp.int32(0), jnp.bool_(False))
    cand_ids, cand_dist, cand_flag, visited, steps, _ = jax.lax.while_loop(cond, body, state)

    if cfg.rerank:
        rr = min(cfg.rerank, l)
        top_ids = cand_ids[:rr]
        top_valid = top_ids >= 0
        safe = jnp.clip(top_ids, 0, n - 1)
        if cfg.rerank_source == "stored":
            exact = stored_dists(safe, top_valid)
        else:
            # distributed rerank: each device re-encodes its owned share
            li, owned = local_ids(safe)
            toks = g.tokens[li]
            t = toks.shape[1]
            mask = (
                jax.lax.broadcasted_iota(jnp.int32, (rr, t), 1) < g.lengths[li][:, None]
            ).astype(jnp.int32)
            e = encode_tokens(enc_params, toks, mask, cfg.enc_cfg)
            if cfg.normalize and not cfg.enc_cfg.normalize:
                e = e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12)
            d = _local_metric_dists(q, e, cfg.metric)
            exact = jnp.where(top_valid, _psum_vals(d, owned & top_valid, axis), INF)
        exact, top_ids = jax.lax.sort((exact, top_ids), num_keys=1)
        return top_ids[: cfg.k], exact[: cfg.k]
    return cand_ids[: cfg.k], cand_dist[: cfg.k]


def pad_rows(a: np.ndarray, n_pad: int, fill) -> np.ndarray:
    if a.shape[0] >= n_pad:
        return a
    pad = np.full((n_pad - a.shape[0],) + a.shape[1:], fill, a.dtype)
    return np.concatenate([a, pad], axis=0)


class ShardedSearcher:
    """Places index shards over the ``gp`` axis of ``mesh`` and runs the SPMD
    beam search. A mesh with an additional ``dp`` axis (parallel/mesh.py
    ``serving_mesh``) splits the query batch over ``dp`` — serving throughput
    scales with dp while the index stays sharded (replicated across dp)."""

    def __init__(self, mesh: Mesh, neighbors: np.ndarray, *, entries: np.ndarray,
                 emb: Optional[np.ndarray] = None, tokens: Optional[np.ndarray] = None,
                 lengths: Optional[np.ndarray] = None, codes: Optional[np.ndarray] = None,
                 codebooks: Optional[np.ndarray] = None,
                 entry_emb: Optional[np.ndarray] = None):
        self.mesh = mesh
        self.dp = int(mesh.shape.get("dp", 1))
        ndev = int(mesh.shape["gp"])
        n = neighbors.shape[0]
        n_pad = ((n + ndev - 1) // ndev) * ndev
        self.n = n
        row = NamedSharding(mesh, P("gp", None))
        vec = NamedSharding(mesh, P("gp"))
        rep = NamedSharding(mesh, P())
        dummy2 = jax.device_put(np.zeros((ndev, 1), np.float32), row)

        def put_rows(a, fill, dtype=None):
            a = pad_rows(a, n_pad, fill)
            return jax.device_put(a.astype(dtype or a.dtype), row)

        self.g = ShardedGraph(
            neighbors=put_rows(neighbors, -1),
            entry_ids=jax.device_put(entries.astype(np.int32), rep),
            emb=put_rows(emb, 0.0) if emb is not None else dummy2,
            tokens=put_rows(tokens, 0) if tokens is not None else jax.device_put(np.zeros((ndev, 1), np.int32), row),
            lengths=jax.device_put(pad_rows(lengths, n_pad, 0), vec) if lengths is not None
            else jax.device_put(np.zeros((ndev,), np.int32), vec),
            codes=put_rows(codes, 0) if codes is not None else jax.device_put(np.zeros((ndev, 1), np.uint8), row),
            codebooks=jax.device_put(codebooks, rep) if codebooks is not None else jax.device_put(np.zeros((1, 1, 1), np.float32), rep),
            entry_emb=jax.device_put(
                np.asarray(entry_emb, np.float32).astype(jnp.bfloat16)
                if entry_emb is not None else np.zeros((1, 1), jnp.bfloat16),
                rep,
            ),
        )
        self._jitted = {}

    def search(self, q: np.ndarray, cfg: BeamConfig, enc_params=None, keep_local: int = 0):
        """q [B, D] -> (labels [B, k], dists [B, k]); results drop padding ids."""
        if cfg.traversal == "recompute" and keep_local <= 0:
            # sharded recompute always PQ-screens; default: full per-hop budget
            # split evenly across the graph shards
            f = cfg.beam * int(self.g.neighbors.shape[1])
            keep_local = max(1, f // int(self.mesh.shape["gp"]))
        key = (cfg, keep_local)
        if key not in self._jitted:
            mesh = self.mesh
            qspec = P("dp") if self.dp > 1 else P()
            gspec = ShardedGraph(
                neighbors=P("gp", None), entry_ids=P(), emb=P("gp", None),
                tokens=P("gp", None), lengths=P("gp"), codes=P("gp", None), codebooks=P(),
                entry_emb=P(),
            )

            def fn(q, g, enc_params):
                body = shard_map(
                    lambda qq, gg, ep: jax.vmap(
                        lambda qi: _sharded_search_one(qi, gg, cfg, ep, keep_local)
                    )(qq),
                    mesh=mesh,
                    in_specs=(qspec, gspec, P()),
                    out_specs=(qspec, qspec),
                    check_vma=False,
                )
                labels, dists = body(q, g, enc_params)
                return pack_results(labels, dists)  # one host transfer

            self._jitted[key] = jax.jit(fn)
        if enc_params is None:
            enc_params = {"_": jnp.zeros((1,), jnp.float32)}
        q = np.ascontiguousarray(q, dtype=np.float32)
        real_b = q.shape[0]
        if self.dp > 1 and real_b % self.dp:  # dp splits the batch evenly
            q = np.concatenate([q, np.zeros((self.dp - real_b % self.dp, q.shape[1]), np.float32)])
        labels, dists = unpack_results(self._jitted[key](jnp.asarray(q), self.g, enc_params))
        labels, dists = labels[:real_b], dists[:real_b]
        labels = np.where(labels >= self.n, -1, labels)  # padding rows
        return labels, dists
