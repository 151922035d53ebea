"""HNSW-class graph backend: HBM-resident fixed-degree graph + fused search.

Capability parity with the reference HNSW backend (hnsw_backend.py:38-253 and
its forked-faiss C++ beam search), re-designed TPU-first:

  * build: batched k-NN + α-robust-prune (ops/graph.py) instead of sequential
    `IndexHNSWFlat.add`; the result plays the role of the compact CSR graph
    produced by convert_to_csr.py (fixed-degree rows == regular gathers).
  * compact (`is_compact=True`): the embedding matrix is NOT stored — exactly
    the reference's NULL-storage pruning (convert_to_csr.py:236-237). Query
    distances come from on-chip recompute over stored token rows.
  * search: one jitted `beam_search_batch` program (ops/beam_search.py); the
    reference's SearchParametersHNSW knobs map as
       efSearch/complexity -> pool size L
       beam_size/beam_width -> nodes expanded per hop
       pq_pruning_ratio     -> PQ-screen keep fraction (global strategy)
       batch_size           -> static recompute batch (prune_keep)
  * `is_recompute=False` on a compact index is an error, matching
    hnsw_backend.py:189-193.

On-disk payload: ``<prefix>.hnsw.npz`` (neighbors, entries, medoid, metric,
flags, optional embeddings, optional PQ codes/codebooks).
"""

from __future__ import annotations

import logging
import math
import os
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from ...interface import (
    LeannBackendBuilderInterface,
    LeannBackendFactoryInterface,
    LeannBackendSearcherInterface,
)
from ...ops.beam_search import (
    BeamConfig,
    GraphData,
    beam_search_adaptive,
    beam_search_batch_packed,
    beam_search_text_batch_packed,
    unpack_results,
)
from ...ops.graph import build_graph
from ...ops.pq import choose_m, encode_pq_blocked, lift_codebooks, train_opq, train_pq
from ...registry import register_backend
from ...storage import pack_neighbors, unpack_neighbors
from ..common import BaseSearcher, mips_augment, pad_batch_rows, save_ids

logger = logging.getLogger(__name__)

N_ENTRY_POINTS = 16
ENTRY_POOL_SIZE = 4096

# auto-prune guard (prune_ratio=None): unpruned per-hop recompute re-encodes
# all beam*R candidates every hop — at high complexity the fused program
# cold-compiles for >15 minutes. When the caller didn't choose, and the
# search is big enough to hit that cliff, default to the PQ screen instead of
# documenting around the landmine. Explicit prune_ratio=0.0 still means
# "really unpruned".
AUTO_PRUNE_RATIO = 0.75
AUTO_PRUNE_MIN_N = 50_000
AUTO_PRUNE_MIN_COMPLEXITY = 256


def _entry_points(medoid: int, n: int, count: int = N_ENTRY_POINTS) -> np.ndarray:
    """Medoid + strided sample of starting points."""
    pts = [medoid] + [int(i * n / count) for i in range(count)]
    uniq = list(dict.fromkeys(p for p in pts if 0 <= p < n))
    return np.asarray(uniq[:count], np.int32)


def _pool_cap(n: int) -> int:
    """Entry-pool size rule shared by build and insert: n/16 (capped 32K) so
    seed coverage doesn't wash out at large N, floored at ENTRY_POOL_SIZE,
    and capped at n/4 so the pool stays a genuine subset on small corpora."""
    return min(max(ENTRY_POOL_SIZE, min(n // 16, 32768)), max(n // 4, N_ENTRY_POINTS))


def _entry_pool(medoid: int, n: int, has_screen: bool) -> np.ndarray:
    """Entry pool — the TPU-static replacement for HNSW's upper hierarchy
    layers. When the searcher can cheaply screen candidates per query (stored
    embeddings or PQ codes), store a large strided pool and let the query pick
    its n_entries best seeds; otherwise fall back to a small fixed set. (A
    pool that IS the corpus would be the embedding matrix back under another
    name once f16 pool embeddings are stored — hence the n/4 cap.)"""
    if not has_screen:
        return _entry_points(medoid, n, N_ENTRY_POINTS)
    return _entry_points(medoid, n, min(_pool_cap(n), n))


class HnswBuilder(LeannBackendBuilderInterface):
    def __init__(
        self,
        distance_metric: str = "mips",
        is_compact: bool = True,
        is_recompute: bool = True,
        M: int = 32,  # graph degree (reference M, hnsw_backend.py:83)
        efConstruction: int = 128,  # build candidate budget
        alpha: float = 1.2,
        pq_subspaces: int = 0,  # 0 = auto (~D/8)
        pq_rotate: bool = True,  # OPQ rotation (ops/pq.py train_opq)
        build_sharded: bool = False,  # mesh-sharded build (parallel/sharded_build.py)
        build_checkpoint_dir: str = "",  # resume multi-hour builds phase-by-phase
        reverse_candidates: int = 0,  # reverse-KNN prune candidates (graph.py)
        **kwargs,
    ):
        self.distance_metric = distance_metric
        self.is_compact = is_compact
        self.is_recompute = is_recompute
        self.m = M
        self.ef_construction = efConstruction
        self.alpha = alpha
        self.pq_subspaces = pq_subspaces
        self.pq_rotate = pq_rotate
        self.build_sharded = build_sharded
        self.build_checkpoint_dir = build_checkpoint_dir
        self.reverse_candidates = reverse_candidates

    def build(self, data: np.ndarray, ids: list, index_path: str, **kwargs) -> None:
        # f16 input is preserved (halves the host high-water at 10M+ rows);
        # device compute paths cast per-chunk (bf16 matmuls / f32 norms)
        if data.dtype != np.float16:
            data = np.ascontiguousarray(data, dtype=np.float32)
        else:
            data = np.ascontiguousarray(data)
        n, d = data.shape
        graph_data = mips_augment(data) if self.distance_metric == "mips" else data
        cand_factor = max(2, min(8, self.ef_construction // max(self.m, 1)))
        if self.build_sharded:
            from ...parallel.mesh import graph_mesh
            from ...parallel.sharded_build import sharded_build_graph

            if self.build_checkpoint_dir:
                logger.warning("build_checkpoint_dir is not supported by the "
                               "mesh-sharded build; phases will not checkpoint")
            neighbors, medoid = sharded_build_graph(
                graph_data, graph_mesh(), r=self.m, candidate_factor=cand_factor, alpha=self.alpha
            )
        else:
            neighbors, medoid = build_graph(
                graph_data, r=self.m, candidate_factor=cand_factor, alpha=self.alpha,
                checkpoint_dir=self.build_checkpoint_dir,
                reverse_candidates=self.reverse_candidates,
            )
        payload: Dict[str, Any] = {
            **pack_neighbors(neighbors),  # sorted-delta deflate (storage.py)
            "medoid": np.int32(medoid),
            "metric": self.distance_metric,
            "is_compact": self.is_compact,
            "is_recompute": self.is_recompute,
            "dim": np.int32(d),
        }
        # PQ codes steer pruned expansion whenever recompute is on
        if self.is_recompute and n >= 4:
            m = choose_m(d, self.pq_subspaces)
            if self.pq_rotate:
                # factorized on disk (~1 MB vs ~19 MB lifted); lifted at load
                rotation, cb_plain = train_opq(data, m=m, factorized=True)
                codebooks = lift_codebooks(rotation, cb_plain)
                payload["pq_rotation"] = rotation
            else:
                codebooks = cb_plain = train_pq(data, m=m)
            payload["codebooks"] = cb_plain
            payload["codes"] = encode_pq_blocked(data, codebooks)
        if not self.is_compact:
            payload["embeddings"] = data  # non-compact keeps the matrix
        has_screen = (not self.is_compact) or ("codes" in payload)
        payload["entries"] = _entry_pool(medoid, n, has_screen)
        if self.is_compact and payload["entries"].shape[0] > N_ENTRY_POINTS:
            # pool embeddings (f16, <=25% of rows by _entry_pool's cap):
            # exact MXU seed screening. l2/cosine pools are DERIVABLE from
            # the token cache (BaseSearcher.load_entry_emb) — written to the
            # .entries.cache sidecar, outside all-in accounting
            ee = data[payload["entries"]].astype(np.float16)
            if self.distance_metric in ("l2", "cosine"):
                np.save(f"{index_path}.entries.cache.npy", ee)
            else:
                payload["entry_emb"] = ee
        np.savez(f"{index_path}.hnsw.npz", **payload)
        save_ids(index_path, ids)
        logger.info("hnsw build: N=%d D=%d R=%d compact=%s", n, d, self.m, self.is_compact)


class HnswSearcher(BaseSearcher, LeannBackendSearcherInterface):
    """``sharded=True`` (or ``sharded="auto"`` with >1 device) places the
    graph/codes/tokens over a ``gp`` device mesh and runs the SPMD search
    (parallel/sharded_search.py) — the multi-chip path the reference lacks."""

    def __init__(self, index_path: str, sharded: "bool | str" = False, **kwargs):
        super().__init__(index_path, **kwargs)
        z = np.load(f"{index_path}.hnsw.npz", allow_pickle=False)
        self._nbr_np = unpack_neighbors(z)  # packed (storage.py) or legacy raw
        self.neighbors = jnp.asarray(self._nbr_np)
        self.entries = np.asarray(z["entries"])
        self.metric = str(z["metric"])
        self.is_compact = bool(z["is_compact"])
        self.n = int(self.neighbors.shape[0])
        dummy = jnp.zeros((1, 1), jnp.float32)
        self.emb = jnp.asarray(z["embeddings"]) if "embeddings" in z else dummy
        self.codes = jnp.asarray(z["codes"]) if "codes" in z else jnp.zeros((1, 1), jnp.uint8)
        cb = np.asarray(z["codebooks"]) if "codebooks" in z else None
        if cb is not None and "pq_rotation" in z:  # factorized OPQ: lift
            cb = lift_codebooks(np.asarray(z["pq_rotation"]), cb)
        self.codebooks = jnp.asarray(cb) if cb is not None else dummy
        ee = self.load_entry_emb(z)  # npz -> .entries.cache.npy -> derived
        self.entry_emb = jnp.asarray(ee, jnp.bfloat16) if ee is not None else None
        self.has_pq = "codes" in z
        tok = self.load_tokens()
        if tok is not None:
            self.tokens = jnp.asarray(tok[0])
            self.lengths = jnp.asarray(tok[1])
            self.has_tokens = True
        else:
            self.tokens = jnp.zeros((1, 1), jnp.int32)
            self.lengths = jnp.zeros((1,), jnp.int32)
            self.has_tokens = False
        self._enc = None
        self._sharded = None
        if sharded is True or (sharded == "auto" and self._n_devices() > 1):
            self._init_sharded(z)

    def _n_devices(self) -> int:
        import jax

        return len(jax.devices())

    def _init_sharded(self, z) -> None:
        from ...parallel.mesh import graph_mesh
        from ...parallel.sharded_search import ShardedSearcher

        mesh = graph_mesh()
        tok = self.load_tokens()
        self._sharded = ShardedSearcher(
            mesh,
            self._nbr_np,
            entries=self.entries,
            emb=np.asarray(z["embeddings"]) if "embeddings" in z else None,
            tokens=tok[0] if tok else None,
            lengths=tok[1] if tok else None,
            codes=np.asarray(z["codes"]) if "codes" in z else None,
            codebooks=np.asarray(self.codebooks) if "codebooks" in z else None,
            entry_emb=(np.asarray(self.entry_emb, np.float32)
                       if self.entry_emb is not None else None),
        )
        logger.info("hnsw searcher sharded over %d devices", mesh.devices.size)

    # -- encoder state for on-chip recompute --------------------------------

    def _encoder(self):
        if self._enc is None:
            # calibrated for this index when <prefix>.calib.npz exists
            # (BaseSearcher.get_encoder)
            self._enc = self.get_encoder()
        return self._enc

    def _graph_data(self) -> GraphData:
        return GraphData(
            neighbors=self.neighbors,
            entry_ids=jnp.asarray(self.entries),
            emb=self.emb,
            tokens=self.tokens,
            lengths=self.lengths,
            codes=self.codes,
            codebooks=self.codebooks,
            entry_emb=self.entry_emb,
        )

    def _make_cfg(
        self,
        top_k: int,
        complexity: int,
        beam_width: int,
        prune_ratio: "float | None",
        recompute_embeddings: bool,
        pruning_strategy: str,
        batch_size: int,
        n_entries: int = 16,
        need_encoder: bool = False,
    ):
        l = max(complexity, top_k, beam_width)
        if prune_ratio is None:
            prune_ratio = 0.0
            if recompute_embeddings and self.has_pq and (
                self.n >= AUTO_PRUNE_MIN_N or l >= AUTO_PRUNE_MIN_COMPLEXITY
            ):
                prune_ratio = AUTO_PRUNE_RATIO
                logger.info(
                    "hnsw auto-prune: prune_ratio=%.2f (N=%d, L=%d; pass "
                    "prune_ratio=0.0 explicitly for truly unpruned recompute)",
                    prune_ratio, self.n, l,
                )
        beam = max(1, min(beam_width, l))
        f = beam * int(self.neighbors.shape[1])
        enc_params = None
        enc_cfg = None
        if recompute_embeddings:
            if not self.has_tokens:
                if self.is_compact:
                    raise RuntimeError(
                        "compact index has no embeddings and no token store; cannot search"
                    )
                recompute_embeddings = False
        if not recompute_embeddings and self.emb.shape == (1, 1):
            # parity: recompute=False on a pruned/compact index is an error
            # (reference hnsw_backend.py:189-193)
            raise RuntimeError("recompute_embeddings=False requires a non-compact index")
        if recompute_embeddings or need_encoder:
            enc = self._encoder()
            enc_params, enc_cfg = enc.params, enc.cfg

        traversal = "recompute" if recompute_embeddings else "stored"
        if pruning_strategy not in ("global", "local", "proportional"):
            raise ValueError(f"unknown pruning_strategy {pruning_strategy!r}")
        prune_keep = 0
        if recompute_embeddings and prune_ratio > 0 and self.has_pq:
            prune_keep = max(1, min(f, math.ceil(f * (1.0 - prune_ratio))))
            # batch_size caps the static recompute batch per hop (parity
            # hnsw_backend.py:233-234)
            if batch_size:
                prune_keep = min(prune_keep, batch_size)
        cfg = BeamConfig(
            metric=self.metric,
            k=top_k,
            complexity=l,
            beam=beam,
            max_steps=max(8, l),
            traversal=traversal,
            prune_keep=prune_keep,
            prune_strategy=pruning_strategy,
            rerank=0,
            n_entries=max(1, n_entries),
            normalize=(self.metric == "cosine"),
            enc_cfg=enc_cfg,
        )
        return cfg, enc_params

    def search(
        self,
        query: np.ndarray,
        top_k: int,
        *,
        complexity: int = 64,
        beam_width: int = 4,
        prune_ratio: "float | None" = None,
        recompute_embeddings: bool = True,
        pruning_strategy: str = "global",
        batch_size: int = 0,
        n_entries: int = 16,
        adaptive_steps: int = 0,
        zmq_port: Optional[int] = None,
        **kwargs,
    ) -> Dict[str, np.ndarray]:
        """``adaptive_steps`` > 0 enables the two-phase batched path: the full
        batch runs with the step budget capped there, then only unconverged
        lanes are re-dispatched at full budget (beam_search_adaptive). Exact
        same results; avoids the slowest-lane drag at high complexity. Keep
        the value a stable pow2 — each distinct value compiles a program."""
        q = jnp.asarray(np.ascontiguousarray(query, dtype=np.float32))
        cfg, enc_params = self._make_cfg(
            top_k, complexity, beam_width, prune_ratio, recompute_embeddings,
            pruning_strategy, batch_size, n_entries=n_entries,
        )
        if self._sharded is not None:
            keep_local = 0
            if cfg.prune_keep:
                keep_local = max(1, cfg.prune_keep // self._n_devices())
            labels, dists = self._sharded.search(np.asarray(q), cfg, enc_params, keep_local=keep_local)
            return {"labels": labels, "distances": dists}
        real_b, (qp,) = pad_batch_rows(np.asarray(q, dtype=np.float32))
        if adaptive_steps:
            labels, dists, _, _ = beam_search_adaptive(
                qp, self._graph_data(), cfg, enc_params, first_steps=adaptive_steps
            )
        else:
            packed = beam_search_batch_packed(jnp.asarray(qp), self._graph_data(), cfg, enc_params)
            labels, dists = unpack_results(packed)
        return {"labels": labels[:real_b], "distances": dists[:real_b]}

    def search_text(
        self,
        query: "str | list",
        top_k: int,
        *,
        complexity: int = 64,
        beam_width: int = 4,
        prune_ratio: "float | None" = None,
        recompute_embeddings: bool = True,
        pruning_strategy: str = "global",
        batch_size: int = 0,
        n_entries: int = 16,
        adaptive_steps: int = 0,
        zmq_port: Optional[int] = None,
        **kwargs,
    ) -> Dict[str, np.ndarray]:
        """Fused single-dispatch path: query tokens -> on-chip encode ->
        beam search, one device round-trip total. ``query`` may be a list of
        strings — the whole batch runs in the same dispatch.
        ``adaptive_steps`` > 0 trades the fused encode for the two-phase
        batched search (see :meth:`search`) — worth it exactly when one extra
        dispatch is noise, i.e. large batches at high complexity."""
        queries = [query] if isinstance(query, str) else list(query)
        cfg, enc_params = self._make_cfg(
            top_k, complexity, beam_width, prune_ratio, recompute_embeddings,
            pruning_strategy, batch_size, n_entries=n_entries, need_encoder=True,
        )
        enc = self._encoder()
        if self._sharded is not None:
            q = enc.encode(queries)
            if cfg.normalize:
                q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
            keep_local = 0
            if cfg.prune_keep:
                keep_local = max(1, cfg.prune_keep // self._n_devices())
            labels, dists = self._sharded.search(q, cfg, enc_params, keep_local=keep_local)
            return {"labels": labels, "distances": dists}
        if adaptive_steps:
            q = enc.encode(queries)
            if cfg.normalize:
                q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
            real_b, (qp,) = pad_batch_rows(np.asarray(q, dtype=np.float32))
            labels, dists, _, _ = beam_search_adaptive(
                qp, self._graph_data(), cfg, enc_params, first_steps=adaptive_steps
            )
            return {"labels": labels[:real_b], "distances": dists[:real_b]}
        q_ids, q_mask = enc.tokenize(queries)
        real_b, (q_ids, q_mask) = pad_batch_rows(q_ids, q_mask)
        packed = beam_search_text_batch_packed(
            jnp.asarray(q_ids), jnp.asarray(q_mask), self._graph_data(), cfg, enc_params
        )
        labels, dists = unpack_results(packed)
        return {"labels": labels[:real_b], "distances": dists[:real_b]}


def insert_hnsw(index_path: str, new_emb: np.ndarray, ef: int = 64, alpha: float = 1.2) -> int:
    """Incrementally insert ``new_emb`` [B, D] (already metric-normalized)
    into an existing hnsw index — Vamana batched insertion (ops/insert.py).
    Token/passauge appends are the API layer's job and must happen BEFORE this
    call so compact-index recompute can see the new rows. Returns new N.

    The reference cannot do this at all (full rebuild per update, SURVEY.md
    §5 'no incremental/streaming build')."""
    from ...ops.insert import insert_batch
    from ...ops.pq import encode_pq_blocked

    path = f"{index_path}.hnsw.npz"
    z = dict(np.load(path, allow_pickle=False))
    old_rows = unpack_neighbors(z)
    for k in ("neighbors", "neighbors_packed", "neighbors_n", "neighbors_r"):
        z.pop(k, None)
    searcher = HnswSearcher(index_path)
    new_emb = np.ascontiguousarray(new_emb, dtype=np.float32)
    n_old = int(old_rows.shape[0])

    new_rows, touched, touched_rows = insert_batch(searcher, new_emb, ef=ef, alpha=alpha)
    neighbors = np.concatenate([old_rows, new_rows.astype(old_rows.dtype)])
    if touched.size:
        neighbors[touched] = touched_rows
    z.update(pack_neighbors(neighbors))
    if "codes" in z:
        cb = z["codebooks"]
        if "pq_rotation" in z:
            from ...ops.pq import lift_codebooks

            cb = lift_codebooks(z["pq_rotation"], cb)
        z["codes"] = np.concatenate([z["codes"], encode_pq_blocked(new_emb, cb)])
    if "embeddings" in z:
        # stay in the stored dtype (f16 stores would silently promote to f32)
        z["embeddings"] = np.concatenate([z["embeddings"], new_emb.astype(z["embeddings"].dtype)])
    # keep the entry pool covering the appended id range. At scale the cap is
    # the builder's rule (_pool_cap: n/16 up to 32768) computed at the
    # post-insert N — the old fixed 4096 cap silently froze seed coverage for
    # heavily-inserted indexes >65K rows. Below ~16K rows, insert seeds
    # DENSER than the builder (up to min(n, ENTRY_POOL_SIZE)): inserted rows
    # are integrated by local graph repair only, so seeding them keeps them
    # reliably reachable (measured: recall 0.77 -> 0.97 on a half-inserted
    # 120-row index), and the f16 pool cost at this size is a few MB at most.
    n_new = int(neighbors.shape[0])
    if ("codes" in z) or ("embeddings" in z):
        pool_cap = max(_pool_cap(n_new), min(n_new, ENTRY_POOL_SIZE))
    else:
        pool_cap = N_ENTRY_POINTS
    room = pool_cap - z["entries"].shape[0]
    if room > 0:
        step = max(1, new_emb.shape[0] // max(room, 1))
        extra = np.arange(n_old, n_old + new_emb.shape[0], step, dtype=np.int32)[:room]
        z["entries"] = np.concatenate([z["entries"], extra])
        if "entry_emb" in z:  # keep pool embeddings row-aligned with entries
            z["entry_emb"] = np.concatenate(
                [z["entry_emb"], new_emb[extra - n_old].astype(z["entry_emb"].dtype)]
            )
        # derivable pool cache (l2/cosine builds): now stale — drop it, the
        # next load re-derives it covering the appended entries
        cache = f"{index_path}.entries.cache.npy"
        if os.path.exists(cache):
            os.remove(cache)
    np.savez(path, **z)
    logger.info("hnsw insert: %d -> %d nodes (%d rows repaired)",
                n_old, neighbors.shape[0], touched.size)
    return int(neighbors.shape[0])


@register_backend("hnsw")
class HnswBackendFactory(LeannBackendFactoryInterface):
    @staticmethod
    def builder(**kwargs) -> HnswBuilder:
        return HnswBuilder(**kwargs)

    @staticmethod
    def searcher(index_path: str, **kwargs) -> HnswSearcher:
        return HnswSearcher(index_path, **kwargs)

    @staticmethod
    def insert(index_path: str, embeddings: np.ndarray, **kwargs) -> int:
        return insert_hnsw(index_path, embeddings, **kwargs)
