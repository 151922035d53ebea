"""DiskANN-class backend: PQ-steered traversal + deferred exact rerank.

Capability parity with the reference DiskANN backend
(diskann_backend.py:130-471 + forked-DiskANN C++), TPU-first:

  * build: same batched Vamana-style graph as the hnsw backend (DiskANN *is*
    Vamana), PQ pivots/codes always trained (the reference keeps
    `_pq_pivots.bin`/`_pq_compressed.bin` and deletes the full-precision
    `_disk.index` when recompute is on — diskann_backend.py:145-208). Here
    compact is the only mode: embeddings are never stored.
  * LDG graph partitioning (partition.py) replaces the C++ ``partitioner`` /
    ``index_relayout`` pair; the partition id is the device-shard assignment
    for multi-chip search rather than a disk page layout.
  * search: traversal runs entirely on PQ-ADC distances; when
    ``recompute_embeddings`` is on, the final candidate set is re-encoded
    on-chip in ONE batch and reranked — exactly the deferred-fetch strategy
    (diskann_backend.py:444-449) without the ZMQ/protobuf hop.
    ``beam_width`` parity: wider beam = more parallel expansions per hop.

On-disk payload: ``<prefix>.diskann.npz`` (neighbors packed via storage.py
sorted-delta deflate) + ``<prefix>.partition.npz`` (per-partition counts —
the relayout makes the assignment a step function).
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

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
from ...storage import pack_neighbors, save_partition, token_cache_paths, unpack_neighbors
from ..common import BaseSearcher, mips_augment, pad_batch_rows, save_ids
from ..hnsw.backend import _entry_pool
from .partition import edge_locality, ldg_partition

logger = logging.getLogger(__name__)


class DiskannBuilder(LeannBackendBuilderInterface):
    def __init__(
        self,
        distance_metric: str = "mips",
        is_compact: bool = True,
        is_recompute: bool = True,
        graph_degree: int = 32,  # reference R (diskann_backend.py:258)
        complexity: int = 64,  # reference build complexity
        alpha: float = 1.2,
        pq_subspaces: int = 0,
        pq_rotate: bool = True,  # OPQ rotation (ops/pq.py train_opq)
        num_partitions: int = 0,  # 0 = auto (device count), parity: LDG gp
        partition_passes: int = 10,  # reference gp_times=10
        build_sharded: bool = False,  # mesh-sharded build (parallel/sharded_build.py)
        build_checkpoint_dir: str = "",  # resume multi-hour builds phase-by-phase
        reverse_candidates: int = 0,  # reverse-KNN prune candidates (graph.py)
        **kwargs,
    ):
        self.distance_metric = distance_metric
        self.is_recompute = is_recompute
        self.graph_degree = graph_degree
        self.complexity = complexity
        self.alpha = alpha
        self.pq_subspaces = pq_subspaces
        self.pq_rotate = pq_rotate
        self.num_partitions = num_partitions
        self.partition_passes = partition_passes
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
        r = self.graph_degree
        cand_factor = max(2, min(8, self.complexity // max(r, 1)))
        if self.build_sharded:
            from ...parallel.mesh import graph_mesh
            from ...parallel.sharded_build import sharded_build_graph

            if self.build_checkpoint_dir:
                logger.warning("build_checkpoint_dir is not supported by the "
                               "mesh-sharded build; phases will not checkpoint")
            neighbors, medoid = sharded_build_graph(
                graph_data, graph_mesh(), r=r, candidate_factor=cand_factor, alpha=self.alpha
            )
        else:
            neighbors, medoid = build_graph(
                graph_data, r=r, candidate_factor=cand_factor, alpha=self.alpha,
                checkpoint_dir=self.build_checkpoint_dir,
                reverse_candidates=self.reverse_candidates,
            )
        n_parts = self.num_partitions
        if n_parts <= 0:
            import jax

            n_parts = max(1, len(jax.devices()))
        if n_parts > 1:
            assign = ldg_partition(neighbors, n_parts, passes=self.partition_passes)
            # relayout (parity with the reference's index_relayout C++ step,
            # graph_partition.py:207-226): relabel nodes so each LDG partition
            # is contiguous — device block-shards then coincide with partitions
            # and frontier expansion mostly hits local HBM
            order = np.argsort(assign, kind="stable").astype(np.int64)
            new_of_old = np.empty(n, np.int64)
            new_of_old[order] = np.arange(n)
            neighbors = np.where(neighbors >= 0, new_of_old[np.clip(neighbors, 0, n - 1)], -1)[order].astype(np.int32)
            data = data[order]
            ids = [ids[i] for i in order]
            medoid = int(new_of_old[medoid])
            assign = assign[order]
            self._permute_tokens(index_path, order)
        else:
            # single partition: the relayout is the identity — skip the full
            # fancy-index copy of the matrix (15 GB at 20M rows; `data` may be
            # a read-only memmap on resumed scale runs) and the token rewrite
            assign = np.zeros(n, np.int32)

        import time as _time

        m = choose_m(d, self.pq_subspaces)
        rotation = None
        t_pq = _time.time()
        if self.pq_rotate:
            # factorized on disk (rotation + plain codebooks, ~1 MB) — the
            # ~19 MB lifted tensor is reconstituted at load (ops/pq.py)
            rotation, cb_plain = train_opq(data, m=m, factorized=True)
            codebooks = lift_codebooks(rotation, cb_plain)
        else:
            codebooks = cb_plain = train_pq(data, m=m)
        logger.info("diskann build: pq codebooks trained M=%d (%.0fs)", m, _time.time() - t_pq)
        codes = encode_pq_blocked(data, codebooks)
        logger.info("diskann build: %d rows encoded (%.0fs)", n, _time.time() - t_pq)
        payload = {
            **pack_neighbors(neighbors),  # sorted-delta deflate (storage.py)
            "medoid": np.int32(medoid),
            "entries": _entry_pool(medoid, n, has_screen=True),  # codes always exist
            "metric": self.distance_metric,
            "dim": np.int32(d),
            "codebooks": cb_plain,
            "codes": codes,
            "is_recompute": self.is_recompute,
        }
        if rotation is not None:
            payload["pq_rotation"] = rotation
        if not self.is_recompute:
            payload["embeddings"] = data
        else:
            # pool embeddings (f16, <=25% of rows by _entry_pool's cap):
            # exact MXU seed screening. l2/cosine pools are DERIVABLE from
            # the token cache (BaseSearcher.load_entry_emb) — written to the
            # .entries.cache sidecar, outside all-in accounting; mips pools
            # live in the augmented build space and stay in the npz
            ee = data[payload["entries"]].astype(np.float16)
            if self.distance_metric in ("l2", "cosine"):
                np.save(f"{index_path}.entries.cache.npy", ee)
            else:
                payload["entry_emb"] = ee
        logger.info("diskann build: persisting %s (codes %.2f GB, packed graph)",
                    f"{index_path}.diskann.npz", codes.nbytes / 2**30)
        np.savez(f"{index_path}.diskann.npz", **payload)
        save_partition(index_path, assign)  # counts after relayout (step fn)
        logger.info(
            "diskann build: N=%d R=%d M(pq)=%d parts=%d locality=%.2f",
            n, r, m, n_parts, edge_locality(neighbors, assign),
        )
        save_ids(index_path, ids)

    @staticmethod
    def _permute_tokens(index_path: str, order: np.ndarray) -> None:
        """The token store is written by the core builder in original order;
        relayout must permute it to match the relabeled graph."""
        import os

        p = token_cache_paths(index_path)
        for raw, lenp in ((p["raw"], p["raw_len"]), (p["legacy_raw"], p["legacy_raw_len"])):
            if os.path.exists(raw):
                tok = np.load(raw, mmap_mode="r")[order]  # materializes once
                np.save(raw, tok)
                np.save(lenp, np.load(lenp)[order])
                return
        for path in (p["npz"], p["legacy_npz"]):
            if os.path.exists(path):
                z = np.load(path)
                np.savez_compressed(path, tokens=z["tokens"][order], lengths=z["lengths"][order])
                return


class DiskannSearcher(BaseSearcher, LeannBackendSearcherInterface):
    """``sharded=True`` places the (LDG-relabeled, partition-contiguous)
    graph/codes/tokens over a ``gp`` mesh — block shards coincide with LDG
    partitions, so expansion is mostly HBM-local."""

    # above this size the token store stays host-resident and the exact
    # rerank runs as a second dispatch over host-gathered rows (at 60M chunks
    # the u16[N,T] store is ~7.7 GB — it cannot share a 16 GB HBM with the
    # graph + codes; host RAM is ~8x larger)
    HOST_TOKEN_BYTES = 4 << 30

    def __init__(self, index_path: str, sharded: "bool | str" = False,
                 token_residency: str = "auto", **kwargs):
        """``token_residency``: 'device' uploads the token store to HBM (the
        fused single-dispatch rerank), 'host' keeps it in host RAM and defers
        the exact rerank to a second dispatch over host-gathered rows (the
        beyond-HBM path; TPU analogue of the reference's disk-deferred fetch,
        diskann_backend.py:444-467), 'auto' picks by store size."""
        super().__init__(index_path, **kwargs)
        z = np.load(f"{index_path}.diskann.npz", allow_pickle=False)
        nbr_np = unpack_neighbors(z)  # packed (storage.py) or legacy raw
        self.neighbors = jnp.asarray(nbr_np)
        self.entries = np.asarray(z["entries"])
        self.metric = str(z["metric"])
        self.n = int(self.neighbors.shape[0])
        dummy = jnp.zeros((1, 1), jnp.float32)
        self.codes = jnp.asarray(z["codes"])
        cb = np.asarray(z["codebooks"])
        if "pq_rotation" in z:  # factorized OPQ: lift to runtime form
            cb = lift_codebooks(np.asarray(z["pq_rotation"]), cb)
        self.codebooks = jnp.asarray(cb)
        self.emb = jnp.asarray(z["embeddings"]) if "embeddings" in z else dummy
        ee = self.load_entry_emb(z)  # npz -> .entries.cache.npy -> derived
        self.entry_emb = jnp.asarray(ee, jnp.bfloat16) if ee is not None else None
        want_sharded = sharded is True or (sharded == "auto" and self._n_devices() > 1)
        self.tokens_host = None
        self.lengths_host = None
        tok = self.load_tokens()
        if tok is not None:
            # sharded mode shards tokens over device HBMs instead (per-device
            # slices are 1/n_devices the size); host residency is the
            # single-chip beyond-HBM answer
            host = (not want_sharded) and (
                token_residency == "host"
                or (token_residency == "auto" and tok[0].nbytes > self.HOST_TOKEN_BYTES)
            )
            self.has_tokens = True
            if host:
                # kept as-is: raw stores arrive memmapped and the per-query
                # gather reads only the pages it needs — materializing here
                # would pull the whole (multi-GB) store into RAM
                self.tokens_host = tok[0]
                self.lengths_host = np.asarray(tok[1], np.int32)
                self.tokens = jnp.zeros((1, 1), jnp.int32)
                self.lengths = jnp.zeros((1,), jnp.int32)
                logger.info("diskann tokens host-resident (%.2f GB); deferred rerank",
                            tok[0].nbytes / 2**30)
            else:
                self.tokens = jnp.asarray(tok[0])
                self.lengths = jnp.asarray(tok[1])
        else:
            self.tokens = jnp.zeros((1, 1), jnp.int32)
            self.lengths = jnp.zeros((1,), jnp.int32)
            self.has_tokens = False
        self._enc = None
        self._sharded = None
        if sharded is True or (sharded == "auto" and self._n_devices() > 1):
            from ...parallel.mesh import graph_mesh
            from ...parallel.sharded_search import ShardedSearcher

            mesh = graph_mesh()
            tok = self.load_tokens()
            self._sharded = ShardedSearcher(
                mesh,
                nbr_np,
                entries=self.entries,
                emb=np.asarray(z["embeddings"]) if "embeddings" in z else None,
                tokens=tok[0] if tok else None,
                lengths=tok[1] if tok else None,
                codes=np.asarray(z["codes"]),
                codebooks=np.asarray(cb),
                entry_emb=(np.asarray(self.entry_emb, np.float32)
                           if self.entry_emb is not None else None),
            )
            logger.info("diskann searcher sharded over %d devices", mesh.devices.size)

    def _n_devices(self) -> int:
        import jax

        return len(jax.devices())

    def _encoder(self):
        if self._enc is None:
            # calibrated for this index when <prefix>.calib.npz exists
            # (BaseSearcher.get_encoder)
            self._enc = self.get_encoder()
        return self._enc

    def search(
        self,
        query: np.ndarray,
        top_k: int,
        **kwargs,
    ) -> Dict[str, np.ndarray]:
        # adaptive_steps > 0: two-phase batched search (see hnsw.search)
        adaptive_steps = int(kwargs.pop("adaptive_steps", 0) or 0)
        if self.tokens_host is not None and kwargs.get("recompute_embeddings", True):
            return self._search_host_rerank(
                np.ascontiguousarray(query, dtype=np.float32), top_k,
                adaptive_steps=adaptive_steps, **kwargs,
            )
        cfg, enc_params = self._make_cfg(top_k, **kwargs)
        q = jnp.asarray(np.ascontiguousarray(query, dtype=np.float32))
        if self._sharded is not None:
            labels, dists = self._sharded.search(np.asarray(q), cfg, enc_params)
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

    def search_text(self, query: "str | list", top_k: int, **kwargs) -> Dict[str, np.ndarray]:
        """Fused single-dispatch path (see hnsw.search_text); accepts a batch."""
        queries = [query] if isinstance(query, str) else list(query)
        adaptive_steps = int(kwargs.pop("adaptive_steps", 0) or 0)
        if self.tokens_host is not None and kwargs.get("recompute_embeddings", True):
            q = self._encoder().encode(queries)
            if self.metric == "cosine":
                q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
            return self._search_host_rerank(q, top_k, adaptive_steps=adaptive_steps, **kwargs)
        cfg, enc_params = self._make_cfg(top_k, need_encoder=True, **kwargs)
        enc = self._encoder()
        if self._sharded is not None:
            q = enc.encode(queries)
            if cfg.normalize:
                q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
            labels, dists = self._sharded.search(q, cfg, enc_params)
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

    def _search_host_rerank(
        self,
        q: np.ndarray,
        top_k: int,
        *,
        complexity: int = 64,
        beam_width: int = 4,
        rerank_size: int = 0,
        adaptive_steps: int = 0,
        **kwargs,
    ) -> Dict[str, np.ndarray]:
        """Beyond-HBM search: on-chip PQ traversal returns the top-RR pool
        head (dispatch 1), the host gathers those token rows from the
        RAM-resident store, and a second program re-encodes them for the
        exact rerank (dispatch 2). The TPU-native form of the reference's
        disk-deferred fetch (diskann_backend.py:444-467) — it pays one extra
        device round-trip where the reference pays a ZMQ hop per rerank
        batch, and HBM only ever holds graph + codes + RR token rows."""
        from ...ops.beam_search import beam_search_adaptive, rerank_tokens_batch

        l = max(complexity, top_k, beam_width)
        rr = min(l, rerank_size) if rerank_size else l
        rr = max(rr, top_k)
        kwargs.pop("recompute_embeddings", None)
        # traversal program: PQ distances only, pool head of size rr out
        cfg, _ = self._make_cfg(
            rr, complexity=complexity, beam_width=beam_width,
            recompute_embeddings=False, need_encoder=True, **kwargs,
        )
        enc = self._encoder()
        real_b, (qp,) = pad_batch_rows(np.asarray(q, dtype=np.float32))
        if adaptive_steps:
            ids, _, _, _ = beam_search_adaptive(
                qp, self._graph_data(), cfg, None, first_steps=adaptive_steps
            )
        else:
            packed = beam_search_batch_packed(jnp.asarray(qp), self._graph_data(), cfg, None)
            ids, _ = unpack_results(packed)
        safe = np.clip(ids, 0, self.n - 1)
        toks = self.tokens_host[safe]  # [B, rr, T] — the only token bytes that move
        lens = self.lengths_host[safe]
        packed = rerank_tokens_batch(
            jnp.asarray(qp), jnp.asarray(toks), jnp.asarray(lens), jnp.asarray(ids),
            k=top_k, metric=self.metric, normalize=(self.metric == "cosine"),
            enc_cfg=enc.cfg, enc_params=enc.params,
        )
        labels, dists = unpack_results(packed)
        return {"labels": labels[:real_b], "distances": dists[:real_b]}

    def _make_cfg(
        self,
        top_k: int,
        *,
        complexity: int = 64,
        beam_width: int = 4,
        prune_ratio: float = 0.0,
        recompute_embeddings: bool = True,
        pruning_strategy: str = "global",
        batch_size: int = 0,
        rerank_size: int = 0,  # 0 = rerank the full L-pool (reference default)
        n_entries: int = 16,  # query-aware seeds screened from the entry pool
        zmq_port: Optional[int] = None,
        need_encoder: bool = False,
        **kwargs,
    ):
        if pruning_strategy == "proportional":
            # parity: unsupported on DiskANN (diskann_backend.py:429-433)
            raise ValueError("pruning_strategy='proportional' is not supported by the diskann backend")
        l = max(complexity, top_k, beam_width)
        beam = max(1, min(beam_width, l))
        enc_params = None
        enc_cfg = None
        rerank = 0
        rerank_source = "recompute"
        # deferred fetch reranks the pool head; rerank_size trims it below L
        # (parity knob: reference batch_recompute caps the recompute batch,
        # diskann_backend.py:452-467) — must stay >= top_k to not lose results
        rr = min(l, rerank_size) if rerank_size else l
        rr = max(rr, top_k)
        if recompute_embeddings:
            if self.has_tokens:
                enc = self._encoder()
                enc_params, enc_cfg = enc.params, enc.cfg
                rerank = rr  # deferred fetch: one exact pass over the pool head
            elif self.emb.shape != (1, 1):
                rerank = rr  # exact rerank from stored embeddings
                rerank_source = "stored"
            else:
                raise RuntimeError("recompute requested but index has no token store")
        if need_encoder and enc_cfg is None:
            enc = self._encoder()
            enc_params, enc_cfg = enc.params, enc.cfg
        cfg = BeamConfig(
            metric=self.metric,
            k=top_k,
            complexity=l,
            beam=beam,
            max_steps=max(8, l),
            traversal="pq",
            prune_keep=0,
            rerank=rerank,
            rerank_source=rerank_source,
            n_entries=max(1, n_entries),
            normalize=(self.metric == "cosine"),
            enc_cfg=enc_cfg,
        )
        return cfg, enc_params

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


@register_backend("diskann")
class DiskannBackendFactory(LeannBackendFactoryInterface):
    @staticmethod
    def builder(**kwargs) -> DiskannBuilder:
        return DiskannBuilder(**kwargs)

    @staticmethod
    def searcher(index_path: str, **kwargs) -> DiskannSearcher:
        return DiskannSearcher(index_path, **kwargs)
