"""High-level API: LeannBuilder / LeannSearcher / LeannChat / PassageManager.

Capability parity with the reference (leann-core/src/leann/api.py):
  * ``LeannBuilder``      (api.py:271-604)  — collect chunks, write passages +
    offset index + meta.json, compute embeddings, call backend build; also
    ``build_index_from_embeddings`` for precomputed vectors (api.py:483-604).
  * ``LeannSearcher``     (api.py:607-823)  — load meta, search, enrich labels
    into passages, post-hoc metadata filtering (api.py:786-790).
  * ``PassageManager``    (api.py:119-268)  — per-file offset maps, lazy seeks.
  * ``LeannChat``         (api.py:826-930)  — RAG loop over a searcher + LLM.

TPU-native deltas: no embedding-server subprocess is ever spawned — recompute
is an in-process jitted encoder call inside the backend. Passages are
tokenized at build time and the token matrix is stored alongside the graph so
query-time recompute is a pure device-side gather + encoder forward.

On-disk layout per index prefix ``<dir>/<name>.leann``:
  ``<prefix>.meta.json``        build params, model, metric, flags
  ``<prefix>.passages.jsonl``   one {"id", "text", "metadata"} per line
  ``<prefix>.passages.idx``     pickled {id: byte_offset}
  ``<prefix>.tokens.cache.np*`` token ids/lengths (recompute indexes) — a
                                derivable CACHE (storage.py), regenerated
                                from the passages when absent and excluded
                                from all-in index accounting
  backend payloads              e.g. ``<prefix>.hnsw.npz``
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import pickle
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from .embeddings.compute import compute_embeddings
from .interface import LeannBackendSearcherInterface
from .metadata_filter import MetadataFilterEngine
from .registry import get_backend, register_project_directory

from .storage import load_ids, save_ids, tokenize_corpus, write_token_cache

logger = logging.getLogger(__name__)

INDEX_FORMAT_VERSION = 2

# Models whose embeddings are unit-norm; cosine is forced for them the way the
# reference does for OpenAI/Voyage/Cohere (api.py:301-368).
_NORMALIZED_MODEL_MARKERS = ("text-embedding", "voyage", "cohere", "minilm", "all-MiniLM", "hash-minilm", "hash-tiny")


def _is_normalized_model(model_name: str, mode: str) -> bool:
    low = model_name.lower()
    return any(m.lower() in low for m in _NORMALIZED_MODEL_MARKERS) or mode == "openai"


@dataclass
class SearchResult:
    """Parity: api.py:111-116."""

    id: str
    score: float
    text: str
    metadata: Dict[str, Any] = field(default_factory=dict)


class PassageManager:
    """Offset-indexed access to one or more passage jsonl shards.

    Keeps per-shard offset maps rather than loading passages into memory
    (reference api.py:119-268, built for 60M+ corpora). Also resolves paths
    relative to the meta.json location so indexes are portable."""

    def __init__(self, passage_sources: List[Dict[str, Any]], meta_dir: "str | None" = None,
                 use_native: bool = True):
        self._sources: List[Dict[str, Any]] = []
        self._offsets: List[Dict[str, int]] = []
        self._id_to_source: Dict[str, int] = {}
        self._native: List[Any] = []  # per-source NativePassageStore | None
        self.filter_engine = MetadataFilterEngine()
        for src in passage_sources:
            path = self._resolve(src["path"], meta_dir)
            idx_path = self._resolve(src.get("index_path", path.replace(".jsonl", ".idx")), meta_dir)
            with open(idx_path, "rb") as f:
                offsets = pickle.load(f)
            si = len(self._sources)
            self._sources.append({**src, "path": path})
            self._offsets.append(offsets)
            native = None
            if use_native:
                try:
                    from .runtime.passage_store import NativePassageStore, native_available

                    if native_available():
                        native = NativePassageStore(path)
                except Exception as e:  # fall back to Python seeks
                    logger.debug("native passage store unavailable for %s: %s", path, e)
            self._native.append(native)
            for pid in offsets:
                self._id_to_source[pid] = si

    @staticmethod
    def _resolve(path: str, meta_dir: "str | None") -> str:
        if os.path.exists(path):
            return path
        if meta_dir:
            cand = os.path.join(meta_dir, os.path.basename(path))
            if os.path.exists(cand):
                return cand
        raise FileNotFoundError(f"passage file not found: {path}")

    def __len__(self) -> int:
        return len(self._id_to_source)

    def __contains__(self, pid: str) -> bool:
        return pid in self._id_to_source

    def ids(self) -> List[str]:
        return list(self._id_to_source)

    def get_passage(self, pid: str) -> Dict[str, Any]:
        si = self._id_to_source.get(pid)
        if si is None:
            raise KeyError(f"passage id {pid!r} not found")
        native = self._native[si]
        if native is not None:
            p = native.get(pid)
            if p is not None:
                return p
        offset = self._offsets[si][pid]
        with open(self._sources[si]["path"], "rb") as f:
            f.seek(offset)
            return json.loads(f.readline().decode("utf-8"))

    def iter_passages(self):
        for src, offsets in zip(self._sources, self._offsets):
            with open(src["path"], "rb") as f:
                for pid in offsets:
                    f.seek(offsets[pid])
                    yield json.loads(f.readline().decode("utf-8"))

    def filter_search_results(self, results, filters):
        return self.filter_engine.apply_filters(results, filters)


def _passages_fingerprint(chunks: List[Dict[str, Any]]) -> str:
    """O(1) content key for resume skips: first + last row, serialized the
    way they land in the jsonl (id, text, metadata all participate)."""
    h = hashlib.sha1()
    for c in (chunks[0], chunks[-1]):
        h.update(json.dumps({"id": c["id"], "text": c["text"], "metadata": c.get("metadata", {})},
                            ensure_ascii=False).encode("utf-8"))
    return h.hexdigest()[:16]


def _write_passages(chunks: List[Dict[str, Any]], prefix: str) -> Dict[str, Any]:
    passages_path = f"{prefix}.passages.jsonl"
    idx_path = f"{prefix}.passages.idx"
    done_path = f"{prefix}.passages.done.json"
    src = {"type": "jsonl", "path": passages_path, "index_path": idx_path, "count": len(chunks)}
    # resume skip: rewriting the store costs minutes at 10M+ rows (5+ GB of
    # jsonl + a pickled offset map) and supervised scale builds re-enter this
    # path on every retry. The .done sidecar is written only after both files
    # are complete and keys on count + byte size + first/last-row content.
    if chunks and os.path.exists(passages_path) and os.path.exists(idx_path):
        try:
            got = json.load(open(done_path))
        except Exception:
            got = None
        if (got and got.get("count") == len(chunks)
                and got.get("fp") == _passages_fingerprint(chunks)
                and got.get("bytes") == os.path.getsize(passages_path)):
            logger.info("passages store up to date (%d rows): skipping rewrite", len(chunks))
            return src
    offsets: Dict[str, int] = {}
    with open(passages_path, "wb") as f:
        for c in chunks:
            offsets[c["id"]] = f.tell()
            f.write(json.dumps({"id": c["id"], "text": c["text"], "metadata": c.get("metadata", {})},
                               ensure_ascii=False).encode("utf-8"))
            f.write(b"\n")
    with open(idx_path, "wb") as f:
        pickle.dump(offsets, f)
    if chunks:
        with open(done_path, "w") as f:
            json.dump({"count": len(chunks), "fp": _passages_fingerprint(chunks),
                       "bytes": os.path.getsize(passages_path)}, f)
    return src


class LeannBuilder:
    def __init__(
        self,
        backend_name: str = "hnsw",
        embedding_model: str = "hash-minilm",
        embedding_mode: str = "tpu",
        dimensions: Optional[int] = None,
        distance_metric: Optional[str] = None,
        is_compact: bool = True,
        is_recompute: bool = True,
        max_length: int = 256,
        num_threads: int = 0,  # parity kwarg; threading is XLA's job here
        **backend_kwargs,
    ):
        self.backend_name = backend_name
        self.embedding_model = embedding_model
        self.embedding_mode = embedding_mode
        self.dimensions = dimensions
        self.max_length = max_length
        self.backend_kwargs = backend_kwargs
        # Parity (api.py:282-291): without recompute the index must retain
        # embeddings, so compact storage is forced off.
        if not is_recompute and is_compact:
            logger.info("is_recompute=False forces is_compact=False (embeddings must be stored)")
            is_compact = False
        self.is_compact = is_compact
        self.is_recompute = is_recompute
        if distance_metric is None:
            distance_metric = "cosine" if _is_normalized_model(embedding_model, embedding_mode) else "mips"
        self.distance_metric = distance_metric.lower()
        if self.distance_metric not in ("l2", "mips", "cosine"):
            raise ValueError(f"distance_metric must be l2|mips|cosine, got {distance_metric!r}")
        self.chunks: List[Dict[str, Any]] = []

    def add_text(self, text: str, metadata: Optional[Dict[str, Any]] = None, id: Optional[str] = None) -> None:
        if id is None:
            id = str(len(self.chunks))
        self.chunks.append({"id": id, "text": text, "metadata": metadata or {}})

    @classmethod
    def from_index(cls, index_path: str) -> "LeannBuilder":
        """Builder pre-configured from an existing index's meta.json, for
        incremental updates: add_text() new chunks, then update_index().
        (The reference has no incremental path at all — SURVEY.md §5.)"""
        with open(f"{index_path}.meta.json") as f:
            meta = json.load(f)
        b = cls(
            backend_name=meta["backend_name"],
            embedding_model=meta["embedding_model"],
            embedding_mode=meta.get("embedding_mode", "tpu"),
            dimensions=meta.get("dimensions"),
            distance_metric=meta.get("distance_metric"),
            is_compact=meta.get("is_compact", True),
            is_recompute=meta.get("is_recompute", True),
            max_length=meta.get("max_length", 256),
            **meta.get("backend_kwargs", {}),
        )
        b._update_meta = meta
        return b

    # -- build -------------------------------------------------------------

    def _embed(self, texts: List[str], is_build: bool = True) -> np.ndarray:
        return compute_embeddings(
            texts,
            self.embedding_model,
            mode=self.embedding_mode,
            is_build=is_build,
            batch_size=4096 if is_build else 128,  # build is throughput-bound:
            # each encode dispatch pays the tunnel round-trip, so big batches
            # (500K chunks: 122 dispatches instead of 977) cut embed wall time
            max_length=self.max_length,
            **({"dim": self.dimensions} if (self.dimensions and self.embedding_mode == "simulated") else {}),
        )

    def build_index(self, index_path: str) -> None:
        t0 = time.time()
        chunks = [c for c in self.chunks if c["text"] and c["text"].strip()]
        if not chunks:
            raise ValueError("No non-empty chunks to index")
        if len(chunks) != len(self.chunks):
            logger.warning("dropped %d empty chunks", len(self.chunks) - len(chunks))
        prefix = str(index_path)
        Path(prefix).parent.mkdir(parents=True, exist_ok=True)

        texts = [c["text"] for c in chunks]
        self._maybe_calibrate(texts, prefix)
        t = time.time()
        embeddings = self._embed(texts)
        logger.info("build phase embed: %d chunks in %.1fs", len(texts), time.time() - t)
        self.dimensions = int(embeddings.shape[1])
        source = _write_passages(chunks, prefix)
        t = time.time()
        self._maybe_write_tokens(texts, prefix)
        logger.info("build phase tokens: %.1fs", time.time() - t)
        ids = [c["id"] for c in chunks]
        t = time.time()
        self._backend_build(embeddings, ids, prefix)
        logger.info("build phase backend: %.1fs", time.time() - t)
        self._write_meta(prefix, [source], n=len(chunks))
        logger.info("built index %s (%d chunks) in %.2fs", prefix, len(chunks), time.time() - t0)

    def update_index(self, index_path: str, insert_batch_size: int = 256) -> None:
        """Incrementally insert this builder's chunks into an existing index.

        Vamana-style batched insertion (ops/insert.py): discovery search →
        robust prune → reverse repair, all batched device programs. Appends
        passages/tokens/ids, then updates the graph payload and meta. Open
        searchers must be re-created to see the new nodes.
        """
        prefix = str(index_path)
        with open(f"{prefix}.meta.json") as f:
            meta = json.load(f)
        if meta["backend_name"] != self.backend_name:
            raise ValueError(f"index is {meta['backend_name']!r}, builder is {self.backend_name!r}")
        if meta["embedding_model"] != self.embedding_model:
            raise ValueError("embedding_model mismatch with existing index")
        factory = get_backend(self.backend_name)
        insert = getattr(factory, "insert", None)
        if insert is None:
            raise NotImplementedError(
                f"backend {self.backend_name!r} does not support incremental insert "
                "(diskann's partition-contiguous relabeling requires a rebuild)"
            )
        chunks = [c for c in self.chunks if c["text"] and c["text"].strip()]
        if not chunks:
            raise ValueError("No non-empty chunks to insert")
        n_old = int(meta.get("num_chunks", 0))
        # ids: continue the numeric sequence unless the caller set explicit ids
        with open(f"{prefix}.passages.idx", "rb") as f:
            offsets: Dict[str, int] = pickle.load(f)
        # default ids from add_text are positional ("0","1",...) — remap onto
        # the appended range; explicit non-colliding ids pass through
        for i, c in enumerate(chunks):
            if c["id"].isdigit() and int(c["id"]) < n_old:
                chunks[i] = {**c, "id": str(n_old + i)}
            elif c["id"] in offsets:
                raise ValueError(f"duplicate id {c['id']!r} already in index")
        texts = [c["text"] for c in chunks]

        t0 = time.time()
        embeddings = self._embed(texts)
        if self.distance_metric == "cosine":
            embeddings = embeddings / np.maximum(
                np.linalg.norm(embeddings, axis=1, keepdims=True), 1e-12
            )
        # 1. append passages + offsets + ids (before graph update so compact
        # recompute can address the new token rows)
        with open(f"{prefix}.passages.jsonl", "ab") as f:
            for c in chunks:
                offsets[c["id"]] = f.tell()
                f.write(json.dumps({"id": c["id"], "text": c["text"], "metadata": c.get("metadata", {})},
                                   ensure_ascii=False).encode("utf-8"))
                f.write(b"\n")
        with open(f"{prefix}.passages.idx", "wb") as f:
            pickle.dump(offsets, f)
        if os.path.exists(f"{prefix}.ids.json"):
            id_list = load_ids(prefix)
            id_list.extend(c["id"] for c in chunks)
            save_ids(prefix, id_list)
        # 2. append tokens (the cache re-derives if we skipped, but appending
        # in place is cheaper than a full re-tokenization at next load)
        from .storage import load_token_cache

        old = load_token_cache(prefix)
        if old is not None:
            from .embeddings.encoder import get_encoder

            enc = get_encoder(self.embedding_model, max_length=meta.get("max_length", self.max_length))
            old_tok, old_len = old
            new_tok, new_mask = enc.tokenize(texts)
            t_old = old_tok.shape[1]
            new_tok = new_tok[:, :t_old]
            lengths = np.minimum(new_mask.sum(axis=1), t_old).astype(np.int32)
            all_tok = np.concatenate([old_tok, new_tok.astype(old_tok.dtype)])
            all_len = np.concatenate([old_len, lengths])
            for stale in (f"{prefix}.tokens.npy", f"{prefix}.lengths.npy", f"{prefix}.tokens.npz"):
                if os.path.exists(stale):
                    os.remove(stale)  # legacy store superseded by the cache
            write_token_cache(prefix, all_tok, all_len)
        # 3. graph insert, in bounded batches
        for s in range(0, len(chunks), insert_batch_size):
            insert(prefix, embeddings[s : s + insert_batch_size])
        # 4. meta
        meta["num_chunks"] = n_old + len(chunks)
        if meta.get("passage_sources"):
            meta["passage_sources"][0]["count"] = meta["num_chunks"]
        with open(f"{prefix}.meta.json", "w") as f:
            json.dump(meta, f, indent=2)
        logger.info("updated index %s: +%d chunks (%d total) in %.2fs",
                    prefix, len(chunks), meta["num_chunks"], time.time() - t0)

    def build_index_from_embeddings(self, index_path: str, ids: Sequence[str], embeddings: np.ndarray,
                                    texts: Optional[Sequence[str]] = None) -> None:
        """Build from precomputed (ids, [N, D]) — parity api.py:483-604. When
        ``texts`` is omitted, passages hold empty text and recompute is
        disabled (there is nothing to re-encode).

        NOTE: with ``distance_metric="cosine"`` the embeddings array may be
        L2-normalized IN PLACE (avoids a second multi-GB copy at scale).
        float16 input is accepted and PRESERVED end-to-end (the host
        high-water halves at 10M+ rows; all device compute casts per-chunk
        to bf16/f32 anyway, and recall is bf16-matmul-bound, not storage-
        precision-bound)."""
        if embeddings.dtype != np.float16:
            embeddings = np.ascontiguousarray(embeddings, dtype=np.float32)
        else:
            embeddings = np.ascontiguousarray(embeddings)
        if len(ids) != embeddings.shape[0]:
            raise ValueError("ids/embeddings length mismatch")
        self.dimensions = int(embeddings.shape[1])
        prefix = str(index_path)
        Path(prefix).parent.mkdir(parents=True, exist_ok=True)
        has_text = texts is not None
        if not has_text:
            texts = ["" for _ in ids]
            if self.is_recompute:
                logger.info("no texts supplied: disabling recompute, storing embeddings")
                self.is_recompute = False
                self.is_compact = False
        chunks = [{"id": str(i), "text": t, "metadata": {}} for i, t in zip(ids, texts)]
        source = _write_passages(chunks, prefix)
        if has_text:
            self._maybe_write_tokens(list(texts), prefix)
        self._backend_build(embeddings, [str(i) for i in ids], prefix)
        self._write_meta(prefix, [source], n=len(ids))

    def _maybe_calibrate(self, texts: List[str], prefix: str) -> None:
        """Corpus calibration for loaded-HF-checkpoint encoders (all-but-the-
        top over a corpus sample, encoder.py JaxEncoder.calibrate). The
        calibration is persisted next to the index so query-time encoders
        apply the exact same transform; hash-* models keep their seeded probe
        center and are untouched."""
        if self.embedding_mode not in ("tpu", "jax", "sentence-transformers", "hf", "mlx"):
            return
        from .embeddings.encoder import get_encoder

        enc = get_encoder(self.embedding_model, max_length=self.max_length)
        if not enc.needs_corpus_calibration:
            return
        calib = enc.calibrate(texts)
        np.savez(f"{prefix}.calib.npz", **calib)

    def _maybe_write_tokens(self, texts: List[str], prefix: str) -> None:
        """Tokenize passages for on-device recompute. Stored as uint16 when
        the vocab allows (tokens ≈ compressed text; 6x smaller than f32
        vectors). Written as a ``.cache.`` artifact — the store is derivable
        from the passages (storage.py derive_token_cache), so building it now
        just saves the first searcher the re-tokenization."""
        if not (self.is_recompute and self.embedding_mode in ("tpu", "jax", "sentence-transformers", "hf", "mlx")):
            return
        if not texts:
            return
        done_path = f"{prefix}.tokens.cache.done.json"
        want = {"count": len(texts), "model": self.embedding_model,
                "max_length": self.max_length,
                "fp": hashlib.sha1((texts[0] + "\x00" + texts[-1]).encode("utf-8")).hexdigest()[:16]}
        try:  # resume skip — tokenizing 10M+ rows costs minutes per retry
            if json.load(open(done_path)) == want:
                logger.info("token cache up to date (%d rows): skipping rewrite", len(texts))
                return
        except Exception:
            pass
        from .embeddings.encoder import get_encoder

        enc = get_encoder(self.embedding_model, max_length=self.max_length)
        tok, lengths = tokenize_corpus(texts, enc)
        write_token_cache(prefix, tok, lengths)
        with open(done_path, "w") as f:
            json.dump(want, f)

    @staticmethod
    def _is_unit_norm(embeddings: np.ndarray, tol: float = 3e-3) -> bool:
        """Sampled already-normalized check: a resumed scale run feeds a
        read-only memmap of embeddings that were normalized before persisting
        — re-normalizing would force a full in-RAM copy (15-46 GB at 10M-60M)
        for a no-op. Tolerance covers f16 storage rounding (~5e-4)."""
        step = max(1, embeddings.shape[0] // 1024)
        sn = np.linalg.norm(np.asarray(embeddings[::step], dtype=np.float32), axis=1)
        return bool(np.abs(sn - 1.0).max() <= tol)

    def _backend_build(self, embeddings: np.ndarray, ids: List[str], prefix: str) -> None:
        if self.distance_metric == "cosine" and not self._is_unit_norm(embeddings):
            # in place: a second [N, D] f32 copy is ~15 GB at 10M rows (and
            # the caller of build_index_from_embeddings is documented to
            # expect possible in-place normalization). Read-only inputs
            # (mmap'd .npy etc.) get the copy they require.
            if not embeddings.flags.writeable:
                embeddings = embeddings.copy()
            if embeddings.dtype == np.float16:
                # blockwise f32 math, cast back in place: full-matrix f16
                # norm accumulation loses ~2 digits and a second f32 copy
                # defeats the point of the f16 store
                blk = 1 << 20
                for s in range(0, embeddings.shape[0], blk):
                    b32 = embeddings[s : s + blk].astype(np.float32)
                    nb = np.linalg.norm(b32, axis=1, keepdims=True)
                    embeddings[s : s + blk] = (b32 / np.maximum(nb, 1e-12)).astype(np.float16)
            else:
                norms = np.linalg.norm(embeddings, axis=1, keepdims=True)
                np.divide(embeddings, np.maximum(norms, 1e-12), out=embeddings)
        factory = get_backend(self.backend_name)
        builder = factory.builder(
            distance_metric=self.distance_metric,
            is_compact=self.is_compact,
            is_recompute=self.is_recompute,
            **self.backend_kwargs,
        )
        builder.build(embeddings, ids, prefix)

    def _write_meta(self, prefix: str, sources: List[Dict[str, Any]], n: int) -> None:
        meta = {
            "version": INDEX_FORMAT_VERSION,
            "backend_name": self.backend_name,
            "embedding_model": self.embedding_model,
            "embedding_mode": self.embedding_mode,
            "dimensions": self.dimensions,
            "distance_metric": self.distance_metric,
            "is_compact": self.is_compact,
            "is_pruned": self.is_compact,  # compact == embeddings pruned
            "is_recompute": self.is_recompute,
            "max_length": self.max_length,
            "num_chunks": n,
            "backend_kwargs": self.backend_kwargs,
            "passage_sources": sources,
        }
        with open(f"{prefix}.meta.json", "w") as f:
            json.dump(meta, f, indent=2)
        try:
            register_project_directory(Path(prefix).resolve().parent)
        except OSError:
            pass


class LeannSearcher:
    def __init__(self, index_path: str, enable_warmup: bool = False, **backend_kwargs):
        prefix = str(index_path)
        meta_path = f"{prefix}.meta.json"
        if not os.path.exists(meta_path):
            raise FileNotFoundError(f"index meta not found: {meta_path}")
        with open(meta_path) as f:
            self.meta = json.load(f)
        self.index_path = prefix
        self.backend_name = self.meta["backend_name"]
        self.embedding_model = self.meta["embedding_model"]
        self.embedding_mode = self.meta.get("embedding_mode", "tpu")
        self.distance_metric = self.meta.get("distance_metric", "mips")
        self.passage_manager = PassageManager(self.meta["passage_sources"], meta_dir=str(Path(prefix).parent))
        # merged kwargs: build-time kwargs overridden per-searcher (api.py:638)
        merged = {**self.meta.get("backend_kwargs", {}), **backend_kwargs}
        factory = get_backend(self.backend_name)
        self.backend: LeannBackendSearcherInterface = factory.searcher(prefix, meta=self.meta, **merged)
        if enable_warmup:
            try:
                self.search("warmup", top_k=1)
            except Exception as e:  # pragma: no cover
                logger.debug("warmup failed: %s", e)

    def search(
        self,
        query: "str | np.ndarray",
        top_k: int = 5,
        complexity: int = 64,
        beam_width: int = 1,
        # None = backend default: hnsw auto-applies the PQ screen when an
        # unpruned recompute would hit the >15-min cold-compile cliff
        # (backends/hnsw/backend.py AUTO_PRUNE_*); 0.0 = really unpruned
        prune_ratio: "float | None" = None,
        recompute_embeddings: Optional[bool] = None,
        pruning_strategy: str = "global",
        metadata_filters: Optional[Dict[str, Dict[str, Any]]] = None,
        batch_size: int = 0,
        zmq_port: Optional[int] = None,  # parity kwarg; no server exists here
        **kwargs,
    ) -> List[SearchResult]:
        t0 = time.time()
        n = self.meta.get("num_chunks", len(self.passage_manager))
        top_k = max(1, min(top_k, n))
        if recompute_embeddings is None:
            recompute_embeddings = bool(self.meta.get("is_recompute", False))
        search_params = dict(
            complexity=complexity,
            beam_width=beam_width,
            prune_ratio=prune_ratio,
            recompute_embeddings=recompute_embeddings,
            pruning_strategy=pruning_strategy,
            batch_size=batch_size,
            **kwargs,
        )
        is_text = isinstance(query, str) or (
            isinstance(query, (list, tuple)) and query and isinstance(query[0], str)
        )
        single = isinstance(query, str)
        search_text = getattr(self.backend, "search_text", None)
        if (
            is_text
            and search_text is not None
            and self.embedding_mode in ("tpu", "jax", "sentence-transformers", "hf", "mlx")
        ):
            # fused path: query encoding happens inside the search program —
            # one device dispatch for the whole (possibly batched) query set
            out = search_text(query, top_k, **search_params)
        else:
            if single:
                q = self.backend.compute_query_embedding(query)
            elif is_text:
                get_enc = getattr(self.backend, "get_encoder", None)
                if get_enc is not None and self.embedding_mode in ("tpu", "jax", "sentence-transformers", "hf", "mlx"):
                    q = get_enc().encode(list(query))  # index-calibrated encoder
                else:
                    q = compute_embeddings(list(query), self.embedding_model, mode=self.embedding_mode,
                                           max_length=self.meta.get("max_length", 256))
            else:
                q = np.ascontiguousarray(query, dtype=np.float32)
                if q.ndim == 1:
                    q = q[None, :]
                single = q.shape[0] == 1
            if self.distance_metric == "cosine":
                q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
            out = self.backend.search(q, top_k, **search_params)
        labels, distances = np.asarray(out["labels"]), np.asarray(out["distances"])

        def enrich(row_labels, row_dists) -> List[SearchResult]:
            results: List[SearchResult] = []
            id_list = getattr(self.backend, "id_list", None)
            for lbl, dist in zip(row_labels.tolist(), row_dists.tolist()):
                if lbl < 0:
                    continue
                pid = id_list[lbl] if id_list is not None else str(lbl)
                try:
                    p = self.passage_manager.get_passage(pid)
                except KeyError:
                    continue
                results.append(SearchResult(id=pid, score=float(dist), text=p.get("text", ""),
                                            metadata=p.get("metadata", {})))
            if metadata_filters:
                keep = self.passage_manager.filter_search_results(
                    [{"id": r.id, "text": r.text, "metadata": r.metadata} for r in results],
                    metadata_filters,
                )
                keep_ids = {k["id"] for k in keep}
                results = [r for r in results if r.id in keep_ids]
            return results

        all_results = [enrich(labels[i], distances[i]) for i in range(labels.shape[0])]
        logger.info("search(%r top_k=%d) -> %d row(s) in %.3fs",
                    (query[:40] if isinstance(query, str) else f"<{labels.shape[0]} queries>"),
                    top_k, len(all_results), time.time() - t0)
        # single query -> flat list (reference behavior); batch -> list per query
        return all_results[0] if single else all_results

    def cleanup(self) -> None:
        cleanup = getattr(self.backend, "cleanup", None)
        if cleanup:
            cleanup()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.cleanup()
        return False

    def __del__(self):  # pragma: no cover
        try:
            self.cleanup()
        except Exception:
            pass


class LeannChat:
    """RAG chat loop (reference api.py:826-930)."""

    PROMPT_TEMPLATE = (
        "You are a helpful assistant. Use the following retrieved context to answer the question.\n\n"
        "Context:\n{context}\n\nQuestion: {question}\n\nAnswer:"
    )

    def __init__(self, index_path: str, llm_config: Optional[Dict[str, Any]] = None,
                 searcher: Optional[LeannSearcher] = None, system_prompt: Optional[str] = None, **searcher_kwargs):
        from .chat import get_llm

        self.searcher = searcher or LeannSearcher(index_path, **searcher_kwargs)
        self._owns_searcher = searcher is None
        self.llm = get_llm(llm_config or {"type": "simulated"})
        self.system_prompt = system_prompt

    def ask(self, question: str, top_k: int = 5, llm_kwargs: Optional[Dict[str, Any]] = None, **search_kwargs) -> str:
        results = self.searcher.search(question, top_k=top_k, **search_kwargs)
        context = "\n\n".join(r.text for r in results)
        prompt = self.PROMPT_TEMPLATE.format(context=context, question=question)
        return self.llm.ask(prompt, system=self.system_prompt, **(llm_kwargs or {}))

    def start_interactive(self) -> None:  # pragma: no cover - REPL
        print("LEANN-TPU chat. Type 'quit' to exit.")
        while True:
            try:
                q = input("You: ").strip()
            except (EOFError, KeyboardInterrupt):
                break
            if q.lower() in ("quit", "exit", ""):
                break
            print("Assistant:", self.ask(q))

    def cleanup(self) -> None:
        if self._owns_searcher:
            self.searcher.cleanup()
