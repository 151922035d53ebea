"""Shared backend searcher plumbing.

Parity with the reference's ``BaseSearcher`` (searcher_base.py:12-197) minus
everything server-related: query embeddings come straight from the in-process
engine, never over ZMQ. Also hosts shared helpers for id lists, token stores,
and TPU padding.
"""

from __future__ import annotations

import json
import logging
from typing import Any, Dict, List, Optional

import numpy as np

from ..embeddings.compute import compute_embeddings
from ..storage import derive_token_cache, load_ids, load_token_cache, save_ids  # noqa: F401 (re-export)

logger = logging.getLogger(__name__)


def round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def bucket_batch(n: int) -> int:
    """Round a query-batch size up to a power of two. Every distinct batch
    size compiles a separate fused search program (minutes each through the
    axon tunnel), so callers pad the batch and slice the outputs; the padded
    rows just repeat real queries."""
    b = 1
    while b < n:
        b *= 2
    return b


def pad_batch_rows(*arrays: np.ndarray) -> "tuple[int, list]":
    """Pad [B, ...] arrays to a pow2 batch by repeating row 0.
    -> (real_b, [padded arrays])."""
    real_b = arrays[0].shape[0]
    b = bucket_batch(real_b)
    if b == real_b:
        return real_b, list(arrays)
    out = []
    for a in arrays:
        reps = np.repeat(a[:1], b - real_b, axis=0)
        out.append(np.concatenate([a, reps], axis=0))
    return real_b, out


class BaseSearcher:
    """Loads common index state: meta, id list, optional token store."""

    def __init__(self, index_path: str, meta: Optional[Dict[str, Any]] = None, **kwargs):
        self.index_path = index_path
        if meta is None:
            with open(f"{index_path}.meta.json") as f:
                meta = json.load(f)
        self.meta = meta
        self.embedding_model = meta.get("embedding_model", "hash-minilm")
        self.embedding_mode = meta.get("embedding_mode", "tpu")
        self.distance_metric = meta.get("distance_metric", "mips")
        self.max_length = meta.get("max_length", 256)
        self.dim = meta.get("dimensions")
        self.id_list: List[str] = load_ids(index_path)

    def get_encoder(self):
        """The index's query/recompute encoder — the process-cached one, with
        this index's corpus calibration applied (a copy; <prefix>.calib.npz
        is written by builds over loaded HF checkpoints, see
        api.LeannBuilder._maybe_calibrate). Search-time params must match the
        build-time geometry exactly."""
        if getattr(self, "_calibrated_enc", None) is not None:
            return self._calibrated_enc
        import os

        from ..embeddings.encoder import get_encoder

        enc = get_encoder(self.embedding_model, max_length=self.max_length)
        calib_path = f"{self.index_path}.calib.npz"
        if os.path.exists(calib_path):
            z = np.load(calib_path)
            enc = enc.with_calibration({"out_center": z["out_center"], "out_pc": z["out_pc"]})
        self._calibrated_enc = enc
        return enc

    def compute_query_embedding(self, query: str, **kwargs) -> np.ndarray:
        if self.embedding_mode in ("tpu", "jax", "sentence-transformers", "hf", "mlx"):
            return self.get_encoder().encode([query])
        emb = compute_embeddings(
            [query], self.embedding_model, mode=self.embedding_mode, max_length=self.max_length,
            **({"dim": self.dim} if (self.dim and self.embedding_mode == "simulated") else {}),
        )
        return emb

    def load_tokens(self) -> "tuple[np.ndarray, np.ndarray] | None":
        """Load the token matrix -> (tokens [N, T] u16|i32, lengths [N]).
        Tokens keep their stored dtype (u16 when the vocab fits) so the HBM
        copy is half-size; encode_tokens casts to i32 after the gather.
        Large stores are raw .npy (written above RAW_TOKEN_STORE_BYTES) and
        come back MEMMAPPED — host-deferred rerank gathers touch only the
        pages they need; device uploads read through the map once.

        The store is a derivable CACHE (storage.py): when neither the cache
        nor a legacy store exists but the index was built for recompute, it
        is regenerated from passages.jsonl + the deterministic tokenizer."""
        tok = load_token_cache(self.index_path)
        if tok is not None:
            return tok
        if not self.meta.get("is_recompute", True):
            return None
        return derive_token_cache(self.index_path, self.embedding_model, self.max_length)

    def load_entry_emb(self, z) -> "np.ndarray | None":
        """Entry-pool f16 embeddings for exact entry screening, as a
        DERIVABLE CACHE (the same accounting rule as the token store): from
        the backend npz when present (legacy / mips indexes), else from
        ``<prefix>.entries.cache.npy``, else derived by running the entry
        rows' tokens through the exact recompute pipeline the fused search
        loop uses (ops/beam_search.py: encode_tokens + cosine normalize) —
        bit-identical f16 values to the build-time ``data[entries]`` rows,
        which is the invariant recompute search already depends on. ``leann
        repack`` moves legacy in-npz pools out to the cache file."""
        if "entry_emb" in z:
            return np.asarray(z["entry_emb"])
        import os

        cache = f"{self.index_path}.entries.cache.npy"
        if os.path.exists(cache):
            return np.load(cache)
        metric = str(z["metric"]) if "metric" in z else self.distance_metric
        if metric not in ("l2", "cosine") or "entries" not in z:
            # mips entry pools live in the AUGMENTED build space — not
            # reconstructable from tokens alone; builds keep them in the npz
            return None
        tok = self.load_tokens()
        if tok is None:
            return None
        import jax.numpy as jnp

        from ..embeddings.encoder import encode_tokens

        entries = np.asarray(z["entries"])
        toks = np.asarray(tok[0][entries], np.int32)
        lens = np.asarray(tok[1])[entries]
        mask = np.arange(toks.shape[1])[None, :] < lens[:, None]
        enc = self.get_encoder()
        out = None
        step = 4096
        for s in range(0, toks.shape[0], step):
            e = encode_tokens(enc.params, jnp.asarray(toks[s : s + step]),
                              jnp.asarray(mask[s : s + step]), enc.cfg)
            if metric == "cosine" and not enc.cfg.normalize:
                e = e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12)
            e = np.asarray(e, np.float16)
            if out is None:
                out = np.empty((toks.shape[0], e.shape[1]), np.float16)
            out[s : s + e.shape[0]] = e
        tmp = cache + ".tmp.npy"
        np.save(tmp, out)
        os.replace(tmp, cache)
        logger.info("entry pool derived from tokens: %s rows", out.shape[0])
        return out

    def cleanup(self) -> None:
        pass


def mips_augment(data):
    """MIPS -> L2 reduction for graph construction (Bachrach et al.): append
    sqrt(max||x||^2 - ||x||^2) so L2 neighborhoods in the augmented space
    order like inner products against unit-extended queries. Without this an
    L2-built graph serves a dot-product search objective badly — measured
    recall@3 0.56 vs 0.95+ at 100K on unnormalized 768-d embeddings. Build
    only; stored/PQ/search operate on the raw vectors."""
    import numpy as np

    norms2 = np.einsum("ij,ij->i", data, data, dtype=np.float32)  # f32 accum for f16 inputs
    aug = np.sqrt(np.maximum(norms2.max() - norms2, 0.0)).astype(data.dtype)
    return np.concatenate([data, aug[:, None]], axis=1)
