"""Flat (exact brute-force) backend — the TPU analog of a faiss flat index.

One MXU matmul + top-k over the whole corpus per query batch. Serves three
roles: (1) the minimal end-to-end slice of the framework, (2) the ground-truth
oracle for graph-backend recall tests (the reference compares against flat
faiss in benchmarks/run_evaluation.py:358-367), (3) the storage-baseline for
the savings accounting (README.md:683-687 "traditional vector DB" column).

Embeddings live in HBM padded to lane multiples; queries stream through one
jitted program per (k,) so repeat searches hit the compile cache.
"""

from __future__ import annotations

import logging
from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..interface import (
    LeannBackendBuilderInterface,
    LeannBackendFactoryInterface,
    LeannBackendSearcherInterface,
)
from ..ops.beam_search import unpack_results
from ..ops.distance import flat_search_packed
from ..registry import register_backend
from .common import BaseSearcher, pad_batch_rows, round_up, save_ids

logger = logging.getLogger(__name__)


class FlatBuilder(LeannBackendBuilderInterface):
    def __init__(self, distance_metric: str = "mips", **kwargs):
        self.distance_metric = distance_metric

    def build(self, data: np.ndarray, ids: list, index_path: str, **kwargs) -> None:
        data = np.ascontiguousarray(data, dtype=np.float32)
        np.savez(f"{index_path}.flat.npz", embeddings=data, metric=self.distance_metric)
        save_ids(index_path, ids)


PALLAS_MIN_N = 16384  # below this the XLA path is trivially fast anyway
PALLAS_TILE = 4096  # swept on v5e: 340 GB/s vs 212 at tile=512; 8192+ overflows VMEM


class FlatSearcher(BaseSearcher, LeannBackendSearcherInterface):
    def __init__(self, index_path: str, **kwargs):
        super().__init__(index_path, **kwargs)
        import jax

        z = np.load(f"{index_path}.flat.npz")
        emb = z["embeddings"]
        self.metric = str(z["metric"])
        self.n = emb.shape[0]
        self._use_pallas = jax.default_backend() != "cpu" and self.n >= PALLAS_MIN_N
        pad_to = PALLAS_TILE if self._use_pallas else 128
        n_pad = round_up(self.n, pad_to)
        if n_pad != self.n:
            emb = np.concatenate([emb, np.zeros((n_pad - self.n, emb.shape[1]), np.float32)])
        if self._use_pallas:
            # bf16-resident corpus (half the HBM) + fused distance/top-k
            # kernel; f32 row norms keep l2 exact
            self._emb = jnp.asarray(emb, jnp.bfloat16)
            self._en = jnp.sum(jnp.square(jnp.asarray(emb)), axis=1)[None, :]
        else:
            self._emb = jnp.asarray(emb)
            self._en = None
        self._valid_n = jnp.int32(self.n)

    def search(self, query: np.ndarray, top_k: int, **kwargs) -> Dict[str, np.ndarray]:
        qn = np.ascontiguousarray(query, dtype=np.float32)
        real_b, (qn,) = pad_batch_rows(qn)  # pow2 batch -> bounded compiles
        q = jnp.asarray(qn)
        k = min(top_k, self.n)
        if self._use_pallas:
            from ..ops.pallas_topk import pallas_flat_search_packed

            packed = pallas_flat_search_packed(
                self._emb, q, self._valid_n, k, self.metric, tile=PALLAS_TILE, en=self._en
            )
        else:
            packed = flat_search_packed(self._emb, q, self._valid_n, k, self.metric)
        labels, dists = unpack_results(packed)
        return {"labels": labels[:real_b], "distances": dists[:real_b]}


@register_backend("flat")
class FlatBackendFactory(LeannBackendFactoryInterface):
    @staticmethod
    def builder(**kwargs) -> FlatBuilder:
        return FlatBuilder(**kwargs)

    @staticmethod
    def searcher(index_path: str, **kwargs) -> FlatSearcher:
        return FlatSearcher(index_path, **kwargs)

    @staticmethod
    def insert(index_path: str, embeddings: np.ndarray, **kwargs) -> int:
        """Incremental insert = matrix append (flat keeps every embedding)."""
        path = f"{index_path}.flat.npz"
        z = dict(np.load(path, allow_pickle=False))
        z["embeddings"] = np.concatenate(
            [z["embeddings"], np.ascontiguousarray(embeddings, dtype=np.float32)]
        )
        np.savez(path, **z)
        return int(z["embeddings"].shape[0])
