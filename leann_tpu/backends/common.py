"""Shared backend searcher plumbing.

Parity with the reference's ``BaseSearcher`` (searcher_base.py:12-197) minus
everything server-related: query embeddings come straight from the in-process
engine, never over ZMQ. Also hosts shared helpers for id lists, token stores,
and TPU padding.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, List, Optional

import numpy as np

from ..embeddings.compute import compute_embeddings

logger = logging.getLogger(__name__)


def round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


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
        self.id_list: List[str] = []
        ids_path = f"{index_path}.ids.json"
        if os.path.exists(ids_path):
            with open(ids_path) as f:
                self.id_list = json.load(f)

    def compute_query_embedding(self, query: str, **kwargs) -> np.ndarray:
        emb = compute_embeddings(
            [query], self.embedding_model, mode=self.embedding_mode, max_length=self.max_length,
            **({"dim": self.dim} if (self.dim and self.embedding_mode == "simulated") else {}),
        )
        return emb

    def load_tokens(self) -> "tuple[np.ndarray, np.ndarray] | None":
        """Load the build-time token matrix -> (tokens [N, T] i32, lengths [N])."""
        path = f"{self.index_path}.tokens.npz"
        if not os.path.exists(path):
            return None
        z = np.load(path)
        return z["tokens"].astype(np.int32), z["lengths"].astype(np.int32)

    def cleanup(self) -> None:
        pass


def save_ids(index_path: str, ids: List[str]) -> None:
    with open(f"{index_path}.ids.json", "w") as f:
        json.dump(list(ids), f)
