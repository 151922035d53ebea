"""LEANN-TPU: TPU-native low-storage vector index + RAG engine.

A ground-up JAX/XLA/Pallas re-design of the LEANN capability set
(yichuan-w/LEANN): store only a pruned graph + raw text, recompute embeddings
on demand during query-time traversal — with the whole query path (graph
expansion, encoder recompute, distance + top-k) fused into jitted TPU
programs instead of forked faiss/DiskANN C++ round-tripping to a ZMQ
embedding-server subprocess.
"""

__version__ = "0.1.0"

from .api import LeannBuilder, LeannChat, LeannSearcher, PassageManager, SearchResult  # noqa: F401
from .registry import (  # noqa: F401
    autodiscover_backends,
    get_registered_backends,
    register_backend,
)

__all__ = [
    "LeannBuilder",
    "LeannSearcher",
    "LeannChat",
    "PassageManager",
    "SearchResult",
    "register_backend",
    "autodiscover_backends",
    "get_registered_backends",
]
