"""LEANN-TPU: TPU-native low-storage vector index + RAG engine.

A ground-up JAX/XLA/Pallas re-design of the LEANN capability set
(yichuan-w/LEANN): store only a pruned graph + raw text, recompute embeddings
on demand during query-time traversal — with the whole query path (graph
expansion, encoder recompute, distance + top-k) fused into jitted TPU
programs instead of forked faiss/DiskANN C++ round-tripping to a ZMQ
embedding-server subprocess.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: big-N programs take minutes to compile on
# TPU; caching makes every process after the first start warm. Opt out with
# LEANN_JAX_CACHE=0.
if _os.environ.get("LEANN_JAX_CACHE", "1") != "0":
    try:
        import jax as _jax

        # per-platform subdir; skip CPU entirely (XLA:CPU AOT reload trips on
        # pseudo-features like +prefer-no-gather and recompiles anyway)
        _platform = (_jax.config.jax_platforms or "auto").split(",")[0]
        if _platform not in ("cpu",):
            _jax.config.update(
                "jax_compilation_cache_dir",
                _os.path.join(
                    _os.environ.get("JAX_COMPILATION_CACHE_DIR", _os.path.expanduser("~/.cache/leann_tpu_jax")),
                    _platform,
                ),
            )
            # default thresholds skip entries on some platforms; compiles via
            # the TPU tunnel cost tens of seconds, so cache everything
            _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
            _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from .api import LeannBuilder, LeannChat, LeannSearcher, PassageManager, SearchResult  # noqa: F401
from .registry import (  # noqa: F401
    autodiscover_backends,
    get_registered_backends,
    register_backend,
)
from .runtime.batcher import BatchedSearcher  # noqa: F401

__all__ = [
    "LeannBuilder",
    "LeannSearcher",
    "LeannChat",
    "PassageManager",
    "SearchResult",
    "BatchedSearcher",
    "register_backend",
    "autodiscover_backends",
    "get_registered_backends",
]
