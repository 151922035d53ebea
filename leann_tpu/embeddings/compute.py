"""Unified embedding computation dispatch.

Parity with the reference ``compute_embeddings(texts, model, mode)``
(embedding_compute.py:25-68) with modes:

* ``tpu`` (default; also accepts the reference's ``sentence-transformers`` and
  ``mlx`` names) — the in-process JAX encoder (encoder.py). This replaces both
  the torch sentence-transformers path and the MLX path: on TPU there is one
  native engine.
* ``simulated`` — deterministic bag-of-hashed-words embeddings with no
  transformer; used by tests the way the reference uses mocks.
* ``openai`` / ``ollama`` / ``gemini`` — HTTP-backed modes kept for API
  parity (embedding_compute.py:356-869). They require network reachability
  and raise a clear error otherwise.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

_TPU_MODES = {"tpu", "jax", "sentence-transformers", "mlx", "hf"}


def compute_embeddings(
    texts: Sequence[str],
    model_name: str,
    mode: str = "tpu",
    batch_size: int = 128,
    is_build: bool = False,
    max_length: Optional[int] = None,
    **kwargs,
) -> np.ndarray:
    """Embed ``texts`` -> float32 [N, D]."""
    texts = list(texts)
    if not texts:
        raise ValueError("compute_embeddings called with no texts")
    mode = (mode or "tpu").lower()
    if mode in _TPU_MODES:
        if mode == "mlx":
            logger.info("mode 'mlx' has no meaning on TPU; using the JAX encoder")
        from .encoder import get_encoder

        emb = get_encoder(model_name, max_length=max_length).encode(texts, batch_size=batch_size)
    elif mode == "simulated":
        emb = simulated_embeddings(texts, model_name=model_name, **{k: v for k, v in kwargs.items() if k == "dim"})
    elif mode == "openai":
        emb = _openai_embeddings(texts, model_name, batch_size=min(batch_size, 500))
    elif mode == "ollama":
        emb = _ollama_embeddings(texts, model_name, **kwargs)
    elif mode == "gemini":
        emb = _gemini_embeddings(texts, model_name)
    else:
        raise ValueError(f"Unknown embedding mode {mode!r}")
    if not np.isfinite(emb).all():  # reference validates NaN/Inf (embedding_compute.py:350-352)
        raise ValueError("Embeddings contain NaN/Inf")
    return np.ascontiguousarray(emb, dtype=np.float32)


def simulated_embeddings(texts: Sequence[str], model_name: str = "simulated", dim: int = 64) -> np.ndarray:
    """Deterministic, dependency-free embeddings: average of per-token random
    vectors (seeded by token hash). Texts with overlapping vocabulary land
    close in cosine space, which is exactly what lexical-overlap recall tests
    need. Plays the role of the reference's mocks/SimulatedChat doubles
    (chat.py:807-813) on the embedding side."""
    from .tokenizer import HashTokenizer, stable_hash

    tok = HashTokenizer(vocab_size=1 << 30, max_length=8192)
    out = np.zeros((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        words = tok.tokenize_words(t)
        if not words:
            words = ["<empty>"]
        acc = np.zeros(dim, dtype=np.float64)
        for w in words:
            rng = np.random.default_rng(stable_hash(w) % (2**63))
            acc += rng.standard_normal(dim)
        v = acc / len(words)
        out[i] = v / max(np.linalg.norm(v), 1e-12)
    return out


# ---------------------------------------------------------------------------
# HTTP modes (network-gated)
# ---------------------------------------------------------------------------


def _openai_embeddings(texts: List[str], model_name: str, batch_size: int = 500) -> np.ndarray:
    import os

    try:
        from openai import OpenAI
    except ImportError as e:
        raise RuntimeError("openai python package not available") from e
    client = OpenAI(api_key=os.environ.get("OPENAI_API_KEY"))
    out = []
    for s in range(0, len(texts), batch_size):
        resp = client.embeddings.create(model=model_name, input=texts[s : s + batch_size])
        out.extend(d.embedding for d in resp.data)
    return np.asarray(out, dtype=np.float32)


def _ollama_embeddings(texts: List[str], model_name: str, host: str = "http://localhost:11434", **_) -> np.ndarray:
    import json
    import urllib.request

    out = []
    for t in texts:
        # the reference truncates to 8000 chars for ollama (embedding_compute.py:663-664)
        payload = json.dumps({"model": model_name, "prompt": t[:8000]}).encode()
        req = urllib.request.Request(
            f"{host}/api/embeddings", data=payload, headers={"Content-Type": "application/json"}
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            out.append(json.loads(r.read())["embedding"])
    emb = np.asarray(out, dtype=np.float32)
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    return emb / np.maximum(norms, 1e-12)


def _gemini_embeddings(texts: List[str], model_name: str) -> np.ndarray:
    import os

    try:
        from google import genai
    except ImportError as e:
        raise RuntimeError("google-genai package not available") from e
    client = genai.Client(api_key=os.environ.get("GEMINI_API_KEY"))
    resp = client.models.embed_content(model=model_name, contents=list(texts))
    return np.asarray([e.values for e in resp.embeddings], dtype=np.float32)
