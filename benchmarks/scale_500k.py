#!/usr/bin/env python
"""Scale demonstration: 500K-chunk compact index, on-chip recompute search.

Synthetic topical corpus (zipf-ish vocabulary, 500 topics) so nearest-neighbor
structure is realistic. Reports build-phase times, index bytes vs the flat f32
baseline, single-query p50, batched per-query latency, and recall@3 vs the
exact flat oracle over the same embeddings.
"""

import argparse
import json
import logging
import os
import tempfile
import time

import numpy as np

from bench_common import recall_at_k  # noqa: F401  (repo path side effect)

from leann_tpu import LeannBuilder, LeannSearcher
from leann_tpu.embeddings.encoder import get_encoder
from leann_tpu.ops.distance import flat_search


def synth_corpus(n, rng, n_topics=500, words_per_chunk=30):
    """Topical corpus with realistic tie structure: a wide per-topic
    vocabulary plus doc-unique words, so exact top-k is meaningful (narrow
    topic vocabularies make hundreds of chunks near-identical — an anti-ANN
    workload no real corpus resembles)."""
    vocab = np.array([f"w{i}" for i in range(50000)])
    topic_words = rng.integers(0, len(vocab), size=(n_topics, 300))
    chunks = []
    topics = rng.integers(0, n_topics, size=n)
    for i in range(n):
        tw = vocab[topic_words[topics[i], rng.integers(0, 300, 18)]]
        gw = vocab[rng.integers(0, len(vocab), 6)]
        uw = np.array([f"doc{i}a", f"doc{i}b", f"doc{i}c", f"doc{i}d", f"doc{i}e", f"doc{i}f"])
        words = np.concatenate([tw, gw, uw])
        rng.shuffle(words)
        chunks.append(" ".join(words))
    return chunks


def main():
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-chunks", type=int, default=500_000)
    ap.add_argument("--max-length", type=int, default=64)
    ap.add_argument("--graph-degree", type=int, default=16)
    ap.add_argument("--n-queries", type=int, default=64)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    t0 = time.time()
    chunks = synth_corpus(args.n_chunks, rng)
    print(f"[{time.time()-t0:7.1f}s] corpus generated: {len(chunks)}", flush=True)

    tmp = tempfile.mkdtemp(prefix="leann_500k_")
    prefix = os.path.join(tmp, "big.leann")
    b = LeannBuilder(backend_name="hnsw", embedding_model="hash-minilm",
                     max_length=args.max_length, M=args.graph_degree)
    for c in chunks:
        b.add_text(c)
    t0 = time.time()
    b.build_index(prefix)
    build_s = time.time() - t0
    print(f"[{build_s:7.1f}s] index built", flush=True)

    idx_bytes = os.path.getsize(prefix + ".hnsw.npz")
    tok_bytes = os.path.getsize(prefix + ".tokens.npz")

    s = LeannSearcher(prefix)
    q_idx = rng.choice(len(chunks), args.n_queries, replace=False)
    queries = [" ".join(chunks[i].split()[:12]) for i in q_idx]
    kw = dict(top_k=3, complexity=64, beam_width=8, prune_ratio=0.75)
    s.search(queries[0], **kw)
    lat, labels = [], []
    for q in queries:
        t0 = time.time()
        res = s.search(q, **kw)
        lat.append((time.time() - t0) * 1000)
        labels.append([int(r.id) for r in res])
    p50 = float(np.percentile(lat, 50))
    print(f"single-query p50: {p50:.1f}ms", flush=True)

    enc = get_encoder("hash-minilm", max_length=args.max_length)
    import jax.numpy as jnp

    qv = enc.encode(queries)
    qv /= np.maximum(np.linalg.norm(qv, axis=1, keepdims=True), 1e-12)
    t0 = time.time()
    out = s.backend.search(qv, 3, complexity=64, beam_width=8, prune_ratio=0.75,
                           recompute_embeddings=True, pruning_strategy="global")
    batched = (time.time() - t0) * 1000 / len(queries)
    print(f"batched: {batched:.2f} ms/query", flush=True)

    # exact ground truth over the same embeddings (blocked flat search)
    t0 = time.time()
    emb = enc.encode(chunks, batch_size=1024)
    emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    print(f"[{time.time()-t0:7.1f}s] oracle embeddings", flush=True)
    n_pad = ((emb.shape[0] + 127) // 128) * 128
    emb_p = np.concatenate([emb, np.zeros((n_pad - emb.shape[0], emb.shape[1]), np.float32)])
    tl, td = flat_search(jnp.asarray(emb_p), jnp.asarray(qv), jnp.int32(emb.shape[0]), 3, "cosine")
    truth = np.asarray(tl)
    hits = sum(len(set(l) & set(t.tolist())) for l, t in zip(labels, truth))
    recall = hits / (3 * len(queries))
    flat_bytes = emb.nbytes

    print(json.dumps({
        "n_chunks": len(chunks),
        "build_s": round(build_s, 1),
        "p50_ms": round(p50, 2),
        "batched_ms_per_query": round(batched, 2),
        "recall_at_3": round(recall, 4),
        "index_bytes": idx_bytes,
        "tokens_bytes": tok_bytes,
        "flat_baseline_bytes": flat_bytes,
        "storage_savings_vs_flat": round(1 - idx_bytes / flat_bytes, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
