#!/usr/bin/env python
"""Headline benchmark: p50 recompute-search latency on the reference's
basic_demo workload (Pride & Prejudice chunks), with a recall@3 gate vs the
flat exact oracle.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Headline configuration: the diskann backend — PQ-ADC-steered traversal with
one deferred exact-recompute rerank batch (the reference's fastest strategy,
diskann_backend.py:444-467, minus the ZMQ hop), fused into a single TPU
dispatch per query. The hnsw per-hop-recompute path (the reference's flagship
HNSW flow) is reported alongside as ``hnsw_p50_ms``.

Baseline: the reference's published recompute-mode query latency on a toy
corpus is 5-15 s (benchmarks/README.md:116-117, CPU + embedding-server ZMQ
round-trips per hop). We take the *low* end (5000 ms) as the bar;
``vs_baseline`` is the speedup factor (>1 = faster than reference).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_P50_MS = 5000.0  # reference recompute mode, low end (see docstring)


def load_chunks(max_chunks=1000):
    path = "/root/reference/data/PrideandPrejudice.txt"
    if not os.path.exists(path):  # synthetic fallback corpus
        rng = np.random.default_rng(0)
        words = [f"w{i}" for i in range(5000)]
        return [" ".join(rng.choice(words, 40)) for _ in range(max_chunks)]
    text = open(path, encoding="utf-8").read()
    paras = [p.strip().replace("\n", " ") for p in text.split("\n\n") if len(p.strip()) > 60]
    return paras[:max_chunks]


def main():
    import tempfile

    from leann_tpu import LeannBuilder, LeannSearcher
    from leann_tpu.embeddings.encoder import get_encoder

    chunks = load_chunks()
    tmp = tempfile.mkdtemp(prefix="leann_bench_")

    # ---- build both graph backends over the same corpus --------------------
    t0 = time.time()
    d_idx = os.path.join(tmp, "bench_d.leann")
    b = LeannBuilder(backend_name="diskann", embedding_model="hash-minilm",
                     max_length=128, graph_degree=16)
    for c in chunks:
        b.add_text(c)
    b.build_index(d_idx)
    build_s = time.time() - t0

    h_idx = os.path.join(tmp, "bench_h.leann")
    bh = LeannBuilder(backend_name="hnsw", embedding_model="hash-minilm",
                      max_length=128, M=16)
    for c in chunks:
        bh.add_text(c)
    bh.build_index(h_idx)

    rng = np.random.default_rng(0)
    q_idx = rng.choice(len(chunks), 32, replace=False)
    queries = [" ".join(chunks[i].split()[:12]) for i in q_idx]

    def p50_p90(searcher, kw):
        searcher.search(queries[0], **kw)  # compile warmup
        lat, labels = [], []
        for q in queries:
            t0 = time.time()
            res = searcher.search(q, **kw)
            lat.append((time.time() - t0) * 1000)
            labels.append([int(r.id) for r in res])
        return (float(np.percentile(lat, 50)), float(np.percentile(lat, 90)), labels)

    # headline: PQ traversal + one deferred exact-recompute rerank batch
    sd = LeannSearcher(d_idx)
    kw_d = dict(top_k=3, complexity=64, beam_width=8, rerank_size=32)
    p50, p90, labels = p50_p90(sd, kw_d)

    # batched serving mode: whole query set in ONE fused dispatch
    sd.search(queries, **kw_d)
    t0 = time.time()
    sd.search(queries, **kw_d)
    batched_ms_per_q = (time.time() - t0) * 1000 / len(queries)

    # secondary: the reference's flagship flow — per-hop recompute w/ PQ screen
    sh = LeannSearcher(h_idx)
    kw_h = dict(top_k=3, complexity=64, beam_width=8, prune_ratio=0.75)
    h_p50, _h_p90, h_labels = p50_p90(sh, kw_h)

    # recall@3 vs flat exact search over the same encoder embeddings
    enc = get_encoder("hash-minilm", max_length=128)
    emb = enc.encode(chunks)
    emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    qe = enc.encode(queries)
    qe = qe / np.maximum(np.linalg.norm(qe, axis=1, keepdims=True), 1e-12)
    truth = np.argsort(-qe @ emb.T, axis=1)[:, :3]

    def recall(lbls):
        hits = sum(len(set(l) & set(t.tolist())) for l, t in zip(lbls, truth))
        return hits / (3 * len(queries))

    # storage accounting: graph index bytes vs flat f32 embedding matrix
    graph_bytes = os.path.getsize(d_idx + ".diskann.npz")
    flat_bytes = emb.nbytes

    print(json.dumps({
        "metric": "p50_recompute_search_latency",
        "value": round(p50, 2),
        "unit": "ms",
        "vs_baseline": round(BASELINE_P50_MS / p50, 2),
        "p90_ms": round(p90, 2),
        "batched_ms_per_query": round(batched_ms_per_q, 2),
        "recall_at_3": round(recall(labels), 4),
        "hnsw_p50_ms": round(h_p50, 2),
        "hnsw_recall_at_3": round(recall(h_labels), 4),
        "n_chunks": len(chunks),
        "build_s": round(build_s, 1),
        "index_bytes": graph_bytes,
        "flat_baseline_bytes": flat_bytes,
        "storage_savings": round(1 - graph_bytes / flat_bytes, 3),
    }))


if __name__ == "__main__":
    main()
