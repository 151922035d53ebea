"""Shared benchmark utilities."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_corpus(n_chunks: int = 1000, min_len: int = 60):
    """Pride & Prejudice paragraphs (the reference's canonical fixture), with
    a synthetic fallback when the fixture is absent."""
    path = "/root/reference/data/PrideandPrejudice.txt"
    if os.path.exists(path):
        text = open(path, encoding="utf-8").read()
        paras = [p.strip().replace("\n", " ") for p in text.split("\n\n") if len(p.strip()) > min_len]
        if len(paras) >= n_chunks:
            return paras[:n_chunks]
        # tile with suffix variation to reach n_chunks
        out = list(paras)
        i = 0
        while len(out) < n_chunks:
            out.append(paras[i % len(paras)] + f" (variant {i})")
            i += 1
        return out
    rng = np.random.default_rng(0)
    words = [f"word{i}" for i in range(5000)]
    return [" ".join(rng.choice(words, 40)) for _ in range(n_chunks)]


def make_queries(chunks, n_queries=32, seed=0, n_words=12):
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(chunks), min(n_queries, len(chunks)), replace=False)
    return [" ".join(chunks[i].split()[:n_words]) for i in idx], idx


def ground_truth(enc, chunks, queries, k, metric="cosine"):
    emb = enc.encode(chunks)
    qe = enc.encode(queries)
    if metric == "cosine":
        emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        qe = qe / np.maximum(np.linalg.norm(qe, axis=1, keepdims=True), 1e-12)
        d = -qe @ emb.T
    else:
        d = ((qe[:, None, :] - emb[None, :, :]) ** 2).sum(-1)
    return np.argsort(d, axis=1)[:, :k]


def recall_at_k(labels, truth):
    hits = sum(len(set(l) & set(t.tolist())) for l, t in zip(labels, truth))
    return hits / (truth.shape[0] * truth.shape[1])


def timed_searches(searcher, queries, warmup=1, **kw):
    for q in queries[:warmup]:
        searcher.search(q, **kw)
    lat, labels = [], []
    for q in queries:
        t0 = time.time()
        res = searcher.search(q, **kw)
        lat.append((time.time() - t0) * 1000)
        labels.append([int(r.id) for r in res])
    lat = np.asarray(lat)
    return {
        "p50_ms": float(np.percentile(lat, 50)),
        "p90_ms": float(np.percentile(lat, 90)),
        "mean_ms": float(lat.mean()),
        "labels": labels,
    }


def index_size_bytes(prefix: str, backend: str) -> int:
    suffix = {"hnsw": ".hnsw.npz", "diskann": ".diskann.npz", "flat": ".flat.npz"}[backend]
    total = os.path.getsize(prefix + suffix)
    if backend == "diskann":
        for part in (prefix + ".partition.npy", prefix + ".partition.npz"):
            if os.path.exists(part):
                total += os.path.getsize(part)
    return total
