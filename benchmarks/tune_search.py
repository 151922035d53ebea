#!/usr/bin/env python
"""Search-knob sweep over an existing index: recall@k + latency per config.

The reference exposes the same tuning surface (complexity/beam/prune —
docs/configuration-guide.md) but ships no sweep tool; this one evaluates a
grid against the exact flat oracle over identical embeddings and prints one
JSON line per config. Works on any index built by benchmarks/scale_500k.py
(synthetic corpus is regenerated deterministically from the same seed).

Usage:
  python benchmarks/tune_search.py --index /tmp/.../big.leann --n-chunks 1000000 \
      --grid '[{"complexity":256,"beam_width":16,"rerank_size":64,"n_entries":128}]'

Ground truth is cached next to the index (<index>.truth<k>.npy) because the
oracle embed of the full corpus is the expensive part.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_GRID = [
    {"complexity": 256, "beam_width": 16, "rerank_size": 64, "n_entries": 128},
    {"complexity": 256, "beam_width": 16, "rerank_size": 64, "n_entries": 256},
    {"complexity": 512, "beam_width": 16, "rerank_size": 128, "n_entries": 256},
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True, help="index prefix (…/big.leann)")
    ap.add_argument("--n-chunks", type=int, required=True)
    ap.add_argument("--n-queries", type=int, default=64)
    ap.add_argument("--top-k", type=int, default=3)
    ap.add_argument("--max-length", type=int, default=64)
    ap.add_argument("--grid", default=None, help="JSON list of search-kwarg dicts")
    args = ap.parse_args()

    from scale_500k import synth_corpus

    from leann_tpu import LeannSearcher
    from leann_tpu.embeddings.encoder import get_encoder
    from leann_tpu.ops.distance import flat_search

    rng = np.random.default_rng(0)
    chunks = synth_corpus(args.n_chunks, rng)
    q_idx = rng.choice(len(chunks), args.n_queries, replace=False)
    queries = [" ".join(chunks[i].split()[:12]) for i in q_idx]

    enc = get_encoder("hash-minilm", max_length=args.max_length)
    qv = enc.encode(queries)
    qv /= np.maximum(np.linalg.norm(qv, axis=1, keepdims=True), 1e-12)

    truth_path = f"{args.index}.truth{args.top_k}.npy"
    if os.path.exists(truth_path):
        truth = np.load(truth_path)
    else:
        import jax.numpy as jnp

        t0 = time.time()
        emb = enc.encode(chunks, batch_size=4096)
        emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        n_pad = ((emb.shape[0] + 127) // 128) * 128
        emb_p = np.concatenate([emb, np.zeros((n_pad - emb.shape[0], emb.shape[1]), np.float32)])
        tl, _ = flat_search(jnp.asarray(emb_p), jnp.asarray(qv),
                            jnp.int32(emb.shape[0]), args.top_k, "cosine")
        truth = np.asarray(tl)
        np.save(truth_path, truth)
        print(f"# oracle computed in {time.time()-t0:.0f}s -> {truth_path}", flush=True)

    s = LeannSearcher(args.index)
    grid = json.loads(args.grid) if args.grid else DEFAULT_GRID
    for cfg in grid:
        kw = dict(top_k=args.top_k, **cfg)
        t0 = time.time()
        s.search(queries[0], **kw)  # compile
        compile_s = time.time() - t0
        lat, labels = [], []
        for q in queries:
            t0 = time.time()
            res = s.search(q, **kw)
            lat.append((time.time() - t0) * 1000)
            labels.append([int(r.id) for r in res])
        hits = sum(len(set(l) & set(t.tolist())) for l, t in zip(labels, truth))
        print(json.dumps({
            "recall_at_k": round(hits / (args.top_k * len(queries)), 4),
            "p50_ms": round(float(np.percentile(lat, 50)), 1),
            "p90_ms": round(float(np.percentile(lat, 90)), 1),
            "compile_s": round(compile_s, 1),
            **cfg,
        }), flush=True)


if __name__ == "__main__":
    main()
