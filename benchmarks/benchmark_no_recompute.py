#!/usr/bin/env python
"""Recompute vs no-recompute ablation, both graph backends.

Parity with the reference's benchmarks/benchmark_no_recompute.py:14-148 4-way
grid: {hnsw, diskann} x {recompute (compact, graph+text only), no-recompute
(embeddings stored)} — reporting search latency and index size for each cell.
"""

import argparse
import json
import os
import tempfile

from bench_common import index_size_bytes, load_corpus, make_queries, timed_searches

from leann_tpu import LeannBuilder, LeannSearcher


def run_cell(chunks, queries, backend, recompute, model, max_length, tmp):
    prefix = os.path.join(tmp, f"{backend}_{'rc' if recompute else 'norc'}.leann")
    bk = {"M": 16} if backend == "hnsw" else {"graph_degree": 16}
    b = LeannBuilder(backend_name=backend, embedding_model=model, max_length=max_length,
                     is_recompute=recompute, is_compact=recompute, **bk)
    for c in chunks:
        b.add_text(c)
    b.build_index(prefix)
    s = LeannSearcher(prefix)
    r = timed_searches(s, queries, top_k=3, complexity=32, beam_width=8,
                       recompute_embeddings=recompute)
    return {
        "backend": backend,
        "recompute": recompute,
        "p50_ms": round(r["p50_ms"], 2),
        "p90_ms": round(r["p90_ms"], 2),
        "index_bytes": index_size_bytes(prefix, backend),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-chunks", type=int, default=500)
    ap.add_argument("--embedding-model", default=os.environ.get("LEANN_EMBED_MODEL", "hash-minilm"))
    ap.add_argument("--max-length", type=int, default=128)
    args = ap.parse_args()

    chunks = load_corpus(args.n_chunks)
    queries, _ = make_queries(chunks, 16)
    tmp = tempfile.mkdtemp(prefix="leann_norc_")
    cells = []
    for backend in ("hnsw", "diskann"):
        for recompute in (True, False):
            cell = run_cell(chunks, queries, backend, recompute, args.embedding_model,
                            args.max_length, tmp)
            cells.append(cell)
            print(f"{backend:8s} recompute={recompute!s:5s} p50={cell['p50_ms']:8.1f}ms "
                  f"index={cell['index_bytes'] / 1e6:7.2f}MB")
    print(json.dumps({"n_chunks": len(chunks), "cells": cells}))


if __name__ == "__main__":
    main()
