#!/usr/bin/env python
"""DiskANN-tier vs HNSW-tier: build time, search latency, index size.

Parity with the reference's benchmarks/diskann_vs_hnsw_speed_comparison.py:
28-60 on synthetic/fixture documents.
"""

import argparse
import json
import os
import tempfile
import time

from bench_common import index_size_bytes, load_corpus, make_queries, timed_searches

from leann_tpu import LeannBuilder, LeannSearcher


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-chunks", type=int, default=1000)
    ap.add_argument("--complexity", type=int, default=64)
    args = ap.parse_args()

    chunks = load_corpus(args.n_chunks)
    queries, _ = make_queries(chunks, 16)
    tmp = tempfile.mkdtemp(prefix="leann_dvh_")
    out = {}
    for backend in ("hnsw", "diskann"):
        prefix = os.path.join(tmp, backend + ".leann")
        bk = {"M": 16} if backend == "hnsw" else {"graph_degree": 16}
        t0 = time.time()
        b = LeannBuilder(backend_name=backend, embedding_model="hash-minilm", max_length=128, **bk)
        for c in chunks:
            b.add_text(c)
        b.build_index(prefix)
        build_s = time.time() - t0
        s = LeannSearcher(prefix)
        r = timed_searches(s, queries, top_k=3, complexity=args.complexity, beam_width=8)
        out[backend] = {
            "build_s": round(build_s, 1),
            "p50_ms": round(r["p50_ms"], 2),
            "p90_ms": round(r["p90_ms"], 2),
            "index_bytes": index_size_bytes(prefix, backend),
        }
        print(f"{backend:8s} build={build_s:6.1f}s p50={r['p50_ms']:7.1f}ms "
              f"index={out[backend]['index_bytes'] / 1e6:6.2f}MB")
    print(json.dumps({"n_chunks": len(chunks), **out}))


if __name__ == "__main__":
    main()
