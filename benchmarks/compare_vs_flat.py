#!/usr/bin/env python
"""Storage + peak-RSS comparison vs the flat (traditional vector DB) baseline.

Parity with the reference's benchmarks/compare_faiss_vs_leann.py:56-80: the
flat backend plays faiss's role. Each configuration runs in a subprocess so
peak RSS is isolated (same methodology as the reference).
"""

import argparse
import json
import os
import resource
import subprocess
import sys
import tempfile

from bench_common import index_size_bytes, load_corpus

BODY = r"""
import json, os, resource, sys
sys.path.insert(0, {repo!r})
from benchmarks.bench_common import load_corpus, make_queries, timed_searches
from leann_tpu import LeannBuilder, LeannSearcher

backend = {backend!r}
tmp = {tmp!r}
chunks = load_corpus({n_chunks})
prefix = os.path.join(tmp, backend + ".leann")
if not os.path.exists(prefix + ".meta.json"):
    kw = dict(M=16) if backend == "hnsw" else {{}}
    b = LeannBuilder(backend_name=backend, embedding_model="hash-minilm", max_length=128,
                     is_recompute=(backend != "flat"), **kw)
    for c in chunks:
        b.add_text(c)
    b.build_index(prefix)
s = LeannSearcher(prefix)
queries, _ = make_queries(chunks, 8)
r = timed_searches(s, queries, top_k=3, complexity=32, beam_width=8)
peak_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
print(json.dumps({{"peak_rss_mb": peak_kb / 1024, "p50_ms": r["p50_ms"]}}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-chunks", type=int, default=500)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tmp = tempfile.mkdtemp(prefix="leann_rss_")
    out = {}
    for backend in ("flat", "hnsw"):
        code = BODY.format(repo=repo, backend=backend, tmp=tmp, n_chunks=args.n_chunks)
        proc = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, timeout=1200)
        if proc.returncode != 0:
            print(f"{backend} failed:\n{proc.stderr[-2000:]}", file=sys.stderr)
            continue
        stats = json.loads(proc.stdout.strip().splitlines()[-1])
        stats["index_bytes"] = index_size_bytes(os.path.join(tmp, backend + ".leann"), backend)
        out[backend] = stats
        print(f"{backend:6s} index={stats['index_bytes'] / 1e6:7.2f}MB "
              f"peak_rss={stats['peak_rss_mb']:7.1f}MB p50={stats['p50_ms']:.1f}ms")
    if "flat" in out and "hnsw" in out:
        savings = 1 - out["hnsw"]["index_bytes"] / out["flat"]["index_bytes"]
        print(f"storage savings vs flat: {savings:.1%}")
        out["storage_savings"] = round(savings, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
