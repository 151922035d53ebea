#!/usr/bin/env python
"""Recall@k + latency evaluation harness.

Parity with the reference's benchmarks/run_evaluation.py:18-393: build an
index, search a query set at several complexities, and report recall@k
against exact flat ground truth plus average/percentile latency. The
reference pulls NQ-open eval data from HuggingFace (zero-egress here), so the
corpus is the Pride & Prejudice fixture (or synthetic) and queries come from
--query-mode: verbatim prefixes, perturbed windows, or the NL-question
protocols (bench_common.py) — the recall protocol (vs flat oracle over
identical embeddings, run_evaluation.py:358-367) is the same.

Usage: python benchmarks/run_evaluation.py [--n-chunks 1000] [--backend hnsw]
       [--top-k 3] [--complexities 16 32 64 120]
"""

import argparse
import json
import os
import tempfile

import numpy as np
from bench_common import ground_truth, load_corpus, make_queries, recall_at_k, timed_searches

from leann_tpu import LeannBuilder, LeannSearcher
from leann_tpu.embeddings.encoder import get_encoder


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-chunks", type=int, default=1000)
    ap.add_argument("--n-queries", type=int, default=32)
    ap.add_argument("--backend", default="hnsw", choices=["hnsw", "diskann"])
    ap.add_argument("--embedding-model", default="hash-minilm")
    ap.add_argument("--top-k", type=int, default=3)
    ap.add_argument("--complexities", type=int, nargs="+", default=[16, 32, 64, 120])
    ap.add_argument("--beam-width", type=int, default=8)
    ap.add_argument("--max-length", type=int, default=128)
    ap.add_argument("--graph-degree", type=int, default=16)
    ap.add_argument("--index-dir", default=None, help="reuse/build index here instead of a temp dir")
    ap.add_argument("--query-mode", default="prefix",
                    choices=["prefix", "perturbed", "question", "question_heldout"],
                    help="prefix: verbatim chunk prefixes (self-retrieval); perturbed: "
                         "held-out dropout/reorder/substitution queries; question: the "
                         "headline NL-question protocol (QUESTION_TEMPLATES over "
                         "whole-chunk entities); question_heldout: held-out templates + "
                         "sibling-paraphrased entities (synthetic corpora only — needs "
                         "the sibling-group markers)")
    args = ap.parse_args()

    chunks = load_corpus(args.n_chunks)
    queries, _ = make_queries(chunks, args.n_queries, mode=args.query_mode)
    enc = get_encoder(args.embedding_model, max_length=args.max_length)
    truth = ground_truth(enc, chunks, queries, args.top_k)

    d = args.index_dir or tempfile.mkdtemp(prefix="leann_eval_")
    prefix = os.path.join(d, "eval.leann")
    if not os.path.exists(prefix + ".meta.json"):
        bk = ({"M": args.graph_degree} if args.backend == "hnsw"
              else {"graph_degree": args.graph_degree})
        b = LeannBuilder(backend_name=args.backend, embedding_model=args.embedding_model,
                         max_length=args.max_length, **bk)
        for c in chunks:
            b.add_text(c)
        b.build_index(prefix)

    s = LeannSearcher(prefix)
    rows = []
    for comp in args.complexities:
        r = timed_searches(s, queries, top_k=args.top_k, complexity=comp, beam_width=args.beam_width)
        rec = recall_at_k(r["labels"], truth)
        rows.append({"complexity": comp, "recall": round(rec, 4),
                     "p50_ms": round(r["p50_ms"], 2), "p90_ms": round(r["p90_ms"], 2)})
        print(f"complexity={comp:4d}  recall@{args.top_k}={rec:.4f}  "
              f"p50={r['p50_ms']:.1f}ms  p90={r['p90_ms']:.1f}ms")
    print(json.dumps({"backend": args.backend, "n_chunks": len(chunks),
                      "query_mode": args.query_mode, "results": rows}))


if __name__ == "__main__":
    main()
