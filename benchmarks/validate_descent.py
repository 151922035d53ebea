#!/usr/bin/env python
"""Candidate-recall validation for approximate KNN generators, against a
SAMPLED exact oracle (ops/graph.py exact_knn_rows: O(S·N·D), so the oracle
stays cheap at any corpus size — 2048 rows at 60M × 384 is under a minute of
MXU time).

Why this exists: candidate quality is the whole ballgame for graph builds —
the spill window/cluster heuristic measured 13% candidate recall at 10M and
the index built on it recalled 0.66 no matter the search budget (docs/
roadmap.md). The roadmap's beyond-exact plan (cluster-bootstrapped
NN-descent, LEANN_KNN_MODE=descent) must therefore be validated with a
measured candidate recall BEFORE an index is built on it. This script is
that gate. The reference has no counterpart: its candidate generation is
faiss/DiskANN C++ inserts (reference hnsw_backend.py:83-89) that never face
the beyond-HBM regime.

Usage (tier with persisted normalized embeddings, e.g. the DPR cache):
  python benchmarks/validate_descent.py --out-dir ~/.cache/leann_tpu_bench/dpr21m_r32
Fresh synthetic corpus (encodes first):
  python benchmarks/validate_descent.py --n-chunks 500000

Prints one JSON line: generator timing + candidate recall@k / @10 on the
sampled rows (recall@10 is the number the α-prune actually cares about —
the closest neighbors dominate the pruned graph).
"""

import argparse
import json
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(1, os.path.dirname(os.path.abspath(__file__)))


def load_or_encode(args):
    """Normalized [N, D] matrix: a tier's persisted emb_norm.npy (memmapped)
    when --out-dir has one, else synth + encode like benchmarks/scale_10m.py."""
    if args.out_dir:
        p = os.path.join(os.path.expanduser(args.out_dir), "emb_norm.npy")
        if os.path.exists(p):
            emb = np.load(p, mmap_mode="r")
            print(f"loaded {emb.shape} {emb.dtype} from {p}", flush=True)
            return emb
        raise SystemExit(f"no emb_norm.npy in {args.out_dir}")
    from scale_500k import synth_corpus

    from leann_tpu.embeddings.encoder import get_encoder

    chunks = synth_corpus(args.n_chunks, np.random.default_rng(0))
    enc = get_encoder("hash-minilm", max_length=args.max_length)
    emb = enc.encode(chunks, batch_size=4096).astype(np.float32)
    emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    return emb


def main():
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="", help="tier dir with emb_norm.npy")
    ap.add_argument("--n-chunks", type=int, default=500_000)
    ap.add_argument("--max-length", type=int, default=64)
    ap.add_argument("--k", type=int, default=64, help="candidate list width")
    ap.add_argument("--sample", type=int, default=2048)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--n-iters", type=int, default=16)
    ap.add_argument("--mode", default="descent", choices=["descent", "spill"])
    ap.add_argument("--save-cands", default="",
                    help="persist candidate ids (npy) for an offline build")
    ap.add_argument("--from-state", action="store_true",
                    help="score the tier dir's nd_state_i.npy descent "
                         "checkpoint as-is (time-boxed runs: a killed descent "
                         "leaves resumable state — this measures the recall "
                         "it had reached without running more rounds)")
    args = ap.parse_args()

    from leann_tpu.ops.graph import exact_knn_rows, nn_descent, spill_knn_streamed

    emb = load_or_encode(args)
    n = emb.shape[0]

    # spill scratch + the [N,k] outputs go to memmaps in the tier dir when we
    # have one (at 10M+ the in-RAM alternative adds several GB of RSS on the
    # 1-core host, next to the memmapped tier matrix)
    scratch = os.path.expanduser(args.out_dir) if args.out_dir else ""
    t0 = time.time()
    state_iter = None
    if args.from_state:
        sp = os.path.join(scratch, "nd_state_i.npy")
        mp = os.path.join(scratch, "nd_state.json")
        if not os.path.exists(sp):
            raise SystemExit(f"--from-state: no {sp}")
        cand = np.load(sp, mmap_mode="r")[:n]
        args.k = int(cand.shape[1])  # the oracle/denominator follow the state
        if os.path.exists(mp):
            state_iter = json.load(open(mp)).get("iter")
        print(f"scoring checkpointed descent state (iter {state_iter})", flush=True)
    elif args.mode == "descent":
        cand, _ = nn_descent(emb, args.k, n_iters=args.n_iters,
                             checkpoint_dir=scratch)
    else:
        cand, _ = spill_knn_streamed(emb, args.k, scratch_dir=scratch)
    gen_s = time.time() - t0
    print(f"{args.mode} candidates in {gen_s:.1f}s", flush=True)
    if args.save_cands:
        np.save(args.save_cands, cand)

    rng = np.random.default_rng(args.seed)
    rows = np.sort(rng.choice(n, min(args.sample, n), replace=False))
    t0 = time.time()
    ex_i, _ = exact_knn_rows(emb, rows, args.k)
    oracle_s = time.time() - t0

    hits_k = hits_10 = 0
    k10 = min(10, args.k)
    for r, ex in zip(rows, ex_i):
        got = set(int(x) for x in cand[r] if x >= 0)
        truth = [int(x) for x in ex if x >= 0]
        hits_k += len(got & set(truth))
        hits_10 += len(got & set(truth[:k10]))
    out = {
        "mode": args.mode + ("" if state_iter is None else f"@iter{state_iter}"),
        "n": int(n),
        "k": args.k,
        "sample_rows": int(len(rows)),
        "gen_s": round(gen_s, 1),
        "oracle_s": round(oracle_s, 1),
        "cand_recall_at_k": round(hits_k / (args.k * len(rows)), 4),
        "cand_recall_at_10": round(hits_10 / (k10 * len(rows)), 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
