#!/usr/bin/env python
"""10M-chunk scale demonstration — the first waypoint toward the reference's
60M rpj_wiki headline (README.md:685-687: 201 GB flat -> 6 GB LEANN).

At this scale the build must stream: the f32 embedding matrix (~15 GB at
10M x 384) exceeds single-chip HBM, so graph candidates come from the
streamed multi-probe window pass (ops/graph.py spill_knn_streamed), pruning
runs against a bf16-only device copy, and the oracle is a host-blocked
matmul. Embeddings are computed ONCE and fed through
``build_index_from_embeddings(texts=...)`` (which still writes the token
store for on-chip recompute).

Reports one JSON line: build phase times, all-in index bytes vs the flat f32
baseline, recall@3 vs the exact oracle, single-query p50, batched ms/query.
"""

import argparse
import json
import logging
import os
import resource
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(1, os.path.dirname(os.path.abspath(__file__)))

from scale_500k import synth_corpus  # noqa: E402

from leann_tpu import LeannBuilder, LeannSearcher  # noqa: E402
from leann_tpu.embeddings.encoder import get_encoder  # noqa: E402


def host_oracle(emb_n: np.ndarray, qv: np.ndarray, k: int, block: int = 1 << 20) -> np.ndarray:
    """Exact cosine top-k by host-blocked matmul (the [N, D] matrix does not
    fit in HBM at this scale). emb_n and qv must both be L2-normalized."""
    nq = qv.shape[0]
    best_d = np.full((nq, k), -np.inf, np.float32)
    best_i = np.full((nq, k), -1, np.int64)
    for s in range(0, emb_n.shape[0], block):
        # block cast: f16 matrices matmul at f16 speed in numpy (no BLAS)
        sims = qv @ np.asarray(emb_n[s : s + block], dtype=np.float32).T  # [nq, block]
        cat_d = np.concatenate([best_d, sims], axis=1)
        cat_i = np.concatenate(
            [best_i, np.broadcast_to(np.arange(s, s + sims.shape[1]), sims.shape)], axis=1
        )
        top = np.argpartition(-cat_d, k - 1, axis=1)[:, :k]
        best_d = np.take_along_axis(cat_d, top, 1)
        best_i = np.take_along_axis(cat_i, top, 1)
    order = np.argsort(-best_d, axis=1)
    return np.take_along_axis(best_i, order, 1)


def rss_gb() -> float:
    """Process high-water RSS in GB — printed per phase so the growth point
    of the host footprint is attributable (the 10M f32 run peaked ~95 GB)."""
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20


def jload(path):
    """json.load that treats a truncated sidecar from a killed run as absent
    (resume must never crash on its own half-written artifacts)."""
    try:
        return json.load(open(path))
    except Exception:
        return None


def main():
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-chunks", type=int, default=10_000_000)
    ap.add_argument("--max-length", type=int, default=64)
    ap.add_argument("--graph-degree", type=int, default=24)
    ap.add_argument("--n-queries", type=int, default=64)
    ap.add_argument("--complexity", type=int, default=1024)
    ap.add_argument("--beam-width", type=int, default=16)
    ap.add_argument("--rerank-size", type=int, default=64)
    ap.add_argument("--out-dir", default="")
    # f16 halves every host-resident [N, D] (encode buffer, build input):
    # required beyond ~12M chunks on a 125 GB host; quality is bf16-matmul-
    # bound on device either way
    ap.add_argument("--emb-dtype", default="f32", choices=["f32", "f16"])
    # reverse-KNN prune candidates (ops/graph.py _augment_reverse_candidates):
    # the bidirectional-edge quality lever for spill-KNN graphs; prune cost
    # grows ~((C+rc)/C)^2, everything else unchanged
    ap.add_argument("--reverse-candidates", type=int, default=0)
    # index artifact name inside out_dir — a degree sweep writes its variant
    # (e.g. big10m_r48.leann) NEXT to the cached tier instead of clobbering
    # it; corpus/emb/oracle caches are shared either way, and passage/token
    # stores can be hardlinked across prefixes (the .done sidecars key on
    # content, not name)
    ap.add_argument("--prefix", default="big10m.leann")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    phases = {}
    out_dir = args.out_dir or tempfile.mkdtemp(prefix="leann_10m_")
    os.makedirs(out_dir, exist_ok=True)
    emb_path = os.path.join(out_dir, "emb_norm.npy")
    emb_meta = os.path.join(out_dir, "emb_norm.json")
    tpath = os.path.join(out_dir, "truth.npy")
    qpath = os.path.join(out_dir, "queries.json")

    t0 = time.time()
    # chunk cache: synth_corpus costs ~10 min at 10M and every supervisor
    # retry pays it before reaching the phase it actually resumes — the text
    # reloads ~10x faster than it regenerates. Queries must come from the
    # cache too (their rng draw happens AFTER synth_corpus consumed the
    # stream, so a cache hit can't reproduce it).
    cpath, cmeta = os.path.join(out_dir, "chunks.txt"), os.path.join(out_dir, "chunks.json")
    want_c = {"n": args.n_chunks, "gen": "synth_corpus_v1"}
    queries = None
    if os.path.exists(cpath) and jload(cmeta) == want_c and jload(qpath):
        chunks = open(cpath, encoding="utf-8").read().split("\n")[: args.n_chunks]
        queries = jload(qpath)
        print("resuming: corpus text from cache", flush=True)
    else:
        chunks = synth_corpus(args.n_chunks, rng)
        if args.out_dir:  # one-shot tmpdir runs skip the 2.7-26 GB write
            with open(cpath + ".tmp", "w", encoding="utf-8") as f:
                f.write("\n".join(chunks))
            os.replace(cpath + ".tmp", cpath)
            json.dump(want_c, open(cmeta, "w"))
    phases["corpus_s"] = round(time.time() - t0, 1)
    print(f"[{phases['corpus_s']}s] corpus: {len(chunks)} (rss {rss_gb():.1f} GB)", flush=True)

    enc = get_encoder("hash-minilm", max_length=args.max_length)
    # ---- encode + blockwise in-place normalize, persisted for resume ------
    # Multi-hour 10M+ runs die to tunnel wedges; every phase output lands in
    # out_dir so a rerun with the same --out-dir restarts where it stopped
    # (the graph build itself resumes via build_checkpoint_dir below). The
    # normalized matrix is reloaded as a read-only memmap either way: page
    # cache instead of 15-31 GB of anonymous RSS through the build.
    want = {"n": len(chunks), "dim": enc.cfg.dim, "dtype": args.emb_dtype,
            "max_length": args.max_length}
    resume = os.path.exists(emb_path) and jload(emb_meta) == want
    if resume:
        print(f"resuming: normalized embeddings from {emb_path}", flush=True)
        phases["encode_s"] = 0.0
    else:
        t0 = time.time()
        dt = np.float16 if args.emb_dtype == "f16" else np.float32
        emb = np.empty((len(chunks), enc.cfg.dim), dt)
        step = 1 << 20
        for st in range(0, len(chunks), step):
            emb[st : st + step] = enc.encode(
                chunks[st : st + step], batch_size=4096
            ).astype(dt)
            print(f"  encoded {min(st + step, len(chunks))}/{len(chunks)}", flush=True)
        blk = 1 << 20  # blockwise in-place normalize: no full-size temporaries
        for st in range(0, len(chunks), blk):
            b32 = emb[st : st + blk].astype(np.float32)
            nb = np.linalg.norm(b32, axis=1, keepdims=True)
            emb[st : st + blk] = (b32 / np.maximum(nb, 1e-12)).astype(emb.dtype)
        np.save(emb_path, emb)
        json.dump(want, open(emb_meta, "w"))
        del emb
        phases["encode_s"] = round(time.time() - t0, 1)
    emb = np.load(emb_path, mmap_mode="r")
    n_total, dim = emb.shape
    flat_bytes = n_total * dim * 4
    print(f"[{phases['encode_s']}s] encoded {emb.shape} {emb.dtype} (rss {rss_gb():.1f} GB)", flush=True)

    # ---- exact oracle (cached; keyed on the embedding meta too — truth from
    # an f32 run must not survive into an f16 rerun of the same out-dir) -----
    if queries is None:
        q_idx = rng.choice(len(chunks), args.n_queries, replace=False)
        queries = [" ".join(chunks[i].split()[:12]) for i in q_idx]
    tmeta = os.path.join(out_dir, "truth_meta.json")
    if os.path.exists(tpath) and jload(qpath) == queries and jload(tmeta) == want:
        truth = np.load(tpath)
        phases["oracle_s"] = 0.0
        print("resuming: oracle truth from cache", flush=True)
    else:
        t0 = time.time()
        qv = enc.encode(queries)
        qv /= np.maximum(np.linalg.norm(qv, axis=1, keepdims=True), 1e-12)
        truth = host_oracle(emb, qv, 3)
        phases["oracle_s"] = round(time.time() - t0, 1)
        np.save(tpath, truth)
        json.dump(queries, open(qpath, "w"))
        json.dump(want, open(tmeta, "w"))
    print(f"[{phases['oracle_s']}s] oracle done (rss {rss_gb():.1f} GB)", flush=True)

    prefix = os.path.join(out_dir, args.prefix)
    b = LeannBuilder(
        backend_name="diskann", embedding_model="hash-minilm",
        max_length=args.max_length, distance_metric="cosine",
        graph_degree=args.graph_degree,
        build_checkpoint_dir=os.path.join(out_dir, "ckpt"),
        reverse_candidates=args.reverse_candidates,
    )
    t0 = time.time()
    b.build_index_from_embeddings(prefix, [str(i) for i in range(len(chunks))], emb,
                                  texts=chunks)
    phases["build_s"] = round(time.time() - t0, 1)
    print(f"[{phases['build_s']}s] index built (rss {rss_gb():.1f} GB)", flush=True)
    del emb, chunks  # free before the searcher loads the index

    # all-in accounting (everything needed to search; text + derivable
    # caches excluded — storage.py index_all_in_bytes)
    from leann_tpu.storage import index_all_in_bytes

    idx_bytes = index_all_in_bytes(prefix)

    s = LeannSearcher(prefix)
    kw = dict(top_k=3, complexity=args.complexity, beam_width=args.beam_width,
              rerank_size=args.rerank_size, n_entries=128)
    s.search(queries[0], **kw)  # compile warmup
    lat, labels = [], []
    for q in queries[:32]:
        t0 = time.time()
        res = s.search(q, **kw)
        lat.append((time.time() - t0) * 1000)
        labels.append([int(r.id) for r in res])
    p50 = float(np.percentile(lat, 50))
    print(f"p50 {p50:.1f} ms", flush=True)

    s.search(queries, **kw)
    t0 = time.time()
    res_b = s.search(queries, **kw)
    batched = (time.time() - t0) * 1000 / len(queries)
    labels_b = [[int(r.id) for r in row] for row in res_b]
    print(f"batched {batched:.2f} ms/q", flush=True)

    def recall(lbls, tr):
        hits = sum(len(set(l) & set(t.tolist())) for l, t in zip(lbls, tr))
        return hits / (3 * len(lbls))

    # tie-aware recall: at 10M+ the synthetic corpus has near-duplicate
    # sibling chunks and 12-word prefix queries no longer discriminate among
    # them — the oracle's id set is arbitrary within similarity ties, so plain
    # id-recall under-reports the index (measured 0.66 at 10M while full-chunk
    # self-retrieval was 16/16). Standard ANN fix: a returned id is a hit when
    # its exact similarity reaches the oracle's 3rd-best, within eps.
    def tie_recall(lbls, tr, eps=1e-3):
        emb_n = np.load(emb_path, mmap_mode="r")
        enc_q = get_encoder("hash-minilm", max_length=args.max_length)
        qv2 = enc_q.encode([queries[i] for i in range(len(lbls))])
        qv2 /= np.maximum(np.linalg.norm(qv2, axis=1, keepdims=True), 1e-12)
        hits = total = 0
        for qi, row in enumerate(lbls):
            ids = np.asarray([int(x) for x in row])
            ids = ids[ids >= 0]  # padded/invalid labels count as misses
            floor = float(np.min(
                np.asarray(emb_n[np.sort(tr[qi])], np.float32) @ qv2[qi]))
            if len(ids):
                sims = np.asarray(emb_n[ids], np.float32) @ qv2[qi]
                hits += int((sims >= floor - eps).sum())
            total += len(row)
        return hits / max(total, 1)

    print(json.dumps({
        "n_chunks": n_total,
        **phases,
        "p50_ms": round(p50, 2),
        "batched_ms_per_query": round(batched, 2),
        "recall_at_3": round(recall(labels, truth[:32]), 4),
        "batched_recall_at_3": round(recall(labels_b, truth), 4),
        "tie_aware_recall_at_3": round(tie_recall(labels_b, truth), 4),
        "index_bytes": idx_bytes,
        "flat_baseline_bytes": flat_bytes,
        "storage_savings_vs_flat": round(1 - idx_bytes / flat_bytes, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
