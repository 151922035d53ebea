#!/usr/bin/env python
"""Peak-memory comparison: flat (stored embeddings) vs hnsw (compact,
recompute) vs diskann (PQ traversal + rerank), each in an isolated
subprocess — parity with the reference's compare_faiss_vs_leann.py:56-80,
which measures peak RSS per backend the same way.

Per backend we report:
  * host peak RSS (ru_maxrss of the child process), with per-stage
    checkpoints (imports -> corpus -> build -> search)
  * device HBM high-water via jax.local_devices()[0].memory_stats() when the
    platform exposes it (bytes_in_use peak)

Usage: python benchmarks/memory_profile.py            # parent: run all
       python benchmarks/memory_profile.py --child M  # internal
"""

import argparse
import json
import os
import resource
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODES = ("flat", "hnsw", "diskann")


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0  # linux: KB


def hbm_peak_mb():
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats() or {}
        for key in ("peak_bytes_in_use", "bytes_in_use"):
            if key in stats:
                return stats[key] / 1e6
    except Exception:
        pass
    return None


def load_chunks(n=1000):
    path = "/root/reference/data/PrideandPrejudice.txt"
    if not os.path.exists(path):
        import numpy as np

        rng = np.random.default_rng(0)
        words = [f"w{i}" for i in range(5000)]
        return [" ".join(rng.choice(words, 40)) for _ in range(n)]
    text = open(path, encoding="utf-8").read()
    return [p.strip().replace("\n", " ") for p in text.split("\n\n") if len(p.strip()) > 60][:n]


def run_child(mode: str):
    stages = {"start": rss_mb()}
    from leann_tpu import LeannBuilder, LeannSearcher

    stages["imports"] = rss_mb()
    chunks = load_chunks()
    stages["corpus"] = rss_mb()

    tmp = tempfile.mkdtemp(prefix=f"leann_mem_{mode}_")
    idx = os.path.join(tmp, f"{mode}.leann")
    kw = {
        "flat": dict(backend_name="flat"),
        "hnsw": dict(backend_name="hnsw", M=16),
        "diskann": dict(backend_name="diskann", graph_degree=16),
    }[mode]
    b = LeannBuilder(embedding_model="hash-minilm", max_length=128, **kw)
    for c in chunks:
        b.add_text(c)
    b.build_index(idx)
    stages["build"] = rss_mb()

    s = LeannSearcher(idx)
    skw = dict(top_k=3, complexity=64, beam_width=8)
    if mode == "diskann":
        skw["rerank_size"] = 32
    elif mode == "hnsw":
        # PQ-screened per-hop recompute: the realistic configuration, and a
        # far smaller XLA program than unpruned full-fanout recompute (which
        # can take >15 min to compile cold through the remote-compile tunnel)
        skw["prune_ratio"] = 0.75
    for q in chunks[:16]:
        s.search(" ".join(q.split()[:12]), **skw)
    stages["search"] = rss_mb()

    index_bytes = sum(
        os.path.getsize(os.path.join(tmp, f))
        for f in os.listdir(tmp)
        if ".passages." not in f
    )
    print("RESULT " + json.dumps({
        "mode": mode,
        "peak_rss_mb": round(max(stages.values()), 1),
        "stages_mb": {k: round(v, 1) for k, v in stages.items()},
        "hbm_peak_mb": hbm_peak_mb(),
        "index_bytes": index_bytes,
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", choices=MODES)
    ap.add_argument("--modes", nargs="+", default=list(MODES), choices=MODES)
    args = ap.parse_args()
    if args.child:
        run_child(args.child)
        return

    results = {}
    for mode in args.modes:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", mode],
            capture_output=True, text=True, timeout=1200,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        line = next((ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT ")), None)
        if proc.returncode != 0 or line is None:
            results[mode] = {"error": proc.stderr[-500:]}
            continue
        results[mode] = json.loads(line[len("RESULT "):])

    print(f"{'backend':9s} {'peak RSS MB':>12s} {'HBM peak MB':>12s} {'index bytes':>12s}")
    for mode, r in results.items():
        if "error" in r:
            print(f"{mode:9s} FAILED: {r['error'][:80]}")
            continue
        hbm = f"{r['hbm_peak_mb']:.0f}" if r.get("hbm_peak_mb") else "n/a"
        print(f"{mode:9s} {r['peak_rss_mb']:12.1f} {hbm:>12s} {r['index_bytes']:12d}")
    print(json.dumps({"results": results}))


if __name__ == "__main__":
    main()
