"""Smoke test for bench.py's scale-tier measurement (measure_scale_tier):
assemble a miniature tier dir with the same artifact contract the resumable
scale build writes (index + queries.json + truth.npy + emb_norm.npy), then
check the recall curve / perturbed protocol / storage keys come out sane.
Runs on the CPU conftest mesh — the real tiers are 10M/20M on TPU."""

import json
import os
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (ROOT, os.path.join(ROOT, "benchmarks")):
    if p not in sys.path:
        sys.path.insert(0, p)

import bench  # noqa: E402
from scale_10m import host_oracle  # noqa: E402
from scale_500k import synth_corpus  # noqa: E402

from leann_tpu import LeannBuilder  # noqa: E402
from leann_tpu.embeddings.encoder import get_encoder  # noqa: E402


@pytest.fixture(scope="module")
def tiny_tier(tmp_path_factory):
    cache = tmp_path_factory.mktemp("bench_cache")
    tier = cache / "s_tiny"
    tier.mkdir()
    n = 1500
    rng = np.random.default_rng(0)
    chunks = synth_corpus(n, rng)
    enc = get_encoder("hash-minilm", max_length=64)
    emb = enc.encode(chunks)
    emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    np.save(tier / "emb_norm.npy", emb.astype(np.float32))

    q_idx = rng.choice(n, 16, replace=False)
    queries = [" ".join(chunks[i].split()[:12]) for i in q_idx]
    qv = enc.encode(queries)
    qv /= np.maximum(np.linalg.norm(qv, axis=1, keepdims=True), 1e-12)
    truth = host_oracle(emb, qv, 3)
    np.save(tier / "truth.npy", truth)
    json.dump(queries, open(tier / "queries.json", "w"))

    b = LeannBuilder(backend_name="diskann", embedding_model="hash-minilm",
                     max_length=64, distance_metric="cosine", graph_degree=16)
    b.build_index_from_embeddings(str(tier / "big10m.leann"),
                                  [str(i) for i in range(n)], emb, texts=chunks)
    return str(cache)


def test_measure_scale_tier_curve(tiny_tier, monkeypatch):
    monkeypatch.setattr(bench, "CACHE_DIR", tiny_tier)
    out = bench.measure_scale_tier("s_tiny", "tiny", points=((32, 16), (64, 32)))
    assert out["n_chunks_tiny"] == 1500
    # headline protocol is question-shaped (emb matrix present -> host oracle)
    assert out["recall_protocol_tiny"] == "question"
    curve = out["recall_curve_tiny"]
    assert [p["complexity"] for p in curve] == [32, 64]
    for p in curve:
        assert 0.0 <= p["recall_at_3"] <= 1.0
        assert p["tie_recall_at_3"] >= p["recall_at_3"] - 1e-9
        assert p["batched_ms_per_query"] > 0
    # question retrieval at 1.5K chunks should be easy for the graph
    assert out["recall_at_3_tiny"] >= 0.85
    assert out["tie_recall_at_3_tiny"] >= out["recall_at_3_tiny"] - 1e-9
    # diagnostics: prefix self-retrieval + perturbed protocol, both cached
    assert out["prefix_recall_at_3_tiny"] >= 0.9
    assert "perturbed_recall_at_3_tiny" in out
    assert os.path.exists(os.path.join(tiny_tier, "s_tiny", "truth_perturbed.npy"))
    assert os.path.exists(os.path.join(tiny_tier, "s_tiny", "truth_question.npy"))
    assert out["index_bytes_tiny"] < out["flat_baseline_bytes_tiny"]
    # JSON-serializable (the driver prints one JSON line)
    json.dumps(out)


def test_measure_scale_tier_skips_when_absent(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "CACHE_DIR", str(tmp_path))
    assert bench.measure_scale_tier("s10m", "10m") == {}


def test_make_queries_question_mode():
    from bench_common import make_queries

    chunks = synth_corpus(500, np.random.default_rng(3))
    q, idx = make_queries(chunks, 16, seed=7, mode="question")
    assert len(q) == 16
    for query, i in zip(q, idx):
        words = set(chunks[i].split())
        # entity words come from the WHOLE source chunk, wrapped in an NL
        # question shell; no verbatim-prefix tie
        assert len([w for w in query.split() if w in words]) >= 4
        assert not chunks[i].startswith(query)
    # deterministic given the seed
    q2, _ = make_queries(chunks, 16, seed=7, mode="question")
    assert q == q2


def test_merge_stale_tiers():
    out = {"recall_at_3_10m": 0.95, "batched_ms_per_query_10m": 30.0}
    prev = {
        "recall_at_3_10m": 0.90,  # measured this run -> NOT overwritten
        "recall_at_3_20m": 0.91, "index_bytes_20m": 123,  # absent -> merged
        "n_chunks_dpr": 2100000, "recall_at_3_dpr21m": 0.96,
        "trained_encoder_recall_at_3": 0.97,
        "recorded_at_utc": "2026-08-19T00:00:00Z",
        "tier_recorded_at_utc": {"20m": "2026-08-18T12:00:00Z"},
    }
    stale, stamps = bench.merge_stale_tiers(out, prev)
    assert out["recall_at_3_10m"] == 0.95  # fresh row kept
    assert out["recall_at_3_20m"] == 0.91 and out["index_bytes_20m"] == 123
    assert out["recall_at_3_dpr21m"] == 0.96 and out["n_chunks_dpr"] == 2100000
    assert out["trained_encoder_recall_at_3"] == 0.97
    assert sorted(stale) == ["20m", "dpr21m", "trained"]
    # stale rows carry their ORIGINAL timestamps; fresh rows get a new one
    assert stamps["20m"] == "2026-08-18T12:00:00Z"
    assert stamps["dpr21m"] == "2026-08-19T00:00:00Z"
    assert stamps["10m"] > "2026-08-19"


def test_merge_stale_tiers_no_prev():
    out = {"recall_at_3_10m": 0.95}
    stale, stamps = bench.merge_stale_tiers(out, {})
    assert stale == [] and set(stamps) == {"10m"}
