"""Serving-layer micro-batcher tests (runtime/batcher.py).

The reference has no serving layer (its per-query path spawns an embedding
server subprocess, SURVEY.md §2.5); this is new TPU-native surface, so the
tests define the contract: coalescing, correctness vs direct search, parameter
isolation, error propagation, and clean shutdown.
"""

import os
import tempfile
import threading
import time

import pytest

from leann_tpu import BatchedSearcher, LeannBuilder, LeannSearcher


@pytest.fixture(scope="module")
def built_index(tmp_path_factory):
    docs = [
        ("machine learning is a subset of artificial intelligence", {"chapter": 1}),
        ("neural networks learn hierarchical representations from data", {"chapter": 2}),
        ("the solar system contains eight planets orbiting the sun", {"chapter": 3}),
        ("jupiter is the largest planet in the solar system", {"chapter": 4}),
        ("photosynthesis converts sunlight into chemical energy in plants", {"chapter": 5}),
        ("mitochondria are the powerhouse of the cell", {"chapter": 6}),
        ("the stock market fluctuates based on investor sentiment", {"chapter": 7}),
        ("compound interest grows savings exponentially over time", {"chapter": 8}),
    ]
    path = str(tmp_path_factory.mktemp("batcher") / "idx.leann")
    b = LeannBuilder(backend_name="hnsw", embedding_model="hash-tiny", max_length=32, M=4)
    for text, md in docs:
        b.add_text(text, metadata=md)
    b.build_index(path)
    return path


class TestBatchedSearcher:
    def test_matches_direct_search(self, built_index):
        direct = LeannSearcher(built_index, enable_warmup=False)
        want = direct.search("planets of the solar system", top_k=2, complexity=8, beam_width=2)
        with BatchedSearcher(built_index, max_batch=4, max_wait_ms=1.0,
                             enable_warmup=False) as bs:
            got = bs.search("planets of the solar system", top_k=2, complexity=8, beam_width=2)
        assert [r.id for r in got] == [r.id for r in want]

    def test_coalesces_concurrent_queries(self, built_index):
        queries = [
            "solar system planets", "neural networks data", "stock market investors",
            "photosynthesis energy", "jupiter largest planet", "compound interest savings",
            "machine learning intelligence", "mitochondria cell",
        ]
        with BatchedSearcher(built_index, max_batch=8, max_wait_ms=200.0,
                             enable_warmup=False) as bs:
            # warm the compiled shapes so the flush isn't serialized by compiles
            bs.search(queries[0], top_k=2, complexity=8, beam_width=2)
            results = {}

            def worker(q):
                results[q] = bs.search(q, top_k=2, complexity=8, beam_width=2)

            threads = [threading.Thread(target=worker, args=(q,)) for q in queries]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            batches, n_q = bs.batches_run, bs.queries_run
        assert n_q == len(queries) + 1
        # 8 concurrent queries with a 200ms window must land in far fewer
        # than 8 batches (>=7 of them coalesce after the warmup batch)
        assert batches <= 4, f"expected coalescing, got {batches} batches"
        direct = LeannSearcher(built_index, enable_warmup=False)
        for q in queries:
            want = [r.id for r in direct.search(q, top_k=2, complexity=8, beam_width=2)]
            assert [r.id for r in results[q]] == want

    def test_param_changes_do_not_mix(self, built_index):
        with BatchedSearcher(built_index, max_batch=8, max_wait_ms=50.0,
                             enable_warmup=False) as bs:
            f1 = bs.submit("solar system", top_k=1, complexity=8, beam_width=2)
            f2 = bs.submit("solar system", top_k=3, complexity=8, beam_width=2)
            r1, r2 = f1.result(timeout=120), f2.result(timeout=120)
        assert len(r1) == 1
        assert len(r2) == 3

    def test_error_propagates(self, built_index):
        with BatchedSearcher(built_index, max_batch=4, max_wait_ms=1.0,
                             enable_warmup=False) as bs:
            fut = bs.submit("anything", top_k=2, pruning_strategy="not-a-strategy")
            with pytest.raises(Exception):
                fut.result(timeout=120)

    def test_submit_after_close_raises(self, built_index):
        bs = BatchedSearcher(built_index, max_batch=2, max_wait_ms=1.0, enable_warmup=False)
        bs.close()
        with pytest.raises(RuntimeError):
            bs.submit("x", top_k=1)

    def test_accepts_existing_searcher(self, built_index):
        s = LeannSearcher(built_index, enable_warmup=False)
        with BatchedSearcher(s, max_batch=2, max_wait_ms=1.0) as bs:
            out = bs.search("mitochondria", top_k=1, complexity=8, beam_width=2)
        assert len(out) == 1
        # searcher not owned -> still usable
        assert s.search("mitochondria", top_k=1, complexity=8, beam_width=2)
