"""Sharded-searcher integration through the public API (8-device CPU mesh)."""

import numpy as np


class TestShardedBackendIntegration:
    def test_stored_mode_matches_unsharded(self, rng, tmp_path):
        from leann_tpu import LeannBuilder, LeannSearcher

        n, d = 512, 32
        emb = rng.standard_normal((n, d)).astype(np.float32)
        idx = str(tmp_path / "s.leann")
        b = LeannBuilder(backend_name="hnsw", embedding_mode="simulated", embedding_model="simulated",
                         distance_metric="l2", is_recompute=False, M=16)
        b.build_index_from_embeddings(idx, [str(i) for i in range(n)], emb)

        plain = LeannSearcher(idx)
        shard = LeannSearcher(idx, sharded=True)
        for i in (0, 7, 100):
            r1 = plain.search(emb[i], top_k=5, complexity=32, beam_width=4, recompute_embeddings=False)
            r2 = shard.search(emb[i], top_k=5, complexity=32, beam_width=4, recompute_embeddings=False)
            assert [x.id for x in r1] == [x.id for x in r2]

    def test_recompute_sharded_e2e(self, tiny_corpus, tmp_path):
        from leann_tpu import LeannBuilder, LeannSearcher

        idx = str(tmp_path / "sr.leann")
        b = LeannBuilder(backend_name="hnsw", embedding_model="hash-tiny", embedding_mode="tpu",
                         max_length=32, M=4)
        for text, md in tiny_corpus * 2:  # 24 rows -> 3 per shard
            b.add_text(text, metadata=md)
        b.build_index(idx)
        s = LeannSearcher(idx, sharded=True)
        res = s.search("the largest planet jupiter", top_k=3, complexity=8, beam_width=2)
        assert len(res) == 3
        assert any("jupiter" in r.text or "planet" in r.text for r in res)


class TestDiskannShardedRelayout:
    def test_relayout_and_sharded_search(self, tiny_corpus, tmp_path):
        """LDG relayout keeps results correct; sharded diskann (PQ traversal +
        distributed rerank) works through the public API."""
        import numpy as np

        from leann_tpu import LeannBuilder, LeannSearcher

        idx = str(tmp_path / "dr.leann")
        b = LeannBuilder(backend_name="diskann", embedding_model="hash-tiny", embedding_mode="tpu",
                         max_length=32, graph_degree=4, num_partitions=8, partition_passes=3)
        for text, md in tiny_corpus * 2:
            b.add_text(text, metadata=md)
        b.build_index(idx)
        from leann_tpu.storage import load_partition

        assign = load_partition(idx)
        assert (np.diff(assign) >= 0).all(), "relayout must make partitions contiguous"

        plain = LeannSearcher(idx)
        r1 = plain.search("jupiter is the largest planet in the solar system", top_k=3, complexity=12)
        assert any("jupiter" in r.text or "planet" in r.text for r in r1)

        shard = LeannSearcher(idx, sharded=True)
        r2 = shard.search("jupiter is the largest planet in the solar system", top_k=3, complexity=12)
        assert any("jupiter" in r.text or "planet" in r.text for r in r2)


class TestShardedGlobalPruningApproximation:
    """'global' pruning on the mesh is approximated by the union of
    per-device top-``keep_local`` ADC picks (parallel/sharded_search.py
    recompute_local). This pins the recall cost of that approximation vs the
    single-chip true global selection on an adversarial corpus: 64 tight
    sibling clusters laid out CONTIGUOUSLY, so each cluster (and with it a
    query's entire true candidate set) lives wholly on one of the 8 block
    shards while the per-device budget splits 8 ways. Measured divergence:
    sharded is within ~1 recall point of single-chip everywhere, and often
    above it (the union can cover more of the pool)."""

    def test_union_pruning_within_one_point_of_global(self, tmp_path):
        import json
        import os

        import numpy as np

        from leann_tpu import LeannBuilder, LeannSearcher
        from leann_tpu.embeddings.encoder import get_encoder

        rng = np.random.default_rng(0)
        words = [f"w{i}" for i in range(500)]
        texts = [
            f"cluster {c} member {m} " + " ".join(rng.choice(words, 6))
            for c in range(64) for m in range(16)
        ]
        idx = str(tmp_path / "adv.leann")
        b = LeannBuilder(backend_name="hnsw", embedding_model="hash-tiny",
                         max_length=32, M=8)
        for t in texts:
            b.add_text(t)
        b.build_index(idx)

        enc = get_encoder("hash-tiny", max_length=32)
        emb = enc.encode(texts)
        qs = [f"cluster {c} member 3" for c in range(0, 64, 2)]
        qe = enc.encode(qs)
        metric = json.load(open(idx + ".meta.json"))["distance_metric"]
        if metric == "cosine":
            emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
            qe = qe / np.maximum(np.linalg.norm(qe, axis=1, keepdims=True), 1e-12)
        truth = np.argsort(-qe @ emb.T, axis=1)[:, :3]

        def rec(labels):
            return sum(len(set(a) & set(t.tolist())) for a, t in zip(labels, truth)) / (3 * len(labels))

        s1 = LeannSearcher(idx)
        s8 = LeannSearcher(idx, sharded=True)
        # harshest measured operating point (pr=.95/bw=16) diverges ~1 point;
        # the milder ones put sharded ABOVE single
        for pr, bw in [(0.75, 8), (0.95, 16)]:
            kw = dict(top_k=3, complexity=64, beam_width=bw,
                      prune_ratio=pr, pruning_strategy="global")
            r1 = rec([[int(r.id) for r in row] for row in s1.search(qs, **kw)])
            r8 = rec([[int(r.id) for r in row] for row in s8.search(qs, **kw)])
            assert r8 >= r1 - 0.011, f"pr={pr} bw={bw}: sharded {r8} vs single {r1}"
