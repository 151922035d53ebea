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
