"""Core API + registry + metadata filter unit tests (reference test strategy:
tests/test_ci_minimal.py, tests/test_metadata_filtering.py)."""

import json
import pickle

import numpy as np
import pytest


def test_imports_and_registry():
    import leann_tpu
    from leann_tpu.registry import get_registered_backends

    backends = get_registered_backends()
    assert "flat" in backends
    assert "hnsw" in backends
    assert "diskann" in backends
    assert hasattr(leann_tpu, "LeannBuilder")


class TestMetadataFilter:
    def setup_method(self):
        from leann_tpu.metadata_filter import MetadataFilterEngine

        self.engine = MetadataFilterEngine()
        self.items = [
            {"id": "1", "text": "a", "metadata": {"chapter": 1, "author": "austen", "tags": ["classic"], "published": True}},
            {"id": "2", "text": "b", "metadata": {"chapter": 5, "author": "tolkien", "tags": ["fantasy"], "published": False}},
            {"id": "3", "text": "c", "metadata": {"chapter": "7", "author": "austen", "tags": [], "published": True}},
        ]

    def test_eq_ne(self):
        assert [r["id"] for r in self.engine.apply_filters(self.items, {"author": {"==": "austen"}})] == ["1", "3"]
        assert [r["id"] for r in self.engine.apply_filters(self.items, {"author": {"!=": "austen"}})] == ["2"]

    def test_ordering_with_coercion(self):
        # chapter "7" (string) must compare numerically
        assert [r["id"] for r in self.engine.apply_filters(self.items, {"chapter": {"<=": 5}})] == ["1", "2"]
        assert [r["id"] for r in self.engine.apply_filters(self.items, {"chapter": {">": 4}})] == ["2", "3"]

    def test_in_not_in(self):
        assert [r["id"] for r in self.engine.apply_filters(self.items, {"author": {"in": ["austen"]}})] == ["1", "3"]
        assert [r["id"] for r in self.engine.apply_filters(self.items, {"author": {"not_in": ["austen"]}})] == ["2"]

    def test_contains_startswith_endswith(self):
        assert [r["id"] for r in self.engine.apply_filters(self.items, {"tags": {"contains": "classic"}})] == ["1"]
        assert [r["id"] for r in self.engine.apply_filters(self.items, {"author": {"starts_with": "tol"}})] == ["2"]
        assert [r["id"] for r in self.engine.apply_filters(self.items, {"author": {"ends_with": "en"}})] == ["1", "2", "3"]

    def test_bool_ops(self):
        assert [r["id"] for r in self.engine.apply_filters(self.items, {"published": {"is_true": True}})] == ["1", "3"]
        assert [r["id"] for r in self.engine.apply_filters(self.items, {"published": {"is_false": True}})] == ["2"]

    def test_compound_and(self):
        got = self.engine.apply_filters(self.items, {"author": {"==": "austen"}, "chapter": {"<": 3}})
        assert [r["id"] for r in got] == ["1"]

    def test_top_level_field_priority(self):
        assert [r["id"] for r in self.engine.apply_filters(self.items, {"id": {"==": "2"}})] == ["2"]

    def test_missing_field_excludes(self):
        assert self.engine.apply_filters(self.items, {"nope": {"==": 1}}) == []

    def test_unknown_operator_raises(self):
        with pytest.raises(ValueError):
            self.engine.apply_filters(self.items, {"chapter": {"~=": 3}})


class TestTokenizer:
    def test_deterministic_across_instances(self):
        from leann_tpu.embeddings.tokenizer import HashTokenizer

        t1, t2 = HashTokenizer(), HashTokenizer()
        ids1, m1 = t1.encode("Hello, TPU world! 123")
        ids2, m2 = t2.encode("Hello, TPU world! 123")
        np.testing.assert_array_equal(ids1, ids2)
        np.testing.assert_array_equal(m1, m2)
        assert m1.sum() >= 4

    def test_padding_and_truncation(self):
        from leann_tpu.embeddings.tokenizer import HashTokenizer

        t = HashTokenizer(max_length=8)
        ids, mask = t.encode("one two three four five six seven eight nine ten")
        assert ids.shape == (8,) and mask.sum() == 8

    def test_cjk(self):
        from leann_tpu.embeddings.tokenizer import HashTokenizer

        t = HashTokenizer()
        ids, mask = t.encode("机器学习")
        assert mask.sum() == 6  # CLS + 4 chars + SEP


class TestEncoder:
    def test_shapes_and_determinism(self):
        from leann_tpu.embeddings.encoder import get_encoder

        enc = get_encoder("hash-tiny")
        e1 = enc.encode(["machine learning", "the solar system"])
        e2 = enc.encode(["machine learning", "the solar system"])
        assert e1.shape == (2, 64)
        np.testing.assert_allclose(e1, e2, atol=1e-6)
        # normalized model -> unit norm
        np.testing.assert_allclose(np.linalg.norm(e1, axis=1), 1.0, atol=1e-3)

    def test_batch_independence(self):
        from leann_tpu.embeddings.encoder import get_encoder

        enc = get_encoder("hash-tiny")
        a = enc.encode(["alpha beta gamma"])
        b = enc.encode(["alpha beta gamma", "totally different text here"])
        np.testing.assert_allclose(a[0], b[0], atol=1e-4)


class TestSimulatedEmbeddings:
    def test_lexical_overlap_is_closer(self):
        from leann_tpu.embeddings.compute import simulated_embeddings

        e = simulated_embeddings(
            ["the solar system has planets", "planets orbit in the solar system", "bank interest rates rose"],
            dim=64,
        )
        sim_close = e[0] @ e[1]
        sim_far = e[0] @ e[2]
        assert sim_close > sim_far


class TestBuilderSearcherFlat:
    def test_end_to_end(self, tiny_corpus, tmp_path):
        from leann_tpu import LeannBuilder, LeannSearcher

        idx = str(tmp_path / "demo.leann")
        b = LeannBuilder(backend_name="flat", embedding_mode="simulated", embedding_model="simulated", dimensions=64)
        for text, md in tiny_corpus:
            b.add_text(text, metadata=md)
        b.build_index(idx)

        s = LeannSearcher(idx)
        res = s.search("largest planet in the solar system", top_k=3)
        assert len(res) == 3
        assert any("jupiter" in r.text for r in res)
        assert all(r.metadata for r in res)

    def test_metadata_filters(self, tiny_corpus, tmp_path):
        from leann_tpu import LeannBuilder, LeannSearcher

        idx = str(tmp_path / "demo2.leann")
        b = LeannBuilder(backend_name="flat", embedding_mode="simulated", embedding_model="simulated", dimensions=64)
        for text, md in tiny_corpus:
            b.add_text(text, metadata=md)
        b.build_index(idx)
        s = LeannSearcher(idx)
        res = s.search("solar system planets", top_k=8, metadata_filters={"topic": {"==": "space"}})
        assert res and all(r.metadata["topic"] == "space" for r in res)

    def test_meta_and_passages_files(self, tiny_corpus, tmp_path):
        from leann_tpu import LeannBuilder

        idx = str(tmp_path / "demo3.leann")
        b = LeannBuilder(backend_name="flat", embedding_mode="simulated", embedding_model="simulated", dimensions=32)
        for text, md in tiny_corpus:
            b.add_text(text, metadata=md)
        b.build_index(idx)
        meta = json.loads((tmp_path / "demo3.leann.meta.json").read_text())
        assert meta["backend_name"] == "flat"
        assert meta["num_chunks"] == len(tiny_corpus)
        with open(idx + ".passages.idx", "rb") as f:
            offsets = pickle.load(f)
        assert len(offsets) == len(tiny_corpus)

    def test_build_from_embeddings(self, tmp_path, rng):
        from leann_tpu import LeannBuilder, LeannSearcher

        n, d = 50, 32
        emb = rng.standard_normal((n, d)).astype(np.float32)
        ids = [f"p{i}" for i in range(n)]
        idx = str(tmp_path / "pre.leann")
        b = LeannBuilder(backend_name="flat", embedding_mode="simulated", embedding_model="simulated",
                         distance_metric="l2")
        b.build_index_from_embeddings(idx, ids, emb)
        s = LeannSearcher(idx)
        res = s.search(emb[7], top_k=1)
        assert res[0].id == "p7"

    def test_chat_simulated(self, tiny_corpus, tmp_path):
        from leann_tpu import LeannBuilder, LeannChat

        idx = str(tmp_path / "chat.leann")
        b = LeannBuilder(backend_name="flat", embedding_mode="simulated", embedding_model="simulated", dimensions=64)
        for text, md in tiny_corpus:
            b.add_text(text, metadata=md)
        b.build_index(idx)
        chat = LeannChat(idx, llm_config={"type": "simulated"})
        answer = chat.ask("what is the largest planet?", top_k=2)
        assert "simulated" in answer and "planet" in answer.lower()


class TestBatchedQueries:
    def test_batched_text_search(self, tiny_corpus, tmp_path):
        from leann_tpu import LeannBuilder, LeannSearcher

        idx = str(tmp_path / "batch.leann")
        b = LeannBuilder(backend_name="hnsw", embedding_model="hash-tiny", embedding_mode="tpu",
                         max_length=32, M=4)
        for text, md in tiny_corpus:
            b.add_text(text, metadata=md)
        b.build_index(idx)
        s = LeannSearcher(idx)
        res = s.search(
            ["jupiter is the largest planet in the solar system",
             "the stock market fluctuates based on investor sentiment"],
            top_k=3, complexity=12, beam_width=2,
        )
        assert isinstance(res, list) and len(res) == 2
        assert all(isinstance(row, list) and len(row) == 3 for row in res)
        assert any("planet" in r.text or "jupiter" in r.text for r in res[0])
        assert any("market" in r.text or "investor" in r.text for r in res[1])

    def test_batched_vector_search(self, tiny_corpus, tmp_path, rng):
        from leann_tpu import LeannBuilder, LeannSearcher
        import numpy as np

        n, d = 40, 16
        emb = rng.standard_normal((n, d)).astype(np.float32)
        idx = str(tmp_path / "batchv.leann")
        b = LeannBuilder(backend_name="flat", embedding_mode="simulated", embedding_model="simulated",
                         distance_metric="l2")
        b.build_index_from_embeddings(idx, [str(i) for i in range(n)], emb)
        s = LeannSearcher(idx)
        res = s.search(emb[:3], top_k=1)
        assert len(res) == 3 and [r[0].id for r in res] == ["0", "1", "2"]


class TestPackedResults:
    def test_roundtrip_exact_bits(self, rng):
        import jax.numpy as jnp

        from leann_tpu.ops.beam_search import pack_results, unpack_results

        labels = rng.integers(-1, 2**31 - 1, size=(4, 7), dtype=np.int32)
        dists = rng.standard_normal((4, 7)).astype(np.float32)
        dists[0, 0] = 3.4e38  # INF sentinel must survive the bitcast
        dists[1, 2] = 1e-42  # denormal payload too
        packed = pack_results(jnp.asarray(labels), jnp.asarray(dists))
        assert packed.dtype == jnp.int32 and packed.shape == (4, 14)
        out_l, out_d = unpack_results(packed)
        np.testing.assert_array_equal(out_l, labels)
        np.testing.assert_array_equal(out_d.view(np.int32), dists.view(np.int32))
