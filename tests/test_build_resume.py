"""Mid-build checkpoint/resume (ops/graph.py build_graph checkpoint_dir) and
the read-only-memmap embedding input path used by resumed scale runs.

The reference has no mid-build resume — its finished index is the only
checkpoint (SURVEY.md §5); multi-hour 10M+ builds over a tunneled TPU need
phase-level restarts."""

import json
import os

import numpy as np
import pytest


@pytest.fixture
def corpus(rng):
    centers = rng.standard_normal((16, 24)).astype(np.float32) * 3
    emb = centers[rng.integers(0, 16, 1500)] + rng.standard_normal((1500, 24)).astype(np.float32)
    return emb.astype(np.float32)


class TestBuildGraphCheckpoint:
    def test_resume_skips_phases_and_matches(self, corpus, tmp_path):
        from leann_tpu.ops.graph import build_graph

        ck = str(tmp_path / "ck")
        g1, m1 = build_graph(corpus, r=8, checkpoint_dir=ck)
        assert os.path.exists(os.path.join(ck, "ckpt_knn.npy"))
        assert os.path.exists(os.path.join(ck, "ckpt_pruned.npy"))

        # full resume: the pruned checkpoint short-circuits both phases
        g2, m2 = build_graph(corpus, r=8, checkpoint_dir=ck)
        assert m1 == m2
        np.testing.assert_array_equal(g1, g2)

        # knn-only resume: drop the pruned artifact, keep candidates
        os.remove(os.path.join(ck, "ckpt_pruned.npy"))
        g3, _ = build_graph(corpus, r=8, checkpoint_dir=ck)
        np.testing.assert_array_equal(g1, g3)

    def test_pq_prune_codes_checkpoint(self, corpus, tmp_path, monkeypatch):
        """The beyond-HBM PQ prune (20M+ path) checkpoints its trained
        codebook + corpus codes: a killed prune resumes without re-paying the
        train+encode dispatches (the round-4 20M kill-loop), and the resumed
        graph is bit-identical."""
        from leann_tpu.ops import graph as G

        monkeypatch.setattr(G, "PRUNE_EBF_MAX_BYTES", 1)  # force the PQ path
        ck = str(tmp_path / "ck")
        g1, m1 = G.build_graph(corpus, r=8, checkpoint_dir=ck)
        assert os.path.exists(os.path.join(ck, "ckpt_prune_codes.npy"))
        assert os.path.exists(os.path.join(ck, "ckpt_prune_codes.npy.cb.npy"))

        # drop the pruned-graph artifact: the rerun must resume from the
        # codes checkpoint (not retrain) and reproduce the same graph
        os.remove(os.path.join(ck, "ckpt_pruned.npy"))
        import leann_tpu.ops.pq as PQ

        calls = []
        orig = PQ.train_pq

        def spy(*a, **kw):
            calls.append(1)
            return orig(*a, **kw)

        # graph.py imports train_pq from .pq inside the prune block, so the
        # module-level patch is the one that intercepts
        monkeypatch.setattr(PQ, "train_pq", spy)
        g2, m2 = G.build_graph(corpus, r=8, checkpoint_dir=ck)
        assert not calls, "resume must not retrain the prune codebooks"
        assert m1 == m2
        np.testing.assert_array_equal(g1, g2)

    def test_stale_key_rejected(self, corpus, rng, tmp_path):
        """A checkpoint from a different corpus or different params must be
        ignored, never loaded."""
        from leann_tpu.ops.graph import build_graph

        ck = str(tmp_path / "ck")
        build_graph(corpus, r=8, checkpoint_dir=ck)

        other = corpus + rng.standard_normal(corpus.shape).astype(np.float32)
        g_other, _ = build_graph(other, r=8, checkpoint_dir=ck)
        g_fresh, _ = build_graph(other, r=8)
        np.testing.assert_array_equal(g_other, g_fresh)

        # param change (r) invalidates the pruned ckpt but keeps the knn one
        g_r6, _ = build_graph(corpus, r=6, checkpoint_dir=ck)
        g_r6_fresh, _ = build_graph(corpus, r=6)
        np.testing.assert_array_equal(g_r6, g_r6_fresh)

    def test_spill_scratch_renamed_into_checkpoint(self, corpus, tmp_path, monkeypatch):
        """When the KNN phase ran with disk-backed spill scratch, the output
        memmap is renamed into ckpt_knn.npy (no 15 GB copy at 60M) and the
        dead scratch files are removed."""
        from leann_tpu.ops import graph as G

        ck = str(tmp_path / "ck")
        monkeypatch.setattr(G, "EXACT_KNN_MAX_N", 100)   # force the spill path
        monkeypatch.setattr(G, "SPILL_MEMMAP_BYTES", 1)  # force disk scratch
        g1, m1 = G.build_graph(corpus, r=8, checkpoint_dir=ck)
        files = sorted(os.listdir(ck))
        assert "ckpt_knn.npy" in files and "ckpt_pruned.npy" in files
        assert not any(f.startswith("spill_") for f in files), files
        g2, m2 = G.build_graph(corpus, r=8, checkpoint_dir=ck)  # resume
        assert m1 == m2
        np.testing.assert_array_equal(g1, g2)

    def test_corrupt_checkpoint_ignored(self, corpus, tmp_path):
        from leann_tpu.ops.graph import build_graph

        ck = str(tmp_path / "ck")
        g1, _ = build_graph(corpus, r=8, checkpoint_dir=ck)
        with open(os.path.join(ck, "ckpt_pruned.npy"), "wb") as f:
            f.write(b"not an npy")
        g2, _ = build_graph(corpus, r=8, checkpoint_dir=ck)
        np.testing.assert_array_equal(g1, g2)


class TestMemmapEmbeddingInput:
    def test_prenormalized_readonly_memmap_build(self, rng, tmp_path):
        """build_index_from_embeddings over a read-only memmap of already-
        normalized f16 vectors (the resumed scale-run input): no crash on the
        in-place cosine normalize, searchable result."""
        from leann_tpu import LeannBuilder, LeannSearcher
        from leann_tpu.embeddings.encoder import get_encoder

        n = 600
        texts = [f"passage {i} topic {i % 9}" for i in range(n)]
        enc = get_encoder("hash-tiny", max_length=32)
        emb = enc.encode(texts)
        emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        p = tmp_path / "emb.npy"
        np.save(p, emb.astype(np.float16))
        mm = np.load(p, mmap_mode="r")
        assert not mm.flags.writeable

        idx = str(tmp_path / "mm.leann")
        b = LeannBuilder(backend_name="diskann", embedding_model="hash-tiny",
                         max_length=32, distance_metric="cosine", graph_degree=8,
                         build_checkpoint_dir=str(tmp_path / "ck"))
        b.build_index_from_embeddings(idx, [str(i) for i in range(n)], mm, texts=texts)

        s = LeannSearcher(idx)
        res = s.search(texts[42], top_k=3, complexity=32, beam_width=4)
        assert len(res) == 3

    def test_unit_norm_detection(self, rng):
        from leann_tpu.api import LeannBuilder

        e = rng.standard_normal((500, 16)).astype(np.float32)
        assert not LeannBuilder._is_unit_norm(e)
        e /= np.maximum(np.linalg.norm(e, axis=1, keepdims=True), 1e-12)
        assert LeannBuilder._is_unit_norm(e)
        assert LeannBuilder._is_unit_norm(e.astype(np.float16))


def test_ckpt_key_stride_sensitivity(rng):
    """The sampled content key must change when the corpus changes (including
    rows off the sample stride is not guaranteed, but shape/dtype and sampled
    content are)."""
    from leann_tpu.ops.graph import _ckpt_key

    a = rng.standard_normal((5000, 8)).astype(np.float32)
    k1 = _ckpt_key(a, "c16")
    assert _ckpt_key(a, "c16") == k1
    assert _ckpt_key(a, "c32") != k1
    b = a.copy()
    b[0, 0] += 1.0
    assert _ckpt_key(b, "c16") != k1
    assert _ckpt_key(a.astype(np.float16), "c16") != k1
