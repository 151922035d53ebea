"""Graph construction, PQ, and fused beam-search tests.

What the reference never had (SURVEY.md §4 takeaway): deterministic recall
harnesses vs brute force. Every graph test here asserts recall against the
flat oracle on the same embeddings.
"""

import numpy as np
import pytest


def _recall(pred, truth):
    hits = sum(len(set(p) & set(t)) for p, t in zip(pred, truth))
    return hits / (len(truth) * len(truth[0]))


def _brute_force(emb, q, k, metric="l2"):
    if metric in ("mips", "cosine"):
        d = -q @ emb.T
    else:
        d = ((q[:, None, :] - emb[None, :, :]) ** 2).sum(-1)
    return np.argsort(d, axis=1)[:, :k]


class TestKnn:
    def test_exact_knn_matches_numpy(self, rng):
        from leann_tpu.ops.graph import exact_knn

        emb = rng.standard_normal((200, 16)).astype(np.float32)
        ids, dists = exact_knn(emb, 5, query_block=64, tile=128)
        d = ((emb[:, None, :] - emb[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(d, np.inf)
        truth = np.argsort(d, axis=1)[:, :5]
        assert _recall(ids, truth) > 0.97  # bf16 matmul ties allowed

    def test_no_self_neighbors(self, rng):
        from leann_tpu.ops.graph import exact_knn

        emb = rng.standard_normal((100, 8)).astype(np.float32)
        ids, _ = exact_knn(emb, 4)
        assert not any(ids[i].tolist().count(i) for i in range(100))


class TestPQ:
    def test_adc_approximates_l2(self, rng):
        from leann_tpu.ops.pq import adc_distances, adc_lut, encode_pq_blocked, train_pq
        import jax.numpy as jnp

        emb = rng.standard_normal((2000, 32)).astype(np.float32)
        cb = train_pq(emb, m=8, n_iters=8)
        codes = encode_pq_blocked(emb, cb)
        q = emb[0]
        lut = adc_lut(jnp.asarray(q), jnp.asarray(cb), "l2")
        approx = np.asarray(adc_distances(jnp.asarray(codes[:100].astype(np.int32)), lut))
        exact = ((emb[:100] - q) ** 2).sum(-1)
        # rank correlation must be strong even if absolute values differ
        from scipy.stats import spearmanr  # noqa

        rho = spearmanr(approx, exact).correlation
        assert rho > 0.85

    def test_codes_shape_dtype(self, rng):
        from leann_tpu.ops.pq import encode_pq_blocked, train_pq

        emb = rng.standard_normal((500, 24)).astype(np.float32)
        cb = train_pq(emb, n_iters=4)
        codes = encode_pq_blocked(emb, cb)
        assert codes.dtype == np.uint8
        assert codes.shape == (500, cb.shape[0])


class TestOPQ:
    """OPQ (train_opq) lifted codebooks: f32[M, K, D], shape-polymorphic
    encode/lut, absolute-scale L2 ADC, recall >= plain PQ on rotated data."""

    def _aniso(self, rng, n=4000, d=32):
        # decaying spectrum rotated off-axis: plain PQ's worst case
        spec = np.exp(-np.arange(d) / 4.0)
        basis, _ = np.linalg.qr(rng.standard_normal((d, d)))
        return ((rng.standard_normal((n, d)) * spec) @ basis.T).astype(np.float32)

    def test_lifted_shapes_and_adc_scale(self, rng):
        import jax.numpy as jnp
        from leann_tpu.ops.pq import adc_distances, adc_lut, encode_pq_blocked, train_opq

        emb = self._aniso(rng)
        cb = train_opq(emb, m=8, n_iters=6, opq_iters=4, sample=2048)
        assert cb.shape == (8, 256, 32)  # lifted: last dim = D
        codes = encode_pq_blocked(emb, cb)
        assert codes.dtype == np.uint8 and codes.shape == (emb.shape[0], 8)
        q = emb[7]
        lut = adc_lut(jnp.asarray(q), jnp.asarray(cb), "l2")
        ad = np.asarray(adc_distances(jnp.asarray(codes[:200].astype(np.int32)), lut))
        # input-space reconstruction = sum_m B[m, code_m]; ADC must equal
        # ||q - recon||^2 exactly (up to fp) -> safe to pool with exact dists
        rec = np.sum(np.stack([cb[m][codes[:200, m]] for m in range(8)], 0), 0)
        true = ((q[None] - rec) ** 2).sum(-1)
        np.testing.assert_allclose(ad, true, rtol=1e-3, atol=1e-2)

    def test_opq_beats_plain_pq_on_anisotropic(self, rng):
        import jax.numpy as jnp
        from leann_tpu.ops.pq import adc_distances, adc_lut, encode_pq_blocked, train_opq, train_pq

        emb = self._aniso(rng)
        cb_p = train_pq(emb, m=8, n_iters=6, sample=2048)
        cb_o = train_opq(emb, m=8, n_iters=6, opq_iters=4, sample=2048)

        def recall10(cb):
            codes = encode_pq_blocked(emb, cb)
            hits = 0
            for qi in range(0, 200, 10):
                q = emb[qi]
                lut = adc_lut(jnp.asarray(q), jnp.asarray(cb), "l2")
                ad = np.asarray(adc_distances(jnp.asarray(codes.astype(np.int32)), lut))
                approx = set(np.argsort(ad)[:10].tolist())
                exact = set(np.argsort(((emb - q) ** 2).sum(-1))[:10].tolist())
                hits += len(approx & exact)
            return hits / 200

        assert recall10(cb_o) >= recall10(cb_p)

    def test_mips_lut_matches_reconstruction(self, rng):
        import jax.numpy as jnp
        from leann_tpu.ops.pq import adc_distances, adc_lut, encode_pq_blocked, train_opq

        emb = self._aniso(rng)
        cb = train_opq(emb, m=4, n_iters=4, opq_iters=3, sample=2048)
        codes = encode_pq_blocked(emb, cb)
        q = emb[3]
        lut = adc_lut(jnp.asarray(q), jnp.asarray(cb), "mips")
        ad = np.asarray(adc_distances(jnp.asarray(codes[:100].astype(np.int32)), lut))
        rec = np.sum(np.stack([cb[m][codes[:100, m]] for m in range(4)], 0), 0)
        np.testing.assert_allclose(ad, -(rec @ q), rtol=1e-3, atol=1e-3)


class TestGraphBuild:
    def test_graph_degree_and_validity(self, rng):
        from leann_tpu.ops.graph import build_graph

        emb = rng.standard_normal((300, 16)).astype(np.float32)
        g, medoid = build_graph(emb, r=8)
        assert g.shape == (300, 8)
        assert 0 <= medoid < 300
        valid = g[g >= 0]
        assert valid.max() < 300
        # every node keeps at least one edge
        assert (g >= 0).any(axis=1).all()


class TestBeamSearchStored:
    def test_recall_vs_bruteforce(self, rng):
        """Graph beam search with stored embeddings must recover ≥90% of true
        top-10 on random data (reference docs claim 95%+ for HNSW;
        docs/configuration-guide.md:92)."""
        from leann_tpu.ops.beam_search import BeamConfig, GraphData, beam_search_batch
        from leann_tpu.ops.graph import build_graph
        import jax.numpy as jnp

        n, d, k = 800, 24, 10
        emb = rng.standard_normal((n, d)).astype(np.float32)
        g, medoid = build_graph(emb, r=16)
        q = rng.standard_normal((8, d)).astype(np.float32)
        dummy = jnp.zeros((1, 1), jnp.float32)
        gd = GraphData(
            neighbors=jnp.asarray(g),
            entry_ids=jnp.asarray(np.asarray([medoid] + list(range(0, n, n // 8)), np.int32)),
            emb=jnp.asarray(emb),
            tokens=jnp.zeros((1, 1), jnp.int32),
            lengths=jnp.zeros((1,), jnp.int32),
            codes=jnp.zeros((1, 1), jnp.uint8),
            codebooks=dummy,
        )
        cfg = BeamConfig(metric="l2", k=k, complexity=64, beam=4, max_steps=64, traversal="stored")
        labels, dists, steps, _ = beam_search_batch(jnp.asarray(q), gd, cfg)
        truth = _brute_force(emb, q, k)
        rec = _recall(np.asarray(labels), truth)
        assert rec >= 0.9, f"recall {rec}"
        # distances must be sorted ascending
        dd = np.asarray(dists)
        assert (np.diff(dd, axis=1) >= -1e-4).all()


class TestAdaptiveSearch:
    """Two-phase batched search (beam_search_adaptive): exact result parity
    with the single-dispatch program — converged lanes are deterministic
    under the step cap, escalated lanes rerun at full budget."""

    def _graph(self, rng, n=600, d=16):
        from leann_tpu.ops.beam_search import GraphData
        from leann_tpu.ops.graph import build_graph
        import jax.numpy as jnp

        emb = rng.standard_normal((n, d)).astype(np.float32)
        g, medoid = build_graph(emb, r=8)
        gd = GraphData(
            neighbors=jnp.asarray(g),
            entry_ids=jnp.asarray(np.asarray([medoid], np.int32)),
            emb=jnp.asarray(emb),
            tokens=jnp.zeros((1, 1), jnp.int32),
            lengths=jnp.zeros((1,), jnp.int32),
            codes=jnp.zeros((1, 1), jnp.uint8),
            codebooks=jnp.zeros((1, 1), jnp.float32),
        )
        return emb, gd

    def test_parity_with_escalation(self, rng):
        from leann_tpu.ops.beam_search import BeamConfig, beam_search_adaptive, beam_search_batch
        import jax.numpy as jnp

        emb, gd = self._graph(rng)
        q = rng.standard_normal((16, emb.shape[1])).astype(np.float32)
        cfg = BeamConfig(metric="l2", k=5, complexity=32, beam=2, max_steps=64, traversal="stored")
        fl, fd, fs, fne = (np.asarray(x) for x in beam_search_batch(jnp.asarray(q), gd, cfg))
        assert fs.max() > 2, "fixture too easy: no lane would escalate"
        al, ad, asteps, ane = beam_search_adaptive(q, gd, cfg, first_steps=2)
        np.testing.assert_array_equal(al, fl)
        np.testing.assert_allclose(ad, fd, rtol=1e-6)
        np.testing.assert_array_equal(asteps, fs)  # escalated lanes report full-run telemetry
        np.testing.assert_array_equal(ane, fne)

    def test_no_escalation_and_passthrough(self, rng):
        from leann_tpu.ops.beam_search import BeamConfig, beam_search_adaptive, beam_search_batch
        import jax.numpy as jnp

        emb, gd = self._graph(rng)
        q = rng.standard_normal((8, emb.shape[1])).astype(np.float32)
        cfg = BeamConfig(metric="l2", k=5, complexity=32, beam=2, max_steps=64, traversal="stored")
        fl, _, fs, _ = (np.asarray(x) for x in beam_search_batch(jnp.asarray(q), gd, cfg))
        # cap above every lane's convergence step -> phase 2 never dispatched
        cap = int(fs.max()) + 1
        assert cap < cfg.max_steps
        al, _, _, _ = beam_search_adaptive(q, gd, cfg, first_steps=cap)
        np.testing.assert_array_equal(al, fl)
        # first_steps >= max_steps -> plain single dispatch
        al2, _, _, _ = beam_search_adaptive(q, gd, cfg, first_steps=cfg.max_steps)
        np.testing.assert_array_equal(al2, fl)

    def test_backend_kwarg(self, rng, tmp_path):
        from leann_tpu import LeannBuilder
        from leann_tpu.backends.hnsw.backend import HnswSearcher

        rng2 = np.random.default_rng(11)
        texts = [f"doc {i} " + " ".join(f"w{rng2.integers(0, 300)}" for _ in range(10))
                 for i in range(300)]
        prefix = str(tmp_path / "adapt.leann")
        b = LeannBuilder(backend_name="hnsw", embedding_model="hash-tiny", max_length=32, M=8)
        for t in texts:
            b.add_text(t)
        b.build_index(prefix)
        s = HnswSearcher(prefix)
        from leann_tpu.embeddings.encoder import get_encoder

        q = get_encoder("hash-tiny", max_length=32).encode([texts[3], texts[144], texts[270]])
        base = s.search(q, top_k=5, complexity=32, prune_ratio=0.5)
        adap = s.search(q, top_k=5, complexity=32, prune_ratio=0.5, adaptive_steps=2)
        np.testing.assert_array_equal(adap["labels"], base["labels"])
        np.testing.assert_allclose(adap["distances"], base["distances"], rtol=1e-5)


class TestHnswBackendE2E:
    def test_stored_mode_recall(self, rng, tmp_path):
        from leann_tpu import LeannBuilder, LeannSearcher

        n, d = 600, 32
        emb = rng.standard_normal((n, d)).astype(np.float32)
        ids = [str(i) for i in range(n)]
        idx = str(tmp_path / "h.leann")
        b = LeannBuilder(backend_name="hnsw", embedding_mode="simulated", embedding_model="simulated",
                         distance_metric="l2", is_recompute=False, M=16)
        b.build_index_from_embeddings(idx, ids, emb)
        s = LeannSearcher(idx)
        hits = 0
        truth = _brute_force(emb, emb[:20], 5)
        for i in range(20):
            res = s.search(emb[i], top_k=5, complexity=64, beam_width=4, recompute_embeddings=False)
            hits += len({int(r.id) for r in res} & set(truth[i]))
        assert hits / 100 >= 0.9

    def test_recompute_mode_e2e(self, tiny_corpus, tmp_path):
        """Compact index (no embeddings stored) answered via on-chip recompute."""
        import json

        from leann_tpu import LeannBuilder, LeannSearcher

        idx = str(tmp_path / "hr.leann")
        b = LeannBuilder(backend_name="hnsw", embedding_model="hash-tiny", embedding_mode="tpu",
                         max_length=64, M=4)
        for text, md in tiny_corpus:
            b.add_text(text, metadata=md)
        b.build_index(idx)
        meta = json.loads((tmp_path / "hr.leann.meta.json").read_text())
        assert meta["is_compact"] and meta["is_recompute"]
        # the npz payload must NOT contain an embedding matrix
        z = np.load(idx + ".hnsw.npz")
        assert "embeddings" not in z
        s = LeannSearcher(idx)
        res = s.search("the largest planet jupiter", top_k=3, complexity=12, beam_width=2)
        assert len(res) == 3
        assert any("jupiter" in r.text or "planet" in r.text for r in res)

    def test_auto_prune_guard(self, tiny_corpus, tmp_path):
        """prune_ratio=None at high complexity auto-applies the PQ screen
        (the unpruned-recompute cold-compile cliff); explicit 0.0 stays
        unpruned."""
        from leann_tpu import LeannBuilder
        from leann_tpu.backends.hnsw.backend import HnswSearcher

        idx = str(tmp_path / "ap.leann")
        b = LeannBuilder(backend_name="hnsw", embedding_model="hash-tiny", embedding_mode="tpu",
                         max_length=64, M=4)
        for text, md in tiny_corpus:
            b.add_text(text, metadata=md)
        b.build_index(idx)
        s = HnswSearcher(idx)
        auto, _ = s._make_cfg(3, 256, 4, None, True, "global", 0)
        assert auto.prune_keep > 0
        explicit, _ = s._make_cfg(3, 256, 4, 0.0, True, "global", 0)
        assert explicit.prune_keep == 0
        small, _ = s._make_cfg(3, 32, 4, None, True, "global", 0)
        assert small.prune_keep == 0  # small search: no auto screen

    def test_compact_without_recompute_errors(self, tiny_corpus, tmp_path):
        from leann_tpu import LeannBuilder, LeannSearcher

        idx = str(tmp_path / "he.leann")
        b = LeannBuilder(backend_name="hnsw", embedding_model="hash-tiny", embedding_mode="tpu",
                         max_length=64, M=4)
        for text, md in tiny_corpus:
            b.add_text(text, metadata=md)
        b.build_index(idx)
        s = LeannSearcher(idx)
        with pytest.raises(RuntimeError):
            s.search("anything", top_k=2, recompute_embeddings=False)


class TestDiskannBackendE2E:
    def test_pq_traversal_with_rerank(self, rng, tmp_path):
        from leann_tpu import LeannBuilder, LeannSearcher

        n, d = 600, 32
        emb = rng.standard_normal((n, d)).astype(np.float32)
        ids = [str(i) for i in range(n)]
        idx = str(tmp_path / "d.leann")
        b = LeannBuilder(backend_name="diskann", embedding_mode="simulated", embedding_model="simulated",
                         distance_metric="l2", is_recompute=False, graph_degree=16)
        b.build_index_from_embeddings(idx, ids, emb)
        s = LeannSearcher(idx)
        truth = _brute_force(emb, emb[:20], 5)
        hits = 0
        for i in range(20):
            res = s.search(emb[i], top_k=5, complexity=64, beam_width=4, recompute_embeddings=True)
            hits += len({int(r.id) for r in res} & set(truth[i]))
        assert hits / 100 >= 0.85

    def test_partition_artifacts(self, tiny_corpus, tmp_path):
        """Parity with tests/test_diskann_partition.py: partition file exists,
        assignment is balanced."""
        from leann_tpu import LeannBuilder

        idx = str(tmp_path / "dp.leann")
        b = LeannBuilder(backend_name="diskann", embedding_model="hash-tiny", embedding_mode="tpu",
                         max_length=64, graph_degree=4, num_partitions=4, partition_passes=3)
        for text, md in tiny_corpus:
            b.add_text(text, metadata=md)
        b.build_index(idx)
        from leann_tpu.storage import load_partition

        assign = load_partition(idx)
        assert assign.shape == (len(tiny_corpus),)
        sizes = np.bincount(assign, minlength=4)
        assert sizes.max() - sizes.min() <= 2

    def test_proportional_pruning_rejected(self, rng, tmp_path):
        from leann_tpu import LeannBuilder, LeannSearcher

        emb = rng.standard_normal((100, 16)).astype(np.float32)
        idx = str(tmp_path / "dr.leann")
        b = LeannBuilder(backend_name="diskann", embedding_mode="simulated", embedding_model="simulated",
                         distance_metric="l2", is_recompute=False, graph_degree=8)
        b.build_index_from_embeddings(idx, [str(i) for i in range(100)], emb)
        s = LeannSearcher(idx)
        with pytest.raises(ValueError):
            s.search(emb[0], top_k=2, pruning_strategy="proportional")


class TestEntryEmb:
    """Compact indexes carry f16 pool embeddings (entry_emb) so seed
    selection is an exact MXU matvec instead of PQ-ADC gathers."""

    def _build(self, rng, tmp_path, backend):
        from leann_tpu import LeannBuilder

        texts = [f"doc {i} " + " ".join(f"w{rng.integers(0, 200)}" for _ in range(12))
                 for i in range(300)]
        prefix = str(tmp_path / f"{backend}.leann")
        kw = dict(M=8) if backend == "hnsw" else dict(graph_degree=8)
        b = LeannBuilder(backend_name=backend, embedding_model="hash-tiny",
                         max_length=32, **kw)
        for t in texts:
            b.add_text(t)
        b.build_index(prefix)
        return prefix

    def test_entry_emb_stored_and_aligned(self, rng, tmp_path):
        import os

        for backend in ("hnsw", "diskann"):
            prefix = self._build(rng, tmp_path, backend)
            z = np.load(f"{prefix}.{backend}.npz", allow_pickle=False)
            cache = f"{prefix}.entries.cache.npy"
            if str(z["metric"]) in ("l2", "cosine"):
                # derivable-sidecar contract (round 5): the pool lives in
                # .entries.cache.npy, outside all-in accounting, regenerable
                # from the token cache (BaseSearcher.load_entry_emb)
                assert "entry_emb" not in z.files and os.path.exists(cache)
                ee = np.load(cache)
            else:  # mips pools live in the augmented space -> stay in-npz
                assert "entry_emb" in z.files
                ee = z["entry_emb"]
            assert ee.dtype == np.float16
            assert ee.shape[0] == z["entries"].shape[0]
            assert "embeddings" not in z  # still compact

    def test_search_uses_exact_screen(self, rng, tmp_path):
        from leann_tpu import LeannSearcher

        prefix = self._build(rng, tmp_path, "diskann")
        s = LeannSearcher(prefix)
        res = s.search("doc 5 w1 w2", top_k=3, complexity=16, beam_width=2, n_entries=8)
        assert len(res) == 3 and all(np.isfinite(r.score) for r in res)


class TestPruningStrategies:
    """global / local / proportional PQ-screen semantics (reference
    hnsw_backend.py:222-231): the strategies must produce measurably
    different exact-recompute budgets and selection patterns, not be silent
    aliases of 'global'."""

    @pytest.fixture(scope="class")
    def built(self, tmp_path_factory):
        from leann_tpu import LeannBuilder

        rng = np.random.default_rng(7)
        texts = [f"doc {i} " + " ".join(f"w{rng.integers(0, 400)}" for _ in range(12))
                 for i in range(400)]
        prefix = str(tmp_path_factory.mktemp("prune") / "p.leann")
        b = LeannBuilder(backend_name="hnsw", embedding_model="hash-tiny",
                         max_length=32, M=8)
        for t in texts:
            b.add_text(t)
        b.build_index(prefix)
        return prefix, texts

    def _run(self, prefix, queries_emb, strategy, prune_ratio=0.5):
        import jax.numpy as jnp

        from leann_tpu.backends.hnsw.backend import HnswSearcher
        from leann_tpu.ops.beam_search import beam_search_batch

        s = HnswSearcher(prefix)
        cfg, enc_params = s._make_cfg(
            top_k=5, complexity=32, beam_width=4, prune_ratio=prune_ratio,
            recompute_embeddings=True, pruning_strategy=strategy, batch_size=0,
        )
        assert cfg.prune_keep > 0 and cfg.prune_strategy == strategy
        labels, dists, steps, n_exact = beam_search_batch(
            jnp.asarray(queries_emb), s._graph_data(), cfg, enc_params
        )
        return (np.asarray(labels), np.asarray(dists), int(np.asarray(n_exact).sum()))

    def test_strategy_budgets_and_selection(self, built):
        from leann_tpu.embeddings.encoder import get_encoder

        prefix, texts = built
        enc = get_encoder("hash-tiny", max_length=32)
        q = enc.encode([texts[i] for i in (3, 77, 200, 311)])
        out = {s: self._run(prefix, q, s) for s in ("global", "local", "proportional")}
        for labels, dists, n_exact in out.values():
            assert labels.shape == (4, 5) and n_exact > 0
            assert (labels >= 0).all()
        # proportional scales the exact budget with fresh-candidate count ->
        # strictly fewer recomputes than global's fixed per-hop budget
        assert out["proportional"][2] < out["global"][2]
        # local hands slots per source node -> different traversal than
        # global. At mild prune ratios both converge on a small corpus, so
        # discriminate under a harsh budget (keep = ~10% of the expansion
        # set, ~1 slot per source row)
        harsh_g = self._run(prefix, q, "global", prune_ratio=0.9)
        harsh_l = self._run(prefix, q, "local", prune_ratio=0.9)
        assert not np.allclose(harsh_l[1], harsh_g[1])

    def test_strategies_keep_recall(self, built):
        from leann_tpu.embeddings.encoder import get_encoder

        prefix, texts = built
        enc = get_encoder("hash-tiny", max_length=32)
        qi = list(range(0, 400, 25))
        q = enc.encode([texts[i] for i in qi])
        # self-retrieval: each query is a corpus chunk; top-1 should be itself
        for strat in ("global", "local", "proportional"):
            labels, _, _ = self._run(prefix, q, strat)
            self_hit = sum(1 for row, i in zip(labels, qi) if i in row)
            assert self_hit / len(qi) >= 0.8, strat


class TestHostDeferredRerank:
    """token_residency='host' (beyond-HBM path): PQ traversal on-chip, token
    store in host RAM, exact rerank as a second dispatch over host-gathered
    rows. Must produce the same results as the fused device-token path —
    same pool head, same encode, same metric math."""

    @pytest.fixture(scope="class")
    def built(self, tmp_path_factory):
        from leann_tpu import LeannBuilder

        rng = np.random.default_rng(13)
        texts = [f"doc {i} " + " ".join(f"w{rng.integers(0, 300)}" for _ in range(10))
                 for i in range(300)]
        prefix = str(tmp_path_factory.mktemp("hostrr") / "h.leann")
        b = LeannBuilder(backend_name="diskann", embedding_model="hash-tiny",
                         max_length=32, M=8)
        for t in texts:
            b.add_text(t)
        b.build_index(prefix)
        return prefix, texts

    def test_parity_with_device_tokens(self, built):
        from leann_tpu.backends.diskann.backend import DiskannSearcher
        from leann_tpu.embeddings.encoder import get_encoder

        prefix, texts = built
        q = get_encoder("hash-tiny", max_length=32).encode(
            [texts[7], texts[120], texts[255]]
        )
        dev = DiskannSearcher(prefix)  # auto -> device at this size
        assert dev.tokens_host is None
        host = DiskannSearcher(prefix, token_residency="host")
        assert host.tokens_host is not None and host.tokens.shape == (1, 1)
        kw = dict(top_k=5, complexity=24, beam_width=4, rerank_size=16)
        rd = dev.search(q, **kw)
        rh = host.search(q, **kw)
        np.testing.assert_array_equal(rh["labels"], rd["labels"])
        np.testing.assert_allclose(rh["distances"], rd["distances"], rtol=1e-5)
        # adaptive two-phase composes with the host rerank
        ra = host.search(q, adaptive_steps=2, **kw)
        np.testing.assert_array_equal(ra["labels"], rd["labels"])

    def test_search_text_host_path(self, built):
        from leann_tpu.backends.diskann.backend import DiskannSearcher

        prefix, texts = built
        dev = DiskannSearcher(prefix)
        host = DiskannSearcher(prefix, token_residency="host")
        kw = dict(top_k=3, complexity=64, beam_width=4)
        rd = dev.search_text([texts[42], texts[200]], **kw)
        rh = host.search_text([texts[42], texts[200]], **kw)
        np.testing.assert_array_equal(rh["labels"], rd["labels"])
        np.testing.assert_allclose(rh["distances"], rd["distances"], rtol=1e-5)
        # at cx64 this fixture matches the flat MIPS oracle exactly; the
        # query's own chunk is rank 1. Backend labels are LDG-relabeled rows —
        # map through the id list (what the API layer does) before comparing.
        from leann_tpu.storage import load_ids

        ids = load_ids(prefix)
        assert ids[rh["labels"][0][0]] == "42" and ids[rh["labels"][1][0]] == "200"


class TestRawTokenStore:
    """Above RAW_TOKEN_STORE_BYTES the token store is raw .npy (memmapped at
    load) instead of npz. Forced on via monkeypatch: build, search (device
    and host residency), and incremental append must all behave identically
    to the npz path."""

    def test_raw_roundtrip_search_and_append(self, tmp_path, monkeypatch):
        import os

        import leann_tpu.storage as storage
        from leann_tpu import LeannBuilder
        from leann_tpu.backends.diskann.backend import DiskannSearcher
        from leann_tpu.embeddings.encoder import get_encoder

        monkeypatch.setattr(storage, "RAW_TOKEN_STORE_BYTES", 0)
        rng = np.random.default_rng(5)
        texts = [f"doc {i} " + " ".join(f"w{rng.integers(0, 200)}" for _ in range(8))
                 for i in range(150)]
        prefix = str(tmp_path / "raw.leann")
        b = LeannBuilder(backend_name="diskann", embedding_model="hash-tiny",
                         max_length=32, M=8)
        for t in texts:
            b.add_text(t)
        b.build_index(prefix)
        assert os.path.exists(f"{prefix}.tokens.cache.npy")
        assert not os.path.exists(f"{prefix}.tokens.cache.npz")
        dev = DiskannSearcher(prefix)
        host = DiskannSearcher(prefix, token_residency="host")
        assert isinstance(host.tokens_host, np.memmap)  # raw store stays mapped
        q = get_encoder("hash-tiny", max_length=32).encode([texts[10], texts[99]])
        rd = dev.search(q, top_k=3, complexity=32)
        rh = host.search(q, top_k=3, complexity=32)
        np.testing.assert_array_equal(rh["labels"], rd["labels"])
        # incremental append keeps the raw format and stays searchable
        # (hnsw: diskann's partition-contiguous relabeling forbids inserts)
        hp = str(tmp_path / "rawh.leann")
        bh = LeannBuilder(backend_name="hnsw", embedding_model="hash-tiny",
                          max_length=32, M=8)
        for t in texts:
            bh.add_text(t)
        bh.build_index(hp)
        assert os.path.exists(f"{hp}.tokens.cache.npy")
        b2 = LeannBuilder(backend_name="hnsw", embedding_model="hash-tiny",
                          max_length=32, M=8)
        for i in range(10):
            b2.add_text(f"appended {i} w7 w8 w9")
        b2.update_index(hp)
        tok = np.load(f"{hp}.tokens.cache.npy", mmap_mode="r")
        assert tok.shape[0] == 160
        from leann_tpu.backends.hnsw.backend import HnswSearcher

        s2 = HnswSearcher(hp)
        r2 = s2.search(q, top_k=3, complexity=32, prune_ratio=0.5)
        assert (np.asarray(r2["labels"]) >= 0).all()


class TestF16HostMatrix:
    """float16 embeddings through build_index_from_embeddings are preserved
    end-to-end (the host high-water halves at 10M+ rows). Quality must track
    the f32 build — device compute casts per-chunk to bf16/f32 anyway."""

    def _overlap(self, a, b, k=3):
        return np.mean([len(set(x[:k]) & set(y[:k])) / k for x, y in zip(a, b)])

    def test_f16_stored_cosine(self, rng, tmp_path):
        from leann_tpu import LeannBuilder, LeannSearcher

        emb = rng.standard_normal((400, 32)).astype(np.float32)
        ids = [str(i) for i in range(400)]
        p32 = str(tmp_path / "f32.leann")
        p16 = str(tmp_path / "f16.leann")
        for p, e in ((p32, emb.copy()), (p16, emb.astype(np.float16))):
            b = LeannBuilder(backend_name="hnsw", distance_metric="cosine", M=8)
            b.build_index_from_embeddings(p, ids, e)
        z16 = np.load(f"{p16}.hnsw.npz", allow_pickle=False)
        assert z16["embeddings"].dtype == np.float16  # no silent f32 promotion
        q = emb[:8] / np.linalg.norm(emb[:8], axis=1, keepdims=True)
        r32 = LeannSearcher(p32).search(q, top_k=3, complexity=32, beam_width=4)
        r16 = LeannSearcher(p16).search(q, top_k=3, complexity=32, beam_width=4)
        l32 = [[r.id for r in row] for row in r32]
        l16 = [[r.id for r in row] for row in r16]
        assert self._overlap(l32, l16) >= 0.8
        # self-retrieval survives the f16 store
        assert sum(l16[i][0] == str(i) for i in range(8)) >= 7

    def test_f16_compact_diskann(self, tmp_path):
        from leann_tpu import LeannBuilder, LeannSearcher
        from leann_tpu.embeddings.encoder import get_encoder

        rng = np.random.default_rng(3)
        texts = [f"doc {i} " + " ".join(f"w{rng.integers(0, 300)}" for _ in range(10))
                 for i in range(300)]
        enc = get_encoder("hash-tiny", max_length=32)
        emb = enc.encode(texts)
        ids = [str(i) for i in range(len(texts))]
        p32 = str(tmp_path / "d32.leann")
        p16 = str(tmp_path / "d16.leann")
        for p, e in ((p32, emb.copy()), (p16, emb.astype(np.float16))):
            b = LeannBuilder(backend_name="diskann", embedding_model="hash-tiny",
                             max_length=32, M=8)
            b.build_index_from_embeddings(p, ids, e, texts=texts)
        qs = [texts[11], texts[150], texts[299]]
        r32 = LeannSearcher(p32).search(qs, top_k=3, complexity=64, beam_width=4)
        r16 = LeannSearcher(p16).search(qs, top_k=3, complexity=64, beam_width=4)
        l32 = [[r.id for r in row] for row in r32]
        l16 = [[r.id for r in row] for row in r16]
        assert self._overlap(l32, l16) >= 0.75
        assert [row[0] for row in l16] == ["11", "150", "299"]


class TestMipsGraphAugmentation:
    """MIPS -> L2 augmentation at build: without it an L2-built graph serves
    the dot-product objective badly (measured recall@3 0.56 at 100K/768-d)."""

    def test_mips_recall_on_varying_norms(self, rng, tmp_path):
        from leann_tpu import LeannBuilder, LeannSearcher

        n, d = 1500, 32
        # clustered directions with widely varying norms: the regime where
        # L2 neighborhoods and MIPS neighborhoods disagree most
        cent = rng.standard_normal((15, d)).astype(np.float32)
        x = cent[rng.integers(0, 15, n)] + 0.3 * rng.standard_normal((n, d)).astype(np.float32)
        x *= rng.uniform(0.2, 3.0, size=(n, 1)).astype(np.float32)
        idx = str(tmp_path / "mips.leann")
        b = LeannBuilder(backend_name="hnsw", embedding_mode="simulated",
                         embedding_model="simulated", distance_metric="mips",
                         is_recompute=False, is_compact=False, M=12)
        b.build_index_from_embeddings(idx, [str(i) for i in range(n)], x)
        s = LeannSearcher(idx)
        q = rng.standard_normal((24, d)).astype(np.float32)
        truth = np.argsort(-(q @ x.T), axis=1)[:, :5]
        hits = 0
        for i in range(24):
            res = s.search(q[i], top_k=5, complexity=64, beam_width=4,
                           recompute_embeddings=False)
            hits += len({int(r.id) for r in res} & set(truth[i].tolist()))
        assert hits / (5 * 24) >= 0.9, f"mips recall {hits / 120}"
