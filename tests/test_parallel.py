"""Multi-device tests on the virtual 8-device CPU mesh: sharded search parity
vs single-chip, and the contrastive training step (dp x tp)."""

import numpy as np
import pytest


def _recall(pred, truth):
    hits = sum(len(set(int(x) for x in p if x >= 0) & set(t)) for p, t in zip(pred, truth))
    return hits / (len(truth) * len(truth[0]))


class TestShardedSearch:
    def _setup(self, rng, n=512, d=32, r=16):
        from leann_tpu.ops.graph import build_graph
        from leann_tpu.ops.pq import encode_pq_blocked, train_pq

        emb = rng.standard_normal((n, d)).astype(np.float32)
        g, medoid = build_graph(emb, r=r)
        entries = np.asarray([medoid] + list(range(0, n, n // 8)), np.int32)
        cb = train_pq(emb, n_iters=6)
        codes = encode_pq_blocked(emb, cb)
        return emb, g, entries, cb, codes

    def test_stored_mode_matches_single_chip(self, rng):
        import jax
        import jax.numpy as jnp

        from leann_tpu.ops.beam_search import BeamConfig, GraphData, beam_search_batch
        from leann_tpu.parallel.mesh import graph_mesh
        from leann_tpu.parallel.sharded_search import ShardedSearcher

        emb, g, entries, cb, codes = self._setup(rng)
        q = rng.standard_normal((4, emb.shape[1])).astype(np.float32)
        cfg = BeamConfig(metric="l2", k=10, complexity=64, beam=4, max_steps=64, traversal="stored")

        mesh = graph_mesh(8)
        ss = ShardedSearcher(mesh, g, entries=entries, emb=emb)
        labels_s, dists_s = ss.search(q, cfg)

        dummy = jnp.zeros((1, 1), jnp.float32)
        gd = GraphData(
            neighbors=jnp.asarray(g), entry_ids=jnp.asarray(entries), emb=jnp.asarray(emb),
            tokens=jnp.zeros((1, 1), jnp.int32), lengths=jnp.zeros((1,), jnp.int32),
            codes=jnp.zeros((1, 1), jnp.uint8), codebooks=dummy,
        )
        labels_1, dists_1, _, _ = beam_search_batch(jnp.asarray(q), gd, cfg)
        # identical graph + identical traversal rule -> identical results
        np.testing.assert_array_equal(labels_s, np.asarray(labels_1))
        np.testing.assert_allclose(dists_s, np.asarray(dists_1), rtol=1e-3, atol=1e-3)

    def test_pq_rerank_recall(self, rng):
        from leann_tpu.ops.beam_search import BeamConfig
        from leann_tpu.parallel.mesh import graph_mesh
        from leann_tpu.parallel.sharded_search import ShardedSearcher

        emb, g, entries, cb, codes = self._setup(rng)
        q = emb[:8]
        cfg = BeamConfig(
            metric="l2", k=5, complexity=64, beam=4, max_steps=64,
            traversal="pq", rerank=64, rerank_source="stored",
        )
        mesh = graph_mesh(8)
        ss = ShardedSearcher(mesh, g, entries=entries, emb=emb, codes=codes, codebooks=cb)
        labels, dists = ss.search(q, cfg)
        d = ((q[:, None, :] - emb[None, :, :]) ** 2).sum(-1)
        truth = np.argsort(d, axis=1)[:, :5]
        assert _recall(labels, truth) >= 0.85

    @pytest.mark.parametrize("strategy", ["global", "local", "proportional"])
    def test_sharded_recompute_e2e(self, tiny_corpus, rng, strategy):
        """Distributed on-chip recompute: tokens sharded, per-device screening.
        All three pruning strategies must traverse correctly under shard_map
        (lockstep with ops/beam_search.py semantics)."""
        from leann_tpu.embeddings.encoder import get_encoder
        from leann_tpu.ops.beam_search import BeamConfig
        from leann_tpu.ops.graph import build_graph
        from leann_tpu.ops.pq import encode_pq_blocked, train_pq
        from leann_tpu.parallel.mesh import graph_mesh
        from leann_tpu.parallel.sharded_search import ShardedSearcher

        texts = [t for t, _ in tiny_corpus] * 4  # 48 rows
        enc = get_encoder("hash-tiny", max_length=32)
        emb = enc.encode(texts)
        toks, mask = enc.tokenize(texts, 32)
        lengths = mask.sum(axis=1).astype(np.int32)
        g, medoid = build_graph(emb, r=8)
        cb = train_pq(emb, n_iters=4)
        codes = encode_pq_blocked(emb, cb)
        mesh = graph_mesh(8)
        ss = ShardedSearcher(
            mesh, g, entries=np.asarray([medoid, 0, 5, 11], np.int32),
            tokens=toks, lengths=lengths, codes=codes, codebooks=cb,
        )
        cfg = BeamConfig(
            metric="cosine", k=3, complexity=16, beam=2, max_steps=16,
            traversal="recompute", enc_cfg=enc.cfg, normalize=True,
            prune_strategy=strategy,
        )
        q = enc.encode(["the largest planet jupiter"])
        labels, dists = ss.search(q, cfg, enc_params=enc.params, keep_local=4)
        texts_found = [texts[i] for i in labels[0] if i >= 0]
        assert any("jupiter" in t or "planet" in t for t in texts_found)


class TestContrastiveTrainer:
    def test_loss_decreases_dp_tp(self, tiny_corpus):
        from leann_tpu.embeddings.encoder import get_encoder
        from leann_tpu.parallel.mesh import make_mesh
        from leann_tpu.parallel.train import ContrastiveTrainer

        enc = get_encoder("hash-tiny", max_length=16)
        mesh = make_mesh([("dp", 4), ("tp", 2)])
        trainer = ContrastiveTrainer(enc.cfg, mesh, learning_rate=1e-3)
        texts = [t for t, _ in tiny_corpus][:8]
        queries = [" ".join(t.split()[:4]) for t in texts]  # prefix as pseudo-query
        q_ids, q_mask = enc.tokenize(queries, 16)
        d_ids, d_mask = enc.tokenize(texts, 16)
        losses = [trainer.train_step(q_ids, q_mask, d_ids, d_mask) for _ in range(8)]
        assert losses[-1] < losses[0]
        assert np.isfinite(losses).all()


class TestServingMesh:
    def test_dp_sharded_queries_match_gp_only(self, rng):
        from leann_tpu.ops.graph import build_graph
        from leann_tpu.ops.beam_search import BeamConfig
        from leann_tpu.parallel.mesh import graph_mesh, serving_mesh
        from leann_tpu.parallel.sharded_search import ShardedSearcher

        n, d = 256, 32
        emb = rng.standard_normal((n, d)).astype(np.float32)
        g, medoid = build_graph(emb, r=8)
        entries = np.asarray([medoid] + list(range(0, n, n // 8)), np.int32)
        cfg = BeamConfig(metric="l2", k=5, complexity=32, beam=4, max_steps=32, traversal="stored")
        q = rng.standard_normal((6, d)).astype(np.float32)  # 6 % dp(2) == 0

        ss_gp = ShardedSearcher(graph_mesh(4), g, entries=entries, emb=emb)
        l_gp, d_gp = ss_gp.search(q, cfg)
        ss_dp = ShardedSearcher(serving_mesh(dp=2, gp=4), g, entries=entries, emb=emb)
        l_dp, d_dp = ss_dp.search(q, cfg)
        np.testing.assert_array_equal(l_gp, l_dp)
        np.testing.assert_allclose(d_gp, d_dp, rtol=1e-4, atol=1e-4)

        # ragged batch (5 % 2 != 0) pads internally and trims back
        l5, _ = ss_dp.search(q[:5], cfg)
        np.testing.assert_array_equal(l5, l_gp[:5])
