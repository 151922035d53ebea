"""NN-descent and vectorized reverse-fill tests (the large-N build path)."""

import numpy as np


class TestNNDescent:
    def test_matches_exact_knn_clustered(self, rng):
        """Clustered data (the realistic text-embedding regime — NN-descent's
        design point). Uniform random high-dim data is its known worst case
        and is covered by the looser bound below."""
        from leann_tpu.ops.graph import exact_knn, nn_descent

        n, d, k = 2000, 32, 10
        centers = rng.standard_normal((20, d)).astype(np.float32) * 4
        emb = (centers[rng.integers(0, 20, n)] + rng.standard_normal((n, d))).astype(np.float32)
        ids_nd, _ = nn_descent(emb, k, n_iters=8, block=512)
        ids_ex, _ = exact_knn(emb, k)
        recall = np.mean([len(set(a) & set(b)) for a, b in zip(ids_nd.tolist(), ids_ex.tolist())]) / k
        assert recall >= 0.9, f"nn-descent recall {recall}"

    def test_uniform_random_lower_bound(self, rng):
        from leann_tpu.ops.graph import exact_knn, nn_descent

        n, d, k = 2000, 32, 10
        emb = rng.standard_normal((n, d)).astype(np.float32)
        ids_nd, _ = nn_descent(emb, k, n_iters=8, block=512)
        ids_ex, _ = exact_knn(emb, k)
        recall = np.mean([len(set(a) & set(b)) for a, b in zip(ids_nd.tolist(), ids_ex.tolist())]) / k
        assert recall >= 0.7, f"nn-descent recall {recall}"

    def test_no_self_or_dup(self, rng):
        from leann_tpu.ops.graph import nn_descent

        emb = rng.standard_normal((500, 16)).astype(np.float32)
        ids, _ = nn_descent(emb, 8, n_iters=4, block=128)
        for i in range(500):
            row = [x for x in ids[i] if x >= 0]
            assert i not in row
            assert len(row) == len(set(row))

    def test_checkpoint_resume_bit_identical(self, rng, tmp_path, monkeypatch):
        """Intra-phase descent resume (ADVICE r3): a run killed mid-descent
        restarts from the last persisted round and converges to the SAME
        graph as an uninterrupted run (the per-round RNG is fold_in(key, it),
        so the candidate stream replays)."""
        import leann_tpu.ops.graph as G

        emb = rng.standard_normal((600, 16)).astype(np.float32)
        ref_ids, ref_d = G.nn_descent(emb, 8, n_iters=6, block=128)

        # force a checkpoint write after every round, then kill after round 2
        monkeypatch.setattr(G, "QCKPT_SECS", -1.0)
        ck = str(tmp_path / "nd")
        calls = {"n": 0}
        real_iter = G._nn_descent_iter

        def dying_iter(*a, **kw):
            calls["n"] += 1
            if calls["n"] > 2:
                raise RuntimeError("simulated worker wedge")
            return real_iter(*a, **kw)

        monkeypatch.setattr(G, "_nn_descent_iter", dying_iter)
        try:
            G.nn_descent(emb, 8, n_iters=6, block=128, checkpoint_dir=ck)
        except RuntimeError:
            pass
        import json as _json
        import os as _os

        meta = _json.load(open(_os.path.join(ck, "nd_state.json")))
        assert meta["iter"] == 2  # two completed rounds persisted

        monkeypatch.setattr(G, "_nn_descent_iter", real_iter)
        res_ids, res_d = G.nn_descent(emb, 8, n_iters=6, block=128, checkpoint_dir=ck)
        np.testing.assert_array_equal(res_ids, ref_ids)
        np.testing.assert_allclose(res_d, ref_d, rtol=1e-6)
        # state cleaned up after completion
        assert not _os.path.exists(_os.path.join(ck, "nd_state.json"))


class TestReverseFill:
    def test_fill_and_dedup(self):
        from leann_tpu.ops.graph import _fill_reverse_edges

        nbrs = np.array([[1, -1, -1], [2, -1, -1], [0, 1, -1], [-1, -1, -1]], np.int32)
        out = _fill_reverse_edges(nbrs, np.random.default_rng(0))
        assert out.shape == nbrs.shape
        # out-edges preserved in front
        assert out[0, 0] == 1 and out[1, 0] == 2
        # node 0 gains reverse edge from 2; node 3 keeps at least empty row
        assert 2 in out[0]
        for i in range(4):
            row = [x for x in out[i] if x >= 0]
            assert len(row) == len(set(row)) and i not in row

    def test_big_graph_recall_via_build(self, rng):
        """build_graph with forced nn-descent path still yields a searchable
        graph (threshold monkeypatched down)."""
        import leann_tpu.ops.graph as G
        from leann_tpu.ops.beam_search import BeamConfig, GraphData, beam_search_batch
        import jax.numpy as jnp

        old = G.EXACT_KNN_MAX_N
        G.EXACT_KNN_MAX_N = 100
        try:
            n, d = 1200, 24
            emb = rng.standard_normal((n, d)).astype(np.float32)
            g, medoid = G.build_graph(emb, r=16)
        finally:
            G.EXACT_KNN_MAX_N = old
        dummy = jnp.zeros((1, 1), jnp.float32)
        gd = GraphData(
            neighbors=jnp.asarray(g),
            entry_ids=jnp.asarray(np.arange(0, n, n // 16, dtype=np.int32)),
            emb=jnp.asarray(emb), tokens=jnp.zeros((1, 1), jnp.int32),
            lengths=jnp.zeros((1,), jnp.int32), codes=jnp.zeros((1, 1), jnp.uint8),
            codebooks=dummy,
        )
        cfg = BeamConfig(metric="l2", k=10, complexity=64, beam=8, max_steps=64, traversal="stored")
        q = emb[:16]
        labels, _, _, _ = beam_search_batch(jnp.asarray(q), gd, cfg)
        d2 = ((q[:, None, :] - emb[None, :, :]) ** 2).sum(-1)
        truth = np.argsort(d2, axis=1)[:, :10]
        rec = np.mean([len(set(a) & set(b.tolist())) for a, b in zip(np.asarray(labels).tolist(), truth)]) / 10
        assert rec >= 0.85, f"recall {rec}"


class TestSpillKnnStreamed:
    """The 10M+ candidate pass: host-resident corpus streamed through
    fixed-shape bf16 chunk dispatches, multi-probe cluster windows."""

    def _clustered(self, rng, n=6000, d=32, n_c=30):
        centers = rng.standard_normal((n_c, d)).astype(np.float32) * 3
        return (centers[rng.integers(0, n_c, n)]
                + rng.standard_normal((n, d)).astype(np.float32) * 0.7)

    def test_matches_in_memory_quality(self, rng):
        from leann_tpu.ops.graph import cluster_window_init, exact_knn, spill_knn_streamed

        emb = self._clustered(rng)
        k = 10
        ids_s, d_s = spill_knn_streamed(emb, k, window=1024, n_probe=2, chunk_rows=4096)
        ids_m, _ = cluster_window_init(emb, k, window=1024, n_probe=2)
        ids_ex, _ = exact_knn(emb, k)

        def recall(a):
            return np.mean([
                len(set(x[x >= 0].tolist()) & set(y.tolist())) for x, y in zip(a, ids_ex)
            ]) / k

        r_s, r_m = recall(ids_s), recall(ids_m)
        assert r_s >= 0.75, f"streamed spill recall {r_s}"
        assert r_s >= r_m - 0.08, f"streamed {r_s} far below in-memory {r_m}"
        # no self edges, no dups, dists ascending
        for i in range(0, 6000, 500):
            row = ids_s[i][ids_s[i] >= 0]
            assert i not in row.tolist()
            assert len(set(row.tolist())) == len(row)
            dd = d_s[i][ids_s[i] >= 0]
            assert (np.diff(dd) >= -1e-3).all()

    def test_scratch_memmap_matches_in_ram(self, rng, monkeypatch, tmp_path):
        """Disk-backed spill scratch (the 60M host-RAM path) must be
        bit-identical to the in-RAM arrays, and the expanded scratch files
        must be cleaned up after the merge."""
        import os

        from leann_tpu.ops import graph as G

        emb = self._clustered(rng, n=4000)
        ids_m, d_m = G.spill_knn_streamed(emb, 8, window=1024, n_probe=2, chunk_rows=4096)
        monkeypatch.setattr(G, "SPILL_MEMMAP_BYTES", 1)
        ids_f, d_f = G.spill_knn_streamed(emb, 8, window=1024, n_probe=2, chunk_rows=4096,
                                          scratch_dir=str(tmp_path))
        np.testing.assert_array_equal(np.asarray(ids_f), ids_m)
        np.testing.assert_array_equal(np.asarray(d_f), d_m)
        assert isinstance(ids_f, np.memmap)
        left = sorted(os.listdir(tmp_path))
        assert left == ["spill_out_d.npy", "spill_out_ids.npy"], left

    def test_build_graph_large_path(self, rng, monkeypatch):
        """Forcing the >EXACT_KNN_MAX_N branch must produce a graph whose
        search recall matches the exact-built one (bf16 residency + streamed
        candidates)."""
        import jax.numpy as jnp

        from leann_tpu.ops import graph as G
        from leann_tpu.ops.beam_search import BeamConfig, GraphData, beam_search_batch

        emb = self._clustered(rng)
        n = emb.shape[0]
        monkeypatch.setattr(G, "EXACT_KNN_MAX_N", 1000)
        g, med = G.build_graph(emb, r=8)
        monkeypatch.setattr(G, "EXACT_KNN_MAX_N", 10**9)
        g2, _ = G.build_graph(emb, r=8)

        entries = np.unique(np.concatenate([[med], np.arange(0, n, 64)])).astype(np.int32)
        dummy = jnp.zeros((1, 1), jnp.float32)
        q = emb[:48]
        dd = ((q[:, None, :] - emb[None]) ** 2).sum(-1)
        truth = np.argsort(dd, axis=1)[:, :5]
        cfg = BeamConfig(metric="l2", k=5, complexity=48, beam=4, max_steps=48,
                         traversal="stored", n_entries=16)

        def rec(graph):
            gd = GraphData(neighbors=jnp.asarray(graph), entry_ids=jnp.asarray(entries),
                           emb=jnp.asarray(emb), tokens=jnp.zeros((1, 1), jnp.int32),
                           lengths=jnp.zeros((1,), jnp.int32),
                           codes=jnp.zeros((1, 1), jnp.uint8),
                           codebooks=jnp.zeros((1, 1, 1), jnp.float32), entry_emb=None)
            labels, _, _, _ = beam_search_batch(jnp.asarray(q), gd, cfg)
            labels = np.asarray(labels)
            return np.mean([len(set(a.tolist()) & set(b.tolist())) for a, b in zip(labels, truth)]) / 5

        r_stream, r_exact = rec(g), rec(g2)
        assert r_stream >= r_exact - 0.08, f"streamed-built {r_stream} vs exact-built {r_exact}"
        _ = dummy

    def test_build_graph_descent_path(self, rng, monkeypatch):
        """Forced-threshold e2e through LEANN_KNN_MODE=descent (the 60M
        single-chip candidate generator, VERDICT r3 #4): build_graph must
        route beyond-EXACT_KNN_MAX_N corpora through cluster-bootstrapped
        NN-descent and produce a graph whose search recall tracks the
        exact-built one."""
        import jax.numpy as jnp

        from leann_tpu.ops import graph as G
        from leann_tpu.ops.beam_search import BeamConfig, GraphData, beam_search_batch

        emb = self._clustered(rng)
        n = emb.shape[0]
        monkeypatch.setattr(G, "EXACT_KNN_MAX_N", 1000)
        monkeypatch.setenv("LEANN_KNN_MODE", "descent")
        g, med = G.build_graph(emb, r=8)
        monkeypatch.setattr(G, "EXACT_KNN_MAX_N", 10**9)
        monkeypatch.delenv("LEANN_KNN_MODE")
        g2, _ = G.build_graph(emb, r=8)

        entries = np.unique(np.concatenate([[med], np.arange(0, n, 64)])).astype(np.int32)
        q = emb[:48]
        dd = ((q[:, None, :] - emb[None]) ** 2).sum(-1)
        truth = np.argsort(dd, axis=1)[:, :5]
        cfg = BeamConfig(metric="l2", k=5, complexity=48, beam=4, max_steps=48,
                         traversal="stored", n_entries=16)

        def rec(graph):
            gd = GraphData(neighbors=jnp.asarray(graph), entry_ids=jnp.asarray(entries),
                           emb=jnp.asarray(emb), tokens=jnp.zeros((1, 1), jnp.int32),
                           lengths=jnp.zeros((1,), jnp.int32),
                           codes=jnp.zeros((1, 1), jnp.uint8),
                           codebooks=jnp.zeros((1, 1, 1), jnp.float32), entry_emb=None)
            labels, _, _, _ = beam_search_batch(jnp.asarray(q), gd, cfg)
            labels = np.asarray(labels)
            return np.mean([len(set(a.tolist()) & set(b.tolist())) for a, b in zip(labels, truth)]) / 5

        r_desc, r_exact = rec(g), rec(g2)
        assert r_desc >= r_exact - 0.08, f"descent-built {r_desc} vs exact-built {r_exact}"

    def test_nn_descent_host_state_parity(self, rng, monkeypatch):
        """The memory-bounded host-resident-state mode (auto above
        LEANN_DESCENT_HBM_BUDGET — the 10M-scale single-chip regime where
        device-resident descent state exceeds HBM) must be BIT-identical to
        the device-resident mode: same per-round candidate streams, same
        top-k, only the residency of dists/outputs differs."""
        from leann_tpu.ops import graph as G

        emb = self._clustered(rng)
        i1, d1 = G.nn_descent(emb, 12, n_iters=3)
        monkeypatch.setenv("LEANN_DESCENT_HBM_BUDGET", "1000")
        i2, d2 = G.nn_descent(emb, 12, n_iters=3)
        assert np.array_equal(i1, i2)
        assert np.array_equal(d1, d2)


class TestPQPrune:
    """The beyond-HBM prune (20M+ rows): candidates decoded on-chip from
    device-resident PQ codes instead of a bf16 corpus matrix."""

    def test_matches_exact_prune_quality(self, rng, monkeypatch):
        import jax.numpy as jnp

        from leann_tpu.ops import graph as G
        from leann_tpu.ops.beam_search import BeamConfig, GraphData, beam_search_batch

        n, d = 4096, 32
        centers = rng.standard_normal((24, d)).astype(np.float32) * 3
        emb = (centers[rng.integers(0, 24, n)]
               + rng.standard_normal((n, d)).astype(np.float32) * 0.7)

        g_exact, med = G.build_graph(emb, r=8)
        monkeypatch.setattr(G, "PRUNE_EBF_MAX_BYTES", 1)  # force the PQ path
        g_pq, med_pq = G.build_graph(emb, r=8)

        assert g_pq.shape == g_exact.shape
        assert ((g_pq >= -1) & (g_pq < n)).all()
        for i in range(0, n, 333):  # no self-loops / dups after reverse fill
            row = g_pq[i][g_pq[i] >= 0]
            assert i not in row.tolist() and len(set(row.tolist())) == len(row)

        entries = np.unique(np.concatenate([[med], np.arange(0, n, 256)])).astype(np.int32)
        q = emb[:48]
        dd = ((q[:, None, :] - emb[None]) ** 2).sum(-1)
        truth = np.argsort(dd, axis=1)[:, :5]
        cfg = BeamConfig(metric="l2", k=5, complexity=48, beam=4, max_steps=48,
                         traversal="stored", n_entries=16)

        def rec(graph):
            gd = GraphData(neighbors=jnp.asarray(graph), entry_ids=jnp.asarray(entries),
                           emb=jnp.asarray(emb), tokens=jnp.zeros((1, 1), jnp.int32),
                           lengths=jnp.zeros((1,), jnp.int32),
                           codes=jnp.zeros((1, 1), jnp.uint8),
                           codebooks=jnp.zeros((1, 1, 1), jnp.float32), entry_emb=None)
            labels, _, _, _ = beam_search_batch(jnp.asarray(q), gd, cfg)
            labels = np.asarray(labels)
            return np.mean([len(set(a.tolist()) & set(b.tolist())) for a, b in zip(labels, truth)]) / 5

        r_pq, r_exact = rec(g_pq), rec(g_exact)
        assert r_pq >= r_exact - 0.08, f"pq-pruned {r_pq} vs exact-pruned {r_exact}"

    def test_decode_pq_fidelity(self, rng):
        """decode_pq must invert encode_pq to per-subspace nearest centroids
        (exact lookup parity vs a host reconstruction) and reconstruct with
        low MSE on clusterable data."""
        import jax.numpy as jnp

        from leann_tpu.ops.pq import decode_pq, encode_pq, train_pq

        centers = rng.standard_normal((8, 32)).astype(np.float32) * 2
        x = (centers[rng.integers(0, 8, 2048)]
             + rng.standard_normal((2048, 32)).astype(np.float32) * 0.3)
        cb = train_pq(x, m=4, n_iters=8)  # [4, 256, 8]
        codes = np.asarray(encode_pq(jnp.asarray(x), jnp.asarray(cb)))
        dec = np.asarray(decode_pq(jnp.asarray(cb), jnp.asarray(codes)))
        # exact parity with host per-subspace centroid lookup
        host = np.concatenate(
            [cb[m][codes[:, m]] for m in range(4)], axis=1
        )
        np.testing.assert_allclose(dec, host, rtol=0, atol=0)
        # reconstruction is close on clustered data
        mse = float(np.mean(np.sum((dec - x) ** 2, axis=1)))
        ref = float(np.mean(np.sum(x ** 2, axis=1)))
        assert mse < 0.25 * ref, f"pq mse {mse} vs energy {ref}"
        # batched-rank decode (the kernel's [B, C, M] shape)
        codes3 = codes[:128].reshape(16, 8, 4)
        dec3 = np.asarray(decode_pq(jnp.asarray(cb), jnp.asarray(codes3)))
        np.testing.assert_allclose(dec3.reshape(128, 32), host[:128], rtol=0, atol=0)

    def test_nondivisible_dim_pads(self, rng, monkeypatch):
        """Dims with no usable subspace divisor (e.g. prime, or the mips-
        augmented D+1) must zero-pad instead of degenerating to one global
        codebook (choose_m returns 1 for such dims)."""
        from leann_tpu.ops import graph as G

        assert G._prune_pq_m(384) == 64          # ds=6
        assert G._prune_pq_m(385) > 1            # mips-augmented: 55 (ds=7)
        assert 385 % G._prune_pq_m(385) == 0
        assert G._prune_pq_m(29) == 0            # prime: padding path

        emb = rng.standard_normal((1024, 29)).astype(np.float32)
        monkeypatch.setattr(G, "PRUNE_EBF_MAX_BYTES", 1)
        g, med = G.build_graph(emb, r=8)
        assert g.shape == (1024, 8) and ((g >= -1) & (g < 1024)).all()
        # graph quality must survive padding: edges point at near neighbors
        d2 = ((emb[:64, None, :] - emb[None, :, :]) ** 2).sum(-1)
        true_nn = np.argsort(d2, axis=1)[:, 1:9]
        overlap = np.mean([
            len(set(g[i][g[i] >= 0].tolist()) & set(true_nn[i].tolist())) / 8
            for i in range(64)
        ])
        assert overlap >= 0.3, f"padded-dim prune lost the neighborhood: {overlap}"

    def test_f16_input(self, rng, monkeypatch):
        """The 20M+ pipeline feeds f16 host matrices; the PQ prune must accept
        them (train/encode cast to f32 internally, rows upload as bf16)."""
        from leann_tpu.ops import graph as G

        emb = rng.standard_normal((1024, 32)).astype(np.float16)
        monkeypatch.setattr(G, "PRUNE_EBF_MAX_BYTES", 1)
        g, med = G.build_graph(emb, r=8)
        assert g.shape == (1024, 8) and 0 <= med < 1024
        assert ((g >= -1) & (g < 1024)).all()


class TestReverseCandidates:
    """Reverse-KNN candidate augmentation before the prune (the bidirectional
    Vamana edge lever for spill-KNN builds)."""

    def test_augment_contract(self):
        from leann_tpu.ops.graph import _augment_reverse_candidates

        # node 0 -> {1, 2}; node 1 -> {0}; node 2 -> {1}; node 3 -> {} (padded)
        fwd = np.array([[1, 2], [0, -1], [1, -1], [-1, -1]], np.int32)
        out = _augment_reverse_candidates(fwd, rev_c=2)
        assert out.shape == (4, 4)
        np.testing.assert_array_equal(out[:, :2], fwd)  # forward list untouched
        rev = out[:, 2:]
        assert 2 in rev[1].tolist()        # 2 lists 1 and 1's fwd lacks 2
        assert 0 not in rev[1].tolist()    # 0 is already a fwd candidate of 1
        assert rev[0].tolist() == [-1, -1]  # 1 -> 0 is dup of fwd; nothing else
        assert 0 in rev[2].tolist()        # 0 lists 2, 2's fwd lacks 0
        assert rev[3].tolist() == [-1, -1]  # nobody lists node 3
        for i in range(4):
            row = rev[i][rev[i] >= 0].tolist()
            assert i not in row and len(row) == len(set(row))

    def test_rev_c_truncation_keeps_closest_sources(self):
        from leann_tpu.ops.graph import _augment_reverse_candidates

        # every node lists node 0 first; rev_c=2 keeps the lowest-id sources
        # (stable grouping preserves source order)
        n = 6
        fwd = np.full((n, 1), 0, np.int32)
        fwd[0, 0] = 5  # not a low id, so dedup doesn't mask the truncation
        out = _augment_reverse_candidates(fwd, rev_c=2)
        assert out[0, 1:].tolist() == [1, 2]

    def test_spill_build_recall_not_worse(self, rng, monkeypatch):
        """On the forced spill path (the only place the knob is aimed at),
        reverse candidates must not hurt search recall and typically help
        boundary nodes. Loose bound: parity within noise."""
        import jax.numpy as jnp

        from leann_tpu.ops import graph as G
        from leann_tpu.ops.beam_search import BeamConfig, GraphData, beam_search_batch

        centers = rng.standard_normal((30, 24)).astype(np.float32) * 3
        n = 4000
        emb = (centers[rng.integers(0, 30, n)]
               + rng.standard_normal((n, 24)).astype(np.float32) * 0.7)
        monkeypatch.setattr(G, "EXACT_KNN_MAX_N", 1000)
        g_plain, med = G.build_graph(emb, r=8)
        g_rev, _ = G.build_graph(emb, r=8, reverse_candidates=8)
        assert g_rev.shape == g_plain.shape

        entries = np.unique(np.concatenate([[med], np.arange(0, n, 64)])).astype(np.int32)
        q = emb[:48]
        dd = ((q[:, None, :] - emb[None]) ** 2).sum(-1)
        truth = np.argsort(dd, axis=1)[:, :5]
        cfg = BeamConfig(metric="l2", k=5, complexity=48, beam=4, max_steps=48,
                         traversal="stored", n_entries=16)

        def rec(graph):
            gd = GraphData(neighbors=jnp.asarray(graph), entry_ids=jnp.asarray(entries),
                           emb=jnp.asarray(emb), tokens=jnp.zeros((1, 1), jnp.int32),
                           lengths=jnp.zeros((1,), jnp.int32),
                           codes=jnp.zeros((1, 1), jnp.uint8),
                           codebooks=jnp.zeros((1, 1, 1), jnp.float32), entry_emb=None)
            labels, _, _, _ = beam_search_batch(jnp.asarray(q), gd, cfg)
            labels = np.asarray(labels)
            return np.mean([len(set(a.tolist()) & set(b.tolist())) for a, b in zip(labels, truth)]) / 5

        r_rev, r_plain = rec(g_rev), rec(g_plain)
        assert r_rev >= r_plain - 0.05, f"reverse-candidates hurt: {r_rev} vs {r_plain}"


class TestExactKnnSharded:
    """Column-sharded exact k-NN — the default beyond-HBM candidate pass
    (replaces spill-KNN, whose candidate recall measured 13% at 10M)."""

    def test_parity_with_exact_knn(self, rng):
        from leann_tpu.ops.graph import exact_knn, exact_knn_sharded

        n, d, k = 5000, 32, 8
        emb = rng.standard_normal((n, d)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        i1, d1 = exact_knn(emb, k, query_block=256, tile=1024, approx_recall=1.0)
        # shard_bytes forces >=3 column shards; qchunk forces both the
        # in-shard device slice and the streamed-upload query paths
        i2, d2 = exact_knn_sharded(emb, k, query_block=256, tile=512, qchunk=1024,
                                   shard_bytes=512 * 2 * d, approx_recall=1.0)
        assert (i1 == i2).all()
        assert np.abs(d1 - d2).max() < 1e-4

    def test_f16_host_matrix(self, rng):
        """The 10M+ build path feeds an f16 host matrix; ids must land within
        cast-noise of the f32 answer (identical distances up to bf16/f16)."""
        from leann_tpu.ops.graph import exact_knn, exact_knn_sharded

        n, d, k = 3000, 32, 8
        emb = rng.standard_normal((n, d)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        i1, _ = exact_knn(emb, k, query_block=256, tile=1024, approx_recall=1.0)
        i2, _ = exact_knn_sharded(emb.astype(np.float16), k, query_block=256,
                                  tile=512, qchunk=1024, shard_bytes=512 * 2 * d,
                                  approx_recall=1.0)
        agree = (i1 == i2).mean()
        assert agree > 0.9, f"f16 id agreement {agree}"

    def test_resume_from_partial_state(self, rng, tmp_path, monkeypatch):
        """A run killed between shards must resume at the first unfinished
        shard and produce the same answer as an uninterrupted run."""
        from leann_tpu.ops import graph as G

        n, d, k = 4000, 16, 6
        emb = rng.standard_normal((n, d)).astype(np.float32)
        full_i, full_d = G.exact_knn_sharded(emb, k, query_block=256, tile=512,
                                             qchunk=1024, shard_bytes=1024 * 2 * d,
                                             approx_recall=1.0)

        calls = {"n": 0}
        orig = G._exact_knn_shard_device

        def boom(*a, **kw):
            calls["n"] += 1
            if calls["n"] > 6:  # die partway through shard 2+
                raise RuntimeError("simulated tunnel wedge")
            return orig(*a, **kw)

        monkeypatch.setattr(G, "_exact_knn_shard_device", boom)
        try:
            G.exact_knn_sharded(emb, k, query_block=256, tile=512, qchunk=1024,
                                shard_bytes=1024 * 2 * d, approx_recall=1.0,
                                checkpoint_dir=str(tmp_path))
            raise AssertionError("expected simulated crash")
        except RuntimeError:
            pass
        monkeypatch.setattr(G, "_exact_knn_shard_device", orig)
        # state sidecar exists and records completed shards
        import json as _json
        meta = _json.load(open(tmp_path / "exknn_state.json"))
        assert meta["shards_done"] >= 1
        i2, d2 = G.exact_knn_sharded(emb, k, query_block=256, tile=512, qchunk=1024,
                                     shard_bytes=1024 * 2 * d, approx_recall=1.0,
                                     checkpoint_dir=str(tmp_path))
        assert (i2 == full_i).all()
        assert np.abs(d2 - full_d).max() < 1e-4
        # state is cleaned up after a completed run
        assert not (tmp_path / "exknn_state.json").exists()

    def test_resume_mid_shard(self, rng, tmp_path, monkeypatch):
        """At 10M one shard's query sweep spans hours, so the qchunk watermark
        must also be durable: a run killed inside shard 0 resumes at the last
        checkpointed qchunk, not the start of the shard, and still matches the
        uninterrupted answer."""
        from leann_tpu.ops import graph as G

        n, d, k = 4000, 16, 6
        emb = rng.standard_normal((n, d)).astype(np.float32)
        full_i, full_d = G.exact_knn_sharded(emb, k, query_block=256, tile=512,
                                             qchunk=1024, shard_bytes=1024 * 2 * d,
                                             approx_recall=1.0)

        monkeypatch.setattr(G, "QCKPT_SECS", 0.0)  # checkpoint after every qchunk
        calls = {"n": 0}
        orig = G._exact_knn_shard_device

        def boom(*a, **kw):
            calls["n"] += 1
            if calls["n"] > 2:  # die inside shard 0 (4 qchunks/shard)
                raise RuntimeError("simulated tunnel wedge")
            return orig(*a, **kw)

        monkeypatch.setattr(G, "_exact_knn_shard_device", boom)
        try:
            G.exact_knn_sharded(emb, k, query_block=256, tile=512, qchunk=1024,
                                shard_bytes=1024 * 2 * d, approx_recall=1.0,
                                checkpoint_dir=str(tmp_path))
            raise AssertionError("expected simulated crash")
        except RuntimeError:
            pass
        monkeypatch.setattr(G, "_exact_knn_shard_device", orig)
        import json as _json
        meta = _json.load(open(tmp_path / "exknn_state.json"))
        # dispatches 1-2 succeeded, but the depth-1 dispatch pipeline only
        # writes chunk i back when chunk i+1 is enqueued — the crash on
        # dispatch 3 leaves chunk 2 in flight, so exactly 1 qchunk is durable
        assert meta["shards_done"] == 0 and meta["qchunks_done"] == 1

        calls2 = {"n": 0}

        def count(*a, **kw):
            calls2["n"] += 1
            return orig(*a, **kw)

        monkeypatch.setattr(G, "_exact_knn_shard_device", count)
        i2, d2 = G.exact_knn_sharded(emb, k, query_block=256, tile=512, qchunk=1024,
                                     shard_bytes=1024 * 2 * d, approx_recall=1.0,
                                     checkpoint_dir=str(tmp_path))
        # 16 qchunk sweeps total (4 shards x 4), 1 already durable
        assert calls2["n"] == 15
        assert (i2 == full_i).all()
        assert np.abs(d2 - full_d).max() < 1e-4
        assert not (tmp_path / "exknn_state.json").exists()

    def test_build_graph_default_uses_exact(self, rng, monkeypatch):
        """Above EXACT_KNN_MAX_N the default candidate pass is the sharded
        exact one; LEANN_KNN_MODE=spill opts back into the heuristic."""
        from leann_tpu.ops import graph as G

        emb = rng.standard_normal((2000, 16)).astype(np.float32)
        monkeypatch.setattr(G, "EXACT_KNN_MAX_N", 500)
        seen = []
        orig_ex, orig_sp = G.exact_knn_sharded, G.spill_knn_streamed
        monkeypatch.setattr(G, "exact_knn_sharded",
                            lambda *a, **kw: (seen.append("exact"), orig_ex(*a, **kw))[1])
        monkeypatch.setattr(G, "spill_knn_streamed",
                            lambda *a, **kw: (seen.append("spill"), orig_sp(*a, **kw))[1])
        G.build_graph(emb, r=8)
        assert seen == ["exact"]
        monkeypatch.setenv("LEANN_KNN_MODE", "spill")
        G.build_graph(emb, r=8)
        assert seen == ["exact", "spill"]

    def test_candidate_width_env_reuses_knn_ckpt(self, rng, tmp_path, monkeypatch):
        """LEANN_KNN_CANDIDATES pins c independent of R, so a degree re-prune
        (e.g. the 10M R=48 variant) resumes from the saved ckpt_knn.npy
        instead of recomputing the candidate pass."""
        import json as _json

        from leann_tpu.ops import graph as G

        emb = rng.standard_normal((600, 16)).astype(np.float32)
        ck = str(tmp_path)
        G.build_graph(emb, r=16, checkpoint_dir=ck)  # c = 16*2 = 32
        key1 = _json.load(open(tmp_path / "ckpt_knn.npy.json"))["key"]
        assert "_c32" in key1

        calls = []
        orig = G.exact_knn
        monkeypatch.setattr(G, "exact_knn",
                            lambda *a, **kw: (calls.append(1), orig(*a, **kw))[1])
        monkeypatch.setenv("LEANN_KNN_CANDIDATES", "32")
        nbrs, _ = G.build_graph(emb, r=24, checkpoint_dir=ck)  # would be c=48
        assert calls == []  # KNN phase resumed from the r=16 run's candidates
        assert nbrs.shape[1] == 24
        key2 = _json.load(open(tmp_path / "ckpt_knn.npy.json"))["key"]
        assert key2 == key1


class TestExactKnnRows:
    """Sampled-row exact oracle (exact_knn_rows) — the cheap validation gate
    for approximate candidate generators at 10M-60M scale."""

    def test_matches_full_exact(self, rng):
        from leann_tpu.ops.graph import exact_knn, exact_knn_rows

        n, d, k = 3000, 32, 8
        emb = rng.standard_normal((n, d)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        full_i, full_d = exact_knn(emb, k, query_block=256, tile=1024,
                                   approx_recall=1.0)
        rows = np.sort(rng.choice(n, 64, replace=False))
        # shard_bytes forces multiple column shards through the merge path
        ri, rd = exact_knn_rows(emb, rows, k, shard_bytes=512 * 2 * d, tile=512)
        assert (ri == full_i[rows]).all()
        assert np.abs(rd - full_d[rows]).max() < 1e-4

    def test_include_self(self, rng):
        from leann_tpu.ops.graph import exact_knn_rows

        n, d = 1000, 16
        emb = rng.standard_normal((n, d)).astype(np.float32)
        rows = np.arange(0, n, 97)
        ri, rd = exact_knn_rows(emb, rows, 4, include_self=True, tile=512)
        assert (ri[:, 0] == rows).all()  # self distance ~0 wins every row
        # bf16 dots on unnormalized vectors (|x|^2 ~ 16) leave ~0.1 residue
        assert np.abs(rd[:, 0]).max() < 0.3

    def test_f16_memmap_input(self, rng, tmp_path):
        """Tier matrices arrive as f16 memmaps beyond ~12M chunks; the oracle
        must accept them directly (blockwise f32 casts, no full-size copy)."""
        from leann_tpu.ops.graph import exact_knn_rows

        n, d, k = 2000, 16, 6
        emb = rng.standard_normal((n, d)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        p = tmp_path / "emb.npy"
        np.save(p, emb.astype(np.float16))
        mm = np.load(p, mmap_mode="r")
        rows = np.sort(rng.choice(n, 32, replace=False))
        ri, _ = exact_knn_rows(mm, rows, k, tile=512)
        ri32, _ = exact_knn_rows(emb, rows, k, tile=512)
        agree = (ri == ri32).mean()
        assert agree > 0.9, f"f16 id agreement {agree}"
