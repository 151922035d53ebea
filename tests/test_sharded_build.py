"""Sharded (mesh) graph build: ring-KNN exactness and graph-quality parity
with the single-device build, on the virtual 8-device CPU mesh."""

import numpy as np
import pytest


@pytest.fixture
def mesh():
    from leann_tpu.parallel.mesh import graph_mesh

    return graph_mesh()


def _recall(pred, truth):
    hits = sum(len(set(p) & set(t)) for p, t in zip(pred, truth))
    return hits / (len(truth) * len(truth[0]))


class TestRingKnn:
    def test_matches_single_device_exact_knn(self, rng, mesh):
        from leann_tpu.ops.graph import exact_knn
        from leann_tpu.parallel.sharded_build import ring_knn

        n, d, k = 700, 24, 8  # deliberately not divisible by 8 devices
        emb = rng.standard_normal((n, d)).astype(np.float32)
        ids_r, dists_r = ring_knn(emb, k, mesh, qb=32)
        ids_s, _ = exact_knn(emb, k, query_block=64, tile=128)
        # both are bf16-matmul exact top-k; near-ties may swap, so compare as sets
        assert _recall(ids_r, ids_s) > 0.97
        assert ids_r.shape == (n, k)
        # no self-neighbors, no out-of-range ids
        assert not any(ids_r[i].tolist().count(i) for i in range(n))
        assert ids_r.max() < n
        # distances ascend
        dd = np.where(np.isfinite(dists_r), dists_r, np.inf)
        assert (np.diff(dd, axis=1) >= -1e-3).all()

    def test_vs_numpy_bruteforce(self, rng, mesh):
        from leann_tpu.parallel.sharded_build import ring_knn

        n, d, k = 320, 16, 5
        emb = rng.standard_normal((n, d)).astype(np.float32)
        ids_r, _ = ring_knn(emb, k, mesh, qb=16)
        dmat = ((emb[:, None, :] - emb[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(dmat, np.inf)
        truth = np.argsort(dmat, axis=1)[:, :k]
        assert _recall(ids_r, truth) > 0.97


class TestShardedBuildGraph:
    def test_graph_quality_parity(self, rng, mesh):
        """A sharded-built graph must give beam-search recall on par with the
        single-device build over the same embeddings."""
        import jax.numpy as jnp
        from leann_tpu.ops.beam_search import BeamConfig, GraphData, beam_search_batch
        from leann_tpu.ops.graph import build_graph
        from leann_tpu.parallel.sharded_build import sharded_build_graph

        n, d, k = 600, 24, 10
        emb = rng.standard_normal((n, d)).astype(np.float32)
        g_s, medoid_s = sharded_build_graph(emb, mesh, r=16, qb=32, prune_block=16)
        g_1, _ = build_graph(emb, r=16)
        assert g_s.shape == g_1.shape == (n, 16)
        assert 0 <= medoid_s < n
        assert (g_s >= 0).any(axis=1).all()
        assert g_s.max() < n

        q = rng.standard_normal((8, d)).astype(np.float32)
        dmat = ((q[:, None, :] - emb[None, :, :]) ** 2).sum(-1)
        truth = np.argsort(dmat, axis=1)[:, :k]

        def search_recall(graph):
            gd = GraphData(
                neighbors=jnp.asarray(graph),
                entry_ids=jnp.asarray(np.asarray([medoid_s] + list(range(0, n, n // 8)), np.int32)),
                emb=jnp.asarray(emb),
                tokens=jnp.zeros((1, 1), jnp.int32),
                lengths=jnp.zeros((1,), jnp.int32),
                codes=jnp.zeros((1, 1), jnp.uint8),
                codebooks=jnp.zeros((1, 1, 1), jnp.float32),
            )
            cfg = BeamConfig(metric="l2", k=k, complexity=64, beam=4, max_steps=64,
                             traversal="stored")
            labels, _, _, _ = beam_search_batch(jnp.asarray(q), gd, cfg)
            return _recall(np.asarray(labels), truth)

        rec_s, rec_1 = search_recall(g_s), search_recall(g_1)
        assert rec_s >= rec_1 - 0.05, f"sharded {rec_s} vs single {rec_1}"
        assert rec_s >= 0.9


class TestBuilderIntegration:
    def test_build_sharded_kwarg_end_to_end(self, rng, tmp_path):
        """LeannBuilder(build_sharded=True) builds over the virtual mesh and
        the resulting index searches identically through the public API."""
        from leann_tpu import LeannBuilder, LeannSearcher

        texts = [f"doc {i} " + " ".join(f"w{rng.integers(0, 100)}" for _ in range(10))
                 for i in range(200)]
        prefix = str(tmp_path / "sb.leann")
        b = LeannBuilder(backend_name="diskann", embedding_model="hash-tiny",
                         max_length=32, graph_degree=8, build_sharded=True)
        for t in texts:
            b.add_text(t)
        b.build_index(prefix)
        s = LeannSearcher(prefix)
        res = s.search("doc 7", top_k=3, complexity=16, beam_width=2)
        assert len(res) == 3 and all(np.isfinite(r.score) for r in res)
