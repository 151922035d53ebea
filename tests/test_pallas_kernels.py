"""Pallas kernel tests (interpreter mode on the CPU test mesh; the compiled
path is exercised on real TPU by bench.py and the verify drives)."""

import numpy as np
import pytest


class TestPallasFlatTopk:
    @pytest.mark.parametrize("metric", ["l2", "mips"])
    def test_matches_xla(self, rng, metric):
        import jax.numpy as jnp

        from leann_tpu.ops.distance import flat_search
        from leann_tpu.ops.pallas_topk import pallas_flat_search

        n, d, b, k = 1024, 64, 4, 5
        e = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
        q = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
        vn = jnp.int32(n - 50)
        idx_p, d_p = pallas_flat_search(e, q, vn, k, metric, tile=256, interpret=True)
        idx_x, d_x = flat_search(e, q, vn, k, metric)
        overlap = np.mean(
            [len(set(a) & set(b_)) for a, b_ in zip(np.asarray(idx_p).tolist(), np.asarray(idx_x).tolist())]
        ) / k
        assert overlap >= 0.95
        np.testing.assert_allclose(np.sort(np.asarray(d_p)), np.sort(np.asarray(d_x)), rtol=1e-2, atol=1e-2)

    def test_valid_n_masks_padding(self, rng):
        import jax.numpy as jnp

        from leann_tpu.ops.pallas_topk import pallas_flat_search

        n, d = 512, 32
        e = np.zeros((n, d), np.float32)
        e[:10] = rng.standard_normal((10, d))
        # padding rows would win under mips if unmasked (dot=0 beats negatives)
        q = -np.abs(rng.standard_normal((2, d))).astype(np.float32)
        idx, dists = pallas_flat_search(jnp.asarray(e), jnp.asarray(q), jnp.int32(10), 3, "mips",
                                        tile=256, interpret=True)
        assert (np.asarray(idx) < 10).all()


class TestPanelBucketmin:
    """Fused distance + bucket-argmin kernel feeding the exact-KNN sweeps
    (ops/pallas_knn.py)."""

    def _mk(self, rng, m, d, qb):
        c = rng.standard_normal((m, d)).astype(np.float32)
        import jax.numpy as jnp

        cbf = jnp.asarray(c, jnp.bfloat16)
        cn = jnp.asarray(np.einsum("ij,ij->i", c, c), jnp.float32)
        return c, cbf, cn

    def test_matches_ref_mirror(self, rng):
        """Kernel (interpret) == the pure-jnp mirror, bit-for-bit, including
        padding mask, self-exclusion, and a nonzero strip offset."""
        import jax.numpy as jnp

        from leann_tpu.ops.pallas_knn import panel_bucketmin, panel_bucketmin_ref

        m, d, qb, tile, t_strip = 1024, 64, 8, 512, 256
        c, cbf, cn = self._mk(rng, m, d, qb)
        qe = cbf[32 : 32 + qb]
        qn = cn[32 : 32 + qb]
        args = dict(tile=tile, t_strip=t_strip)
        for off in (0, 1):  # strip offset in t_strip units: tile 2 covers rows 512+
            bo = jnp.int32(off * (tile // t_strip))
            kv, ki = panel_bucketmin(qe, qn, cbf, bo, jnp.int32(0),
                                     jnp.int32(m - 100), jnp.int32(32),
                                     interpret=True, **args)
            rv, ri = panel_bucketmin_ref(qe, qn, cbf, bo, jnp.int32(0),
                                         jnp.int32(m - 100), jnp.int32(32), **args)
            np.testing.assert_array_equal(np.asarray(ki), np.asarray(ri))
            np.testing.assert_allclose(np.asarray(kv), np.asarray(rv), rtol=1e-6)

    def test_self_and_padding_excluded(self, rng):
        import jax.numpy as jnp

        from leann_tpu.ops.pallas_knn import panel_bucketmin

        m, d, qb = 512, 32, 8
        _, cbf, cn = self._mk(rng, m, d, qb)
        q_start = 128
        kv, ki = panel_bucketmin(cbf[q_start : q_start + qb], cn[q_start : q_start + qb],
                                 cbf, jnp.int32(0), jnp.int32(0),
                                 jnp.int32(300), jnp.int32(q_start),
                                 tile=512, t_strip=128, interpret=True)
        kv, ki = np.asarray(kv), np.asarray(ki)
        finite = np.isfinite(kv)
        assert (ki[finite] < 300).all()  # rows >= col_end_real never win
        for r in range(qb):  # a query row never returns itself
            assert q_start + r not in set(ki[r][finite[r]].tolist())

    def test_exact_knn_e2e_pallas_panel(self, rng, monkeypatch):
        """exact_knn + exact_knn_sharded with the pallas panel reach the same
        neighbors as the XLA panel path (>=98% id overlap vs exact)."""
        from leann_tpu.ops import graph as G

        n, d, k = 3000, 48, 8
        emb = rng.standard_normal((n, d)).astype(np.float32)
        ids_x, _ = G.exact_knn(emb, k, query_block=128, tile=1024)
        monkeypatch.setenv("LEANN_KNN_PANEL", "pallas_interpret")
        ids_p, _ = G.exact_knn(emb, k, query_block=128, tile=1024)
        ov = np.mean([len(set(a) & set(b)) for a, b in
                      zip(ids_x.tolist(), ids_p.tolist())]) / k
        assert ov >= 0.98, ov
        ids_s, _ = G.exact_knn_sharded(emb, k, query_block=128, tile=1024,
                                       qchunk=1024, shard_bytes=1024 * 2 * d)
        ov_s = np.mean([len(set(a) & set(b)) for a, b in
                        zip(ids_x.tolist(), ids_s.tolist())]) / k
        assert ov_s >= 0.98, ov_s

    def test_pick_t_strip(self):
        from leann_tpu.ops.pallas_knn import pick_t_strip

        assert pick_t_strip(131072) == 1024
        assert pick_t_strip(512) == 512
        assert pick_t_strip(1280) == 640  # largest 128-multiple divisor <= 1024
        assert pick_t_strip(1000) == 0  # not 128-aligned -> xla fallback
