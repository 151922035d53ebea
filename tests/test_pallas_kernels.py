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
