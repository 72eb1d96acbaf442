"""k-NN correspondence search vs scipy brute force (reference:
NearestNeighbor.h:104-314)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial import cKDTree

from icp_variants_tpu.ops import knn


def _brute(queries, targets):
    tree = cKDTree(targets)
    d, i = tree.query(queries, k=1)
    return i.astype(np.int32), (d**2).astype(np.float32)


class TestNNSearchXLA:
    def test_matches_scipy(self):
        rng = np.random.default_rng(0)
        q = rng.standard_normal((517, 3)).astype(np.float32)
        t = rng.standard_normal((903, 3)).astype(np.float32)
        idx, d2 = knn.nn_search_xla(jnp.asarray(q), jnp.asarray(t))
        ref_idx, ref_d2 = _brute(q, t)
        np.testing.assert_array_equal(np.asarray(idx), ref_idx)
        np.testing.assert_allclose(np.asarray(d2), ref_d2, rtol=1e-3, atol=1e-5)

    def test_six_dim_color_features(self):
        rng = np.random.default_rng(1)
        qp = rng.standard_normal((100, 3)).astype(np.float32)
        tp = rng.standard_normal((200, 3)).astype(np.float32)
        qc = rng.integers(0, 256, (100, 4)).astype(np.float32)
        tc = rng.integers(0, 256, (200, 4)).astype(np.float32)
        qf = np.asarray(knn.color_features(jnp.asarray(qp), jnp.asarray(qc)))
        tf = np.asarray(knn.color_features(jnp.asarray(tp), jnp.asarray(tc)))
        # Feature layout: [x, y, z, r/255, g/255, b/255] (NearestNeighbor.h:212-224)
        np.testing.assert_allclose(qf[:, 3:], qc[:, :3] / 255.0, rtol=1e-6)
        idx, _ = knn.nn_search_xla(jnp.asarray(qf), jnp.asarray(tf))
        ref_idx, _ = _brute(qf, tf)
        np.testing.assert_array_equal(np.asarray(idx), ref_idx)


class TestNNSearchPallas:
    def test_matches_xla_interpret(self):
        """Pallas kernel in interpreter mode must agree with the XLA oracle."""
        rng = np.random.default_rng(2)
        q = rng.standard_normal((300, 3)).astype(np.float32)
        t = rng.standard_normal((1500, 3)).astype(np.float32)
        idx_p, d2_p = knn.nn_search_pallas(
            jnp.asarray(q), jnp.asarray(t), interpret=True
        )
        ref_idx, ref_d2 = _brute(q, t)
        np.testing.assert_array_equal(np.asarray(idx_p), ref_idx)
        np.testing.assert_allclose(np.asarray(d2_p), ref_d2, rtol=1e-3, atol=1e-5)

    def test_padded_targets_never_win(self):
        rng = np.random.default_rng(3)
        q = rng.standard_normal((64, 3)).astype(np.float32)
        t = rng.standard_normal((100, 3)).astype(np.float32)  # padded to 1024
        idx_p, _ = knn.nn_search_pallas(jnp.asarray(q), jnp.asarray(t), interpret=True)
        assert (np.asarray(idx_p) < 100).all()


class TestMatch:
    def test_threshold_is_squared(self):
        # FLANN path compares SQUARED distance (NearestNeighbor.h:182).
        q = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]], jnp.float32)
        t = jnp.asarray([[0.01, 0.0, 0.0], [5.0, 5.0, 5.0]], jnp.float32)
        idx, d2, valid = knn.match(q, t, max_distance=0.0003)
        valid = np.asarray(valid)
        assert valid[0]  # d2 = 1e-4 <= 3e-4
        assert not valid[1]  # d2 ~ 0.98

    def test_query_mask(self):
        q = jnp.zeros((4, 3), jnp.float32)
        t = jnp.zeros((8, 3), jnp.float32)
        mask = jnp.asarray([True, False, True, False])
        _, _, valid = knn.match(q, t, 1.0, query_mask=mask)
        np.testing.assert_array_equal(np.asarray(valid), [True, False, True, False])
