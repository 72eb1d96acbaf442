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


class TestPrunedIndex:
    """Morton/bbox-pruned search (TargetIndex path)."""

    def test_build_index_shapes(self):
        rng = np.random.default_rng(4)
        t = rng.standard_normal((1000, 3)).astype(np.float32)
        index = knn.build_target_index(jnp.asarray(t), tile_t=256)
        assert index.points.shape == (1024, 8)
        assert index.bbox_min.shape == (4, 8)
        # Permutation is a valid bijection over the padded rows.
        assert sorted(np.asarray(index.perm).tolist()) == list(range(1024))

    def test_pruned_matches_oracle_interpret(self):
        rng = np.random.default_rng(5)
        t = rng.standard_normal((1500, 3)).astype(np.float32) * 3.0
        q = rng.standard_normal((300, 3)).astype(np.float32) * 3.0
        index = knn.build_target_index(jnp.asarray(t), tile_t=256)
        ref_idx, ref_d2 = _brute(q, t)
        idx, d2 = knn.nn_search_pruned(
            jnp.asarray(q), index, 1e6, interpret=True, tile_q=128, tile_t=256
        )
        np.testing.assert_array_equal(np.asarray(idx), ref_idx)
        np.testing.assert_allclose(np.asarray(d2), ref_d2, rtol=1e-3, atol=1e-5)

    def test_threshold_pruning_exact_for_accepted(self):
        rng = np.random.default_rng(6)
        t = rng.standard_normal((1000, 3)).astype(np.float32)
        q = rng.standard_normal((256, 3)).astype(np.float32)
        index = knn.build_target_index(jnp.asarray(t), tile_t=256)
        ref_idx, ref_d2 = _brute(q, t)
        max_d = 0.02
        idx, d2 = knn.nn_search_pruned(
            jnp.asarray(q), index, max_d, interpret=True, tile_q=128, tile_t=256
        )
        idx, d2 = np.asarray(idx), np.asarray(d2)
        within = ref_d2 <= max_d
        np.testing.assert_array_equal(idx[within], ref_idx[within])
        # Rows beyond threshold are flagged rejected one way or the other.
        assert ((idx[~within] == -1) | (d2[~within] > max_d)).all()

    def test_match_indexed_xla_path(self):
        rng = np.random.default_rng(7)
        t = rng.standard_normal((500, 3)).astype(np.float32)
        q = t[:100] + 0.001
        index = knn.build_target_index(jnp.asarray(t), tile_t=256)
        idx, d2, valid = knn.match_indexed(jnp.asarray(q), index, 0.01)
        assert np.asarray(valid).all()
        np.testing.assert_array_equal(np.asarray(idx), np.arange(100))

    def test_sentinel_targets_never_matched(self):
        rng = np.random.default_rng(8)
        t = np.full((512, 3), 2.0e6, np.float32)  # all invalid
        t[:10] = rng.standard_normal((10, 3))
        q = rng.standard_normal((64, 3)).astype(np.float32)
        index = knn.build_target_index(jnp.asarray(t), tile_t=256)
        idx, d2, valid = knn.match_indexed(jnp.asarray(q), index, 1e3)
        assert (np.asarray(idx)[np.asarray(valid)] < 10).all()
