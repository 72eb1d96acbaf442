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
        idx_p = np.asarray(idx_p)
        # nn_search_pallas is unthresholded: every query must win SOME
        # real row (an all-reject regression would also satisfy < 100).
        assert (idx_p >= 0).all()
        assert (idx_p < 100).all()


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
        valid = np.asarray(valid)
        # Standard-normal queries vs real targets at threshold 1e3: every
        # query must match (guards against an all-invalid vacuous pass).
        assert valid.all()
        assert (np.asarray(idx)[valid] < 10).all()


class TestVisitLists:
    """_visit_lists: the host-side tile-walk planner of the v2 kernel."""

    def _lists(self, q, t, tile_q, tile_t, bound):
        qp = np.asarray(knn._pad_rows(knn._pad_features(jnp.asarray(q)), tile_q, 0.0))
        index = knn.build_target_index(jnp.asarray(t), tile_t=tile_t)
        qtiles = qp.reshape(-1, tile_q, knn.FEATURE_PAD)
        vlist, lblist, counts, _counts0 = knn._visit_lists(
            jnp.min(jnp.asarray(qtiles), axis=1),
            jnp.max(jnp.asarray(qtiles), axis=1),
            index.bbox_min, index.bbox_max, jnp.float32(bound),
        )
        return (np.asarray(vlist), np.asarray(lblist), np.asarray(counts),
                index, qtiles)

    def test_counts_and_membership(self):
        rng = np.random.default_rng(10)
        t = rng.uniform(-4, 4, (1500, 3)).astype(np.float32)
        t = t[np.argsort(knn.morton_codes_np(t))]
        q = rng.uniform(-4, 4, (256, 3)).astype(np.float32)
        bound = 0.5
        vlist, suffix, counts, index, qtiles = self._lists(q, t, 128, 256, bound)
        # Reference visit set per query tile from raw bbox arithmetic.
        bmin, bmax = np.asarray(index.bbox_min), np.asarray(index.bbox_max)
        for r in range(vlist.shape[0]):
            qmin, qmax = qtiles[r].min(axis=0), qtiles[r].max(axis=0)
            gap = np.maximum(np.maximum(qmin - bmax, bmin - qmax), 0.0)
            lb = (gap * gap).sum(axis=1)
            expected = set(np.flatnonzero(lb <= bound).tolist())
            assert counts[r] == len(expected)
            assert set(vlist[r, : counts[r]].tolist()) == expected
            # Padding slots carry tile 0 (always a valid DMA target).
            assert (vlist[r, counts[r]:] == 0).all()
            if counts[r] == 0:
                continue
            # The suffix-min list is exact: position k holds the min lb over
            # listed tiles >= k; padding suffixes are huge (never started).
            lbs = lb[vlist[r, : counts[r]]]
            expected_suffix = np.minimum.accumulate(lbs[::-1])[::-1]
            np.testing.assert_allclose(
                suffix[r, : counts[r]], expected_suffix, rtol=1e-5
            )
            assert (suffix[r, counts[r]:] > bound).all()

    def test_sorted_nearest_first(self):
        """Visited tiles come sorted ascending by lower bound, within the
        sqrt-scale counting-sort bin resolution."""
        rng = np.random.default_rng(11)
        t = rng.uniform(-8, 8, (2000, 3)).astype(np.float32)
        t = t[np.argsort(knn.morton_codes_np(t))]
        q = rng.uniform(-1, 1, (128, 3)).astype(np.float32)
        bound = 4.0
        vlist, suffix, counts, index, qtiles = self._lists(q, t, 128, 256, bound)
        bmin, bmax = np.asarray(index.bbox_min), np.asarray(index.bbox_max)
        bin_width = np.sqrt(bound) / 8
        for r in range(vlist.shape[0]):
            qmin, qmax = qtiles[r].min(axis=0), qtiles[r].max(axis=0)
            gap = np.maximum(np.maximum(qmin - bmax, bmin - qmax), 0.0)
            lb = (gap * gap).sum(axis=1)
            lbs = np.sqrt(lb[vlist[r, : counts[r]]])
            # Non-decreasing up to one bin width of slack.
            assert (np.diff(lbs) >= -bin_width - 1e-6).all()
            # Suffix-min is non-decreasing by construction.
            assert (np.diff(suffix[r]) >= -1e-6).all()

    def test_empty_visit_set(self):
        t = np.zeros((512, 3), np.float32)
        q = np.full((128, 3), 100.0, np.float32)  # far from every target
        vlist, suffix, counts, _, _ = self._lists(q, t, 128, 256, 0.01)
        assert (counts == 0).all()


class TestPrunedV2:
    """The production TPU kernel (visited lists + double-buffered DMA),
    exercised in interpreter mode against the scipy oracle."""

    def _run(self, q, t, bound, **kw):
        kw.setdefault("tile_q", 128)
        kw.setdefault("tile_t", 256)
        kw.setdefault("chunk", 2)
        index = knn.build_target_index(jnp.asarray(t), tile_t=kw["tile_t"])
        idx, d2 = knn.nn_search_pruned_v2(
            jnp.asarray(q), index, bound, interpret=True, **kw
        )
        return np.asarray(idx), np.asarray(d2)

    def test_matches_oracle_morton_layout(self):
        rng = np.random.default_rng(12)
        t = rng.uniform(-5, 5, (1700, 3)).astype(np.float32)
        t = t[np.argsort(knn.morton_codes_np(t))]
        q = rng.uniform(-5, 5, (300, 3)).astype(np.float32)
        q = q[np.argsort(knn.morton_codes_np(q))]
        ref_idx, ref_d2 = _brute(q, t)
        idx, d2 = self._run(q, t, 1e6)
        np.testing.assert_array_equal(idx, ref_idx)
        np.testing.assert_allclose(d2, ref_d2, rtol=1e-3, atol=1e-5)

    def test_matches_oracle_unordered_layout(self):
        """Exactness must not depend on Morton ordering (only pruning does)."""
        rng = np.random.default_rng(13)
        t = rng.uniform(-5, 5, (1000, 3)).astype(np.float32)
        q = rng.uniform(-5, 5, (200, 3)).astype(np.float32)
        ref_idx, ref_d2 = _brute(q, t)
        idx, d2 = self._run(q, t, 1e6)
        np.testing.assert_array_equal(idx, ref_idx)

    def test_threshold_exact_for_accepted(self):
        rng = np.random.default_rng(14)
        t = rng.uniform(-3, 3, (1500, 3)).astype(np.float32)
        t = t[np.argsort(knn.morton_codes_np(t))]
        q = rng.uniform(-3, 3, (256, 3)).astype(np.float32)
        max_d = 0.05
        ref_idx, ref_d2 = _brute(q, t)
        idx, d2 = self._run(q, t, max_d)
        within = ref_d2 <= max_d
        np.testing.assert_array_equal(idx[within], ref_idx[within])
        np.testing.assert_allclose(d2[within], ref_d2[within], rtol=1e-3, atol=1e-6)
        assert ((idx[~within] == -1) | (d2[~within] > max_d)).all()

    def test_zero_count_query_tiles(self):
        """A query tile with NO visited target tiles must come back all
        rejected (n_chunks == 0 skips the DMA loop entirely)."""
        rng = np.random.default_rng(15)
        t = rng.standard_normal((512, 3)).astype(np.float32)
        q = np.concatenate([
            t[:128] + 0.001,                       # tile 0: near targets
            np.full((128, 3), 500.0, np.float32),  # tile 1: far from all
        ]).astype(np.float32)
        idx, d2 = self._run(q, t, 0.01)
        assert (idx[:128] >= 0).all()
        assert (idx[128:] == -1).all()
        assert (d2[128:] > 0.01).all()

    def test_chunk_padding_redundant_tiles_harmless(self):
        """Counts round up to whole chunks; the padding slots re-walk tile 0
        and must not corrupt results (running-min idempotence). chunk=4 with
        few visited tiles forces heavy padding."""
        rng = np.random.default_rng(16)
        t = rng.uniform(-2, 2, (800, 3)).astype(np.float32)
        t = t[np.argsort(knn.morton_codes_np(t))]
        q = rng.uniform(-2, 2, (128, 3)).astype(np.float32)
        ref_idx, ref_d2 = _brute(q, t)
        idx, _ = self._run(q, t, 1e6, chunk=4)
        np.testing.assert_array_equal(idx, ref_idx)

    def test_sentinel_tiles(self):
        """Tiles made entirely of PAD_SENTINEL rows never produce matches."""
        rng = np.random.default_rng(17)
        t = np.full((1024, 3), 1.0e6, np.float32)
        t[:100] = rng.standard_normal((100, 3))
        q = rng.standard_normal((128, 3)).astype(np.float32)
        index = knn.build_target_index(jnp.asarray(t), tile_t=256)
        idx, d2 = knn.nn_search_pruned_v2(
            jnp.asarray(q), index, 1e3, interpret=True,
            tile_q=128, tile_t=256, chunk=2,
        )
        idx = np.asarray(idx)
        # All queries sit near the 100 real rows at threshold 1e3, so all
        # must match — otherwise the filtered check passes vacuously.
        assert (idx >= 0).all()
        assert (idx < 100).all()

    def test_ties_return_equal_distance(self):
        """Duplicate targets in different tiles: the winner may differ from
        scipy's lowest-index rule, but the distance must be exact and the
        winner must be one of the duplicates."""
        rng = np.random.default_rng(18)
        t = rng.uniform(-1, 1, (512, 3)).astype(np.float32)
        t[300] = t[10]  # exact duplicate across tiles
        q = (t[10] + 0.0005)[None].repeat(128, axis=0).astype(np.float32)
        idx, d2 = self._run(q, t, 1.0)
        ref_d2 = ((q[0] - t[10]) ** 2).sum()
        assert np.isin(idx, [10, 300]).all()
        # Expanded-form f32 distances carry ~1e-7 absolute cancellation noise
        # at unit norms; winner selection is unaffected (HIGHEST matmul).
        np.testing.assert_allclose(d2, ref_d2, rtol=1e-3, atol=2e-7)

    def test_bench_tile_configuration(self):
        """The exact production configuration — nn_search_pruned_v2's
        DEFAULTS (tile_q=V2_TILE_Q, tile_t=V2_TILE_T, chunk=V2_CHUNK), the
        ones match_indexed dispatches to on TPU — at a reduced-but-
        multi-tile scale."""
        rng = np.random.default_rng(19)
        t = rng.uniform(-10, 10, (6000, 3)).astype(np.float32)
        t = t[np.argsort(knn.morton_codes_np(t))]
        q = rng.uniform(-10, 10, (512, 3)).astype(np.float32)
        q = q[np.argsort(knn.morton_codes_np(q))]
        ref_idx, ref_d2 = _brute(q, t)
        max_d = 10.0
        index = knn.build_target_index(jnp.asarray(t), tile_t=knn.V2_TILE_T)
        idx, d2 = knn.nn_search_pruned_v2(
            jnp.asarray(q), index, max_d, interpret=True,
        )
        idx, d2 = np.asarray(idx), np.asarray(d2)
        within = ref_d2 <= max_d
        np.testing.assert_array_equal(idx[within], ref_idx[within])

    def test_match_indexed_forced_v2(self):
        """match_indexed(impl='v2') routes through the production kernel and
        applies threshold + target-validity masking identically to the XLA
        path."""
        rng = np.random.default_rng(20)
        t = rng.uniform(-2, 2, (700, 3)).astype(np.float32)
        t = t[np.argsort(knn.morton_codes_np(t))]
        q = rng.uniform(-2, 2, (130, 3)).astype(np.float32)
        qmask = rng.random(130) < 0.8
        index = knn.build_target_index(jnp.asarray(t), tile_t=256)
        i2, d2, v2 = knn.match_indexed(
            jnp.asarray(q), index, 0.1, query_mask=jnp.asarray(qmask),
            impl="v2", interpret=True,
        )
        ix, dx, vx = knn.match_indexed(
            jnp.asarray(q), index, 0.1, query_mask=jnp.asarray(qmask),
            impl="xla",
        )
        np.testing.assert_array_equal(np.asarray(v2), np.asarray(vx))
        sel = np.asarray(v2)
        np.testing.assert_array_equal(np.asarray(i2)[sel], np.asarray(ix)[sel])
