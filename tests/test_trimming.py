"""Robust-registration extensions (no reference analogs): Trimmed ICP
(ops/rejection.py trimmed_mask, ICPConfig.trim_ratio) and robust
M-estimator weighting (ops/weighting.py HUBER/TUKEY). Covers the
histogram-quantile mask and weights against numpy oracles, the
partial-overlap robustness claims end-to-end, and that the defaults stay
reference-parity."""

import jax
import jax.numpy as jnp
import numpy as np

from icp_variants_tpu.core import cloud as cloud_lib
from icp_variants_tpu.ops import rejection, weighting
from icp_variants_tpu.pipeline import icp
from icp_variants_tpu.pipeline.config import (
    ICPConfig, Metric, Minimizer, Weighting,
)


class TestTrimmedMask:
    def test_keeps_best_fraction(self):
        rng = np.random.default_rng(0)
        max_d2 = 2.0
        d2 = rng.uniform(0, max_d2, 4096).astype(np.float32)
        valid = rng.uniform(size=4096) < 0.7
        ratio = 0.6
        keep = np.asarray(
            rejection.trimmed_mask(
                jnp.asarray(d2), jnp.asarray(valid), ratio, max_d2
            )
        )
        n = valid.sum()
        k = int(np.ceil(ratio * n))
        # At least the requested count survives, and never invalid rows.
        assert keep.sum() >= k
        assert not (keep & ~valid).any()
        # Bin-resolution optimality: every kept distance is <= every
        # dropped one up to one bin width (ties at the cut bin are kept).
        bin_w = max_d2 / rejection.TRIM_BINS
        dropped = valid & ~keep
        if dropped.any():
            assert d2[keep].max() <= d2[dropped].min() + bin_w
            # And not grossly over-kept: the cut is the FIRST bin
            # reaching k, so the kept count stays within one bin
            # population of k.
            cut_bin = int(d2[keep].max() / bin_w)
            in_cut = valid & (np.floor(d2 / bin_w).astype(int) == cut_bin)
            assert keep.sum() - k < in_cut.sum() + 1

    def test_all_kept_at_ratio_one(self):
        rng = np.random.default_rng(1)
        d2 = rng.uniform(0, 1.0, 512).astype(np.float32)
        valid = rng.uniform(size=512) < 0.5
        keep = np.asarray(
            rejection.trimmed_mask(jnp.asarray(d2), jnp.asarray(valid), 1.0, 1.0)
        )
        np.testing.assert_array_equal(keep, valid)

    def test_empty_valid_stays_empty(self):
        d2 = jnp.zeros(128, jnp.float32)
        valid = jnp.zeros(128, bool)
        keep = np.asarray(rejection.trimmed_mask(d2, valid, 0.5, 1.0))
        assert not keep.any()


class TestRobustWeights:
    def _matches(self, r, extra=0):
        """MatchArrays whose residual norms are exactly ``r`` (along x)."""
        n = len(r)
        src = np.zeros((n, 3), np.float32)
        src[:, 0] = r
        z = np.zeros((n, 3), np.float32)
        ones = np.ones((n, 4), np.float32)
        return weighting.MatchArrays(
            src_points=jnp.asarray(src), tgt_points=jnp.asarray(z),
            src_normals=jnp.asarray(z), tgt_normals=jnp.asarray(z),
            src_colors=jnp.asarray(ones), tgt_colors=jnp.asarray(ones),
            valid=jnp.ones((n,), bool),
        )

    def test_huber_matches_oracle(self):
        rng = np.random.default_rng(0)
        r = np.abs(rng.standard_normal(2048)).astype(np.float32)
        max_d2 = float((r ** 2).max()) * 1.01
        m = self._matches(r)
        w = np.asarray(
            weighting.apply_weights(Weighting.HUBER, m, max_d2)
        )
        # Oracle scale from the same bin-center median + MAD convention.
        bin_w = max_d2 / rejection.TRIM_BINS

        def med_bin_center(vals2):
            idx = np.minimum(
                (vals2 / bin_w).astype(int), rejection.TRIM_BINS - 1
            )
            cut = int(np.searchsorted(
                np.cumsum(np.bincount(idx, minlength=rejection.TRIM_BINS)),
                np.ceil(0.5 * len(vals2)),
            ))
            return (cut + 0.5) * bin_w

        med = np.sqrt(med_bin_center(r.astype(np.float64) ** 2))
        mad = np.sqrt(med_bin_center((r - med) ** 2))
        sigma = 1.4826 * max(mad, np.sqrt(bin_w))
        k = 1.345 * sigma
        w_ref = np.minimum(1.0, k / np.maximum(r, 1e-30))
        np.testing.assert_allclose(w, w_ref, rtol=1e-4, atol=1e-6)
        assert (w[r <= k] == 1.0).all()

    def test_tukey_zero_beyond_cutoff(self):
        r = np.concatenate([
            np.full(1000, 0.1, np.float32), np.full(24, 10.0, np.float32),
        ])
        max_d2 = 101.0
        w = np.asarray(
            weighting.apply_weights(Weighting.TUKEY, self._matches(r), max_d2)
        )
        assert (w[-24:] == 0.0).all()       # gross outliers fully cut
        assert (w[:1000] > 0.9).all()       # inliers near full weight

    def test_scale_floor_keeps_converged_weights(self):
        """All-zero residuals (perfect alignment) must yield full Huber
        weights, not 0/0."""
        r = np.zeros(512, np.float32)
        w = np.asarray(
            weighting.apply_weights(Weighting.HUBER, self._matches(r), 1.0)
        )
        np.testing.assert_array_equal(w, np.ones(512, np.float32))


def _partial_overlap_pair(n=4000, ghost_frac=0.3, seed=0):
    """Source = rigidly moved target sample PLUS a ghost layer 0.5 above
    the surface that has no counterpart in the target — its matches pull
    the plain solve upward, the classic partial-overlap failure TrICP
    fixes."""
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-2, 2, (n, 2)).astype(np.float32)
    z = 0.3 * np.sin(2 * xy[:, 0]) * np.cos(2 * xy[:, 1])
    tgt = np.column_stack([xy, z]).astype(np.float32)

    ang = 0.05
    R = np.array(
        [[np.cos(ang), -np.sin(ang), 0],
         [np.sin(ang), np.cos(ang), 0],
         [0, 0, 1]], np.float32,
    )
    shift = np.array([0.05, -0.03, 0.02], np.float32)
    inliers = tgt @ R.T + shift
    n_ghost = int(n * ghost_frac)
    ghost_xy = rng.uniform(-2, 2, (n_ghost, 2)).astype(np.float32)
    ghost_z = (
        0.3 * np.sin(2 * ghost_xy[:, 0]) * np.cos(2 * ghost_xy[:, 1]) + 0.5
    )
    ghost = np.column_stack([ghost_xy, ghost_z]).astype(np.float32)
    ghost = ghost @ R.T + shift
    src = np.concatenate([inliers, ghost]).astype(np.float32)
    return src, tgt, R, shift


class TestEndToEnd:
    def _run(self, trim_ratio, weighting_method=Weighting.CONSTANT):
        src, tgt, R, shift = _partial_overlap_pair()
        source = cloud_lib.from_numpy(src, morton_order=True)
        target = cloud_lib.from_numpy(tgt, morton_order=True)
        cfg = ICPConfig(
            metric=Metric.POINT_TO_POINT, minimizer=Minimizer.LINEAR,
            max_distance=1.0, n_iterations=12, trim_ratio=trim_ratio,
            weighting=weighting_method,
        )
        # GT oracle over the INLIER rows only (ghosts have no true
        # counterpart). from_numpy Morton-reorders rows, so identify the
        # inliers by undoing the known transform and re-deriving z.
        rows = np.asarray(source.points)
        undone = (rows - shift) @ R
        true_z = 0.3 * np.sin(2 * undone[:, 0]) * np.cos(2 * undone[:, 1])
        is_inlier = np.abs(undone[:, 2] - true_z) < 0.25
        gt_src = rows
        gt_tgt = undone
        gt_valid = np.asarray(source.valid) & is_inlier
        res = icp.run_icp(
            cfg, source, target, key=jax.random.PRNGKey(0),
            gt_source_points=gt_src, gt_target_points=gt_tgt,
            gt_valid=gt_valid,
        )
        return float(np.asarray(res.trace.rmse)[-1])

    def test_trimming_beats_plain_under_partial_overlap(self):
        plain = self._run(1.0)
        trimmed = self._run(0.7)
        # The ghost layer biases the plain solve; trimming at 0.7 must
        # recover the inlier alignment at least 3x better.
        assert trimmed < plain / 3.0, (trimmed, plain)
        assert trimmed < 0.02, trimmed

    def test_robust_weighting_beats_constant_under_partial_overlap(self):
        """Huber and Tukey IRLS weights must likewise suppress the ghost
        layer's pull — same robustness claim as trimming, realized through
        stage 3 instead of stage 4."""
        plain = self._run(1.0)
        huber = self._run(1.0, Weighting.HUBER)
        tukey = self._run(1.0, Weighting.TUKEY)
        assert huber < plain / 3.0, (huber, plain)
        assert tukey < plain / 3.0, (tukey, plain)
        assert tukey < 0.02 and huber < 0.02

    def test_ratio_one_is_parity(self):
        """trim_ratio=1.0 must compile to the untouched reference-parity
        program — bitwise-identical pose to the default config."""
        src, tgt, _, _ = _partial_overlap_pair(n=800, ghost_frac=0.0)
        source = cloud_lib.from_numpy(src, morton_order=True)
        target = cloud_lib.from_numpy(tgt, morton_order=True)
        base = ICPConfig(
            metric=Metric.POINT_TO_PLANE, minimizer=Minimizer.LINEAR,
            max_distance=1.0, n_iterations=5,
        )
        r1 = icp.run_icp(base, source, target, key=jax.random.PRNGKey(0))
        r2 = icp.run_icp(base.replace(trim_ratio=1.0), source, target,
                         key=jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(r1.pose), np.asarray(r2.pose))
