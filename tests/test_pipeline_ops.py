"""Selection / weighting / rejection stage tests (reference: selection.h,
weighting.h, ICPOptimizer.h:157-174)."""

import jax
import jax.numpy as jnp
import numpy as np

from icp_variants_tpu.ops import rejection, selection, weighting
from icp_variants_tpu.pipeline.config import Weighting


def _arrays(n=8):
    rng = np.random.default_rng(0)
    return weighting.MatchArrays(
        src_points=jnp.asarray(rng.standard_normal((n, 3)), jnp.float32),
        tgt_points=jnp.asarray(rng.standard_normal((n, 3)), jnp.float32),
        src_normals=jnp.asarray(rng.standard_normal((n, 3)), jnp.float32),
        tgt_normals=jnp.asarray(rng.standard_normal((n, 3)), jnp.float32),
        src_colors=jnp.asarray(rng.integers(0, 256, (n, 4)), jnp.float32),
        tgt_colors=jnp.asarray(rng.integers(0, 256, (n, 4)), jnp.float32),
        valid=jnp.ones((n,), bool),
    )


class TestSelection:
    def test_select_all_passthrough(self):
        mask = jnp.asarray([True, False, True])
        np.testing.assert_array_equal(
            np.asarray(selection.select_all(mask)), np.asarray(mask)
        )

    def test_random_sampling_rate(self):
        mask = jnp.ones((20000,), bool)
        sel = selection.random_sampling(jax.random.PRNGKey(0), mask, 0.3)
        rate = float(jnp.mean(sel))
        assert 0.27 < rate < 0.33

    def test_random_respects_base_mask(self):
        base = jnp.zeros((100,), bool)
        sel = selection.random_sampling(jax.random.PRNGKey(1), base, 0.9)
        assert not bool(jnp.any(sel))


class TestBernoulliGaps:
    """The geometric-gap draw must reproduce the Bernoulli(p) process that
    the reference's per-point mt19937 + compaction realises
    (selection.h:88-106): binomial count, uniform marginals, ascending
    rows."""

    def test_count_matches_binomial(self):
        n, p, k_cap = 20000, 0.05, 1536
        counts = []
        draw = jax.jit(
            lambda k: selection.bernoulli_gap_indices(
                k, p, jnp.int32(1), n, k_cap
            )[1].sum()
        )
        for s in range(200):
            counts.append(int(draw(jax.random.PRNGKey(s))))
        counts = np.asarray(counts)
        mean, std = n * p, np.sqrt(n * p * (1 - p))
        # 200-sample mean is within ~4 standard errors; std within 20%.
        assert abs(counts.mean() - mean) < 4 * std / np.sqrt(200)
        assert 0.8 * std < counts.std() < 1.2 * std

    def test_uniform_marginals_and_ascending(self):
        n, p, k_cap = 10000, 0.03, 768
        hits = np.zeros(n)
        for s in range(100):
            rows, mask = selection.bernoulli_gap_indices(
                jax.random.PRNGKey(s), p, jnp.int32(1), n, k_cap
            )
            rows, mask = np.asarray(rows), np.asarray(mask)
            valid_rows = rows[mask]
            assert np.all(np.diff(valid_rows) > 0)  # strictly ascending
            hits[valid_rows] += 1
        # every decile of the cloud is hit at the same ~p rate
        decile_rates = hits.reshape(10, -1).mean(axis=1) / 100
        np.testing.assert_allclose(decile_rates, p, rtol=0.25)

    def test_stride_lattice_and_offset(self):
        n, p, k_cap = 5000, 0.2, 1280
        stride = jnp.int32(8)
        rows, mask = selection.bernoulli_gap_indices(
            jax.random.PRNGKey(3), p, stride, n, k_cap, index_offset=13
        )
        rows, mask = np.asarray(rows), np.asarray(mask)
        # globally (row + offset) ≡ 0 mod stride
        assert np.all((rows[mask] + 13) % 8 == 0)
        assert np.all(rows[mask] < n)
        # rate over the lattice is p
        lattice_size = len(range((-13) % 8, n, 8))
        assert abs(mask.sum() - p * lattice_size) < 5 * np.sqrt(
            lattice_size * p * (1 - p)
        )

    def test_gap_distribution_geometric(self):
        p, k_cap = 0.1, 4096
        rows, mask = selection.bernoulli_gap_indices(
            jax.random.PRNGKey(7), p, jnp.int32(1), 10**6, k_cap
        )
        gaps = np.diff(np.asarray(rows)[np.asarray(mask)])
        # mean inter-arrival of a Bernoulli process is 1/p
        assert abs(gaps.mean() - 1 / p) < 0.6

    def test_coarse_stride_no_int32_overflow(self):
        # tiny p at a coarse stride: unclamped cumsum*stride would overflow
        rows, mask = selection.bernoulli_gap_indices(
            jax.random.PRNGKey(0), 1e-4, jnp.int32(2048), 365056, 4736
        )
        rows = np.asarray(rows)
        assert rows.min() >= 0 and rows.max() < 365056


class TestWeighting:
    def test_constant(self):
        m = _arrays()
        w = weighting.apply_weights(Weighting.CONSTANT, m, 0.1)
        np.testing.assert_allclose(np.asarray(w), 1.0)

    def test_distances_formula(self):
        m = _arrays()
        w = np.asarray(weighting.apply_weights(Weighting.DISTANCES, m, 0.5))
        d2 = np.sum(
            (np.asarray(m.src_points) - np.asarray(m.tgt_points)) ** 2, axis=1
        )
        np.testing.assert_allclose(w, 1.0 - d2 / 0.5, rtol=1e-5)

    def test_normals_formula(self):
        m = _arrays()
        w = np.asarray(weighting.apply_weights(Weighting.NORMALS, m, 0.5))
        dot = np.sum(np.asarray(m.src_normals) * np.asarray(m.tgt_normals), axis=1)
        np.testing.assert_allclose(w, dot, rtol=1e-5)

    def test_colors_multiplies_distance_weight(self):
        # COLORS = distance-weight * color-compatibility (weighting.h:56-87).
        m = _arrays()
        wd = np.asarray(weighting.apply_weights(Weighting.DISTANCES, m, 0.5))
        wc = np.asarray(weighting.apply_weights(Weighting.COLORS, m, 0.5))
        sc = np.asarray(m.src_colors)[:, :3]
        tc = np.asarray(m.tgt_colors)[:, :3]
        diff = np.mod(sc - tc, 256.0)  # uint8 wraparound (weighting.h:28)
        color_term = 1.0 - np.sum(diff * diff, axis=1) / 195075.0
        np.testing.assert_allclose(wc, wd * color_term, rtol=1e-4)

    def test_nonfinite_gives_zero(self):
        m = _arrays()
        m = m._replace(src_points=m.src_points.at[0].set(jnp.nan))
        w = np.asarray(weighting.apply_weights(Weighting.DISTANCES, m, 0.5))
        assert w[0] == 0.0


class TestRejection:
    def test_sixty_degree_threshold(self):
        src_n = jnp.asarray(
            [[1, 0, 0], [1, 0, 0], [1, 0, 0]], jnp.float32
        )
        # Angles: 0deg (keep), 59deg (keep), 61deg (reject)
        a59, a61 = np.deg2rad(59), np.deg2rad(61)
        tgt_n = jnp.asarray(
            [
                [1, 0, 0],
                [np.cos(a59), np.sin(a59), 0],
                [np.cos(a61), np.sin(a61), 0],
            ],
            jnp.float32,
        )
        valid = jnp.ones((3,), bool)
        out = np.asarray(rejection.normal_angle_mask(src_n, tgt_n, valid))
        np.testing.assert_array_equal(out, [True, True, False])

    def test_nan_normals_kept(self):
        # C++ acos(nan) > threshold is false -> the match survives rejection
        # (ICPOptimizer.h:170); parity preserved.
        src_n = jnp.asarray([[jnp.nan, 0, 0]], jnp.float32)
        tgt_n = jnp.asarray([[1, 0, 0]], jnp.float32)
        out = np.asarray(
            rejection.normal_angle_mask(src_n, tgt_n, jnp.ones((1,), bool))
        )
        assert out[0]

    def test_respects_input_mask(self):
        n = jnp.asarray([[1.0, 0, 0]], jnp.float32)
        out = rejection.normal_angle_mask(n, n, jnp.zeros((1,), bool))
        assert not bool(out[0])


class TestSegmentedMultires:
    def test_segmented_matches_in_scan(self):
        """run_icp_batch_multires_segmented (per-level executables over
        stride-SLICED sources) must reproduce the in-scan multires path:
        same membership lattice, same pose trajectory up to f32
        reduction order."""
        import jax

        from icp_variants_tpu.core.cloud import from_numpy
        from icp_variants_tpu.ops import kdtree, normals as nrm
        from icp_variants_tpu.pipeline import icp
        from icp_variants_tpu.pipeline.config import (
            ICPConfig, Metric, Minimizer,
        )

        rng = np.random.default_rng(40)
        clouds_s, clouds_t, kds = [], [], []
        for b in range(2):
            xy = rng.uniform(-2, 2, (3000, 2))
            z = 0.3 * np.sin(2 * xy[:, 0]) * np.cos(2 * xy[:, 1])
            tgt_np = np.column_stack([xy, z]).astype(np.float32)
            src_np = tgt_np + np.array([0.04, -0.02, 0.01], np.float32)
            col = np.clip(
                127 + 120 * np.sin(3 * tgt_np[:, :1] + np.arange(4)), 0, 255
            ).astype(np.float32)
            src = from_numpy(src_np, colors=col, morton_order=True)
            tgt = from_numpy(tgt_np, colors=col, morton_order=True)
            src = src._replace(
                normals=nrm.estimate_normals_knn(src.points, src.valid, k=5))
            tgt = tgt._replace(
                normals=nrm.estimate_normals_knn(tgt.points, tgt.valid, k=5))
            clouds_s.append(src)
            clouds_t.append(tgt)
            kds.append(kdtree.build_kd_index(
                np.asarray(tgt.points), np.asarray(tgt.valid)))
        sources = icp.stack_clouds(clouds_s)
        targets = icp.stack_clouds(clouds_t)
        kd = kdtree.stack_kd_indexes(kds)
        cfg = ICPConfig(
            metric=Metric.POINT_TO_PLANE, minimizer=Minimizer.LINEAR,
            max_distance=1.0, n_iterations=8, multi_resolution=True,
        )
        kw = dict(num_source_points=3000, kd_indexes=kd,
                  key=jax.random.PRNGKey(3))
        r_scan = icp.run_icp_batch(cfg, sources, targets, **kw)
        r_seg = icp.run_icp_batch_multires_segmented(
            cfg, sources, targets, **kw)
        assert np.asarray(r_seg.trace.rmse).shape == (
            np.asarray(r_scan.trace.rmse).shape)
        np.testing.assert_allclose(
            np.asarray(r_seg.pose), np.asarray(r_scan.pose), atol=5e-5)
        # Identical match counts per iteration: the lattice membership is
        # the same point set in both drivers.
        np.testing.assert_array_equal(
            np.asarray(r_seg.trace.num_matches),
            np.asarray(r_scan.trace.num_matches))

    def test_falls_through_for_non_dense(self):
        from icp_variants_tpu.core.cloud import from_numpy
        from icp_variants_tpu.pipeline import icp
        from icp_variants_tpu.pipeline.config import (
            ICPConfig, Metric, Minimizer, Selection,
        )

        rng = np.random.default_rng(41)
        t = rng.uniform(-3, 3, (2000, 3)).astype(np.float32)
        s = t + 0.02
        sources = icp.stack_clouds([from_numpy(s, morton_order=True)])
        targets = icp.stack_clouds([from_numpy(t, morton_order=True)])
        cfg = ICPConfig(
            metric=Metric.POINT_TO_POINT, minimizer=Minimizer.LINEAR,
            max_distance=1.0, n_iterations=4,
            selection=Selection.RANDOM, selection_proba=0.5)
        res = icp.run_icp_batch_multires_segmented(cfg, sources, targets)
        assert np.isfinite(np.asarray(res.pose)).all()
        assert np.asarray(res.trace.rmse).shape == (1, 4)


class TestSeededMembership:
    """The approximate arm's cross-level membership seeding in the
    segmented multires driver (ICPConfig.kd_seed_membership)."""

    def _color_pair(self, b=2, n=3000, seed=44):
        import jax

        from icp_variants_tpu.core.cloud import from_numpy
        from icp_variants_tpu.ops import kdtree, normals as nrm
        from icp_variants_tpu.pipeline import icp

        rng = np.random.default_rng(seed)
        clouds_s, clouds_t, kds = [], [], []
        for _ in range(b):
            xy = rng.uniform(-2, 2, (n, 2))
            z = 0.3 * np.sin(2 * xy[:, 0]) * np.cos(2 * xy[:, 1])
            tgt_np = np.column_stack([xy, z]).astype(np.float32)
            src_np = tgt_np + np.array([0.04, -0.02, 0.01], np.float32)
            col = np.clip(
                127 + 120 * np.sin(3 * tgt_np[:, :1] + np.arange(4)), 0, 255
            ).astype(np.float32)
            src = from_numpy(src_np, colors=col, morton_order=True)
            tgt = from_numpy(tgt_np, colors=col, morton_order=True)
            src = src._replace(
                normals=nrm.estimate_normals_knn(src.points, src.valid, k=5))
            tgt = tgt._replace(
                normals=nrm.estimate_normals_knn(tgt.points, tgt.valid, k=5))
            # Invalidate a patch of source normals: their rows carry no
            # coarse-level match, so the cross-level seed fill's -1
            # handling (borrow the nearest seeded neighbor's block) is
            # actually exercised rather than every row arriving seeded.
            import jax.numpy as jnp
            src_nrm = np.asarray(src.normals).copy()
            src_nrm[50:150] = np.nan
            src = src._replace(normals=jnp.asarray(src_nrm))
            clouds_s.append(src)
            clouds_t.append(tgt)
            from icp_variants_tpu.ops import knn as knn_ops
            feats = np.asarray(knn_ops.color_features(tgt.points, tgt.colors))
            kds.append(kdtree.build_kd_index(feats, np.asarray(tgt.valid)))
        return (icp.stack_clouds(clouds_s), icp.stack_clouds(clouds_t),
                kdtree.stack_kd_indexes(kds))

    def test_segmented_seeded_converges_like_unseeded(self):
        import jax

        from icp_variants_tpu.pipeline import icp
        from icp_variants_tpu.pipeline.config import (
            ICPConfig, Metric, Minimizer,
        )

        sources, targets, kd = self._color_pair()
        base = ICPConfig(
            metric=Metric.POINT_TO_PLANE, minimizer=Minimizer.LINEAR,
            max_distance=1.0, n_iterations=8, multi_resolution=True,
            color_icp=True, matching_checks=16,
        )
        kw = dict(num_source_points=3000, kd_indexes=kd,
                  key=jax.random.PRNGKey(5))
        r_seed = icp.run_icp_batch_multires_segmented(
            base, sources, targets, **kw)
        r_base = icp.run_icp_batch_multires_segmented(
            base.replace(kd_seed_membership=False), sources, targets, **kw)
        # Both runs must invert the 0.04/-0.02/0.01 shift; the seeded
        # pyramid's fine levels never re-rank membership, so poses agree
        # only approximately (both are FLANN-class approximate arms).
        gt_t = np.array([-0.04, 0.02, -0.01], np.float32)
        for r in (r_seed, r_base):
            poses = np.asarray(r.pose)
            for bpose in poses:
                np.testing.assert_allclose(bpose[:3, 3], gt_t, atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(r_seed.pose), np.asarray(r_base.pose), atol=5e-3)

    def test_match_blocks_emitted_and_threaded(self):
        import jax

        from icp_variants_tpu.pipeline import icp
        from icp_variants_tpu.pipeline.config import (
            ICPConfig, Metric, Minimizer,
        )

        sources, targets, kd = self._color_pair(b=1)
        cfg = ICPConfig(
            metric=Metric.POINT_TO_PLANE, minimizer=Minimizer.LINEAR,
            max_distance=1.0, n_iterations=3, color_icp=True,
            matching_checks=16,
        )
        res = icp.run_icp_batch(
            cfg, sources, targets, kd_indexes=kd,
            key=jax.random.PRNGKey(0))
        assert res.match_blocks is not None
        blk = np.asarray(res.match_blocks)
        nc = kd.block_orig.shape[1]
        assert blk.shape == (1, sources.points.shape[1])
        valid_blk = blk[blk >= 0]
        assert len(valid_blk) > 0 and (valid_blk < nc).all()
        # Seeding those blocks back reproduces a converged-state search.
        res2 = icp.run_icp_batch(
            cfg, sources, targets, kd_indexes=kd,
            key=jax.random.PRNGKey(0), membership_seed=res.match_blocks)
        assert np.isfinite(np.asarray(res2.pose)).all()
        # The exact arm emits no blocks.
        res3 = icp.run_icp_batch(
            cfg.replace(matching_checks=0), sources, targets,
            kd_indexes=kd, key=jax.random.PRNGKey(0))
        assert res3.match_blocks is None

    def test_seeded_pyramid_does_not_lose_matches(self):
        """Regression net for the round-5 match-loss artifact: seeding a
        pyramid level from FAR-away stride-parents lands blocks across
        color boundaries and permanently starves the restricted rows —
        the fine level's match count collapsed 4x before the gate was
        added. With SEED_MAX_PARENT_STRIDE in place, the seeded driver's
        final match count must stay within a few percent of the
        unseeded driver's on a color-structured image-like frame."""
        import jax

        from icp_variants_tpu.core.cloud import from_numpy
        from icp_variants_tpu.ops import kdtree, knn as knn_ops
        from icp_variants_tpu.ops import normals as nrm
        from icp_variants_tpu.pipeline import icp
        from icp_variants_tpu.pipeline.config import (
            ICPConfig, Metric, Minimizer,
        )

        # Image-like raster: a wavy surface with SHARP color regions, so
        # raster-adjacent rows cross 6-dim color boundaries like TUM
        # frames do (a smooth-color fixture cannot reproduce the bug).
        h, w = 48, 96
        vv, uu = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        z = 0.2 * np.sin(0.2 * uu) * np.cos(0.2 * vv)
        pts = np.column_stack([
            uu.ravel() * 0.02, vv.ravel() * 0.02, z.ravel()
        ]).astype(np.float32)
        col = np.zeros((h * w, 4), np.float32)
        col[:, 0] = (np.sin(0.5 * uu.ravel()) > 0) * 255.0
        col[:, 1] = ((uu.ravel() // 7 + vv.ravel() // 5) % 2) * 255.0
        col[:, 2] = 128.0
        src_np = pts + np.array([0.012, -0.008, 0.004], np.float32)
        tgt = from_numpy(pts, colors=col)
        src = from_numpy(src_np, colors=col)
        src = src._replace(
            normals=nrm.estimate_normals_knn(src.points, src.valid, k=5))
        tgt = tgt._replace(
            normals=nrm.estimate_normals_knn(tgt.points, tgt.valid, k=5))
        feats = np.asarray(knn_ops.color_features(tgt.points, tgt.colors))
        kd = kdtree.stack_kd_indexes([kdtree.build_kd_index(
            feats, np.asarray(tgt.valid), block_target=256)])
        sources = icp.stack_clouds([src])
        targets = icp.stack_clouds([tgt])
        cfg = ICPConfig(
            metric=Metric.POINT_TO_PLANE, minimizer=Minimizer.LINEAR,
            max_distance=0.05, n_iterations=10, multi_resolution=True,
            color_icp=True, matching_checks=16,
        )
        kw = dict(num_source_points=h * w, kd_indexes=kd,
                  key=jax.random.PRNGKey(2))
        res_seed = icp.run_icp_batch_multires_segmented(
            cfg, sources, targets, **kw)
        res_base = icp.run_icp_batch_multires_segmented(
            cfg.replace(kd_seed_membership=False), sources, targets, **kw)
        n_seed = np.asarray(res_seed.trace.num_matches)[0, -1]
        n_base = np.asarray(res_base.trace.num_matches)[0, -1]
        assert n_base > 0.5 * h * w, n_base
        assert n_seed >= 0.93 * n_base, (n_seed, n_base)
        # And the poses agree: the collapse cost 13 mm at TUM scale.
        np.testing.assert_allclose(
            np.asarray(res_seed.pose), np.asarray(res_base.pose),
            atol=2e-3)
