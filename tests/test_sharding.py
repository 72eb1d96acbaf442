"""Multi-device tests on the 8-way virtual CPU mesh: the sharded ICP step
must agree with the single-device pipeline (psum-reduced solvers)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from icp_variants_tpu.core.cloud import Cloud
from icp_variants_tpu.parallel import sharded_icp
from icp_variants_tpu.pipeline import icp
from icp_variants_tpu.pipeline.config import ICPConfig, Metric, Minimizer


def _batch(n_pairs, cap, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.standard_normal((n_pairs, cap, 3)).astype(np.float32) * 0.1
    nrm = rng.standard_normal((n_pairs, cap, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=2, keepdims=True)
    col = rng.integers(0, 256, (n_pairs, cap, 4)).astype(np.float32)
    valid = np.ones((n_pairs, cap), bool)
    # Target = source rotated a little, same normals.
    ang = 0.05
    R = np.asarray(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
        np.float32,
    )
    tgt = src @ R.T + 0.01
    return src, nrm, col, valid, tgt, nrm @ R.T, col, valid


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return jax.make_mesh((2, 4), ("pairs", "points"))


@pytest.mark.parametrize("minimizer", [Minimizer.LINEAR, Minimizer.NONLINEAR_LM])
@pytest.mark.parametrize(
    "metric", [Metric.POINT_TO_POINT, Metric.POINT_TO_PLANE, Metric.SYMMETRIC]
)
def test_sharded_matches_single_device(mesh, metric, minimizer):
    cfg = ICPConfig(
        metric=metric, minimizer=minimizer, max_distance=1.0,
        lm_max_inner_iterations=3,
    )
    n_pairs, cap = 4, 512
    arrays = _batch(n_pairs, cap)
    poses = np.tile(np.eye(4, dtype=np.float32), (n_pairs, 1, 1))
    keys = jax.random.split(jax.random.PRNGKey(0), n_pairs)

    step = sharded_icp.make_sharded_icp_step(cfg, mesh)
    shard = lambda spec, x: jax.device_put(x, NamedSharding(mesh, spec))
    sharded_args = [shard(P("pairs", "points"), a) for a in arrays[:4]]
    sharded_args += [shard(P("pairs"), a) for a in arrays[4:]]
    out_sharded = np.asarray(
        step(*sharded_args, shard(P("pairs"), poses), shard(P("pairs"), keys))
    )

    # Single-device reference: the plain _iteration per pair.
    gt = jnp.zeros((1, 3), jnp.float32)
    gtv = jnp.ones((1,), bool)
    out_ref = []
    for i in range(n_pairs):
        source = Cloud(
            points=jnp.asarray(arrays[0][i]), normals=jnp.asarray(arrays[1][i]),
            colors=jnp.asarray(arrays[2][i]), valid=jnp.asarray(arrays[3][i]),
        )
        target = Cloud(
            points=jnp.asarray(arrays[4][i]), normals=jnp.asarray(arrays[5][i]),
            colors=jnp.asarray(arrays[6][i]), valid=jnp.asarray(arrays[7][i]),
        )
        pose, _, _ = icp._iteration(
            cfg, source, target, jnp.eye(4), jnp.asarray(1, jnp.int32), keys[i],
            gt, gt, gtv, run_benchmark=False,
        )
        out_ref.append(np.asarray(pose))
    out_ref = np.stack(out_ref)

    np.testing.assert_allclose(out_sharded, out_ref, rtol=1e-3, atol=2e-5)


def test_pair_axis_only_mesh():
    """Pure data parallelism: a ('pairs', 1) mesh partitions pairs with no
    cross-device reductions."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    mesh = jax.make_mesh((4, 1), ("pairs", "points"), devices=jax.devices()[:4])
    cfg = ICPConfig(minimizer=Minimizer.LINEAR, max_distance=1.0)
    arrays = _batch(4, 256, seed=1)
    poses = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    step = sharded_icp.make_sharded_icp_step(cfg, mesh)
    shard = lambda spec, x: jax.device_put(x, NamedSharding(mesh, spec))
    sharded_args = [shard(P("pairs", "points"), a) for a in arrays[:4]]
    sharded_args += [shard(P("pairs"), a) for a in arrays[4:]]
    out = np.asarray(
        step(*sharded_args, shard(P("pairs"), poses), shard(P("pairs"), keys))
    )
    assert out.shape == (4, 4, 4)
    assert np.isfinite(out).all()
    # Each pair must reproduce the plain per-pair iteration — finiteness
    # alone would pass if pairs got each other's points or a degenerate
    # psum doubled the normal equations.
    gt = jnp.zeros((1, 3), jnp.float32)
    gtv = jnp.ones((1,), bool)
    for i in range(4):
        source = Cloud(
            points=jnp.asarray(arrays[0][i]), normals=jnp.asarray(arrays[1][i]),
            colors=jnp.asarray(arrays[2][i]), valid=jnp.asarray(arrays[3][i]),
        )
        target = Cloud(
            points=jnp.asarray(arrays[4][i]), normals=jnp.asarray(arrays[5][i]),
            colors=jnp.asarray(arrays[6][i]), valid=jnp.asarray(arrays[7][i]),
        )
        pose_ref, _, _ = icp._iteration(
            cfg, source, target, jnp.eye(4), jnp.asarray(1, jnp.int32),
            keys[i], gt, gt, gtv, run_benchmark=False,
        )
        np.testing.assert_allclose(
            out[i], np.asarray(pose_ref), rtol=1e-3, atol=2e-5
        )


class TestFullShardedRun:
    """run_icp_batch_sharded: the COMPLETE multires scan distributed over the
    mesh must reproduce single-device run_icp_batch (VERDICT r1 item 2)."""

    def _clouds(self, n_pairs, cap, seed=0):
        arrays = _batch(n_pairs, cap, seed=seed)
        sources = Cloud(
            points=jnp.asarray(arrays[0]), normals=jnp.asarray(arrays[1]),
            colors=jnp.asarray(arrays[2]), valid=jnp.asarray(arrays[3]),
        )
        targets = Cloud(
            points=jnp.asarray(arrays[4]), normals=jnp.asarray(arrays[5]),
            colors=jnp.asarray(arrays[6]), valid=jnp.asarray(arrays[7]),
        )
        return sources, targets

    def test_matches_single_device_full_scan(self, mesh):
        """SELECT_ALL + multires + benchmark: deterministic parity across the
        (pairs=2, points=4) mesh for pose AND all three trace metrics over
        the full schedule (>= 5 iterations)."""
        cfg = ICPConfig(
            metric=Metric.SYMMETRIC, minimizer=Minimizer.LINEAR,
            max_distance=1.0, n_iterations=6, multi_resolution=True,
        )
        n_pairs, cap = 2, 2048  # cap % (4 shards * 256) == 0
        sources, targets = self._clouds(n_pairs, cap)
        gt_src = np.asarray(sources.points)
        gt_tgt = np.asarray(targets.points)
        gt_v = np.asarray(sources.valid)

        res_ref = icp.run_icp_batch(
            cfg, sources, targets,
            gt_source_points=gt_src, gt_target_points=gt_tgt, gt_valid=gt_v,
            key=jax.random.PRNGKey(0), run_benchmark=True,
        )
        res_sh = sharded_icp.run_icp_batch_sharded(
            cfg, sources, targets, mesh,
            gt_source_points=gt_src, gt_target_points=gt_tgt, gt_valid=gt_v,
            key=jax.random.PRNGKey(0), run_benchmark=True,
        )
        assert res_sh.trace.rmse.shape[1] >= 5
        np.testing.assert_allclose(
            np.asarray(res_sh.pose), np.asarray(res_ref.pose),
            rtol=1e-3, atol=5e-5,
        )
        np.testing.assert_allclose(
            np.asarray(res_sh.trace.rmse), np.asarray(res_ref.trace.rmse),
            rtol=1e-3, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(res_sh.trace.benchmark), np.asarray(res_ref.trace.benchmark),
            rtol=1e-3, atol=1e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(res_sh.trace.num_matches), np.asarray(res_ref.trace.num_matches),
        )

    def test_random_fast_sharded_converges(self):
        """Points-only mesh with stratified random selection: per-shard PRNG
        streams differ from single-device, so assert convergence instead of
        bitwise parity."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        mesh = jax.make_mesh((8,), ("points",))
        from icp_variants_tpu.pipeline.config import Selection

        cfg = ICPConfig(
            metric=Metric.POINT_TO_PLANE, minimizer=Minimizer.LINEAR,
            max_distance=1.0, n_iterations=8,
            selection=Selection.RANDOM_FAST, selection_proba=0.5,
        )
        sources, targets = self._clouds(1, 2048, seed=2)
        source = jax.tree.map(lambda x: x[0], sources)
        target = jax.tree.map(lambda x: x[0], targets)
        res = sharded_icp.run_icp_sharded(
            cfg, source, target, mesh,
            gt_source_points=np.asarray(source.points),
            gt_target_points=np.asarray(target.points),
            gt_valid=np.asarray(source.valid),
            key=jax.random.PRNGKey(3),
        )
        rmse = np.asarray(res.trace.rmse)
        assert np.isfinite(np.asarray(res.pose)).all()
        assert rmse[-1] < rmse[0] * 0.5

    def test_random_bernoulli_sharded_converges(self):
        """Points-only mesh with the geometric-gap Bernoulli selection: the
        per-shard lattice offset + folded PRNG streams must still yield a
        converging run (streams differ from single-device, so assert
        convergence, not bitwise parity)."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        mesh = jax.make_mesh((8,), ("points",))
        from icp_variants_tpu.pipeline.config import Selection

        cfg = ICPConfig(
            metric=Metric.POINT_TO_PLANE, minimizer=Minimizer.LINEAR,
            max_distance=1.0, n_iterations=8,
            selection=Selection.RANDOM, selection_proba=0.5,
            multi_resolution=True,
        )
        sources, targets = self._clouds(1, 2048, seed=3)
        source = jax.tree.map(lambda x: x[0], sources)
        target = jax.tree.map(lambda x: x[0], targets)
        res = sharded_icp.run_icp_sharded(
            cfg, source, target, mesh,
            gt_source_points=np.asarray(source.points),
            gt_target_points=np.asarray(target.points),
            gt_valid=np.asarray(source.valid),
            key=jax.random.PRNGKey(4),
        )
        rmse = np.asarray(res.trace.rmse)
        assert np.isfinite(np.asarray(res.pose)).all()
        assert rmse[-1] < rmse[0] * 0.5

    def test_anderson_sharded_matches_single_device(self, mesh):
        """AA-ICP (anderson_m > 0) under the full sharded scan: the mixing
        state is pure pose-space and must reproduce the single-device
        accelerated run exactly (the psum-reduced solve makes new_pose
        identical on every shard, so the AA extrapolation must too)."""
        cfg = ICPConfig(
            metric=Metric.POINT_TO_PLANE, minimizer=Minimizer.LINEAR,
            max_distance=1.0, n_iterations=6, anderson_m=3,
        )
        n_pairs, cap = 2, 2048
        sources, targets = self._clouds(n_pairs, cap, seed=5)
        gt_src = np.asarray(sources.points)
        gt_tgt = np.asarray(targets.points)
        gt_v = np.asarray(sources.valid)

        res_ref = icp.run_icp_batch(
            cfg, sources, targets,
            gt_source_points=gt_src, gt_target_points=gt_tgt, gt_valid=gt_v,
            key=jax.random.PRNGKey(0),
        )
        res_sh = sharded_icp.run_icp_batch_sharded(
            cfg, sources, targets, mesh,
            gt_source_points=gt_src, gt_target_points=gt_tgt, gt_valid=gt_v,
            key=jax.random.PRNGKey(0),
        )
        np.testing.assert_allclose(
            np.asarray(res_sh.pose), np.asarray(res_ref.pose),
            rtol=1e-3, atol=5e-5,
        )
        np.testing.assert_allclose(
            np.asarray(res_sh.trace.rmse), np.asarray(res_ref.trace.rmse),
            rtol=1e-3, atol=1e-5,
        )
        # And acceleration actually engaged: the AA run's final RMSE beats
        # the plain run's at the same iteration count.
        res_plain = icp.run_icp_batch(
            cfg.replace(anderson_m=0), sources, targets,
            gt_source_points=gt_src, gt_target_points=gt_tgt, gt_valid=gt_v,
            key=jax.random.PRNGKey(0),
        )
        assert (
            np.asarray(res_sh.trace.rmse)[:, -1]
            < np.asarray(res_plain.trace.rmse)[:, -1]
        ).all()

    def test_trimmed_sharded_matches_single_device(self, mesh):
        """Trimmed ICP under the points axis: the cut threshold comes from
        psummed global histogram counts, so the sharded run must reproduce
        the single-device trimmed run (a per-shard quantile would trim
        different sets and diverge)."""
        cfg = ICPConfig(
            metric=Metric.POINT_TO_POINT, minimizer=Minimizer.LINEAR,
            max_distance=1.0, n_iterations=5, trim_ratio=0.7,
        )
        n_pairs, cap = 2, 2048
        sources, targets = self._clouds(n_pairs, cap, seed=7)
        gt_src = np.asarray(sources.points)
        gt_tgt = np.asarray(targets.points)
        gt_v = np.asarray(sources.valid)

        res_ref = icp.run_icp_batch(
            cfg, sources, targets,
            gt_source_points=gt_src, gt_target_points=gt_tgt, gt_valid=gt_v,
            key=jax.random.PRNGKey(0),
        )
        res_sh = sharded_icp.run_icp_batch_sharded(
            cfg, sources, targets, mesh,
            gt_source_points=gt_src, gt_target_points=gt_tgt, gt_valid=gt_v,
            key=jax.random.PRNGKey(0),
        )
        np.testing.assert_allclose(
            np.asarray(res_sh.pose), np.asarray(res_ref.pose),
            rtol=1e-3, atol=5e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(res_sh.trace.num_matches),
            np.asarray(res_ref.trace.num_matches),
        )
        # Trimming engaged: fewer matches than the untrimmed run at
        # iteration 0, where distances are still spread over many bins
        # (once aligned, everything lands in the cut bin and tie-keeping
        # correctly retains all matches).
        res_plain = icp.run_icp_batch(
            cfg.replace(trim_ratio=1.0), sources, targets,
            gt_source_points=gt_src, gt_target_points=gt_tgt, gt_valid=gt_v,
            key=jax.random.PRNGKey(0),
        )
        nm_sh = np.asarray(res_sh.trace.num_matches)
        nm_plain = np.asarray(res_plain.trace.num_matches)
        assert (nm_sh[:, 0] < nm_plain[:, 0]).all()
        assert (nm_sh <= nm_plain).all()

    def test_robust_weighting_sharded_matches_single_device(self, mesh):
        """HUBER weighting under the points axis: the MAD scale comes from
        two psummed histogram quantiles, so the sharded run must reproduce
        the single-device run (a per-shard scale would weigh each shard's
        matches differently and diverge)."""
        from icp_variants_tpu.pipeline.config import Weighting

        cfg = ICPConfig(
            metric=Metric.POINT_TO_POINT, minimizer=Minimizer.LINEAR,
            max_distance=1.0, n_iterations=5, weighting=Weighting.HUBER,
        )
        n_pairs, cap = 2, 2048
        sources, targets = self._clouds(n_pairs, cap, seed=9)
        gt_src = np.asarray(sources.points)
        gt_tgt = np.asarray(targets.points)
        gt_v = np.asarray(sources.valid)

        res_ref = icp.run_icp_batch(
            cfg, sources, targets,
            gt_source_points=gt_src, gt_target_points=gt_tgt, gt_valid=gt_v,
            key=jax.random.PRNGKey(0),
        )
        res_sh = sharded_icp.run_icp_batch_sharded(
            cfg, sources, targets, mesh,
            gt_source_points=gt_src, gt_target_points=gt_tgt, gt_valid=gt_v,
            key=jax.random.PRNGKey(0),
        )
        np.testing.assert_allclose(
            np.asarray(res_sh.pose), np.asarray(res_ref.pose),
            rtol=1e-3, atol=5e-5,
        )
        np.testing.assert_allclose(
            np.asarray(res_sh.trace.rmse), np.asarray(res_ref.trace.rmse),
            rtol=1e-3, atol=1e-5,
        )

    def test_gicp_sharded_matches_single_device(self, mesh):
        """GICP under the points axis: whiteners are per-match local math
        and the 6x6 normal equations psum — the sharded run must reproduce
        the single-device run."""
        cfg = ICPConfig(
            metric=Metric.GICP, minimizer=Minimizer.LINEAR,
            max_distance=1.0, n_iterations=5,
        )
        n_pairs, cap = 2, 2048
        sources, targets = self._clouds(n_pairs, cap, seed=11)
        gt_src = np.asarray(sources.points)
        gt_tgt = np.asarray(targets.points)
        gt_v = np.asarray(sources.valid)

        res_ref = icp.run_icp_batch(
            cfg, sources, targets,
            gt_source_points=gt_src, gt_target_points=gt_tgt, gt_valid=gt_v,
            key=jax.random.PRNGKey(0),
        )
        res_sh = sharded_icp.run_icp_batch_sharded(
            cfg, sources, targets, mesh,
            gt_source_points=gt_src, gt_target_points=gt_tgt, gt_valid=gt_v,
            key=jax.random.PRNGKey(0),
        )
        np.testing.assert_allclose(
            np.asarray(res_sh.pose), np.asarray(res_ref.pose),
            rtol=1e-3, atol=5e-5,
        )
        np.testing.assert_allclose(
            np.asarray(res_sh.trace.rmse), np.asarray(res_ref.trace.rmse),
            rtol=1e-3, atol=1e-5,
        )

    def test_runner_cache_reused(self, mesh):
        cfg = ICPConfig(minimizer=Minimizer.LINEAR, max_distance=1.0,
                        n_iterations=2)
        r1 = sharded_icp._sharded_runner(cfg, mesh, False, False)
        r2 = sharded_icp._sharded_runner(cfg, mesh, False, False)
        assert r1 is r2


class TestShardedMultires:
    def test_schedule_independent_of_mesh_padding(self, mesh):
        """The multires stride schedule must come from the PRE-padding
        capacity: the points-axis pad is mesh-dependent, and deriving the
        schedule from it made poses differ across mesh layouts (and from
        the unsharded runner)."""
        from icp_variants_tpu.core import cloud as cloud_lib

        cap = 1536                      # pads to 2048 on the 4-way axis
        cfg = ICPConfig(
            metric=Metric.POINT_TO_PLANE, minimizer=Minimizer.LINEAR,
            max_distance=1.0, n_iterations=6, multi_resolution=True,
        )
        padded = -(-cap // (4 * cloud_lib.PAD_MULTIPLE)) * (
            4 * cloud_lib.PAD_MULTIPLE
        )
        s_true = cloud_lib.multires_stride_schedule(
            cap, cfg.n_iterations, True, cfg.multi_resolution_min_points
        )
        s_pad = cloud_lib.multires_stride_schedule(
            padded, cfg.n_iterations, True, cfg.multi_resolution_min_points
        )
        # Guard the fixture: the pad must actually change the schedule,
        # otherwise this test can't catch a regression.
        assert list(map(int, s_true)) != list(map(int, s_pad))

        arrays = _batch(2, cap, seed=5)
        sources = Cloud(
            points=jnp.asarray(arrays[0]), normals=jnp.asarray(arrays[1]),
            colors=jnp.asarray(arrays[2]), valid=jnp.asarray(arrays[3]),
        )
        targets = Cloud(
            points=jnp.asarray(arrays[4]), normals=jnp.asarray(arrays[5]),
            colors=jnp.asarray(arrays[6]), valid=jnp.asarray(arrays[7]),
        )
        res_ref = icp.run_icp_batch(
            cfg, sources, targets, key=jax.random.PRNGKey(0)
        )
        res_sh = sharded_icp.run_icp_batch_sharded(
            cfg, sources, targets, mesh, key=jax.random.PRNGKey(0)
        )
        np.testing.assert_allclose(
            np.asarray(res_sh.pose), np.asarray(res_ref.pose),
            rtol=1e-3, atol=5e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(res_sh.trace.num_matches),
            np.asarray(res_ref.trace.num_matches),
        )


class TestShardedKd:
    def test_kd_sharded_matches_single_device(self, mesh):
        """The kd (v3) matcher through the sharded full scan: pose and trace
        parity with single-device run_icp_batch using the same kd indexes."""
        from icp_variants_tpu.ops import kdtree

        cfg = ICPConfig(
            metric=Metric.POINT_TO_PLANE, minimizer=Minimizer.LINEAR,
            max_distance=1.0, n_iterations=5,
        )
        n_pairs, cap = 2, 2048
        arrays = _batch(n_pairs, cap, seed=3)
        sources = Cloud(
            points=jnp.asarray(arrays[0]), normals=jnp.asarray(arrays[1]),
            colors=jnp.asarray(arrays[2]), valid=jnp.asarray(arrays[3]),
        )
        targets = Cloud(
            points=jnp.asarray(arrays[4]), normals=jnp.asarray(arrays[5]),
            colors=jnp.asarray(arrays[6]), valid=jnp.asarray(arrays[7]),
        )
        kds = kdtree.stack_kd_indexes([
            kdtree.build_kd_index(arrays[4][b], arrays[7][b])
            for b in range(n_pairs)
        ])
        gt_src = np.asarray(sources.points)
        gt_tgt = np.asarray(targets.points)
        gt_v = np.asarray(sources.valid)

        res_ref = icp.run_icp_batch(
            cfg, sources, targets,
            gt_source_points=gt_src, gt_target_points=gt_tgt, gt_valid=gt_v,
            key=jax.random.PRNGKey(0), kd_indexes=kds,
        )
        res_sh = sharded_icp.run_icp_batch_sharded(
            cfg, sources, targets, mesh,
            gt_source_points=gt_src, gt_target_points=gt_tgt, gt_valid=gt_v,
            key=jax.random.PRNGKey(0), kd_indexes=kds,
        )
        np.testing.assert_allclose(
            np.asarray(res_sh.pose), np.asarray(res_ref.pose),
            rtol=1e-3, atol=5e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(res_sh.trace.num_matches),
            np.asarray(res_ref.trace.num_matches),
        )


class TestShardedApproximateArm:
    """The FLANN-parity approximate arm (matching_checks > 0, no
    certificate/fallback) through the sharded full scan: parity with
    single-device run_icp_batch. The cond-free matching path must carry
    identical varying-manual-axes under shard_map."""

    def test_checks_sharded_matches_single_device(self, mesh):
        from icp_variants_tpu.ops import kdtree

        cfg = ICPConfig(
            metric=Metric.POINT_TO_PLANE, minimizer=Minimizer.LINEAR,
            max_distance=1.0, n_iterations=5, matching_checks=16,
        )
        n_pairs, cap = 2, 2048
        arrays = _batch(n_pairs, cap, seed=9)
        sources = Cloud(
            points=jnp.asarray(arrays[0]), normals=jnp.asarray(arrays[1]),
            colors=jnp.asarray(arrays[2]), valid=jnp.asarray(arrays[3]),
        )
        targets = Cloud(
            points=jnp.asarray(arrays[4]), normals=jnp.asarray(arrays[5]),
            colors=jnp.asarray(arrays[6]), valid=jnp.asarray(arrays[7]),
        )
        kds = kdtree.stack_kd_indexes([
            kdtree.build_kd_index(arrays[4][b], arrays[7][b])
            for b in range(n_pairs)
        ])
        res_ref = icp.run_icp_batch(
            cfg, sources, targets, key=jax.random.PRNGKey(0),
            kd_indexes=kds,
        )
        res_sh = sharded_icp.run_icp_batch_sharded(
            cfg, sources, targets, mesh, key=jax.random.PRNGKey(0),
            kd_indexes=kds,
        )
        np.testing.assert_allclose(
            np.asarray(res_sh.pose), np.asarray(res_ref.pose),
            rtol=1e-3, atol=5e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(res_sh.trace.num_matches),
            np.asarray(res_ref.trace.num_matches),
        )
