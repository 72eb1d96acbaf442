"""AA-ICP (Anderson-accelerated ICP, solvers/anderson.py) — extension,
no reference analog. Covers the mixing math on a known linear fixed-point
problem, the pose chart round-trip, the safeguard, and end-to-end ICP
convergence acceleration with the default config untouched."""

import jax
import jax.numpy as jnp
import numpy as np

from icp_variants_tpu.core import cloud as cloud_lib
from icp_variants_tpu.pipeline import icp
from icp_variants_tpu.pipeline.config import ICPConfig, Metric, Minimizer
from icp_variants_tpu.solvers import anderson


class TestMixingMath:
    def test_linear_fixed_point_accelerates(self):
        """On x -> Ax + b with spectral radius ~0.9, AA(5) must reach the
        fixed point orders of magnitude faster than plain iteration."""
        rng = np.random.default_rng(0)
        Q, _ = np.linalg.qr(rng.standard_normal((6, 6)))
        A = (Q * rng.uniform(0.5, 0.9, 6)) @ Q.T  # symmetric, rho < 0.9
        b = rng.standard_normal(6)
        x_star = np.linalg.solve(np.eye(6) - A, b)

        def G(x):
            return jnp.asarray(A, jnp.float32) @ x + jnp.asarray(
                b, jnp.float32
            )

        m = 5
        x_plain = jnp.zeros(6, jnp.float32)
        x_aa = jnp.zeros(6, jnp.float32)
        state = anderson.init(m)
        for _ in range(12):
            x_plain = G(x_plain)
            state, x_aa = anderson.step(state, x_aa, G(x_aa), m)
        err_plain = np.linalg.norm(np.asarray(x_plain) - x_star)
        err_aa = np.linalg.norm(np.asarray(x_aa) - x_star)
        # AA solves a 6-dim linear fixed point essentially exactly once
        # the history spans the space; plain still has O(rho^12) error.
        assert err_aa < err_plain * 1e-2, (err_aa, err_plain)

    def test_first_step_is_plain(self):
        state = anderson.init(4)
        x = jnp.asarray(np.arange(6), jnp.float32)
        g = x + 1.0
        state, x1 = anderson.step(state, x, g, 4)
        np.testing.assert_allclose(np.asarray(x1), np.asarray(g))

    def test_fixed_point_is_stationary(self):
        """At a fixed point (g == x) AA must return x regardless of
        history contents."""
        m = 3
        state = anderson.init(m)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal(6), jnp.float32)
        for _ in range(4):  # build up history with x itself
            state, out = anderson.step(state, x, x, m)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)

    def test_pose_chart_roundtrip(self):
        rng = np.random.default_rng(2)
        from icp_variants_tpu.core import se3

        w = rng.standard_normal(3).astype(np.float32) * 0.5
        t = rng.standard_normal(3).astype(np.float32)
        pose = np.asarray(
            se3.pose_matrix(se3.axis_angle_to_matrix(jnp.asarray(w)),
                            jnp.asarray(t))
        )
        x = anderson.pose_to_vec(jnp.asarray(pose))
        back = np.asarray(anderson.vec_to_pose(x))
        np.testing.assert_allclose(back, pose, atol=1e-5)


class TestEndToEnd:
    def _pair(self, n=3000, ang=0.25, seed=0):
        rng = np.random.default_rng(seed)
        xy = rng.uniform(-2, 2, (n, 2)).astype(np.float32)
        z = 0.3 * np.sin(2 * xy[:, 0]) * np.cos(2 * xy[:, 1])
        tgt = np.column_stack([xy, z]).astype(np.float32)
        R = np.array(
            [[np.cos(ang), -np.sin(ang), 0],
             [np.sin(ang), np.cos(ang), 0],
             [0, 0, 1]], np.float32,
        )
        src = (tgt @ R.T + np.array([0.15, -0.1, 0.05], np.float32))
        return src.astype(np.float32), tgt

    def test_tight_threshold_no_regression(self):
        """Bunny default (tight 3e-4 threshold, LM): near convergence the
        match set flips discontinuously, and raw AA ended 2.6x WORSE than
        plain there — the decaying trust clamp must hold the safeguarded
        run near plain's final error (scripts/aa_production_sweep.py)."""
        from icp_variants_tpu.workloads import bunny as bw

        plain = bw.align_bunny(bw.default_config())
        aa = bw.align_bunny(bw.default_config(anderson_m=2))
        assert aa.final_rmse <= plain.final_rmse * 1.15, (
            aa.final_rmse, plain.final_rmse,
        )

    def test_accelerates_icp_convergence(self):
        """Point-to-point ICP on a large perturbation converges slowly;
        AA(5) must reach the plain run's final RMSE in fewer iterations
        and end at least as low."""
        src, tgt = self._pair()
        source = cloud_lib.from_numpy(src, morton_order=True)
        target = cloud_lib.from_numpy(tgt, morton_order=True)
        base = ICPConfig(
            metric=Metric.POINT_TO_POINT, minimizer=Minimizer.LINEAR,
            max_distance=1.0, n_iterations=14,
        )
        kw = dict(
            gt_source_points=np.asarray(source.points),
            gt_target_points=np.asarray(source.points),  # placeholder
        )
        # Oracle: the perturbed source rows vs their true target positions
        # (the same rows un-perturbed). from_numpy Morton-reorders rows,
        # so build the oracle from the reordered cloud by inverting the
        # known transform.
        ang = 0.25
        R = np.array(
            [[np.cos(ang), -np.sin(ang), 0],
             [np.sin(ang), np.cos(ang), 0],
             [0, 0, 1]], np.float32,
        )
        shift = np.array([0.15, -0.1, 0.05], np.float32)
        src_rows = np.asarray(source.points)
        kw = dict(
            gt_source_points=src_rows,
            gt_target_points=(src_rows - shift) @ R,
            gt_valid=np.asarray(source.valid),
        )
        res_plain = icp.run_icp(base, source, target,
                                key=jax.random.PRNGKey(0), **kw)
        res_aa = icp.run_icp(base.replace(anderson_m=5), source, target,
                             key=jax.random.PRNGKey(0), **kw)
        rmse_plain = np.asarray(res_plain.trace.rmse)
        rmse_aa = np.asarray(res_aa.trace.rmse)
        assert rmse_aa[-1] <= rmse_plain[-1] * 1.05
        # Iterations to reach the plain run's final error:
        it_aa = int(np.argmax(rmse_aa <= rmse_plain[-1]))
        hit = (rmse_aa <= rmse_plain[-1]).any()
        assert hit and it_aa < len(rmse_plain) - 2, (
            it_aa, rmse_aa.tolist(), rmse_plain.tolist(),
        )
