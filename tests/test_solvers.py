"""Solver tests: Procrustes/point-to-plane/symmetric/LM against synthetic
rigid transforms and f64 numpy references (reference:
ProcrustesAligner.h, ICPOptimizer.h:666-898, constraints.h)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icp_variants_tpu.core import se3
from icp_variants_tpu.pipeline.config import Metric
from icp_variants_tpu.solvers import gauss_newton, linear, procrustes


def make_problem(rng, n=200, angle=0.05, scale=1.0, n_pad=40):
    """Matched clouds tgt = R src + t with padding rows + masks."""
    src = (rng.standard_normal((n, 3)) * scale).astype(np.float32)
    w = rng.standard_normal(3)
    w = w / np.linalg.norm(w) * angle
    R = np.asarray(se3.axis_angle_to_matrix(jnp.asarray(w, jnp.float32)))
    t = (rng.standard_normal(3) * 0.1 * scale).astype(np.float32)
    tgt = src @ R.T + t

    normals = rng.standard_normal((n, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    tgt_normals = normals
    src_normals = normals @ R.T  # perfectly consistent normals

    # Append garbage padding rows that must be ignored via the mask.
    pad_src = np.full((n_pad, 3), 2e6, np.float32)
    pad = np.zeros((n_pad, 3), np.float32)
    full = lambda a, p: np.concatenate([a, p], axis=0)
    valid = np.concatenate([np.ones(n, bool), np.zeros(n_pad, bool)])
    weights = np.concatenate(
        [rng.uniform(0.5, 1.0, n).astype(np.float32), np.zeros(n_pad, np.float32)]
    )
    pose_true = np.asarray(
        se3.pose_matrix(jnp.asarray(R), jnp.asarray(t))
    )
    return (
        jnp.asarray(full(src, pad_src)),
        jnp.asarray(full(tgt, pad)),
        jnp.asarray(full(src_normals, pad)),
        jnp.asarray(full(tgt_normals, pad)),
        jnp.asarray(weights),
        jnp.asarray(valid),
        pose_true,
    )


def pose_error(est, true, pts):
    moved_est = pts @ np.asarray(est)[:3, :3].T + np.asarray(est)[:3, 3]
    moved_true = pts @ true[:3, :3].T + true[:3, 3]
    return float(np.sqrt(np.mean(np.sum((moved_est - moved_true) ** 2, axis=1))))


class TestProcrustes:
    def test_recovers_exact_pose(self):
        rng = np.random.default_rng(0)
        src, tgt, _, _, w, valid, pose_true = make_problem(rng, angle=0.5)
        est = procrustes.estimate_pose_point_to_point(src, tgt, w, valid)
        test_pts = np.asarray(src)[:200]
        assert pose_error(est, pose_true, test_pts) < 1e-4

    def test_reflection_correction(self):
        # Degenerate planar clouds can produce det(UV^T) = -1; the D-matrix
        # correction (ProcrustesAligner.h:60-63) must keep R a rotation.
        rng = np.random.default_rng(1)
        src = rng.standard_normal((50, 3)).astype(np.float32)
        src[:, 2] = 0.0
        tgt = src[:, [1, 0, 2]].copy()
        est = procrustes.estimate_pose_point_to_point(
            jnp.asarray(src), jnp.asarray(tgt),
            jnp.ones(50), jnp.ones(50, bool),
        )
        R = np.asarray(est)[:3, :3]
        assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-4)


class TestPointToPlane:
    def test_recovers_small_pose(self):
        rng = np.random.default_rng(2)
        src, tgt, sn, tn, w, valid, pose_true = make_problem(rng, angle=0.02)
        est = linear.estimate_pose_point_to_plane(src, tgt, tn, w, valid)
        assert pose_error(est, pose_true, np.asarray(src)[:200]) < 1e-3

    def test_matches_numpy_lstsq(self):
        """6x6 normal equations == f64 lstsq on the dense 4Nx6 system built
        exactly like ICPOptimizer.h:687-751 (uncentered)."""
        rng = np.random.default_rng(3)
        n = 100
        src, tgt, _, tn, w, valid, _ = make_problem(rng, n=n, angle=0.02, n_pad=0)
        s, d, nn, ww = (np.asarray(a, np.float64) for a in (src, tgt, tn, w))

        A = np.zeros((4 * n, 6))
        b = np.zeros(4 * n)
        for i in range(n):
            si, di, ni, wi = s[i], d[i], nn[i], ww[i]
            A[4 * i] = [
                ni[2] * si[1] - ni[1] * si[2],
                ni[0] * si[2] - ni[2] * si[0],
                ni[1] * si[0] - ni[0] * si[1],
                ni[0], ni[1], ni[2],
            ]
            b[4 * i] = ni @ di - ni @ si
            A[4 * i + 1] = [0, si[2], -si[1], 1, 0, 0]
            b[4 * i + 1] = di[0] - si[0]
            A[4 * i + 2] = [-si[2], 0, si[0], 0, 1, 0]
            b[4 * i + 2] = di[1] - si[1]
            A[4 * i + 3] = [si[1], -si[0], 0, 0, 0, 1]
            b[4 * i + 3] = di[2] - si[2]
            A[4 * i] *= 1.0 * wi
            b[4 * i] *= 1.0 * wi
            for k in (1, 2, 3):
                A[4 * i + k] *= 0.1 * wi
                b[4 * i + k] *= 0.1 * wi
        x_ref, *_ = np.linalg.lstsq(A, b, rcond=None)
        R_ref = np.asarray(
            se3.euler_xyz_to_matrix(
                jnp.float32(x_ref[0]), jnp.float32(x_ref[1]), jnp.float32(x_ref[2])
            )
        )
        pose_ref = np.eye(4)
        pose_ref[:3, :3] = R_ref
        pose_ref[:3, 3] = x_ref[3:]

        est = np.asarray(linear.estimate_pose_point_to_plane(src, tgt, tn, w, valid))
        assert pose_error(est, pose_ref, np.asarray(src)) < 5e-4


class TestSymmetric:
    def test_recovers_small_pose(self):
        rng = np.random.default_rng(4)
        src, tgt, sn, tn, w, valid, pose_true = make_problem(rng, angle=0.05)
        est = linear.estimate_pose_symmetric(src, tgt, sn, tn, w, valid)
        assert pose_error(est, pose_true, np.asarray(src)[:200]) < 1e-3

    def test_identity_on_aligned_clouds(self):
        rng = np.random.default_rng(5)
        src, _, sn, tn, w, valid, _ = make_problem(rng, angle=0.0)
        est = np.asarray(linear.estimate_pose_symmetric(src, src, sn, tn, w, valid))
        np.testing.assert_allclose(est, np.eye(4), atol=1e-4)


class TestLM:
    @pytest.mark.parametrize("metric", [Metric.POINT_TO_POINT, Metric.POINT_TO_PLANE])
    def test_recovers_pose(self, metric):
        rng = np.random.default_rng(6)
        src, tgt, sn, tn, w, valid, pose_true = make_problem(rng, angle=0.2)
        est = gauss_newton.estimate_pose_lm(metric, src, tgt, sn, tn, w, valid)
        assert pose_error(est, pose_true, np.asarray(src)[:200]) < 2e-3

    def test_symmetric_recovers_over_outer_iterations(self):
        """The symmetric residual rotates source by R and target by R^-1
        (constraints.h:118-119), so a single solve yields roughly the half
        rotation; the outer ICP loop composes increments
        (ICPOptimizer.h:308-309) and converges — model that here."""
        rng = np.random.default_rng(6)
        src, tgt, sn, tn, w, valid, pose_true = make_problem(rng, angle=0.2)
        pose = np.eye(4, dtype=np.float32)
        for _ in range(10):
            cur_src = jnp.asarray(np.asarray(src) @ pose[:3, :3].T + pose[:3, 3])
            cur_sn = jnp.asarray(np.asarray(sn) @ pose[:3, :3].T)
            inc = gauss_newton.estimate_pose_lm(
                Metric.SYMMETRIC, cur_src, tgt, cur_sn, tn, w, valid
            )
            pose = np.asarray(inc) @ pose
        assert pose_error(pose, pose_true, np.asarray(src)[:200]) < 2e-3

    def test_cost_decreases(self):
        rng = np.random.default_rng(7)
        src, tgt, sn, tn, w, valid, _ = make_problem(rng, angle=0.3)
        res = gauss_newton.solve_lm(Metric.POINT_TO_POINT, src, tgt, sn, tn, w, valid)
        assert float(res.cost) < float(res.initial_cost)
        assert int(res.n_accepted) >= 1

    def test_nan_normals_masked(self):
        rng = np.random.default_rng(8)
        src, tgt, sn, tn, w, valid, pose_true = make_problem(rng, angle=0.05)
        tn = tn.at[0].set(jnp.nan)
        sn = sn.at[1].set(jnp.nan)
        est = gauss_newton.estimate_pose_lm(
            Metric.POINT_TO_PLANE, src, tgt, sn, tn, w, valid
        )
        assert np.isfinite(np.asarray(est)).all()
        assert pose_error(est, pose_true, np.asarray(src)[:200]) < 2e-3
        est_sym = gauss_newton.estimate_pose_lm(
            Metric.SYMMETRIC, src, tgt, sn, tn, w, valid
        )
        assert np.isfinite(np.asarray(est_sym)).all()


class TestLMScipyParity:
    """Quantitative LM evidence (SURVEY hard-part 3): solve_lm must land on
    the same optimum as scipy.optimize.least_squares run on an f64 replica
    of the exact residual stack (Ceres config: <=10 LM steps,
    function_tolerance 1e-6, ICPOptimizer.h:352-360)."""

    @staticmethod
    def _numpy_residual_fn(metric, src, tgt, src_n, tgt_n, w, valid):
        from scipy.spatial.transform import Rotation

        mask = valid.astype(np.float64)
        wp = (w * mask).astype(np.float64)

        def fn(x):
            R = Rotation.from_rotvec(x[:3]).as_matrix()
            moved = src @ R.T + x[3:6]
            diff = moved - tgt
            parts = [(0.1 * wp)[:, None] * diff]
            if metric == Metric.POINT_TO_PLANE:
                parts.append((wp * (tgt_n * diff).sum(axis=1))[:, None])
            elif metric == Metric.SYMMETRIC:
                tgt_rot = tgt @ R  # R^-1 applied to rows
                n_sum = src_n + tgt_n
                parts.append((wp * (n_sum * (moved - tgt_rot)).sum(axis=1))[:, None])
            return np.concatenate([p.reshape(-1) for p in parts])

        return fn

    @pytest.mark.parametrize(
        "metric", [Metric.POINT_TO_POINT, Metric.POINT_TO_PLANE, Metric.SYMMETRIC]
    )
    def test_matches_scipy_least_squares(self, metric):
        from scipy.optimize import least_squares

        rng = np.random.default_rng(42)
        src, tgt, src_n, tgt_n, w, valid, _ = make_problem(rng, angle=0.15)
        # Perturb correspondences so the optimum is a genuine least-squares
        # trade-off, not an exact rigid fit.
        noise = rng.normal(0, 0.02, tgt.shape).astype(np.float32)
        tgt = tgt + jnp.asarray(noise) * valid[:, None]

        res = gauss_newton.solve_lm(
            metric, src, tgt, src_n, tgt_n, w, valid, max_iterations=10
        )
        x_ours = np.asarray(jax.device_get(res.increment), np.float64)

        fn = self._numpy_residual_fn(
            metric,
            *(np.asarray(a, np.float64) for a in (src, tgt, src_n, tgt_n)),
            np.asarray(w, np.float64), np.asarray(valid),
        )
        sol = least_squares(fn, np.zeros(6), method="lm", xtol=1e-12, ftol=1e-12)
        x_ref = sol.x
        cost_ref = 0.5 * np.sum(fn(x_ref) ** 2)
        cost_ours = 0.5 * np.sum(fn(x_ours) ** 2)

        # Same basin, near-identical optimum: cost within 0.1%, increment
        # within 2e-3 absolute on every dof.
        assert cost_ours <= cost_ref * 1.001 + 1e-12
        np.testing.assert_allclose(x_ours, x_ref, atol=2e-3)

    def test_small_angle_matches_linear_solver(self):
        """At small angles the LM point-to-plane optimum coincides with the
        closed-form linearized solve on the same matches."""
        rng = np.random.default_rng(7)
        src, tgt, src_n, tgt_n, w, valid, _ = make_problem(rng, angle=0.01)
        pose_lm = np.asarray(gauss_newton.estimate_pose_lm(
            Metric.POINT_TO_PLANE, src, tgt, src_n, tgt_n, w, valid
        ))
        pose_lin = np.asarray(linear.estimate_pose_point_to_plane(
            src, tgt, tgt_n, w, valid
        ))
        pts = np.asarray(src)[np.asarray(valid)]
        err = pose_error(pose_lm, pose_lin, pts)
        assert err < 5e-5
