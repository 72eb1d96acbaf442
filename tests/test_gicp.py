"""Generalized-ICP (Metric.GICP — extension, no reference analog; Segal et
al., RSS 2009). Covers the whitener algebra against a numpy oracle, linear
and LM end-to-end convergence on a known transform, the isotropic fallback
for missing normals, and sharded parity."""

import jax
import jax.numpy as jnp
import numpy as np

from icp_variants_tpu.core import cloud as cloud_lib
from icp_variants_tpu.pipeline import icp
from icp_variants_tpu.pipeline.config import ICPConfig, Metric, Minimizer
from icp_variants_tpu.solvers import linear


class TestWhitener:
    def test_matches_numpy_inverse(self):
        rng = np.random.default_rng(0)
        ns = rng.standard_normal((64, 3)).astype(np.float32)
        ns /= np.linalg.norm(ns, axis=1, keepdims=True)
        nt = rng.standard_normal((64, 3)).astype(np.float32)
        nt /= np.linalg.norm(nt, axis=1, keepdims=True)
        L = np.asarray(linear.gicp_whitener(jnp.asarray(ns), jnp.asarray(nt)))
        eps = linear.GICP_EPSILON
        for i in range(0, 64, 7):
            C = (
                2 * np.eye(3)
                - (1 - eps) * np.outer(ns[i], ns[i])
                - (1 - eps) * np.outer(nt[i], nt[i])
            )
            np.testing.assert_allclose(
                L[i] @ L[i].T, np.linalg.inv(C), rtol=2e-3, atol=2e-4
            )

    def test_anisotropy_along_normal(self):
        """With both normals equal to z, the whitened residual must weigh
        the normal direction ~1/sqrt(2*eps) harder than in-plane."""
        n = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        L = np.asarray(linear.gicp_whitener(n, n))[0]
        d_normal = L.T @ np.array([0, 0, 1.0])
        d_plane = L.T @ np.array([1.0, 0, 0])
        ratio = np.linalg.norm(d_normal) / np.linalg.norm(d_plane)
        expect = np.sqrt(2.0 / (2.0 * linear.GICP_EPSILON))
        np.testing.assert_allclose(ratio, expect, rtol=1e-2)

    def test_zero_normals_are_isotropic(self):
        """Non-finite normals zero out -> C = 2I -> L^T scales uniformly."""
        n = jnp.asarray([[np.nan, np.nan, np.nan]], jnp.float32)
        L = np.asarray(linear.gicp_whitener(n, n))[0]
        np.testing.assert_allclose(
            L @ L.T, 0.5 * np.eye(3), rtol=1e-5, atol=1e-6
        )


def _surface_pair(n=3000, ang=0.12, seed=0):
    """Wavy surface with analytic normals; source = rigidly moved target."""
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-2, 2, (n, 2)).astype(np.float32)
    z = 0.3 * np.sin(2 * xy[:, 0]) * np.cos(2 * xy[:, 1])
    pts = np.column_stack([xy, z]).astype(np.float32)
    # Analytic surface normals: (-dz/dx, -dz/dy, 1) normalized.
    nx = -0.6 * np.cos(2 * xy[:, 0]) * np.cos(2 * xy[:, 1])
    ny = 0.6 * np.sin(2 * xy[:, 0]) * np.sin(2 * xy[:, 1])
    nrm = np.column_stack([nx, ny, np.ones(n, np.float32)]).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)

    R = np.array(
        [[np.cos(ang), -np.sin(ang), 0],
         [np.sin(ang), np.cos(ang), 0],
         [0, 0, 1]], np.float32,
    )
    shift = np.array([0.08, -0.05, 0.03], np.float32)
    src = pts @ R.T + shift
    src_nrm = nrm @ R.T
    return (src.astype(np.float32), src_nrm.astype(np.float32),
            pts, nrm, R, shift)


class TestEndToEnd:
    def _run(self, minimizer, metric, n_iterations=10):
        src, src_nrm, tgt, tgt_nrm, R, shift = _surface_pair()
        source = cloud_lib.from_numpy(src, normals=src_nrm, morton_order=True)
        target = cloud_lib.from_numpy(tgt, normals=tgt_nrm, morton_order=True)
        cfg = ICPConfig(
            metric=metric, minimizer=minimizer,
            max_distance=1.0, n_iterations=n_iterations,
        )
        rows = np.asarray(source.points)
        undone = (rows - shift) @ R
        res = icp.run_icp(
            cfg, source, target, key=jax.random.PRNGKey(0),
            gt_source_points=rows, gt_target_points=undone,
            gt_valid=np.asarray(source.valid),
        )
        return np.asarray(res.trace.rmse)

    def test_linear_gicp_converges(self):
        rmse = self._run(Minimizer.LINEAR, Metric.GICP)
        assert rmse[-1] < 2e-3, rmse.tolist()
        # And at least as fast as point-to-plane on the same problem.
        rmse_plane = self._run(Minimizer.LINEAR, Metric.POINT_TO_PLANE)
        assert rmse[-1] < rmse_plane[-1] * 2.0, (rmse[-1], rmse_plane[-1])

    def test_lm_gicp_converges(self):
        rmse = self._run(Minimizer.NONLINEAR_LM, Metric.GICP)
        assert rmse[-1] < 2e-3, rmse.tolist()

    def test_gicp_without_normals_still_converges(self):
        """Clouds without normals: every covariance degrades to isotropic
        (point-to-point behavior) instead of crashing or diverging."""
        src, _, tgt, _, R, shift = _surface_pair()
        source = cloud_lib.from_numpy(src, morton_order=True)
        target = cloud_lib.from_numpy(tgt, morton_order=True)
        cfg = ICPConfig(
            metric=Metric.GICP, minimizer=Minimizer.LINEAR,
            max_distance=1.0, n_iterations=10, rejection=False,
        )
        rows = np.asarray(source.points)
        undone = (rows - shift) @ R
        res = icp.run_icp(
            cfg, source, target, key=jax.random.PRNGKey(0),
            gt_source_points=rows, gt_target_points=undone,
            gt_valid=np.asarray(source.valid),
        )
        rmse = np.asarray(res.trace.rmse)
        assert np.isfinite(rmse).all()
        # Isotropic covariances make GICP behave like point-to-point,
        # which converges slowly on this surface — monotone descent is
        # the contract here, not plane-informed speed.
        assert rmse[-1] < rmse[0] * 0.5
        assert (np.diff(rmse) < 0).all()
