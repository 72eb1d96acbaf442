"""Unit tests for SE(3) primitives (reference: utils.h:26-176)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icp_variants_tpu.core import se3


def random_rotation(rng):
    w = rng.standard_normal(3)
    w = w / np.linalg.norm(w) * rng.uniform(0.1, 3.0)
    return np.asarray(se3.axis_angle_to_matrix(jnp.asarray(w, jnp.float32)))


class TestAxisAngle:
    def test_matrix_roundtrip(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            w = rng.standard_normal(3).astype(np.float32)
            R = se3.axis_angle_to_matrix(jnp.asarray(w))
            w2 = se3.matrix_to_axis_angle(R)
            R2 = se3.axis_angle_to_matrix(w2)
            np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=5e-4)

    def test_rotation_matrix_properties(self):
        w = jnp.asarray([0.3, -0.2, 0.9], jnp.float32)
        R = np.asarray(se3.axis_angle_to_matrix(w))
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-6)

    def test_zero_angle(self):
        R = se3.axis_angle_to_matrix(jnp.zeros(3, jnp.float32))
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-7)

    def test_rotate_matches_matrix(self):
        rng = np.random.default_rng(1)
        w = rng.standard_normal(3).astype(np.float32)
        pts = rng.standard_normal((10, 3)).astype(np.float32)
        R = np.asarray(se3.axis_angle_to_matrix(jnp.asarray(w)))
        rotated = np.asarray(se3.rotate_axis_angle(jnp.asarray(w), jnp.asarray(pts)))
        np.testing.assert_allclose(rotated, pts @ R.T, rtol=1e-4, atol=1e-5)

    def test_rotate_gradient_finite_at_zero(self):
        pts = jnp.asarray([[1.0, 2.0, 3.0]], jnp.float32)
        g = jax.jacfwd(lambda w: se3.rotate_axis_angle(w, pts))(jnp.zeros(3, jnp.float32))
        assert np.isfinite(np.asarray(g)).all()


class TestIncrement:
    def test_apply_increment(self):
        x = jnp.asarray([0.1, -0.2, 0.3, 1.0, 2.0, 3.0], jnp.float32)
        pts = jnp.asarray([[0.5, 0.5, 0.5]], jnp.float32)
        out = se3.apply_increment(x, pts)
        M = np.asarray(se3.increment_to_matrix(x))
        expected = pts @ M[:3, :3].T + M[:3, 3]
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-5, atol=1e-6)

    def test_inv_rotation(self):
        x = jnp.asarray([0.1, -0.2, 0.3, 1.0, 2.0, 3.0], jnp.float32)
        pts = jnp.asarray([[0.5, -0.2, 0.9]], jnp.float32)
        back = se3.apply_increment_inv_rotation(x, se3.rotate_axis_angle(x[:3], pts))
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)


class TestEuler:
    def test_euler_roundtrip(self):
        rng = np.random.default_rng(2)
        for _ in range(20):
            R = random_rotation(rng).astype(np.float32)
            abg = se3.matrix_to_euler_xyz(jnp.asarray(R))
            R2 = se3.euler_xyz_to_matrix(abg[0], abg[1], abg[2])
            np.testing.assert_allclose(np.asarray(R2), R, atol=1e-4)

    def test_euler_first_angle_range(self):
        # Eigen eulerAngles(0,1,2) keeps the first angle in [0, pi].
        rng = np.random.default_rng(3)
        for _ in range(20):
            R = random_rotation(rng).astype(np.float32)
            abg = np.asarray(se3.matrix_to_euler_xyz(jnp.asarray(R)))
            assert -1e-6 <= abg[0] <= np.pi + 1e-6


class TestTransforms:
    def test_transform_points(self):
        rng = np.random.default_rng(4)
        R = random_rotation(rng).astype(np.float32)
        t = rng.standard_normal(3).astype(np.float32)
        pose = np.asarray(se3.pose_matrix(jnp.asarray(R), jnp.asarray(t)))
        pts = rng.standard_normal((5, 3)).astype(np.float32)
        out = se3.transform_points(jnp.asarray(pts), jnp.asarray(pose))
        np.testing.assert_allclose(np.asarray(out), pts @ R.T + t, rtol=1e-5, atol=1e-6)

    def test_transform_normals_rigid(self):
        rng = np.random.default_rng(5)
        R = random_rotation(rng).astype(np.float32)
        pose = np.asarray(se3.pose_matrix(jnp.asarray(R), jnp.asarray(np.ones(3, np.float32))))
        n = rng.standard_normal((5, 3)).astype(np.float32)
        out = se3.transform_normals(jnp.asarray(n), jnp.asarray(pose))
        # For rigid poses R^-T == R: normals rotate without translation.
        np.testing.assert_allclose(np.asarray(out), n @ R.T, rtol=1e-3, atol=1e-4)

    def test_invert_pose(self):
        rng = np.random.default_rng(6)
        R = random_rotation(rng).astype(np.float32)
        t = rng.standard_normal(3).astype(np.float32)
        pose = se3.pose_matrix(jnp.asarray(R), jnp.asarray(t))
        prod = np.asarray(pose @ se3.invert_pose(pose))
        np.testing.assert_allclose(prod, np.eye(4), atol=1e-5)

    def test_cross_matrix(self):
        k = jnp.asarray([1.0, 2.0, 3.0], jnp.float32)
        v = jnp.asarray([0.5, -0.3, 0.8], jnp.float32)
        np.testing.assert_allclose(
            np.asarray(se3.cross_matrix(k) @ v), np.cross(np.asarray(k), np.asarray(v)),
            rtol=1e-6,
        )

    def test_masked_mean(self):
        pts = jnp.asarray([[1.0, 0, 0], [3.0, 0, 0], [100.0, 0, 0]], jnp.float32)
        mask = jnp.asarray([True, True, False])
        np.testing.assert_allclose(np.asarray(se3.masked_mean(pts, mask)), [2.0, 0, 0])
