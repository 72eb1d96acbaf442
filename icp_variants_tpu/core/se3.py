"""SE(3) primitives: axis-angle poses, rotations, rigid transforms.

TPU-native equivalent of the reference's pose machinery
(``utils.h:26-176``): the 6-vector pose increment (axis-angle rotation +
translation), axis-angle <-> rotation-matrix conversion (Ceres'
``AngleAxisRotatePoint`` / ``AngleAxisToRotationMatrix`` kernels), Euler and
Rodrigues rotation builders, and batched point/normal transforms.

Everything here is pure jax.numpy, shape-polymorphic over leading batch
dimensions, and differentiable (the Gauss-Newton path jacfwd's through
``apply_increment``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SMALL_ANGLE = 1e-12


def rotate_axis_angle(w: jax.Array, points: jax.Array) -> jax.Array:
    """Rotate ``points`` [..., 3] by the axis-angle vector ``w`` (3,).

    Rodrigues rotation written exactly as Ceres' ``AngleAxisRotatePoint``
    (referenced at utils.h:51): for theta -> 0 falls back to the first-order
    expansion ``p + w x p`` to stay differentiable at zero.
    """
    theta2 = jnp.sum(w * w)
    # Guard both branches of the where so gradients stay finite at theta=0.
    safe_theta2 = jnp.where(theta2 > _SMALL_ANGLE, theta2, 1.0)
    theta = jnp.sqrt(safe_theta2)
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    axis = w / theta

    w_cross_p = jnp.cross(jnp.broadcast_to(axis, points.shape), points)
    axis_dot_p = jnp.sum(points * axis, axis=-1, keepdims=True)
    rotated = (
        points * cos_t
        + w_cross_p * sin_t
        + axis * axis_dot_p * (1.0 - cos_t)
    )
    # First-order fallback near zero: p + w x p.
    small = points + jnp.cross(jnp.broadcast_to(w, points.shape), points)
    return jnp.where(theta2 > _SMALL_ANGLE, rotated, small)


def apply_increment(x: jax.Array, points: jax.Array) -> jax.Array:
    """Apply a 6-vector pose increment ``[w, t]`` to points [..., 3].

    Mirrors ``PoseIncrement::apply`` (utils.h:44-56): axis-angle rotate then
    translate. Differentiable in ``x`` — this is the function the LM path
    linearizes.
    """
    return rotate_axis_angle(x[:3], points) + x[3:6]


def apply_increment_inv_rotation(x: jax.Array, points: jax.Array) -> jax.Array:
    """Rotate points by the INVERSE rotation of the increment, no translation.

    Mirrors ``PoseIncrement::apply_inv_rotation`` (utils.h:60-72), used by the
    symmetric-ICP constraint to rotate the target by the half-inverse.
    """
    return rotate_axis_angle(-x[:3], points)


def axis_angle_to_matrix(w: jax.Array) -> jax.Array:
    """Axis-angle (3,) -> rotation matrix (3, 3).

    Equivalent of Ceres' ``AngleAxisToRotationMatrix`` used by
    ``PoseIncrement::convertToMatrix`` (utils.h:79-98).
    """
    theta2 = jnp.sum(w * w)
    safe_theta2 = jnp.where(theta2 > _SMALL_ANGLE, theta2, 1.0)
    theta = jnp.sqrt(safe_theta2)
    axis = w / theta
    K = cross_matrix(axis)
    eye = jnp.eye(3, dtype=w.dtype)
    R = eye + jnp.sin(theta) * K + (1.0 - jnp.cos(theta)) * (K @ K)
    # Near zero: I + [w]_x  (first order).
    R_small = eye + cross_matrix(w)
    return jnp.where(theta2 > _SMALL_ANGLE, R, R_small)


def matrix_to_axis_angle(R: jax.Array) -> jax.Array:
    """Rotation matrix (3,3) -> axis-angle (3,). Inverse of the above.

    Goes through a quaternion (Shepperd's method, branchless via where) so
    the extraction stays accurate near theta = pi, where the naive
    skew-part formula loses all precision.
    """
    q = matrix_to_quaternion(R)  # (w, x, y, z), w >= 0
    w_, xyz = q[0], q[1:]
    norm_xyz = jnp.linalg.norm(xyz)
    theta = 2.0 * jnp.arctan2(norm_xyz, w_)
    safe = jnp.where(norm_xyz > 1e-12, norm_xyz, 1.0)
    axis = xyz / safe
    return jnp.where(norm_xyz > 1e-12, axis * theta, xyz * 2.0)


def matrix_to_quaternion(R: jax.Array) -> jax.Array:
    """Rotation matrix -> unit quaternion (w, x, y, z) with w >= 0.

    Branchless Shepperd: compute all four candidate constructions, pick the
    one seeded by the largest diagonal combination.
    """
    m00, m01, m02 = R[0, 0], R[0, 1], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    tr = m00 + m11 + m22

    def cand(seed, a, b, c, d):
        s = 2.0 * jnp.sqrt(jnp.maximum(seed, 1e-12))
        return jnp.stack([a / s * 2.0, b / s * 2.0, c / s * 2.0, d / s * 2.0]) * 0.5

    # Seeds: 1+tr, 1+m00-m11-m22, 1-m00+m11-m22, 1-m00-m11+m22.
    s0 = 1.0 + tr
    s1 = 1.0 + m00 - m11 - m22
    s2 = 1.0 - m00 + m11 - m22
    s3 = 1.0 - m00 - m11 + m22
    q0 = cand(s0, s0, m21 - m12, m02 - m20, m10 - m01)
    q1 = cand(s1, m21 - m12, s1, m01 + m10, m02 + m20)
    q2 = cand(s2, m02 - m20, m01 + m10, s2, m12 + m21)
    q3 = cand(s3, m10 - m01, m02 + m20, m12 + m21, s3)

    seeds = jnp.stack([s0, s1, s2, s3])
    qs = jnp.stack([q0, q1, q2, q3])  # (4, 4)
    best = jnp.argmax(seeds)
    q = qs[best]
    q = q / jnp.linalg.norm(q)
    return jnp.where(q[0] < 0, -q, q)


def increment_to_matrix(x: jax.Array) -> jax.Array:
    """6-vector increment -> 4x4 homogeneous transform.

    ``PoseIncrement::convertToMatrix`` (utils.h:79-98).
    """
    R = axis_angle_to_matrix(x[:3])
    return pose_matrix(R, x[3:6])


def pose_matrix(R: jax.Array, t: jax.Array) -> jax.Array:
    """Assemble a 4x4 pose from rotation (3,3) and translation (3,)."""
    top = jnp.concatenate([R, t.reshape(3, 1)], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=R.dtype)
    return jnp.concatenate([top, bottom], axis=0)


def translation_matrix(t: jax.Array) -> jax.Array:
    """4x4 pure-translation transform (``gettranslationMatrix``, utils.h:149-156)."""
    return pose_matrix(jnp.eye(3, dtype=t.dtype), t)


def cross_matrix(k: jax.Array) -> jax.Array:
    """Skew-symmetric cross-product matrix [k]_x (``crossProductMatrix``, utils.h:160-167)."""
    zero = jnp.zeros((), dtype=k.dtype)
    return jnp.stack(
        [
            jnp.stack([zero, -k[2], k[1]]),
            jnp.stack([k[2], zero, -k[0]]),
            jnp.stack([-k[1], k[0], zero]),
        ]
    )


def rodrigues_matrix(axis: jax.Array, sin_theta: jax.Array, cos_theta: jax.Array) -> jax.Array:
    """R = I + sin(theta) K + (1 - cos(theta)) K^2 (``getRodriguesMatrix``, utils.h:171-176)."""
    K = cross_matrix(axis)
    return jnp.eye(3, dtype=axis.dtype) + sin_theta * K + (1.0 - cos_theta) * (K @ K)


def euler_xyz_to_matrix(alpha: jax.Array, beta: jax.Array, gamma: jax.Array) -> jax.Array:
    """R = Rx(alpha) Ry(beta) Rz(gamma), the convention of the linear
    point-to-plane pose recovery (ICPOptimizer.h:771-773)."""
    ca, sa = jnp.cos(alpha), jnp.sin(alpha)
    cb, sb = jnp.cos(beta), jnp.sin(beta)
    cg, sg = jnp.cos(gamma), jnp.sin(gamma)
    Rx = jnp.array([[1, 0, 0], [0, ca, -sa], [0, sa, ca]], dtype=alpha.dtype)
    Ry = jnp.array([[cb, 0, sb], [0, 1, 0], [-sb, 0, cb]], dtype=alpha.dtype)
    Rz = jnp.array([[cg, -sg, 0], [sg, cg, 0], [0, 0, 1]], dtype=alpha.dtype)
    return Rx @ Ry @ Rz


def matrix_to_euler_xyz(R: jax.Array) -> jax.Array:
    """Extract (alpha, beta, gamma) with R = Rx(a) Ry(b) Rz(g).

    Matches Eigen's ``eulerAngles(0, 1, 2)`` convention used when scaling the
    ETH ground-truth perturbation (main.cpp:420). Eigen constrains the FIRST
    angle to [0, pi]; we reproduce that so pose-scaling parity holds.
    """
    beta = jnp.arctan2(R[0, 2], jnp.sqrt(R[0, 0] ** 2 + R[0, 1] ** 2))
    alpha = jnp.arctan2(-R[1, 2], R[2, 2])
    gamma = jnp.arctan2(-R[0, 1], R[0, 0])
    # Eigen eulerAngles(0,1,2) keeps angle[0] in [0, pi]; if alpha < 0 flip all
    # three (equivalent rotation).
    flip = alpha < 0
    alpha2 = alpha + jnp.pi
    beta2 = jnp.pi - beta
    gamma2 = gamma + jnp.pi
    wrap = lambda a: jnp.arctan2(jnp.sin(a), jnp.cos(a))
    return jnp.where(
        flip,
        jnp.stack([alpha2, wrap(beta2), wrap(gamma2)]),
        jnp.stack([alpha, beta, gamma]),
    )


def transform_points(points: jax.Array, pose: jax.Array) -> jax.Array:
    """Batch rigid transform R p + t (``transformPoints``, utils.h:106-118).

    HIGHEST precision: these coordinates feed nearest-neighbor matching
    (and the warm radii derived from them), where a default-precision MXU
    lowering would round 20 m-scale scenes by up to centimeters and flip
    near-tie winners — k-NN must stay exact in f32 (CLAUDE.md invariant).
    The contraction is K=3, so the cost is negligible.
    """
    return (
        jnp.matmul(points, pose[:3, :3].T, precision=jax.lax.Precision.HIGHEST)
        + pose[:3, 3]
    )


def _inv3(R: jax.Array) -> jax.Array:
    """Closed-form 3x3 inverse (adjugate / det): pure elementwise ops, so it
    vectorizes and shards cleanly (jnp.linalg.inv does not under SPMD)."""
    c0 = jnp.cross(R[:, 1], R[:, 2])
    c1 = jnp.cross(R[:, 2], R[:, 0])
    c2 = jnp.cross(R[:, 0], R[:, 1])
    det = jnp.dot(R[:, 0], c0)
    return jnp.stack([c0, c1, c2], axis=0) / det


def transform_normals(normals: jax.Array, pose: jax.Array) -> jax.Array:
    """Transform normals by R^-T (``transformNormals``, utils.h:122-133).

    For a rigid pose R^-T == R, but we keep the inverse-transpose so behavior
    matches the reference for any invertible linear part.
    """
    R = pose[:3, :3]
    # HIGHEST like transform_points: normals feed the rejection cosine test
    # and plane/symmetric residuals.
    return jnp.matmul(
        normals, _inv3(R), precision=jax.lax.Precision.HIGHEST
    )  # (R^-T n)^T = n^T R^-1


def invert_pose(pose: jax.Array) -> jax.Array:
    """Closed-form inverse of a rigid 4x4 transform."""
    R = pose[:3, :3]
    t = pose[:3, 3]
    Rinv = R.T
    return pose_matrix(Rinv, -Rinv @ t)


def masked_mean(
    points: jax.Array,
    mask: jax.Array,
    weights: jax.Array | None = None,
    axis_name: str | None = None,
) -> jax.Array:
    """Mean of masked (optionally weighted) points (``computeMean``, utils.h:136-145).

    With ``axis_name`` set the reduction spans a mesh axis (points sharded
    across devices): numerator and denominator are psum'd over ICI.
    """
    w = mask.astype(points.dtype)
    if weights is not None:
        w = w * weights
    num = jnp.sum(points * w[:, None], axis=0)
    den = jnp.sum(w)
    if axis_name is not None:
        num = jax.lax.psum(num, axis_name)
        den = jax.lax.psum(den, axis_name)
    return num / jnp.maximum(den, 1e-12)
