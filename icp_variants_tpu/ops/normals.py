"""Depth back-projection and normal estimation — JAX ops.

Replaces two reference components:

* the depth-map PointCloud constructor (PointCloud.h:78-165): back-project
  every pixel through the inverse intrinsics/extrinsics, normals from
  central differences of the depth image with a gradient-magnitude
  rejection, borders invalidated;
* PCL's k-NN ``NormalEstimation`` with k=5 (PointCloud.h:41-76): per-point
  covariance of the k nearest neighbors, smallest eigenvector, oriented
  toward the viewpoint — implemented with an analytic symmetric-3x3
  eigensolver so the whole cloud runs as one fused VPU program (no batched
  LAPACK on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from icp_variants_tpu.ops import knn as knn_lib


@functools.partial(jax.jit, static_argnames=("max_distance",))
def backproject_depth(
    depth: jax.Array,            # (H, W) meters; non-finite = invalid (MINF)
    intrinsics: jax.Array,       # (3, 3)
    extrinsics_inv: jax.Array,   # (4, 4) inverse depth extrinsics
    max_distance: float = 0.1,
):
    """Back-project a depth image into a (H*W)-row point set with normals.

    Mirrors PointCloud.h:92-142:
    * point = Rinv @ [ (u-cx)/fx * d, (v-cy)/fy * d, d ] + tinv
    * normal = normalize([-du, -dv, 1]) from central differences of DEPTH,
      invalid when non-finite or |du|,|dv| > max_distance/2. Note the
      reference leaves these normals in the camera frame (it does not rotate
      them by Rinv) — with the identity extrinsics of the TUM driver the two
      agree; we reproduce the behavior.
    * image borders get invalid normals.

    Returns ``(points (H*W,3), normals (H*W,3), valid_point (H*W,),
    valid_normal (H*W,))``; callers combine the masks per use (the reference
    keeps a point only when BOTH are finite unless keepOriginalSize).
    """
    h, w = depth.shape
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    rot_inv = extrinsics_inv[:3, :3]
    t_inv = extrinsics_inv[:3, 3]

    vv, uu = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    valid_point = jnp.isfinite(depth)
    d = jnp.where(valid_point, depth, 0.0)
    cam = jnp.stack(
        [(uu - cx) / fx * d, (vv - cy) / fy * d, d], axis=-1
    )  # (H, W, 3)
    pts = cam.reshape(-1, 3) @ rot_inv.T + t_inv

    # Central differences on the raw depth image (PointCloud.h:119-120).
    half = max_distance / 2.0
    du = 0.5 * (jnp.roll(depth, -1, axis=1) - jnp.roll(depth, 1, axis=1))
    dv = 0.5 * (jnp.roll(depth, -1, axis=0) - jnp.roll(depth, 1, axis=0))
    grad_ok = (
        jnp.isfinite(du) & jnp.isfinite(dv)
        & (jnp.abs(du) <= half) & (jnp.abs(dv) <= half)
    )
    n = jnp.stack([-du, -dv, jnp.ones_like(du)], axis=-1)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)

    border = (
        (uu == 0) | (uu == w - 1) | (vv == 0) | (vv == h - 1)
    )
    valid_normal = grad_ok & ~border
    normals = jnp.where(valid_normal[..., None], n, jnp.nan).reshape(-1, 3)

    return pts, normals, valid_point.reshape(-1), valid_normal.reshape(-1)


def smallest_eigenvector_sym3(A: jax.Array) -> jax.Array:
    """Unit eigenvector of the smallest eigenvalue of symmetric (..., 3, 3)
    matrices, fully vectorized (trigonometric eigenvalues + cross-product
    eigenvector extraction). The TPU-native stand-in for batched LAPACK."""
    # Eigenvalues via the trigonometric method for symmetric 3x3.
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    I = jnp.eye(3, dtype=A.dtype)
    B = A - q[..., None, None] * I
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    detB = jnp.linalg.det(B)
    r = detB / (2.0 * p**3)
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    # Smallest eigenvalue: q + 2 p cos(phi + 2*pi/3).
    lam = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)

    # Eigenvector: the null direction of (A - lam I); take the largest cross
    # product of its rows for numerical robustness.
    M = A - lam[..., None, None] * I
    c01 = jnp.cross(M[..., 0, :], M[..., 1, :])
    c02 = jnp.cross(M[..., 0, :], M[..., 2, :])
    c12 = jnp.cross(M[..., 1, :], M[..., 2, :])
    cands = jnp.stack([c01, c02, c12], axis=-2)
    norms = jnp.linalg.norm(cands, axis=-1)
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    # Degenerate (isotropic) neighborhoods: fall back to +z.
    fallback = jnp.zeros_like(v).at[..., 2].set(1.0)
    return jnp.where(vn > 1e-20, v / jnp.maximum(vn, 1e-30), fallback)


def estimate_normals_knn(
    points: jax.Array,
    valid: jax.Array,
    k: int = 5,
    viewpoint: jax.Array | None = None,
) -> jax.Array:
    """PCL-style k-NN normal estimation (PointCloud.h:41-76: kSearch=5).

    For each point: covariance of its k nearest neighbors (the query itself
    is one of them, as in PCL when the query belongs to the cloud), normal =
    smallest eigenvector, flipped toward ``viewpoint`` (PCL default origin).
    Invalid rows get NaN normals.
    """
    if viewpoint is None:
        viewpoint = jnp.zeros((3,), points.dtype)
    idx, _ = knn_lib.knn_k(points, points, k)          # (N, k)
    neigh = points[idx]                                 # (N, k, 3)
    mean = jnp.mean(neigh, axis=1, keepdims=True)
    centered = neigh - mean
    cov = jnp.einsum("nki,nkj->nij", centered, centered) / k
    n = smallest_eigenvector_sym3(cov)
    flip = jnp.sum(n * (viewpoint - points), axis=-1) < 0
    n = jnp.where(flip[:, None], -n, n)
    return jnp.where(valid[:, None], n, jnp.nan)
