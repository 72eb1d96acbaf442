"""Padded, masked point-cloud container — the TPU-native ``PointCloud``.

The reference (``PointCloud.h:8-349``) stores dynamically-sized
``std::vector``s and compacts invalid points freely. On TPU everything under
``jit`` must be static-shaped, so a :class:`Cloud` is a pytree of fixed-size
arrays plus a validity mask:

* ``points  (N, 3) float32`` — padded rows hold ``PAD_SENTINEL`` so a padded
  target can never win a nearest-neighbor race (no NaN/Inf in the kernels),
* ``normals (N, 3) float32`` — NaN rows mark "invalid normal" (the
  reference's MINF), masked out by the ops that consume them,
* ``colors  (N, 4) float32`` in [0, 255] (RGBA, reference's ``Vector4uc``),
* ``valid   (N,)  bool`` — false for padding AND for reference-MINF points.

The reference's "idx = -1 means rejected" protocol becomes the mask; its
``keepOriginalSize`` flag becomes "the mask keeps image-shaped position",
which multi-resolution striding and projective matching rely on.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Coordinate written into padded/invalid rows. Large enough that a padded
# target never matches (distance^2 ~ 1e13 >> any max-distance threshold),
# small enough that squared arithmetic stays finite in float32.
PAD_SENTINEL = 2.0e6

# Row-count granularity. 8 sublanes x float32 is the minimum TPU tile height;
# we use 256 so query tiles of the Pallas k-NN kernel divide evenly.
PAD_MULTIPLE = 256


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


class Cloud(NamedTuple):
    """Fixed-size masked point cloud (pytree)."""

    points: jax.Array   # (N, 3) f32
    normals: jax.Array  # (N, 3) f32, NaN rows = invalid normal
    colors: jax.Array   # (N, 4) f32 in [0, 255]
    valid: jax.Array    # (N,) bool

    @property
    def capacity(self) -> int:
        return self.points.shape[0]

    def num_valid(self) -> jax.Array:
        return jnp.sum(self.valid)

    def transformed(self, pose: jax.Array) -> "Cloud":
        """Rigidly transform points (R p + t) and normals (R^-T n).

        Equivalent of transforming a selection before matching
        (ICPOptimizer.h:251-252). Padded rows are re-pinned to the sentinel so
        a transformed cloud is still safe to use as a k-NN target.
        """
        from icp_variants_tpu.core import se3

        pts = se3.transform_points(self.points, pose)
        pts = jnp.where(self.valid[:, None], pts, PAD_SENTINEL)
        nrm = se3.transform_normals(self.normals, pose)
        return self._replace(points=pts, normals=nrm)


def from_numpy(
    points: np.ndarray,
    normals: np.ndarray | None = None,
    colors: np.ndarray | None = None,
    valid: np.ndarray | None = None,
    capacity: int | None = None,
    morton_order: bool = False,
) -> Cloud:
    """Build a padded :class:`Cloud` from host arrays.

    ``capacity`` lets callers force a common padded size across a dataset so
    every scan pair shares one compiled executable (critical for the ETH
    sweep: one XLA program, 45 pairs).

    ``morton_order=True`` reorders rows along a Z-order curve on the host,
    making fixed-size row tiles spatially compact — the layout the
    bbox-pruned k-NN kernel exploits. Do NOT enable for image-shaped clouds
    (projective matching and image-order striding need pixel layout); note
    it also changes WHICH points a multires stride level picks (a different
    but equally arbitrary subsample than the reference's image-order
    stride).
    """
    points = np.asarray(points, dtype=np.float32)
    n = points.shape[0]
    if morton_order and n > 0:
        from icp_variants_tpu.ops.knn import morton_codes_np

        order = np.argsort(morton_codes_np(points), kind="stable")
        points = points[order]
        if normals is not None:
            normals = np.asarray(normals, dtype=np.float32)[order]
        if colors is not None:
            colors = np.asarray(colors, dtype=np.float32)[order]
        if valid is not None:
            valid = np.asarray(valid, dtype=bool)[order]
    cap = capacity if capacity is not None else _round_up(max(n, 1), PAD_MULTIPLE)
    if cap < n:
        raise ValueError(f"capacity {cap} < number of points {n}")
    cap = _round_up(cap, PAD_MULTIPLE)

    if normals is None:
        normals = np.full((n, 3), np.nan, dtype=np.float32)
    else:
        normals = np.asarray(normals, dtype=np.float32)
    if colors is None:
        colors = np.zeros((n, 4), dtype=np.float32)
    else:
        colors = np.asarray(colors, dtype=np.float32)
        if colors.shape[1] == 3:
            colors = np.concatenate(
                [colors, np.zeros((n, 1), dtype=np.float32)], axis=1
            )
    if valid is None:
        valid = np.isfinite(points).all(axis=1)
    else:
        valid = np.asarray(valid, dtype=bool) & np.isfinite(points).all(axis=1)

    pad = cap - n
    pts = np.full((cap, 3), PAD_SENTINEL, dtype=np.float32)
    pts[:n] = np.where(valid[:, None], points, PAD_SENTINEL)
    nrm = np.full((cap, 3), np.nan, dtype=np.float32)
    nrm[:n] = normals
    col = np.zeros((cap, 4), dtype=np.float32)
    col[:n] = colors
    val = np.zeros((cap,), dtype=bool)
    val[:n] = valid
    del pad

    return Cloud(
        points=jnp.asarray(pts),
        normals=jnp.asarray(nrm),
        colors=jnp.asarray(col),
        valid=jnp.asarray(val),
    )


def mesh_vertex_normals(vertices: np.ndarray, triangles: np.ndarray) -> np.ndarray:
    """Vertex normals as the normalized sum of incident (area-weighted) face
    normals — the mesh-constructor convention of PointCloud.h:24-37."""
    v = np.asarray(vertices, dtype=np.float64)
    tri = np.asarray(triangles, dtype=np.int64)
    face_n = np.cross(v[tri[:, 1]] - v[tri[:, 0]], v[tri[:, 2]] - v[tri[:, 0]])
    normals = np.zeros_like(v)
    for k in range(3):
        np.add.at(normals, tri[:, k], face_n)
    norms = np.linalg.norm(normals, axis=1, keepdims=True)
    normals = np.divide(normals, norms, out=np.zeros_like(normals), where=norms > 0)
    return normals.astype(np.float32)


def coarse_stride_mask(
    cloud: Cloud, stride: jax.Array, index_offset: jax.Array | int = 0
) -> jax.Array:
    """Validity mask of the stride-subsampled cloud.

    The reference's ``getCoarseResolution(factor)`` (PointCloud.h:325-343)
    keeps every ``factor``-th point that is valid (finite point AND normal).
    As a mask: row i survives iff ``i % stride == 0`` and it was valid.
    ``stride`` may be a traced scalar (the multi-resolution schedule scans
    over it). ``index_offset`` supplies the global row offset when the cloud
    is a shard of a larger one (point-axis tensor parallelism).
    """
    idx = jnp.arange(cloud.capacity) + index_offset
    finite_normal = jnp.isfinite(cloud.normals).all(axis=1)
    return (idx % stride == 0) & cloud.valid & finite_normal


def multires_initial_stride(num_points: int, minimum_points: int = 100) -> int:
    """Coarsest level stride: halve the point count until it would drop below
    ``minimum_points`` (MULTI_RESOLUTION_MINIMUM_POINTS, ICPOptimizer.h:21,
    196-208)."""
    stride = 1
    size = num_points
    while True:
        size = size // 2
        if size < minimum_points:
            break
        stride *= 2
    return stride


def multires_stride_schedule(
    num_points: int, n_iterations: int, enabled: bool, minimum_points: int = 100
) -> np.ndarray:
    """Per-iteration stride schedule replicating the reference's
    coarse-to-fine loop (ICPOptimizer.h:238, 319-341).

    Iteration i runs at stride ``max(R / 2^i, 1)`` where R is the coarsest
    stride; the loop runs past ``n_iterations`` until full resolution is
    reached, i.e. ``total = max(n_iterations, log2(R) + 1)``.
    """
    if not enabled:
        return np.ones((n_iterations,), dtype=np.int32)
    stride = multires_initial_stride(num_points, minimum_points)
    strides = []
    i = 0
    while True:
        strides.append(stride)
        if stride == 1 and i >= n_iterations - 1:
            break
        stride = max(stride // 2, 1)
        i += 1
    return np.asarray(strides, dtype=np.int32)
