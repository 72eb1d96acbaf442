"""RGB-D frame -> Cloud bridge (the depth-map PointCloud constructor).

Equivalent of PointCloud.h:78-165: back-projection (on device, via
``ops.normals.backproject_depth``), central-difference normals, stride
downsampling and the ``keep_original_size`` contract that projective
matching and multi-resolution rely on.

Deviation from the reference, by design: the reference reads pixel colors
at byte offset ``i`` instead of ``4*i`` (PointCloud.h:158), i.e. its colors
are wrong for every pixel past the first; we index correctly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from icp_variants_tpu.core import cloud as cloud_lib
from icp_variants_tpu.core.cloud import Cloud
from icp_variants_tpu.ops import normals as normals_ops


def cloud_from_depth(
    depth: np.ndarray,             # (H, W) float32, MINF invalid
    color: np.ndarray,             # (H, W, 4) uint8
    intrinsics: np.ndarray,        # (3, 3)
    extrinsics: np.ndarray,        # (4, 4)
    keep_original_size: bool = False,
    downsample_factor: int = 1,
    max_distance: float = 0.1,
    capacity: int | None = None,
    morton_order: bool = False,
    color_morton_order: bool = False,
) -> Cloud:
    """Build a padded Cloud from an RGB-D frame.

    ``keep_original_size=True`` keeps invalid rows in place (image-shaped
    indexing for projective matching / multires striding); otherwise rows
    where point OR normal is invalid are compacted away on the host
    (PointCloud.h:149-164). ``downsample_factor`` strides pixels in
    linearized order exactly like the reference.

    ``morton_order`` (compacted path only) Z-orders the surviving rows:
    spatially-coherent query subgroups keep the resident projective
    kernel's per-subgroup membership rects tight (raster-compacted
    stride-8 rows span ~64 px per 8 queries — 21 member blocks per
    subgroup instead of ~9). Row order is free under SELECT_ALL
    matching; only f32 reduction order shifts.

    ``color_morton_order`` reorders rows (full-size path too, invalid
    rows last) along a 6-dim Morton curve over the color-ICP feature
    space (knn.morton6_codes_np) so the resident color matcher's 32-row
    gates hold same-kd-block queries (+23% color-multires throughput).
    INCOMPATIBLE with projective matching and image-order striding:
    multires strides then subsample the 6-dim Morton order — a
    different-but-equally-arbitrary subsample than the reference's
    image-order stride, same deviation class as ``morton_order``
    (PARITY.md)."""
    extrinsics_inv = np.linalg.inv(np.asarray(extrinsics, np.float32))
    pts, nrm, valid_pt, valid_nm = normals_ops.backproject_depth(
        jnp.asarray(depth, jnp.float32),
        jnp.asarray(intrinsics, jnp.float32),
        jnp.asarray(extrinsics_inv),
        max_distance=float(max_distance),
    )
    pts = np.asarray(pts)
    nrm = np.asarray(nrm)
    valid_pt = np.asarray(valid_pt)
    valid_nm = np.asarray(valid_nm)
    cols = np.asarray(color, np.float32).reshape(-1, 4)

    sel = slice(None, None, downsample_factor)
    pts, nrm, cols = pts[sel], nrm[sel], cols[sel]
    valid_pt, valid_nm = valid_pt[sel], valid_nm[sel]

    if keep_original_size:
        if color_morton_order:
            from icp_variants_tpu.ops.knn import morton6_codes_np

            order = np.argsort(
                morton6_codes_np(pts, cols, valid_pt & valid_nm),
                kind="stable")
            pts, nrm, cols = pts[order], nrm[order], cols[order]
            valid_pt = valid_pt[order]
        # Invalid rows stay, marked by the mask (validity = point AND normal,
        # matching what downstream consumers of full-size clouds check).
        return cloud_lib.from_numpy(
            pts, normals=nrm, colors=cols, valid=valid_pt, capacity=capacity
        )

    keep = valid_pt & valid_nm
    if color_morton_order:
        from icp_variants_tpu.ops.knn import morton6_codes_np

        pts, nrm, cols = pts[keep], nrm[keep], cols[keep]
        order = np.argsort(morton6_codes_np(pts, cols), kind="stable")
        return cloud_lib.from_numpy(
            pts[order], normals=nrm[order], colors=cols[order],
            capacity=capacity,
        )
    return cloud_lib.from_numpy(
        pts[keep], normals=nrm[keep], colors=cols[keep], capacity=capacity,
        morton_order=morton_order,
    )
