"""Projective correspondence search (RGB-D frame-to-frame).

TPU-native re-design of ``NearestNeighborSearchProjective``
(NearestNeighbor.h:317-444): each transformed source point is projected into
the target image plane through the depth intrinsics, and the closest target
point within a ``(2W+1)^2`` pixel window wins (W = 12 by default,
NearestNeighbor.h:319), under the squared max-distance threshold.

Instead of the reference's per-point OpenMP scan, the window walk is a
``lax.fori_loop`` over the (2W+1)^2 static offsets with a vectorized gather
per offset — every lane handles one source point, so the whole stage is one
fused VPU program. The target cloud must be image-shaped (width*height rows,
invalid pixels masked), the reference's ``keepOriginalSize`` contract
(NearestNeighbor.h:346-349).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def projective_match(
    query_points: jax.Array,      # (N, 3) transformed source points
    target_points: jax.Array,     # (W*H, 3) image-shaped target cloud
    target_valid: jax.Array,      # (W*H,) bool
    *,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    width: int,
    height: int,
    window: int = 12,
    max_distance: float | jax.Array = 0.1,
    query_mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Return ``(indices, dist2, valid)`` per query point.

    Projection follows NearestNeighbor.h:378-379 (round to nearest pixel);
    the window scan keeps the minimum squared distance among valid target
    pixels (385-404); the threshold compares squared distance (407).
    """
    n = query_points.shape[0]
    x, y, z = query_points[:, 0], query_points[:, 1], query_points[:, 2]
    safe_z = jnp.where(z == 0, 1.0, z)
    u0 = jnp.round(x * fx / safe_z + cx).astype(jnp.int32)
    v0 = jnp.round(y * fy / safe_z + cy).astype(jnp.int32)

    big = jnp.asarray(3.0e13, jnp.float32)
    offsets = jnp.stack(
        jnp.meshgrid(
            jnp.arange(-window, window + 1),
            jnp.arange(-window, window + 1),
            indexing="ij",
        ),
        axis=-1,
    ).reshape(-1, 2)  # ((2W+1)^2, 2) of (dv, du)

    def body(k, carry):
        best_d2, best_idx = carry
        dv = offsets[k, 0]
        du = offsets[k, 1]
        v = v0 + dv
        u = u0 + du
        in_image = (u >= 0) & (u < width) & (v >= 0) & (v < height)
        lin = jnp.clip(v * width + u, 0, width * height - 1)
        tp = target_points[lin]
        ok = in_image & target_valid[lin]
        d2 = jnp.sum((query_points - tp) ** 2, axis=1)
        d2 = jnp.where(ok, d2, big)
        better = d2 < best_d2
        return jnp.where(better, d2, best_d2), jnp.where(better, lin, best_idx)

    init = (jnp.full((n,), big, jnp.float32), jnp.full((n,), -1, jnp.int32))
    best_d2, best_idx = jax.lax.fori_loop(0, offsets.shape[0], body, init)

    valid = best_d2 <= max_distance
    if query_mask is not None:
        valid = valid & query_mask
    return best_idx, best_d2, valid
