"""Projective correspondence search (RGB-D frame-to-frame).

TPU-native re-design of ``NearestNeighborSearchProjective``
(NearestNeighbor.h:317-444): each transformed source point is projected into
the target image plane through the depth intrinsics, and the closest target
point within a ``(2W+1)^2`` pixel window wins (W = 12 by default,
NearestNeighbor.h:319), under the squared max-distance threshold.

Instead of the reference's per-point OpenMP scan, the window walk is a
``lax.fori_loop`` over BATCHES of the (2W+1)^2 static offsets: each step
gathers ``offset_chunk`` whole window rows for every query at once (one
(N, offset_chunk) gather + a lane-wise min), so the loop runs 2W+1 times
rather than (2W+1)^2 — per-step gather/dispatch overhead amortizes across
the window row. The target cloud must be image-shaped (width*height rows,
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
    span = 2 * window + 1
    dus = jnp.arange(-window, window + 1)  # one window ROW per loop step

    def body(k, carry):
        best_d2, best_idx = carry
        dv = k - window
        v = v0 + dv
        u = u0[:, None] + dus[None, :]                      # (N, 2W+1)
        in_image = (u >= 0) & (u < width) & ((v >= 0) & (v < height))[:, None]
        lin = jnp.clip(v[:, None] * width + u, 0, width * height - 1)
        tp = target_points[lin]                             # (N, 2W+1, 3)
        ok = in_image & target_valid[lin]
        d2 = jnp.sum((query_points[:, None, :] - tp) ** 2, axis=2)
        d2 = jnp.where(ok, d2, big)
        row_best = jnp.min(d2, axis=1)
        row_arg = jnp.take_along_axis(
            lin, jnp.argmin(d2, axis=1)[:, None], axis=1
        )[:, 0]
        better = row_best < best_d2
        return (
            jnp.where(better, row_best, best_d2),
            jnp.where(better, row_arg, best_idx),
        )

    init = (jnp.full((n,), big, jnp.float32), jnp.full((n,), -1, jnp.int32))
    best_d2, best_idx = jax.lax.fori_loop(0, span, body, init)

    valid = best_d2 <= max_distance
    if query_mask is not None:
        valid = valid & query_mask
    return best_idx, best_d2, valid
