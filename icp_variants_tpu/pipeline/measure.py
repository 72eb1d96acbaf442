"""Convergence measurement: GT-correspondence RMSE + the ETH (Fontana)
benchmark error.

TPU-native equivalent of ``ConvergenceMeasure`` (ConvergenceMeasure.h:15-184).
Both metrics are pure jitted functions evaluated INSIDE the ICP scan loop
every iteration (the reference records them in-loop too,
ICPOptimizer.h:315-317), so a full per-iteration error curve costs one
device pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from icp_variants_tpu.core import se3


def rmse_alignment_error(
    pose: jax.Array,
    source_points: jax.Array,   # (N, 3) stored source correspondences
    target_points: jax.Array,   # (N, 3) fixed counterpart points
    valid: jax.Array | None = None,
    axis_name: str | None = None,
) -> jax.Array:
    """RMSE over known correspondences after transforming the stored source
    by ``pose`` (ConvergenceMeasure.h:50-66). Non-finite pairs are skipped.

    With ``axis_name`` the correspondence rows are sharded over that mesh
    axis; sum and count psum across it (shard-safe like the solvers)."""
    moved = se3.transform_points(source_points, pose)
    finite = jnp.isfinite(moved).all(axis=1) & jnp.isfinite(target_points).all(axis=1)
    if valid is not None:
        finite = finite & valid
    d2 = jnp.sum((moved - target_points) ** 2, axis=1)
    d2 = jnp.where(finite, d2, 0.0)
    total = jnp.sum(d2)
    count = jnp.sum(finite)
    if axis_name is not None:
        total = jax.lax.psum(total, axis_name)
        count = jax.lax.psum(count, axis_name)
    return jnp.sqrt(total / jnp.maximum(count, 1))


def benchmark_error(
    pose: jax.Array,
    source_points: jax.Array,
    target_points: jax.Array,
    valid: jax.Array | None = None,
    axis_name: str | None = None,
) -> jax.Array:
    """The ETH/Fontana pose-scale-invariant error
    (ConvergenceMeasure.h:133-151):
    mean_i |p_i - q_i| / |p_i - centroid(p)| with p the transformed source."""
    moved = se3.transform_points(source_points, pose)
    if valid is None:
        valid = jnp.ones(moved.shape[:1], dtype=bool)
    centroid = se3.masked_mean(moved, valid, axis_name=axis_name)
    num = jnp.linalg.norm(moved - target_points, axis=1)
    den = jnp.linalg.norm(moved - centroid, axis=1)
    ratio = jnp.where(valid, num / jnp.maximum(den, 1e-30), 0.0)
    total = jnp.sum(ratio)
    count = jnp.sum(valid)
    if axis_name is not None:
        total = jax.lax.psum(total, axis_name)
        count = jax.lax.psum(count, axis_name)
    return total / jnp.maximum(count, 1)
