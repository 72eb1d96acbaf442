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
) -> jax.Array:
    """RMSE over known correspondences after transforming the stored source
    by ``pose`` (ConvergenceMeasure.h:50-66). Non-finite pairs are skipped."""
    moved = se3.transform_points(source_points, pose)
    finite = jnp.isfinite(moved).all(axis=1) & jnp.isfinite(target_points).all(axis=1)
    if valid is not None:
        finite = finite & valid
    d2 = jnp.sum((moved - target_points) ** 2, axis=1)
    d2 = jnp.where(finite, d2, 0.0)
    count = jnp.maximum(jnp.sum(finite), 1)
    return jnp.sqrt(jnp.sum(d2) / count)


def benchmark_error(
    pose: jax.Array,
    source_points: jax.Array,
    target_points: jax.Array,
    valid: jax.Array | None = None,
) -> jax.Array:
    """The ETH/Fontana pose-scale-invariant error
    (ConvergenceMeasure.h:133-151):
    mean_i |p_i - q_i| / |p_i - centroid(p)| with p the transformed source."""
    moved = se3.transform_points(source_points, pose)
    if valid is None:
        valid = jnp.ones(moved.shape[:1], dtype=bool)
    centroid = se3.masked_mean(moved, valid)
    num = jnp.linalg.norm(moved - target_points, axis=1)
    den = jnp.linalg.norm(moved - centroid, axis=1)
    ratio = jnp.where(valid, num / jnp.maximum(den, 1e-30), 0.0)
    count = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(ratio) / count
