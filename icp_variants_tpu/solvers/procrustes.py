"""Weighted Procrustes / Kabsch alignment (linear point-to-point metric).

TPU-native equivalent of ``ProcrustesAligner`` (ProcrustesAligner.h:4-73):
the 3x3 cross-covariance is a masked weighted reduction (one fused matmul on
the MXU), the SVD is a tiny 3x3 solved on-chip, and the det-correction plus
rotate-about-target-mean composition follow the reference exactly.

Reference quirks preserved:
* the means are UNWEIGHTED over matched pairs (ProcrustesAligner.h:32-41),
* only the source matrix rows are weighted (ProcrustesAligner.h:51),
* translation = targetMean - sourceMean, composed as
  ``t = R t - R targetMean + targetMean`` (ProcrustesAligner.h:24-26).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from icp_variants_tpu.core import se3


def estimate_pose_point_to_point(
    src: jax.Array,      # (N, 3) matched (already-transformed) source points
    tgt: jax.Array,      # (N, 3) matched target points
    weights: jax.Array,  # (N,)
    valid: jax.Array,    # (N,) bool
    axis_name: str | None = None,
    weighted_means: bool = False,
) -> jax.Array:
    """Closed-form weighted Kabsch; returns the 4x4 incremental pose.

    With ``axis_name`` set, the N axis is sharded over a mesh axis: the means
    and the 3x3 cross-covariance reduce with psum, the SVD runs replicated.

    ``weighted_means=False`` keeps the reference's unweighted means + the
    weighted-source-rows-only covariance (the quirks above) — harmless for
    the reference's near-1 weights. The robust M-estimator weightings
    (HUBER/TUKEY) drive weights to ~0 on outliers, and unweighted means
    would feed those outliers straight into the TRANSLATION — so they use
    ``weighted_means=True``: proper weighted Kabsch (weighted centroids,
    weights applied once in the covariance)."""
    m = valid.astype(jnp.float32)
    if weighted_means:
        wm = weights * m
        wsum = jnp.sum(wm)
        swsum = jnp.sum(src * wm[:, None], axis=0)
        twsum = jnp.sum(tgt * wm[:, None], axis=0)
        if axis_name is not None:
            wsum = jax.lax.psum(wsum, axis_name)
            swsum = jax.lax.psum(swsum, axis_name)
            twsum = jax.lax.psum(twsum, axis_name)
        denom = jnp.maximum(wsum, 1e-30)
        src_mean = swsum / denom
        tgt_mean = twsum / denom
        sc = (src - src_mean) * wm[:, None]
        dc = tgt - tgt_mean
    else:
        src_mean = se3.masked_mean(src, valid, axis_name=axis_name)
        tgt_mean = se3.masked_mean(tgt, valid, axis_name=axis_name)
        sc = (src - src_mean) * (weights * m)[:, None]
        dc = (tgt - tgt_mean) * m[:, None]
    A = dc.T @ sc  # 3x3 cross-covariance (targetMatrix^T * sourceMatrix)
    if axis_name is not None:
        A = jax.lax.psum(A, axis_name)

    U, _, Vt = jnp.linalg.svd(A)
    d = jnp.linalg.det(U @ Vt)
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], dtype=A.dtype)).at[2, 2].set(d)
    R = U @ D @ Vt

    t = tgt_mean - src_mean
    trans = R @ t - R @ tgt_mean + tgt_mean
    return se3.pose_matrix(R, trans)
