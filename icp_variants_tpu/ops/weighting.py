"""Weighting stage (stage 3): per-correspondence scalar weights, fused + masked.

Reference semantics (weighting.h:8-100), reproduced exactly, including two
quirks worth flagging:

* ``COLORS_WEIGHTING`` first computes the distance-compatibility weight and
  then MULTIPLIES it by the color-compatibility term (weighting.h:56-87) —
  it is a combined distance*color weight, not a pure color weight.
* The color difference is computed on ``unsigned char`` vectors, which wrap
  modulo 256 in Eigen (weighting.h:28). We replicate the wraparound so weight
  values match the reference bit-for-bit in expectation.

Non-finite points/normals contribute weight 0 (weighting.h:58-73). All
methods leave invalid matches untouched — downstream consumers multiply by
the validity mask anyway.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from icp_variants_tpu.pipeline.config import Weighting

MAX_COLOR_DIFFERENCE = 195075.0  # weighting.h:6


class MatchArrays(NamedTuple):
    """Gathered per-correspondence data (the SoA form of ``Match``)."""

    src_points: jax.Array    # (N, 3) transformed source points
    tgt_points: jax.Array    # (N, 3) matched target points
    src_normals: jax.Array   # (N, 3) transformed source normals
    tgt_normals: jax.Array   # (N, 3) matched target normals
    src_colors: jax.Array    # (N, 4)
    tgt_colors: jax.Array    # (N, 4)
    valid: jax.Array         # (N,) bool


def _distances_weight(src: jax.Array, tgt: jax.Array, max_distance) -> jax.Array:
    """1 - |s - t|^2 / maxDistance (weighting.h:16-20; maxDistance is the
    squared threshold)."""
    d2 = jnp.sum((src - tgt) ** 2, axis=-1)
    w = 1.0 - d2 / max_distance
    finite = jnp.isfinite(src).all(axis=-1) & jnp.isfinite(tgt).all(axis=-1)
    return jnp.where(finite, w, 0.0)


def _normals_weight(src_n: jax.Array, tgt_n: jax.Array) -> jax.Array:
    """n_s . n_t (weighting.h:22-25)."""
    w = jnp.sum(src_n * tgt_n, axis=-1)
    finite = jnp.isfinite(src_n).all(axis=-1) & jnp.isfinite(tgt_n).all(axis=-1)
    return jnp.where(finite, w, 0.0)


def _robust_center_scale(
    d2: jax.Array,
    valid: jax.Array,
    max_d2,
    axis_name: str | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Robust (center, scale) of the matched residual magnitudes:
    ``med = median(r)`` and ``sigma = 1.4826 * median(|r - med|)`` (the
    MAD). Two histogram quantiles (ops/rejection.py; sqrt is monotone, so
    the median of r is the sqrt of the median of d2, and |r - med|^2 is
    again bounded by max_d2). The deviation-around-the-median form
    matters: a systematic initial misalignment inflates median(r) itself,
    and a scale built from it would declare structured outliers inliers.
    Floored at one bin width so a perfectly-converged (all-zero-residual)
    match set yields full weights instead of 0/0."""
    from icp_variants_tpu.ops import rejection

    _, cut, bin_w = rejection.quantile_bin(
        d2, valid, 0.5, max_d2, axis_name=axis_name
    )
    med = jnp.sqrt((cut.astype(jnp.float32) + 0.5) * bin_w)
    dev2 = (jnp.sqrt(jnp.maximum(d2, 0.0)) - med) ** 2
    _, cut_dev, _ = rejection.quantile_bin(
        dev2, valid, 0.5, max_d2, axis_name=axis_name
    )
    mad = jnp.sqrt((cut_dev.astype(jnp.float32) + 0.5) * bin_w)
    sigma = 1.4826 * jnp.maximum(mad, jnp.sqrt(bin_w))
    return med, sigma


def _huber_weight(
    src: jax.Array, tgt: jax.Array, valid, max_d2, axis_name=None
) -> jax.Array:
    """Huber M-estimator IRLS weight: 1 for |r| <= k, k/|r| beyond, with
    k = 1.345 sigma (95% Gaussian efficiency) and sigma the per-iteration
    MAD scale. Extension — no reference analog."""
    d2 = jnp.sum((src - tgt) ** 2, axis=-1)
    r = jnp.sqrt(d2)
    _, sigma = _robust_center_scale(d2, valid, max_d2, axis_name=axis_name)
    k = 1.345 * sigma
    w = jnp.minimum(1.0, k / jnp.maximum(r, 1e-30))
    finite = jnp.isfinite(src).all(axis=-1) & jnp.isfinite(tgt).all(axis=-1)
    return jnp.where(finite, w, 0.0)


def _tukey_weight(
    src: jax.Array, tgt: jax.Array, valid, max_d2, axis_name=None
) -> jax.Array:
    """Tukey biweight IRLS weight: (1 - (r/c)^2)^2 inside r <= c, 0
    beyond (hard outlier suppression), with c = 4.685 sigma. Extension —
    no reference analog."""
    d2 = jnp.sum((src - tgt) ** 2, axis=-1)
    r = jnp.sqrt(d2)
    _, sigma = _robust_center_scale(d2, valid, max_d2, axis_name=axis_name)
    c = 4.685 * sigma
    u = jnp.clip(r / c, 0.0, 1.0)
    w = (1.0 - u * u) ** 2
    finite = jnp.isfinite(src).all(axis=-1) & jnp.isfinite(tgt).all(axis=-1)
    return jnp.where(finite, w, 0.0)


def _colors_weight(src_c: jax.Array, tgt_c: jax.Array) -> jax.Array:
    """1 - |wrap8(c_s - c_t)|^2 / 195075 over RGB (weighting.h:27-30).

    The uint8 subtraction wraps modulo 256 in the reference; emulated here on
    float values known to be integral in [0, 255].
    """
    diff = jnp.mod(src_c[..., :3] - tgt_c[..., :3], 256.0)
    return 1.0 - jnp.sum(diff * diff, axis=-1) / MAX_COLOR_DIFFERENCE


def apply_weights(
    method: Weighting,
    m: MatchArrays,
    max_distance: float | jax.Array,
    axis_name: str | None = None,
) -> jax.Array:
    """Compute per-match weights for the configured method.

    CONSTANT keeps the matcher-assigned weight of 1 (weighting.h:44-45).
    Returned weights are NOT masked by validity; callers fold ``m.valid`` in.
    ``axis_name``: mesh axis the correspondence dimension is sharded over —
    the robust extensions psum their scale histogram so every shard weighs
    against the same global scale (reference methods are pointwise and
    ignore it).
    """
    if method == Weighting.CONSTANT:
        return jnp.ones(m.valid.shape, dtype=jnp.float32)
    if method == Weighting.DISTANCES:
        return _distances_weight(m.src_points, m.tgt_points, max_distance)
    if method == Weighting.NORMALS:
        return _normals_weight(m.src_normals, m.tgt_normals)
    if method == Weighting.COLORS:
        w = _distances_weight(m.src_points, m.tgt_points, max_distance)
        return w * _colors_weight(m.src_colors, m.tgt_colors)
    if method == Weighting.HUBER:
        return _huber_weight(
            m.src_points, m.tgt_points, m.valid, max_distance,
            axis_name=axis_name,
        )
    if method == Weighting.TUKEY:
        return _tukey_weight(
            m.src_points, m.tgt_points, m.valid, max_distance,
            axis_name=axis_name,
        )
    raise ValueError(f"unknown weighting method {method}")
