"""Rejection stage (stage 4): normal-compatibility pruning as a masked op.

Reference: ``ICPOptimizer::pruneCorrespondences`` (ICPOptimizer.h:157-174) —
a match is invalidated when the angle between source and target normals
exceeds 60 degrees. One reference quirk matters: in C++,
``acos(nan) > threshold`` is FALSE, so matches whose normals are non-finite
are NOT rejected by this stage. We reproduce that by only rejecting when the
angle test is finitely, definitely above threshold.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ANGLE_THRESHOLD_RAD = 60.0 * jnp.pi / 180.0


def normal_angle_mask(
    src_normals: jax.Array,
    tgt_normals: jax.Array,
    valid: jax.Array,
    threshold_rad: float = float(ANGLE_THRESHOLD_RAD),
) -> jax.Array:
    """Return the validity mask after the 60-degree normal-angle test.

    cos(angle) = n_s.n_t / (|n_s||n_t|); reject iff angle > threshold, i.e.
    cos(angle) < cos(threshold) — computed without acos for speed and TPU
    numerics.
    """
    dot = jnp.sum(src_normals * tgt_normals, axis=-1)
    norm_prod = jnp.linalg.norm(src_normals, axis=-1) * jnp.linalg.norm(
        tgt_normals, axis=-1
    )
    cos_angle = dot / norm_prod
    # Reject only when the comparison is definitively true (NaN -> keep),
    # mirroring C++ NaN comparison semantics at ICPOptimizer.h:170.
    reject = cos_angle < jnp.cos(threshold_rad)
    reject = jnp.where(jnp.isnan(cos_angle), False, reject)
    return valid & ~reject


TRIM_BINS = 1024


def trimmed_mask(
    d2: jax.Array,
    valid: jax.Array,
    ratio: float,
    max_d2: float,
    axis_name: str | None = None,
) -> jax.Array:
    """Trimmed-ICP rejection (extension — no reference analog): keep the
    best ``ratio`` fraction of valid matches by squared distance
    (Chetverikov et al., "The Trimmed Iterative Closest Point algorithm").

    TPU-native quantile: every valid match distance is bounded by the
    match threshold ``max_d2`` (the matcher's squared compare,
    NearestNeighbor.h:182), so fixed 1024-bin cumulative counts over
    [0, max_d2] find the cut bin with one broadcast compare-reduce — no
    device sort (pathologically slow on this backend), no scatter (TPU
    scatters serialize) and, sharded, ONE psum of the (1024,) counts,
    making the threshold bit-identical on every shard. All ties at the
    cut bin are kept (kept count >= ceil(ratio * n)).
    """
    idx, cut, _ = quantile_bin(d2, valid, ratio, max_d2, axis_name=axis_name)
    return valid & (idx <= cut)


def quantile_bin(
    d2: jax.Array,
    valid: jax.Array,
    q: float,
    max_d2: float,
    axis_name: str | None = None,
) -> tuple[jax.Array, jax.Array, float]:
    """Shared histogram-quantile primitive: returns ``(bin_idx, cut, bin_w)``
    where ``cut`` is the first of TRIM_BINS equal bins over [0, max_d2]
    whose cumulative valid count reaches ``ceil(q * n)``. One broadcast
    compare-reduce, no device sort or scatter; one (TRIM_BINS,) psum when
    sharded, so the cut is bit-identical on every shard. Also the robust
    weighting scale estimator (ops/weighting.py)."""
    nbins = TRIM_BINS
    bin_w = max_d2 / nbins
    idx = jnp.clip(
        (d2 * (nbins / max_d2)).astype(jnp.int32), 0, nbins - 1
    )
    bins = jnp.arange(nbins, dtype=jnp.int32)
    cum = jnp.sum(
        (idx[:, None] <= bins[None, :]) & valid[:, None],
        axis=0,
        dtype=jnp.int32,
    )
    if axis_name is not None:
        cum = jax.lax.psum(cum, axis_name)
    n = cum[-1]
    k = jnp.ceil(q * n.astype(jnp.float32)).astype(jnp.int32)
    cut = jnp.argmax(cum >= k).astype(jnp.int32)  # first bin reaching k
    return idx, cut, bin_w
