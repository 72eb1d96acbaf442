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
