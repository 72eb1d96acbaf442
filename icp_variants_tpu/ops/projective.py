"""Projective correspondence search (RGB-D frame-to-frame).

TPU-native re-design of ``NearestNeighborSearchProjective``
(NearestNeighbor.h:317-444): each transformed source point is projected into
the target image plane through the depth intrinsics, and the closest target
point within a ``(2W+1)^2`` pixel window wins (W = 12 by default,
NearestNeighbor.h:319), under the squared max-distance threshold.

Layout is the design (same lesson as ops/kdtree.py): TPU XLA gathers are
row-issue-bound, so per-query work must move as FEW, WIDE contiguous rows.
The target image is re-tiled into ``B x B`` pixel blocks stored
coordinate-major as single contiguous rows ([x...x, y...y, z...z] over the
block's pixels); each query gathers only the ``nb x nb`` block neighborhood
(3x3 for B=16, W=12) that covers its window — ~9 wide rows instead of 625
pixel rows — and candidates outside the exact window are masked per pixel
from their reconstructed coordinates. This replaced a row-of-window
``lax.fori_loop`` formulation that spent ~355 ms/iter at 640x480 on gather
issue overhead (scripts/evidence/bench_projective_log.txt).

Queries are processed in fixed-size chunks (``lax.map``) so the
(N, nb^2, 3B^2) candidate tensor stays bounded at full-resolution
(307k-query) multires levels.

Tie-breaking deviates from the reference's first-in-row-major-scan-order
only for EXACTLY equal f32 distances of distinct pixels (the reference
keeps the first strictly-better pixel, NearestNeighbor.h:385-404); the
winner is still a true minimum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Finite pad for invalid/out-of-image pixels: squared distance ~1e18 stays
# finite in f32 and never survives the threshold.
PAD_COORD = 1.0e9
BIG = 3.0e13
BLOCK = 16          # pixels per block side
CHUNK = 32768       # queries per lax.map step
# Gather the nb x nb block neighborhood as ONE contiguous 2-D slice per
# query (vmapped dynamic_slice over a (hb, wb*3*B^2) view) instead of
# nb^2 separate block-row gathers. Measured 3x SLOWER on hardware
# (0.355 vs 1.16 frames/s — the batched dynamic_slice lowers to a
# per-query serialized slice path, losing to the plain row gather;
# scripts/evidence/approx_arm_log.txt). Kept for the record; OFF.
SLICED_GATHER = False


@functools.partial(
    jax.jit,
    static_argnames=(
        "fx", "fy", "cx", "cy", "width", "height", "window", "block", "chunk"
    ),
)
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
    block: int = BLOCK,
    chunk: int = CHUNK,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Return ``(indices, dist2, valid)`` per query point.

    Projection follows NearestNeighbor.h:378-379 (round to nearest pixel);
    the window scan keeps the minimum squared distance among valid target
    pixels (385-404); the threshold compares squared distance (407).
    """
    n = query_points.shape[0]
    b = block
    b2 = b * b
    span = 2 * window + 1
    nb = (span - 2) // b + 2          # blocks per axis covering any offset
    wb = max(-(-width // b), nb)
    hb = max(-(-height // b), nb)

    # --- target re-tiling: (HB*WB, 3*B^2) coordinate-major block rows ------
    img = jnp.where(
        target_valid[:, None], target_points, jnp.float32(PAD_COORD)
    ).reshape(height, width, 3)
    img = jnp.pad(
        img,
        ((0, hb * b - height), (0, wb * b - width), (0, 0)),
        constant_values=PAD_COORD,
    )
    blocks = (
        img.reshape(hb, b, wb, b, 3)
        .transpose(0, 2, 4, 1, 3)
        .reshape(hb * wb, 3 * b2)
    )

    # Within-block pixel offsets for slot s (row-major): (s // b, s % b).
    slot = jnp.arange(b2, dtype=jnp.int32)
    sv, su = slot // b, slot % b

    def one_chunk(q):
        m = q.shape[0]
        x, y, z = q[:, 0], q[:, 1], q[:, 2]
        safe_z = jnp.where(z == 0, 1.0, z)
        # Clip before the int cast: off-screen projections can overflow
        # int32; the window mask rejects them either way.
        u0 = jnp.round(
            jnp.clip(x * fx / safe_z + cx, -1.0e6, 1.0e6)
        ).astype(jnp.int32)
        v0 = jnp.round(
            jnp.clip(y * fy / safe_z + cy, -1.0e6, 1.0e6)
        ).astype(jnp.int32)

        c0 = jnp.clip((u0 - window) // b, 0, wb - nb)
        r0 = jnp.clip((v0 - window) // b, 0, hb - nb)
        offs = jnp.arange(nb, dtype=jnp.int32)
        bids = (
            (r0[:, None, None] + offs[:, None]) * wb
            + (c0[:, None, None] + offs[None, :])
        ).reshape(m, nb * nb)                           # (m, K)

        if SLICED_GATHER:
            # One contiguous (nb, nb*3*B^2) slice per query from the
            # (hb, wb*3*B^2) row view — the nb^2 neighborhood blocks are
            # row-adjacent, so this replaces nb^2 row gathers with one
            # two-dim sliced gather.
            wide = blocks.reshape(hb, wb * 3 * b2)
            cand = jax.vmap(
                lambda r, c: jax.lax.dynamic_slice(
                    wide, (r, c * (3 * b2)), (nb, nb * 3 * b2)
                )
            )(r0, c0)                                   # (m, nb, nb*3*B^2)
            cand = cand.reshape(m, nb * nb, 3 * b2)
        else:
            cand = blocks[bids]                         # (m, K, 3*B^2) rows
        d2 = None
        for c in range(3):
            diff = cand[:, :, c * b2:(c + 1) * b2] - q[:, c, None, None]
            d2 = diff * diff if d2 is None else d2 + diff * diff

        pv = (bids // wb)[:, :, None] * b + sv          # (m, K, B^2)
        pu = (bids % wb)[:, :, None] * b + su
        inwin = (
            (jnp.abs(pu - u0[:, None, None]) <= window)
            & (jnp.abs(pv - v0[:, None, None]) <= window)
            & (pu < width)
            & (pv < height)
        )
        d2 = jnp.where(inwin, d2, jnp.float32(BIG)).reshape(m, -1)

        a = jnp.argmin(d2, axis=1)
        best_d2 = jnp.take_along_axis(d2, a[:, None], axis=1)[:, 0]
        lin = (pv * width + pu).reshape(m, -1)
        best_idx = jnp.where(
            best_d2 < BIG,
            jnp.take_along_axis(lin, a[:, None], axis=1)[:, 0],
            -1,
        )
        return best_d2, best_idx

    if n <= chunk:
        best_d2, best_idx = one_chunk(query_points)
    else:
        pad = (-n) % chunk
        qp = jnp.pad(query_points, ((0, pad), (0, 0)))
        best_d2, best_idx = jax.lax.map(
            one_chunk, qp.reshape(-1, chunk, 3)
        )
        best_d2 = best_d2.reshape(-1)[:n]
        best_idx = best_idx.reshape(-1)[:n]

    valid = best_d2 <= max_distance
    if query_mask is not None:
        valid = valid & query_mask
    return best_idx, best_d2, valid
