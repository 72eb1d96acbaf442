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


def _resident_fits_projective(
    width: int, height: int, block: int, window: int = 12
) -> bool:
    """Whether the image block table fits the resident kernel's VMEM
    budget (640x480 at B=16 is ~9.8 MB). Uses the same nb-clamped block
    grid as projective_match_resident — for images smaller than the
    window's block span the padded table is LARGER than ceil(dim/b)
    suggests, and the fit check must count what the kernel allocates."""
    from icp_variants_tpu.ops import knn

    b = block
    span = 2 * window + 1
    nb = (span - 2) // b + 2
    wb = max(-(-width // b), nb)
    hb = max(-(-height // b), nb)
    return (hb * wb) * 8 * (b * b) * 4 <= knn.RESIDENT_VMEM_BUDGET


@functools.partial(
    jax.jit,
    static_argnames=(
        "fx", "fy", "cx", "cy", "width", "height", "window", "block",
        "max_distance", "tile_q", "gate_width", "interpret",
    ),
)
def projective_match_resident(
    query_points: jax.Array,
    target_points: jax.Array,
    target_valid: jax.Array,
    *,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    width: int,
    height: int,
    window: int = 12,
    max_distance: float = 0.1,
    query_mask: jax.Array | None = None,
    block: int = BLOCK,
    tile_q: int = 128,
    gate_width: int = 32,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Projective window search through the RESIDENT-VMEM kernel.

    The XLA formulation gathers each query's nb x nb block neighborhood
    from HBM every iteration (~9 wide rows x 38k queries — gather-issue
    bound, ~23 ms/frame/iter at 640x480). Here the WHOLE image block
    table (~9.8 MB at 640x480, B=16) is bulk-copied once per kernel
    launch into persistent VMEM (knn._make_resident_kernel pixel_window
    mode): per-subgroup membership is the bounding RECT of the
    subgroup's window neighborhoods (a superset — raster-coherent
    subgroups share most blocks), and every candidate lane is masked by
    the exact +-window pixel test in-kernel, so results equal
    :func:`projective_match` (same candidate set, same arithmetic; ties
    may break differently, see module docstring).
    """
    from icp_variants_tpu.ops import kdtree, knn

    n = query_points.shape[0]
    b = block
    b2 = b * b
    span = 2 * window + 1
    nb = (span - 2) // b + 2
    wb = max(-(-width // b), nb)
    hb = max(-(-height // b), nb)
    nc = hb * wb

    # --- image block table in the kernel page layout --------------------
    img = jnp.where(
        target_valid[:, None], target_points, jnp.float32(PAD_COORD)
    ).reshape(height, width, 3)
    img = jnp.pad(
        img,
        ((0, hb * b - height), (0, wb * b - width), (0, 0)),
        constant_values=PAD_COORD,
    )
    blocks3 = (
        img.reshape(hb, b, wb, b, 3)
        .transpose(0, 2, 4, 1, 3)
        .reshape(nc, 3, b2)
    )
    pages = jnp.zeros((nc, 8, b2), jnp.float32).at[:, :3].set(blocks3)

    # --- queries: projection + padded feature rows ----------------------
    x, y, z = query_points[:, 0], query_points[:, 1], query_points[:, 2]
    safe_z = jnp.where(z == 0, 1.0, z)
    u0 = jnp.round(jnp.clip(x * fx / safe_z + cx, -1.0e6, 1.0e6))
    v0 = jnp.round(jnp.clip(y * fy / safe_z + cy, -1.0e6, 1.0e6))
    group = kdtree._PREFIX_GROUP * tile_q
    nq_pad = -(-n // group) * group
    pad = nq_pad - n
    q8 = jnp.zeros((nq_pad, 8), jnp.float32)
    q8 = q8.at[:n, :3].set(query_points)
    q8 = q8.at[:n, 3].set(u0)
    q8 = q8.at[:n, 4].set(v0)

    bound_val = jnp.float32(max_distance) * (1.0 + 1e-6) + 1e-30
    live = (
        jnp.ones((n,), bool) if query_mask is None else query_mask
    )
    binit = jnp.pad(
        jnp.where(live, bound_val, -1.0), (0, pad), constant_values=-1.0
    )

    # --- per-subgroup membership: bounding rect of the neighborhoods ----
    r0 = jnp.clip((v0.astype(jnp.int32) - window) // b, 0, hb - nb)
    c0 = jnp.clip((u0.astype(jnp.int32) - window) // b, 0, wb - nb)
    big = jnp.int32(1 << 20)
    r0p = jnp.pad(jnp.where(live, r0, big), (0, pad), constant_values=big)
    c0p = jnp.pad(jnp.where(live, c0, big), (0, pad), constant_values=big)
    nqt = nq_pad // tile_q
    n_sub = tile_q // kdtree._SG_WIDTH
    r0s = r0p.reshape(nqt, n_sub, kdtree._SG_WIDTH)
    c0s = c0p.reshape(nqt, n_sub, kdtree._SG_WIDTH)
    rmin = jnp.min(r0s, axis=2)
    rmax = jnp.max(jnp.where(r0s == big, -big, r0s), axis=2)
    cmin = jnp.min(c0s, axis=2)
    cmax = jnp.max(jnp.where(c0s == big, -big, c0s), axis=2)
    br = (jnp.arange(nc, dtype=jnp.int32) // wb)[None, None, :]
    bc = (jnp.arange(nc, dtype=jnp.int32) % wb)[None, None, :]
    bits = (
        (br >= rmin[:, :, None]) & (br < rmax[:, :, None] + nb)
        & (bc >= cmin[:, :, None]) & (bc < cmax[:, :, None] + nb)
    )                                               # (nqt, n_sub, nc)
    submask = jnp.sum(
        bits.astype(jnp.int32)
        << jnp.arange(n_sub, dtype=jnp.int32)[None, :, None],
        axis=1,
    )                                               # (nqt, nc)
    member = bits.any(axis=1)

    # --- per-gate walk spans (lane-packed like the prefix kernel's) -----
    n_gate = tile_q // gate_width
    r_sub = n_sub // n_gate
    gate_bits = bits.reshape(nqt, n_gate, r_sub, nc).any(axis=2)
    iota_nc = jnp.arange(nc, dtype=jnp.int32)
    jmin = jnp.min(jnp.where(gate_bits, iota_nc, nc), axis=2)
    jend = jnp.max(jnp.where(gate_bits, iota_nc + 1, 0), axis=2)
    jend = jnp.maximum(jend, jmin)
    ranges_rows = jnp.zeros((nqt, 128), jnp.int32)
    ranges_rows = ranges_rows.at[:, 0:2 * n_gate:2].set(jmin)
    ranges_rows = ranges_rows.at[:, 1:2 * n_gate:2].set(jend)

    dist, idx = knn._run_resident_kernel(
        q8, binit, member, member & False, jnp.zeros((nqt, nc), jnp.float32),
        submask, pages, float(max_distance),
        tile_q=tile_q, tile_t=b2, n_features=3, interpret=interpret,
        gate_width=gate_width, ranges_rows=ranges_rows,
        pixel_window=(float(window), width, height, wb, b),
    )
    sorted_idx = idx[:n, 0]
    d2 = dist[:n, 0]
    pid = sorted_idx // b2
    slot = sorted_idx % b2
    pu = (pid % wb) * b + slot % b
    pv = (pid // wb) * b + slot // b
    lin = pv * width + pu
    best_idx = jnp.where(sorted_idx >= 0, lin, -1)
    valid = (d2 <= max_distance) & (best_idx >= 0)
    if query_mask is not None:
        valid = valid & query_mask
    return best_idx, d2, valid
