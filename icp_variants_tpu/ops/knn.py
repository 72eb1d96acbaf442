"""Nearest-neighbor correspondence search — Pallas kernels on the VPU.

TPU-native replacement for the FLANN kd-tree matcher
(NearestNeighbor.h:104-314, both the 3-dim geometric and the 6-dim color-ICP
variants), EXACT within the matching threshold (the reference's FLANN search
is 16-check approximate; exactness-vs-scipy is this framework's invariant,
pinned by tests/test_kdtree.py and test_knn.py).

Shipped design (the production hierarchy, fastest first):

* **Resident-VMEM kernel** (``_make_resident_kernel``): the target's kd
  page table (blocks x 8 rows x lanes) is DMA'd ONCE into persistent VMEM
  scratch; each query tile walks only its member (query-tile, block) regions
  — per-query top-K block membership intersected with the search radii,
  computed by the fused prefix kernel in ``ops/kdtree.py`` — and evaluates
  **direct-difference** distances ``sum((q - t)^2)`` on the VPU with a
  running (min, argmin). Gating granularity 64 rows (measured optimum:
  finer regions pay ~0.1-0.2 us of per-region issue cost each).
* **Bitmap/visited-list kernels** (``_make_bitmap_kernel`` / the v2
  visited-list path): for tables too large to reside, membership bitmaps are
  compacted on the scalar core and member pages stream through
  double-buffered chunk DMA.
* :func:`nn_search_xla` / :func:`nn_search_pallas` — the dense brute-force
  pair: correctness oracle (runs on the CPU test mesh) and the non-indexed
  fallback.

Why NOT the MXU: the ``|q|^2 + |t|^2 - 2 q.t`` expansion rides the systolic
array but catastrophically cancels in f32 at ETH's ~20 m scene scale,
flipping near-tie 1-NN winners unless run at HIGHEST (multi-pass) precision
— measured 7.5 ms vs 4.3 ms per bench call before it was rejected
(ROADMAP.md "Measured roofline"). Direct-difference VPU distances are
exact at DEFAULT precision and the gated candidate sets run at ~60% of VPU
f32 speed-of-light; the MXU is reserved for the prefix kernel's 0/1
submask packing, where bf16 passes ARE exact.

All matchers return, per query row, the index of the closest target and the
squared distance. Thresholding (``dist2 <= max_distance``, matching the
squared comparison at NearestNeighbor.h:182) is left to the caller so the
same search result can be re-thresholded per pyramid level.

Invalid / padded target rows are expected to carry ``cloud.PAD_SENTINEL``
coordinates, which keeps every lane finite (no NaN poisoning) while making
such rows unelectable.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile sizes: queries per grid row, targets per inner step. The distance tile
# (TQ x TT f32) plus operands must fit VMEM comfortably: 256*1024*4 = 1 MiB.
TILE_Q = 256
TILE_T = 1024
# Feature dim padded to the f32 sublane multiple.
FEATURE_PAD = 8
# Target tile for the INDEXED (pruned) paths. The visited-list kernel (v2)
# with an 8-tile inner chunk measured best at 512 on v5e: fine tiles keep
# the bboxes tight (more pruning) while the chunked DMA+matmul amortizes
# per-tile latency.
INDEX_TILE_T = 512


def _pad_features(x: jax.Array) -> jax.Array:
    """Zero-pad the trailing feature dim to FEATURE_PAD columns."""
    d = x.shape[-1]
    if d == FEATURE_PAD:
        return x
    return jnp.pad(x, ((0, 0), (0, FEATURE_PAD - d)))


def _pad_rows(x: jax.Array, multiple: int, fill: float) -> jax.Array:
    n = x.shape[0]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return x
    return jnp.pad(x, ((0, target - n), (0, 0)), constant_values=fill)


def color_features(points: jax.Array, colors: jax.Array) -> jax.Array:
    """6-dim [x, y, z, r/255, g/255, b/255] feature rows of the color-ICP
    matcher (NearestNeighbor.h:212-224: color_scale=1, normalize=1/255)."""
    return jnp.concatenate([points, colors[:, :3] * (1.0 / 255.0)], axis=1)


# ---------------------------------------------------------------------------
# XLA (portable) path
# ---------------------------------------------------------------------------


def nn_search_xla(
    queries: jax.Array, targets: jax.Array, *, chunk: int = 4096
) -> tuple[jax.Array, jax.Array]:
    """Exact 1-NN via chunked dense distance tiles (runs on any backend)."""
    n = queries.shape[0]
    qp = _pad_rows(queries, chunk, 0.0)
    t_norm2 = jnp.sum(targets * targets, axis=1)

    def one_chunk(q):
        g = jnp.dot(q, targets.T, precision=jax.lax.Precision.HIGHEST)
        d2 = jnp.sum(q * q, axis=1, keepdims=True) + t_norm2[None, :] - 2.0 * g
        return jnp.argmin(d2, axis=1).astype(jnp.int32), jnp.min(d2, axis=1)

    num_chunks = qp.shape[0] // chunk
    idx, d2 = jax.lax.map(one_chunk, qp.reshape(num_chunks, chunk, -1))
    return idx.reshape(-1)[:n], d2.reshape(-1)[:n]


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------


def _make_nn_kernel(tile_t: int):
    def _nn_kernel(q_ref, t_ref, qn2_ref, tn2_ref, dist_ref, idx_ref):
        """One (query-tile, target-tile) cell: distances + running argmin.

        Grid = (num_q_tiles, num_t_tiles) with the target axis innermost; the
        output block for query tile i is revisited for every j, carrying the
        running minimum in VMEM (canonical reduction-over-grid pattern).
        """
        j = pl.program_id(1)

        # HIGHEST precision: TPU matmuls default to bf16 passes, which loses
        # the mantissa bits that decide near-tie nearest neighbors. With
        # exact-f32 passes the kernel is bit-faithful for 1-NN at
        # scan-registration scales.
        g = jax.lax.dot_general(
            q_ref[:],
            t_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [tile_q, tile_t]
        d2 = qn2_ref[:] + tn2_ref[:] - 2.0 * g

        local_min = jnp.min(d2, axis=1, keepdims=True)
        local_arg = (
            jnp.argmin(d2, axis=1).astype(jnp.int32).reshape(-1, 1) + j * tile_t
        )

        @pl.when(j == 0)
        def _():
            dist_ref[:] = local_min
            idx_ref[:] = local_arg

        @pl.when(j > 0)
        def _():
            better = local_min < dist_ref[:]
            idx_ref[:] = jnp.where(better, local_arg, idx_ref[:])
            dist_ref[:] = jnp.where(better, local_min, dist_ref[:])

    return _nn_kernel


@functools.partial(
    jax.jit, static_argnames=("interpret", "tile_q", "tile_t")
)
def nn_search_pallas(
    queries: jax.Array,
    targets: jax.Array,
    *,
    interpret: bool = False,
    tile_q: int = TILE_Q,
    tile_t: int = TILE_T,
) -> tuple[jax.Array, jax.Array]:
    """Exact 1-NN as a Pallas TPU kernel.

    ``queries`` (Nq, D) and ``targets`` (Nt, D) with D <= 8; rows are padded
    internally to tile multiples. Padded query rows produce garbage results
    that callers mask; padded target rows are filled with a large sentinel so
    they never win.
    """
    nq = queries.shape[0]
    q = _pad_rows(_pad_features(queries), tile_q, 0.0)
    # Sentinel 1e6 -> dist2 ~ 1e13, dwarfs any real match but stays finite.
    t = _pad_rows(_pad_features(targets), tile_t, 1.0e6)

    qn2 = jnp.sum(q * q, axis=1, keepdims=True)               # (Nq, 1)
    tn2 = jnp.sum(t * t, axis=1).reshape(1, -1)               # (1, Nt)

    grid = (q.shape[0] // tile_q, t.shape[0] // tile_t)

    dist, idx = pl.pallas_call(
        _make_nn_kernel(tile_t),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, FEATURE_PAD), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t, FEATURE_PAD), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_t), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((q.shape[0], 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * q.shape[0] * t.shape[0] * FEATURE_PAD + 4 * q.shape[0] * t.shape[0],
            bytes_accessed=(q.size + t.size) * 4 + q.shape[0] * 8,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, t, qn2, tn2)

    return idx[:nq, 0], dist[:nq, 0]


# ---------------------------------------------------------------------------
# Pruned search: Morton-sorted targets + per-tile bounding boxes
# ---------------------------------------------------------------------------
#
# The FLANN kd-tree wins on CPU by CULLING: most of the cloud is never
# visited per query. The TPU-native equivalent keeps the tiled brute-force
# shape but sorts targets along a Morton (Z-order) curve so each target tile
# is spatially compact, precomputes per-tile bounding boxes, and lets the
# kernel SKIP a (query-tile, target-tile) cell whenever the squared distance
# between the two bounding boxes exceeds the matching threshold — exact for
# every match the pipeline would accept (matches beyond the threshold are
# discarded by the caller anyway, NearestNeighbor.h:182). With the tight
# thresholds of the real workloads this removes ~95-99% of the work.


class TargetIndex(NamedTuple):
    """Prebuilt search structure over a target cloud (the ``buildIndex``
    phase, NearestNeighbor.h:122-141).

    ``points_t3`` pages carry ``0.5*|t|^2`` in feature row ``FEATURE_PAD-1``
    (unused by the production direct-difference kernel; kept so
    matmul-style variants can emit ``q.t - 0.5|t|^2`` directly by setting
    the query's last feature to ``-1``). Bboxes are computed over the
    UNaugmented features."""

    points: jax.Array     # (Nt_pad, 8) Morton-sorted, feature-padded
    points_t3: jax.Array  # (n_tiles, 8, tile_t) tile-major transposed pages
    perm: jax.Array       # (Nt_pad,) sorted position -> original row
    bbox_min: jax.Array   # (n_tiles, 8)
    bbox_max: jax.Array   # (n_tiles, 8)
    norm2: jax.Array      # (1, Nt_pad)


def morton_codes_np(points, valid_mask=None):
    """Host-side Morton codes (numpy) for load-time cloud ordering — device
    sorts compile pathologically slowly in this environment, and a rigid
    transform preserves spatial locality, so ordering once on the host is
    both cheaper and sufficient."""
    import numpy as np

    xyz = np.asarray(points)[:, :3]
    if valid_mask is None:
        valid_mask = np.abs(xyz).max(axis=1) < 1.0e5
    if not valid_mask.any():
        return np.zeros(len(xyz), np.int64)
    lo = xyz[valid_mask].min(axis=0)
    hi = xyz[valid_mask].max(axis=0)
    scale = 1023.0 / np.maximum(hi - lo, 1e-12)
    q = np.clip((xyz - lo) * scale, 0.0, 1023.0).astype(np.uint32)

    def part(x):
        x = x & 0x3FF
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    code = part(q[:, 0]) | (part(q[:, 1]) << 1) | (part(q[:, 2]) << 2)
    code = code.astype(np.int64)
    return np.where(valid_mask, code, np.int64(1) << 40)


def morton6_codes_np(points, colors, valid_mask=None):
    """Host-side Morton codes over the 6-dim COLOR-ICP feature space
    ([x, y, z, r/255, g/255, b/255] — the exact metric of the color kd
    tree, NearestNeighbor.h:212-224) with one SHARED quantization scale
    across all six dims (the tree splits on widest-dimension extents in
    these units, so locality must be measured isotropically, not
    per-dim normalized).

    Load-time ordering by these codes clusters same-kd-block queries
    into the resident kernel's 32-row gates: raster-adjacent pixels
    fragment across ~3 distinct color blocks per gate at sharp color
    edges, and each gate pays the UNION of its members' blocks —
    hardware-measured +23% on the color-multires config
    (scripts/evidence/block_target_probe.txt, morton6 probe). Invalid
    rows sort to the end (max code)."""
    import numpy as np

    feats = np.concatenate([
        np.asarray(points, np.float64)[:, :3],
        np.asarray(colors, np.float64)[:, :3] / 255.0,
    ], axis=1)
    if valid_mask is None:
        valid_mask = np.abs(feats[:, :3]).max(axis=1) < 1.0e5
    valid_mask = np.asarray(valid_mask, bool)
    if not valid_mask.any():
        return np.zeros(len(feats), np.uint64)
    lo = feats[valid_mask].min(axis=0)
    rng = feats[valid_mask].max(axis=0) - lo
    scale = 1023.0 / max(float(rng.max()), 1e-12)
    q = np.clip((feats - lo) * scale, 0.0, 1023.0).astype(np.uint64)

    def spread6(x):
        out = np.zeros_like(x, np.uint64)
        for b in range(10):
            out |= ((x >> np.uint64(b)) & np.uint64(1)) << np.uint64(6 * b)
        return out

    code = np.zeros(feats.shape[0], np.uint64)
    for d in range(6):
        code |= spread6(q[:, d]) << np.uint64(d)
    code[~valid_mask] = np.uint64(0xFFFFFFFFFFFFFFFF)
    return code


@functools.partial(jax.jit, static_argnames=("tile_t",))
def build_target_index(targets: jax.Array, *, tile_t: int = INDEX_TILE_T) -> TargetIndex:
    """Precompute the tile-bbox search structure over the targets.

    NO on-device sort happens here: pruning quality comes from the target
    rows being spatially coherent, which the data layer provides by
    Morton-ordering clouds ON THE HOST at load time
    (``cloud.from_numpy(morton_order=True)`` — device sorts are a compile
    bottleneck in this environment, and a one-time host ordering survives
    every rigid transform). With incoherent layouts the search stays exact,
    just unpruned. Tiles mixing valid and sentinel rows get huge bboxes and
    are never pruned (correct, merely unoptimized).
    """
    t = _pad_rows(_pad_features(targets), tile_t, 1.0e6)
    n_tiles = t.shape[0] // tile_t
    tiles = t.reshape(n_tiles, tile_t, FEATURE_PAD)
    # Augmented pages: last feature row = 0.5|t|^2 over the REAL features
    # (see TargetIndex docstring). Sentinel rows get a huge value — their
    # scores go enormously negative, so they can never win the argmax.
    half_norm2 = 0.5 * jnp.sum(t[:, :-1] * t[:, :-1], axis=1)
    t_aug = t.at[:, FEATURE_PAD - 1].set(half_norm2)
    tiles_aug = t_aug.reshape(n_tiles, tile_t, FEATURE_PAD)
    return TargetIndex(
        points=t,
        points_t3=tiles_aug.transpose(0, 2, 1),
        perm=jnp.arange(t.shape[0], dtype=jnp.int32),
        bbox_min=jnp.min(tiles, axis=1),
        bbox_max=jnp.max(tiles, axis=1),
        norm2=jnp.sum(t * t, axis=1).reshape(1, -1),
    )


def _make_pruned_kernel(tile_t: int):
    def kernel(visit_ref, bound_ref, q_ref, t_ref, qn2_ref, tn2_ref,
               dist_ref, idx_ref):
        # visit_ref and bound_ref are scalar-prefetch arguments: whole
        # arrays resident in SMEM, indexed by program ids. Per-cell (1,1)
        # SMEM blocks made Mosaic compile time explode with grid size.
        i = pl.program_id(0)
        j = pl.program_id(1)
        bound = bound_ref[0]

        @pl.when(j == 0)
        def _():
            dist_ref[:] = jnp.full_like(dist_ref, bound)
            idx_ref[:] = jnp.full_like(idx_ref, -1)

        # The visit mask is precomputed outside the kernel (bbox-vs-bbox
        # lower bounds over Morton-compact tiles); a skipped cell costs only
        # the scalar test.
        @pl.when(visit_ref[i, j] > 0)
        def _():
            g = jax.lax.dot_general(
                q_ref[:], t_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            d2 = qn2_ref[:] + tn2_ref[:] - 2.0 * g
            local_min = jnp.min(d2, axis=1, keepdims=True)
            local_arg = (
                jnp.argmin(d2, axis=1).astype(jnp.int32).reshape(-1, 1)
                + j * tile_t
            )
            better = local_min < dist_ref[:]
            idx_ref[:] = jnp.where(better, local_arg, idx_ref[:])
            dist_ref[:] = jnp.where(better, local_min, dist_ref[:])

    return kernel


@functools.partial(
    jax.jit, static_argnames=("interpret", "tile_q", "tile_t")
)
def nn_search_pruned(
    queries: jax.Array,
    index: TargetIndex,
    max_distance: float | jax.Array,
    *,
    interpret: bool = False,
    tile_q: int = TILE_Q,
    tile_t: int = INDEX_TILE_T,
) -> tuple[jax.Array, jax.Array]:
    """Threshold-bounded exact 1-NN against a prebuilt :class:`TargetIndex`.

    Returns ``(indices, dist2)`` in ORIGINAL target numbering. Queries whose
    true nearest neighbor lies beyond ``sqrt(max_distance)`` may return
    ``idx == -1`` / ``dist2 == max_distance*(1+eps)`` — exactly the rows the
    threshold would reject.
    """
    nq = queries.shape[0]
    q = _pad_rows(_pad_features(queries), tile_q, 0.0)
    # Query-tile compactness (and hence pruning quality) relies on the
    # data-layer Morton ordering of the SOURCE cloud — rigid poses preserve
    # it, so no per-iteration sort is needed.
    qn2 = jnp.sum(q * q, axis=1, keepdims=True)

    n_tiles = index.points.shape[0] // tile_t
    nq_tiles = q.shape[0] // tile_q
    grid = (nq_tiles, n_tiles)
    bound_val = jnp.float32(max_distance) * (1.0 + 1e-6) + 1e-30

    # Precomputed bbox-vs-bbox lower bounds -> per-cell visit mask.
    qtiles = q.reshape(nq_tiles, tile_q, FEATURE_PAD)
    qmin = jnp.min(qtiles, axis=1)
    qmax = jnp.max(qtiles, axis=1)
    gap = jnp.maximum(
        jnp.maximum(
            qmin[:, None, :] - index.bbox_max[None, :, :],
            index.bbox_min[None, :, :] - qmax[:, None, :],
        ),
        0.0,
    )
    lb = jnp.sum(gap * gap, axis=-1)                    # (nq_tiles, n_tiles)
    visit = (lb <= bound_val).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, FEATURE_PAD), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t, FEATURE_PAD), lambda i, j, *_: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_t), lambda i, j, *_: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, 1), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
    )
    dist, idx = pl.pallas_call(
        _make_pruned_kernel(tile_t),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((q.shape[0], 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(visit, jnp.asarray([bound_val], jnp.float32), q, index.points, qn2, index.norm2)

    sorted_idx = idx[:nq, 0]
    d2_out = dist[:nq, 0]
    orig = index.perm[jnp.clip(sorted_idx, 0, index.perm.shape[0] - 1)]
    return jnp.where(sorted_idx < 0, -1, orig), d2_out


# ---------------------------------------------------------------------------
# v2: visited-list kernel — work proportional to surviving tiles
# ---------------------------------------------------------------------------
#
# The 2-D grid kernel pays a fixed per-grid-step cost for every
# (query-tile, target-tile) cell, visited or not (~1700 steps at ETH scale
# floors it around 10 ms). This kernel flips the loop: the grid is 1-D over
# query tiles, and each step walks ONLY its visited target tiles — ids
# precomputed on the host side of the call — streaming them from HBM with
# double-buffered async copies.
#
# Defaults from the hardware sweep (scripts/knn_sweep.py, 4.7k queries vs
# 365k targets, bound 10): tile_q=128 / tile_t=1024 / chunk=4 at 3.76
# ms/call incl. visit lists, vs 4.39 for 256/1024/8 and 4.12 for 128/512/8.
# Smaller query tiles tighten per-tile bboxes (fewer visited tiles); chunk 4
# halves the tail waste of count rounding at little DMA-amortization loss.


V2_TILE_T = 1024
V2_TILE_Q = 128
V2_CHUNK = 4


def _make_visited_kernel(tile_t: int, max_v: int, chunk: int, n_features: int):
    """Each inner step streams CHUNK visited tiles (one DMA per tile, one
    wait + one fused distance+argmin sweep for the whole chunk). Visit
    lists are padded with tile 0 to a chunk multiple; redundant tiles are
    harmless (running-min is idempotent).

    Distances are DIRECT coordinate differences on the VPU, not the
    expanded ``|q|^2+|t|^2-2q.t`` matmul: at K=3..6 the MXU pads the
    contraction to its native depth and HIGHEST precision multiplies the
    passes — measured 7.5 ms vs 4.3 ms per bench iteration — and the
    expanded form loses ~|q|^2*eps to cancellation (3/4736 flipped winners
    at 20 m scene scale) while direct differences are exact at full f32.

    The lists arrive sorted ascending by bbox lower bound, alongside the
    SUFFIX-MIN of those bounds, and split into two phases:

    * Phase 1 — the first ``count0`` chunks (lower bound in the innermost
      sqrt-bin, i.e. tiles overlapping the query bbox). These can never be
      pruned, so they run UNCONDITIONALLY with double-buffered DMA and zero
      scalar-vector syncs (a per-chunk ``max(dist)`` read would stall the
      scalar core's DMA issue behind the VPU — measured as costing more
      than the pruning saved).
    * One bound read — after phase 1 every query has seen the tiles nearest
      it, so ``wb = max(dist)`` is already near its final value.
    * Phase 2 — remaining chunks gated on ``suffix_lb <= wb`` with the
      FROZEN wb: a pure-scalar test (free-running DMA issue), exact because
      frozen-wb >= true running wb (conservative superset), and trivially
      consistent between a chunk's DMA start and wait (same deterministic
      predicate), so double buffering needs no flag bookkeeping."""

    def kernel(
        count_ref,        # scalar prefetch: (nq_tiles,) int32, chunk counts
        count0_ref,       # scalar prefetch: (nq_tiles,) int32, phase-1 chunks
        vlist_ref,        # (nq_tiles, 8, max_v) int32 in HBM, lb-ascending
        suflb_ref,        # (nq_tiles, 8, max_v) f32 in HBM: SUFFIX-MIN of lb
        t_ref,            # (n_tiles, 8, tile_t) in HBM
        q_ref,            # (tile_q, 8) VMEM block
        binit_ref,        # (tile_q, 1) VMEM: per-query initial bound — the
                          # search radius (a plain broadcast bound normally;
                          # negative for already-resolved queries in the
                          # per-query fallback mode, which freezes them out)
        dist_ref,         # out (tile_q, 1)
        idx_ref,          # out (tile_q, 1)
        vrow_ref,         # SMEM scratch (8, max_v)
        lbrow_ref,        # SMEM scratch (8, max_v)
        wb_ref,           # SMEM scratch (1,) f32: frozen phase-2 bound
        tbuf_ref,         # VMEM scratch (2, 8, chunk*tile_t)
        copy_sems,        # DMA semaphores (2, chunk)
        row_sem,
        lb_sem,
    ):
        i = pl.program_id(0)
        n_chunks = count_ref[i]
        n_phase1 = count0_ref[i]

        # Fetch this query tile's visited-tile ids + suffix bounds into SMEM.
        # Lists are stored 8-row-replicated so the HBM slices satisfy
        # Mosaic's (8, 128) tiling; only row 0 is read.
        row_dma = pltpu.make_async_copy(vlist_ref.at[i], vrow_ref, row_sem)
        row_dma.start()
        lb_dma = pltpu.make_async_copy(suflb_ref.at[i], lbrow_ref, lb_sem)
        lb_dma.start()

        dist_ref[:] = binit_ref[:]
        idx_ref[:] = jnp.full_like(idx_ref, -1)

        row_dma.wait()
        lb_dma.wait()

        def tile_dma(slot, k, j):
            tile_id = vrow_ref[0, k * chunk + j]
            # t_ref pages are TRANSPOSED (8, tile_t): sublane 8, lane tile_t
            # (128-multiple), feature-major for the q @ t contraction.
            return pltpu.make_async_copy(
                t_ref.at[tile_id],
                tbuf_ref.at[slot, :, pl.ds(j * tile_t, tile_t)],
                copy_sems.at[slot, j],
            )

        def start_chunk(slot, k):
            for j in range(chunk):
                tile_dma(slot, k, j).start()

        def wait_chunk(slot, k):
            for j in range(chunk):
                tile_dma(slot, k, j).wait()

        def _compute(slot, k):
            t = tbuf_ref[slot]                      # (8, chunk*tile_t)
            d2 = (q_ref[:, 0:1] - t[0:1, :]) ** 2
            for c in range(1, n_features):
                d2 = d2 + (q_ref[:, c:c + 1] - t[c:c + 1, :]) ** 2
            local_min = jnp.min(d2, axis=1, keepdims=True)
            gpos = jnp.argmin(d2, axis=1).astype(jnp.int32)  # in [0, chunk*tile_t)
            sub = jax.lax.rem(gpos, tile_t)
            seg = gpos // tile_t                     # which chunk member won
            base = jnp.full_like(gpos, vrow_ref[0, k * chunk])
            for j in range(1, chunk):
                base = jnp.where(
                    seg == j, vrow_ref[0, k * chunk + j], base
                )
            local_arg = (base * tile_t + sub).reshape(-1, 1)
            better = local_min < dist_ref[:]
            idx_ref[:] = jnp.where(better, local_arg, idx_ref[:])
            dist_ref[:] = jnp.where(better, local_min, dist_ref[:])

        # --- phase 1: unconditional, double-buffered, sync-free ------------
        @pl.when(n_phase1 > 0)
        def _():
            start_chunk(0, 0)

            def body1(k, _):
                slot = jax.lax.rem(k, 2)
                next_slot = jax.lax.rem(k + 1, 2)

                @pl.when(k + 1 < n_phase1)
                def _():
                    start_chunk(next_slot, k + 1)

                wait_chunk(slot, k)
                _compute(slot, k)
                return 0

            jax.lax.fori_loop(0, n_phase1, body1, 0)

        # --- one bound read, then the frozen-bound tail --------------------
        @pl.when(n_phase1 < n_chunks)
        def _():
            wb_ref[0] = jnp.max(dist_ref[:])

            def active(k):
                # Clamp: active(last+1) is evaluated under pl.when (no
                # short-circuit) and k*chunk can hit the row width when
                # the visit list fills it exactly.
                p = jnp.minimum(k * chunk, lbrow_ref.shape[1] - 1)
                return lbrow_ref[0, p] <= wb_ref[0]

            @pl.when(active(n_phase1))
            def _():
                start_chunk(0, n_phase1)

            def body2(k, _):
                slot = jax.lax.rem(k - n_phase1, 2)
                next_slot = jax.lax.rem(k - n_phase1 + 1, 2)

                @pl.when((k + 1 < n_chunks) & active(k + 1))
                def _():
                    start_chunk(next_slot, k + 1)

                @pl.when(active(k))
                def _():
                    wait_chunk(slot, k)
                    _compute(slot, k)
                return 0

            jax.lax.fori_loop(n_phase1, n_chunks, body2, 0)

    return kernel


# Padding value for suffix-min lists: larger than any real squared bound but
# finite in f32. Plain float — a module-level jnp constant would initialize
# the XLA backend at import, breaking jax.distributed.initialize ordering.
_LB_PAD = 1.0e30


def _visit_lists(
    qmin, qmax, bbox_min, bbox_max, bound_val
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-query-tile visited target-tile ids sorted ascending by bbox lower
    bound, the SUFFIX-MIN of those bounds, and visit counts.

    Sorting uses an 8-bin counting sort on a sqrt scale (device argsort
    compiles pathologically here, and the onehot cost scales linearly with
    the bin count — 1.9 ms/iter at 64 bins vs 0.2 at 8; sqrt concentrates
    resolution near zero, where the running-best bound lives once each
    query has found a candidate). Order only decides how early the prune
    bites;
    the SUFFIX-MIN is built from the exact lb values, so the kernel's
    "stop when suffix > worst-best" rule is exact under ANY ordering.
    Padding slots carry suffix 1e30 (never started) and tile id 0 (a valid
    DMA target if a started chunk straddles the count boundary).

    ``bound_val`` may be a scalar or a per-query-tile (nqt,) vector (the
    per-query fallback mode passes each tile's worst unresolved radius;
    negative values yield empty lists).
    """
    gap = jnp.maximum(
        jnp.maximum(
            qmin[:, None, :] - bbox_max[None, :, :],
            bbox_min[None, :, :] - qmax[:, None, :],
        ),
        0.0,
    )
    lb = jnp.sum(gap * gap, axis=-1)               # (nqt, ntt)
    bound_val = jnp.broadcast_to(
        jnp.asarray(bound_val, jnp.float32), lb.shape[:1]
    )[:, None]
    return _visit_lists_from(lb, lb <= bound_val, bound_val)


def _visit_lists_from(lb, visited, bound_val):
    """List construction from an explicit membership mask + per-cell lower
    bounds (see :func:`_visit_lists`); the kd-union matcher passes a
    per-query top-K union as ``visited`` instead of the radius test."""
    nqt, ntt = visited.shape

    nbins = 8
    scale = jnp.sqrt(jnp.maximum(lb, 0.0) / jnp.maximum(bound_val, 1e-30))
    binid = jnp.clip((scale * nbins).astype(jnp.int32), 0, nbins - 1)
    onehot = (
        (binid[..., None] == jnp.arange(nbins)[None, None, :]) & visited[..., None]
    ).astype(jnp.int32)                            # (nqt, ntt, nbins)
    rank_in_bin = jnp.cumsum(onehot, axis=1) - onehot
    bin_counts = jnp.sum(onehot, axis=1)           # (nqt, nbins)
    bin_offsets = jnp.cumsum(bin_counts, axis=1) - bin_counts
    pos = jnp.sum(
        onehot * (bin_offsets[:, None, :] + rank_in_bin), axis=-1
    )                                              # (nqt, ntt)

    rows = jnp.broadcast_to(jnp.arange(nqt)[:, None], (nqt, ntt))
    cols = jnp.broadcast_to(jnp.arange(ntt)[None, :], (nqt, ntt))
    slot = jnp.where(visited, pos, ntt)            # ntt = out-of-range => drop
    vlist = jnp.zeros((nqt, ntt), jnp.int32)
    vlist = vlist.at[rows.reshape(-1), slot.reshape(-1)].set(
        cols.reshape(-1).astype(jnp.int32), mode="drop"
    )
    lblist = jnp.full((nqt, ntt), _LB_PAD, jnp.float32)
    lblist = lblist.at[rows.reshape(-1), slot.reshape(-1)].set(
        lb.reshape(-1), mode="drop"
    )
    counts = jnp.sum(visited, axis=1).astype(jnp.int32)
    # Bin-0 tiles (lower bound within the innermost sqrt bin — in particular
    # every tile overlapping the query bbox) form the list prefix: the
    # kernel's unconditional phase 1.
    counts0 = jnp.sum(visited & (binid == 0), axis=1).astype(jnp.int32)
    suffix = jax.lax.cummin(lblist, axis=1, reverse=True)
    return vlist, suffix, counts, counts0


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "tile_q", "tile_t", "chunk", "use_phase1"),
)
def nn_search_pruned_v2(
    queries: jax.Array,
    index: TargetIndex,
    max_distance: float | jax.Array,
    *,
    interpret: bool = False,
    tile_q: int = V2_TILE_Q,
    tile_t: int = V2_TILE_T,
    chunk: int = V2_CHUNK,
    per_query_bound: jax.Array | None = None,
    use_phase1: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Visited-list exact 1-NN. Same contract as :func:`nn_search_pruned`;
    build the index with ``build_target_index(..., tile_t=V2_TILE_T)``.

    ``per_query_bound`` (N,) switches the kernel to per-query search radii
    (the k-d matcher's exactness fallback): a NEGATIVE radius freezes that
    query out entirely (idx -1, dist = its radius); visit lists shrink to
    each query tile's worst unresolved radius. Pair with
    ``use_phase1=False`` so pruning starts from those radii immediately
    instead of running the unconditional nearest-tile phase.
    """
    nq = queries.shape[0]
    n_features = queries.shape[1]
    q = _pad_rows(_pad_features(queries), tile_q, 0.0)

    n_tiles = index.points.shape[0] // tile_t
    nq_tiles = q.shape[0] // tile_q
    bound_val = jnp.float32(max_distance) * (1.0 + 1e-6) + 1e-30
    if per_query_bound is not None:
        binit = jnp.pad(
            jnp.asarray(per_query_bound, jnp.float32),
            (0, q.shape[0] - nq),
            constant_values=-1.0,
        )
        tile_bound = jnp.max(binit.reshape(nq_tiles, tile_q), axis=1)
    else:
        binit = jnp.full((q.shape[0],), bound_val, jnp.float32)
        tile_bound = bound_val

    qtiles = q.reshape(nq_tiles, tile_q, FEATURE_PAD)
    vlist, suffix, counts, counts0 = _visit_lists(
        jnp.min(qtiles, axis=1), jnp.max(qtiles, axis=1),
        index.bbox_min, index.bbox_max, tile_bound,
    )
    if not use_phase1:
        counts0 = jnp.zeros_like(counts0)
    dist, idx = _run_visited_kernel(
        q, binit, vlist, suffix, counts, counts0, index.points_t3,
        tile_q=tile_q, tile_t=tile_t, chunk=chunk,
        n_features=n_features, interpret=interpret,
    )
    sorted_idx = idx[:nq, 0]
    d2_out = dist[:nq, 0]
    orig = index.perm[jnp.clip(sorted_idx, 0, index.perm.shape[0] - 1)]
    return jnp.where(sorted_idx < 0, -1, orig), d2_out


def _run_visited_kernel(
    q, binit, vlist, suffix, counts, counts0, pages,
    *, tile_q, tile_t, chunk, n_features, interpret,
):
    """Invoke the visited-list kernel on prebuilt lists.

    ``q`` is row/feature padded, ``pages`` is the (n_tiles, 8, tile_t)
    coordinate-major page array, lists are (nqt, n_tiles) with suffix-min
    bounds. Shared by the radius path (:func:`nn_search_pruned_v2`) and the
    kd-union path (kdtree.nn_search_kd_union) — both produce per-query-tile
    lists, only the membership rule differs.
    """
    nq_tiles = q.shape[0] // tile_q
    n_tiles = pages.shape[0]
    max_v = ((n_tiles + 127) // 128) * 128
    vlist = jnp.pad(vlist, ((0, 0), (0, max_v - n_tiles)))
    lblist = jnp.pad(
        suffix, ((0, 0), (0, max_v - n_tiles)), constant_values=_LB_PAD
    )
    # 8-row replication for tiling-legal (1-row worth of) HBM slices.
    vlist = jnp.broadcast_to(vlist[:, None, :], (nq_tiles, 8, max_v))
    lblist = jnp.broadcast_to(lblist[:, None, :], (nq_tiles, 8, max_v))
    # Chunked inner loop: counts in whole chunks; list slots past the true
    # count hold tile 0 (valid), so over-read chunks are merely redundant.
    counts = (counts + (chunk - 1)) // chunk
    counts0 = (counts0 + (chunk - 1)) // chunk

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nq_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # vlist (DMA'd per q-tile)
            pl.BlockSpec(memory_space=pltpu.HBM),   # lblist (DMA'd per q-tile)
            pl.BlockSpec(memory_space=pltpu.HBM),   # target points (DMA'd per visited tile)
            pl.BlockSpec((tile_q, FEATURE_PAD), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((8, max_v), jnp.int32),
            pltpu.SMEM((8, max_v), jnp.float32),
            pltpu.SMEM((1,), jnp.float32),
            pltpu.VMEM((2, FEATURE_PAD, chunk * tile_t), jnp.float32),
            pltpu.SemaphoreType.DMA((2, chunk)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        _make_visited_kernel(tile_t, max_v, chunk, n_features),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((q.shape[0], 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        counts,
        counts0,
        vlist,
        lblist,
        pages,
        q,
        binit[:, None],
    )


# Quantization width for lower bounds packed into the bitmap code words
# (value = lbq << 2 | tag). 2^20 levels over [0, bound]; quantizing lb DOWN
# and the frozen bound UP keeps the prune conservative (never skips a
# needed block).
_LBQ_BITS = 20


# Compute-gating subgroup width of the bitmap kernel: queries are gated
# per SG_WIDTH-row subgroup so each distance pass touches only the
# (subgroup, block) pairs some subgroup query actually needs — the
# tile-level union costs 5-7x the subgroup information floor at bench
# shapes (scripts/evidence/subgroup_union_log.txt). 8 = the f32 sublane count, so
# a subgroup's query rows are one native (8, lane) slice.
SG_WIDTH = 8


def _make_bitmap_kernel(
    tile_t: int, nc_real: int, nqt: int, chunk: int, n_features: int,
    quant_scale: float, tile_q: int,
):
    """Bitmap-walk variant of the visited-list kernel for the warm-start
    radius search. Instead of consuming lists pre-sorted on the XLA side —
    whose construction (two 512-lane scatters + cummin per tile) cost
    ~0.45 ms/pair, ~half the warm matcher (scripts/evidence/warm_stage_log.txt) —
    each grid step receives one packed CODE row per query tile
    (0 = non-member, tag 1 = hot: block contains a live query, tag 2 =
    cold, with the block's quantized per-tile lower bound in the upper
    bits) and compacts it on the SCALAR core in SMEM with ONE walk over
    the [jmin, jend) member span (scalar-prefetched; members cluster
    spatially and kd block ids are tree-ordered, so the span is a small
    fraction of nc).

    The PAIR batch axis is flattened into the grid (program p = pair
    ``p // nqt``, query tile ``p % nqt``): one kernel launch serves the
    whole data-parallel batch, where the generic pallas batching rule
    would fall back to an explicit per-pair loop over the HBM operands.

    Phase discipline (same as :func:`_make_visited_kernel`): hot chunks
    run unconditionally with double-buffered DMA; ONE bound read (wb = max
    running best — near-final once every query has seen its own block);
    cold chunks gate their DMA on "any in-count block with lb <= wb" with
    the FROZEN, quantized-UP wb — exact because the per-tile lb is a min
    over the tile's queries and quantized DOWN, and deterministic between
    a chunk's DMA start and wait. Reads of compacted slots past the true
    count (a partial last chunk) clamp to the last real slot — the
    duplicated block's page re-read is a no-op under the running min, and
    uninitialized SMEM is never used as a DMA source id; the cold
    predicate guards count membership per slot, so stale lb slots are
    never trusted.

    Compute gating (the round-3 rewrite): the distance pass runs per
    (SG_WIDTH-row subgroup, block), gated on the prefix kernel's
    per-subgroup membership bits (code row 1) — a block is evaluated only
    against the subgroups whose queries have it in their hit set, cutting
    the VPU work ~5-7x vs the tile-level union
    (scripts/evidence/subgroup_union_log.txt). Exactness is untouched: gating only
    removes (query, block) pairs OUTSIDE the query's membership set, which
    the tile-level scheme evaluated as harmless extras. Cold computes are
    additionally pruned per subgroup with frozen per-subgroup bounds
    (wb16): skipping block B for subgroup s when quantized-down
    lb_tile(B) > quantized-up max-running-best(s) is exact because
    lb_tile <= lb(q, B) for every tile query q."""

    n_sub = tile_q // SG_WIDTH

    def kernel(
        range_ref,        # scalar prefetch (2*B*nqt,) int32: [jmin, jend)
                          # pairs, flat — a 2-D SMEM operand pads its minor
                          # dim to 128 lanes (9.8 MB at the TUM color
                          # shapes vs the 1 MB SMEM, measured OOM)
        code_ref,         # (B*nqt, 8, nc) int32 in HBM: row 0 = tag|lbq
                          # codes, row 1 = subgroup membership masks
        t_ref,            # (B*nc_real, 8, tile_t) pages in HBM
        q_ref,            # (tile_q, 8) VMEM
        binit_ref,        # (tile_q, 1) VMEM per-query initial bound
        dist_ref,         # out (tile_q, 1)
        idx_ref,          # out (tile_q, 1)
        vcode_ref,        # SMEM (8, nc) int32: code/mask rows landing
        vids_ref,         # SMEM (8, nc) int32: rows 0/1 = compacted
                          # hot/cold ids, 2 = cold quantized lbs,
                          # 3/4 = hot/cold subgroup masks
        wb_ref,           # SMEM (1,) f32: frozen phase-2 bound (tile max)
        wb16_ref,         # SMEM (n_sub,) f32: frozen per-subgroup bounds
        tbuf_ref,         # VMEM scratch (2, 8, chunk*tile_t)
        copy_sems,        # DMA semaphores (2, chunk)
        code_sem,
    ):
        p = pl.program_id(0)
        page_base = (p // nqt) * nc_real   # this pair's page rows

        code_dma = pltpu.make_async_copy(code_ref.at[p], vcode_ref, code_sem)
        code_dma.start()

        dist_ref[:] = binit_ref[:]
        idx_ref[:] = jnp.full_like(idx_ref, -1)

        code_dma.wait()

        # Fused scalar compaction walk over the member span. Stores are
        # unconditional (a non-member leaves its count in place, so the
        # slot is overwritten by the next member); clamping keeps garbage
        # slots — overwritten or over-read past the count — valid DMA
        # targets.
        def walk(j, carry):
            ch, cc = carry
            m = vcode_ref[0, j]
            msk = vcode_ref[1, j]
            tag = m & 3
            jc = jnp.minimum(j, nc_real - 1)
            vids_ref[0, ch] = jc
            vids_ref[1, cc] = jc
            vids_ref[2, cc] = m >> 2
            vids_ref[3, ch] = msk
            vids_ref[4, cc] = msk
            return ch + (tag == 1), cc + (tag == 2)

        cnt_h, cnt_c = jax.lax.fori_loop(
            range_ref[2 * p], range_ref[2 * p + 1], walk, (0, 0)
        )
        ch_h = (cnt_h + chunk - 1) // chunk
        ch_c = (cnt_c + chunk - 1) // chunk

        def slot_clamped(k, j, cold):
            # A partial last chunk over-reads slots past the true count;
            # those were never written THIS grid step (and on the first
            # step never at all — SMEM scratch is uninitialized), so clamp
            # to the last real slot: the duplicated block's page is
            # re-read, which the running min makes a no-op.
            if cold:
                return jnp.minimum((k - ch_h) * chunk + j, cnt_c - 1)
            return jnp.minimum(k * chunk + j, cnt_h - 1)

        def tile_dma(slot, k, j, cold):
            tile_id = vids_ref[1 if cold else 0, slot_clamped(k, j, cold)]
            return pltpu.make_async_copy(
                t_ref.at[page_base + tile_id],
                tbuf_ref.at[slot, :, pl.ds(j * tile_t, tile_t)],
                copy_sems.at[slot, j],
            )

        def start_chunk(slot, k, cold):
            for j in range(chunk):
                tile_dma(slot, k, j, cold).start()

        def wait_chunk(slot, k, cold):
            for j in range(chunk):
                tile_dma(slot, k, j, cold).wait()

        def _compute(slot, k, cold):
            ids_row = 1 if cold else 0
            if cold:
                # Frozen per-subgroup quantized-up bounds (written once,
                # before the cold phase).
                wbqs = [
                    (wb16_ref[s] * quant_scale).astype(jnp.int32) + 1
                    for s in range(n_sub)
                ]
            for j in range(chunk):
                sl = slot_clamped(k, j, cold)
                msk = vids_ref[ids_row + 3, sl]
                base = vids_ref[ids_row, sl]

                @pl.when(msk != 0)
                def _(j=j, sl=sl, msk=msk, base=base):
                    t = tbuf_ref[slot, :, pl.ds(j * tile_t, tile_t)]
                    lbq = vids_ref[2, sl]
                    for s in range(n_sub):
                        need = ((msk >> s) & 1) == 1
                        if cold:
                            need = need & (lbq <= wbqs[s])

                        @pl.when(need)
                        def _(s=s):
                            rows = slice(s * SG_WIDTH, (s + 1) * SG_WIDTH)
                            d2 = (q_ref[rows, 0:1] - t[0:1, :]) ** 2
                            for c in range(1, n_features):
                                d2 = d2 + (
                                    q_ref[rows, c:c + 1] - t[c:c + 1, :]
                                ) ** 2
                            local_min = jnp.min(d2, axis=1, keepdims=True)
                            sub = jnp.argmin(d2, axis=1).astype(jnp.int32)
                            # PAIR-LOCAL sorted page index (callers map via
                            # their own page_orig).
                            local_arg = (base * tile_t + sub).reshape(-1, 1)
                            better = local_min < dist_ref[rows]
                            idx_ref[rows] = jnp.where(
                                better, local_arg, idx_ref[rows]
                            )
                            dist_ref[rows] = jnp.where(
                                better, local_min, dist_ref[rows]
                            )

        # --- phase 1: hot chunks, unconditional DMA ----------------------
        @pl.when(ch_h > 0)
        def _():
            start_chunk(0, 0, False)

            def body1(k, _):
                slot = jax.lax.rem(k, 2)
                next_slot = jax.lax.rem(k + 1, 2)

                @pl.when(k + 1 < ch_h)
                def _():
                    start_chunk(next_slot, k + 1, False)

                wait_chunk(slot, k, False)
                _compute(slot, k, False)
                return 0

            jax.lax.fori_loop(0, ch_h, body1, 0)

        # --- one bound read, then the frozen-bound cold tail -------------
        @pl.when(ch_c > 0)
        def _():
            for s in range(n_sub):
                wb16_ref[s] = jnp.max(
                    dist_ref[s * SG_WIDTH:(s + 1) * SG_WIDTH]
                )
            wb_ref[0] = jnp.max(dist_ref[:])

            def active(k):
                # Any real (in-count) block of cold chunk k with quantized
                # lb <= quantized-UP wb. The count guard skips stale slots;
                # the index clamp keeps the probe of active(last+1) —
                # evaluated under pl.when with no short-circuit — inside
                # the SMEM scratch when the cold list fills it exactly.
                wbq = (wb_ref[0] * quant_scale).astype(jnp.int32) + 1
                base = (k - ch_h) * chunk
                last = vids_ref.shape[1] - 1
                ok = False
                for j in range(chunk):
                    p = base + j
                    ok = ok | (
                        (p < cnt_c) & (vids_ref[2, jnp.minimum(p, last)] <= wbq)
                    )
                return ok

            @pl.when(active(ch_h))
            def _():
                start_chunk(0, ch_h, True)

            def body2(k, _):
                slot = jax.lax.rem(k - ch_h, 2)
                next_slot = jax.lax.rem(k - ch_h + 1, 2)

                @pl.when((k + 1 < ch_h + ch_c) & active(k + 1))
                def _():
                    start_chunk(next_slot, k + 1, True)

                @pl.when(active(k))
                def _():
                    wait_chunk(slot, k, True)
                    _compute(slot, k, True)
                return 0

            jax.lax.fori_loop(ch_h, ch_h + ch_c, body2, 0)

    return kernel


def _run_bitmap_kernel_flat(
    q, binit, hot, cold, lb_tile, submask, pages, max_distance,
    *, tile_q, tile_t, chunk, n_features, interpret,
):
    """Flat batched bitmap-kernel invocation.

    ``q`` (B, Nq_pad, F), ``binit`` (B, Nq_pad), ``hot``/``cold``
    (B, nqt, nc) bool, ``lb_tile`` (B, nqt, nc) f32, ``submask``
    (B, nqt, nc) int32 per-subgroup membership bits, ``pages``
    (B, nc, 8, tile_t); ``max_distance`` is the STATIC squared threshold
    anchoring the lb quantization. Returns ``(dist, idx)`` of shape
    (B, Nq_pad, 1) with PAIR-LOCAL sorted page indices.
    """
    b, nq_pad, f = q.shape
    nq_tiles = nq_pad // tile_q
    nc = pages.shape[1]
    # 8-row pages for tiling-legal HBM slices (row 0 = tag/lbq codes,
    # row 1 = subgroup masks); the lane dim must be a 128-multiple (kd
    # block counts are powers of two >= 128 at production scale; pad for
    # small clouds).
    nc_pad = ((nc + 127) // 128) * 128

    bound_val = float(
        np.float32(max_distance) * np.float32(1.0 + 1e-6) + np.float32(1e-30)
    )
    quant_scale = float((1 << _LBQ_BITS) / bound_val)
    lbq = jnp.clip(
        (lb_tile * jnp.float32(quant_scale)).astype(jnp.int32),
        0, (1 << (_LBQ_BITS + 1)) - 1,
    )
    code = jnp.where(
        hot, 1, jnp.where(cold, (lbq << 2) | 2, 0)
    ).astype(jnp.int32)
    rows = jnp.stack([code, submask.astype(jnp.int32)], axis=2)
    code8 = jnp.pad(
        rows, ((0, 0), (0, 0), (0, 6), (0, nc_pad - nc))
    ).reshape(b * nq_tiles, 8, nc_pad)

    # Member span per tile (members cluster in tree order): the kernel's
    # walk runs [jmin, jend) only.
    member = hot | cold
    iota = jnp.arange(nc, dtype=jnp.int32)
    jmin = jnp.min(jnp.where(member, iota, nc), axis=2)
    jend = jnp.max(jnp.where(member, iota + 1, 0), axis=2)
    ranges = jnp.stack(
        [jmin, jnp.maximum(jend, jmin)], axis=-1
    ).reshape(2 * b * nq_tiles)

    kernel = _make_bitmap_kernel(
        tile_t, nc, nq_tiles, chunk, n_features, quant_scale, tile_q
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * nq_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # code bitmap
            pl.BlockSpec(memory_space=pltpu.HBM),   # target pages
            pl.BlockSpec((tile_q, FEATURE_PAD), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((8, nc_pad), jnp.int32),
            pltpu.SMEM((8, nc_pad), jnp.int32),
            pltpu.SMEM((1,), jnp.float32),
            pltpu.SMEM((tile_q // SG_WIDTH,), jnp.float32),
            pltpu.VMEM((2, FEATURE_PAD, chunk * tile_t), jnp.float32),
            pltpu.SemaphoreType.DMA((2, chunk)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    dist, idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b * nq_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((b * nq_pad, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        ranges,
        code8,
        pages.reshape(b * nc, 8, tile_t),
        q.reshape(b * nq_pad, f),
        binit.reshape(b * nq_pad, 1),
    )
    return dist.reshape(b, nq_pad, 1), idx.reshape(b, nq_pad, 1)


@functools.lru_cache(maxsize=None)
def _bitmap_search_fn(
    tile_q: int, tile_t: int, chunk: int, n_features: int,
    max_distance: float, interpret: bool,
):
    """Build (and cache) the custom-vmap bitmap searcher.

    Constructed via lru_cache on the static config so the ``custom_vmap``
    object is created once (building one inside a traced scan body leaks
    tracers into its staged jaxpr). The vmap rule flattens the pair axis
    into the kernel grid — ONE launch for the whole batch — where the
    generic pallas batching rule would loop per pair over the HBM
    operands.
    """
    kw = dict(
        tile_q=tile_q, tile_t=tile_t, chunk=chunk,
        n_features=n_features, interpret=interpret,
    )

    def search(q, binit, hot, cold, lb_tile, submask, pages):
        dist, idx = _run_bitmap_kernel_flat(
            q[None], binit[None], hot[None], cold[None], lb_tile[None],
            submask[None], pages[None], max_distance, **kw
        )
        return dist[0], idx[0]

    search_vm = jax.custom_batching.custom_vmap(search)

    @search_vm.def_vmap
    def _rule(axis_size, in_batched, *args):
        flat = [
            x if b else jnp.broadcast_to(x, (axis_size,) + x.shape)
            for x, b in zip(args, in_batched)
        ]
        out = _run_bitmap_kernel_flat(*flat, max_distance, **kw)
        return out, (True, True)

    return search_vm


def _run_bitmap_kernel(
    q, binit, hot, cold, lb_tile, submask, pages, max_distance,
    *, tile_q, tile_t, chunk, n_features, interpret,
):
    """Two-phase bitmap-walk search over one pair (batches via the custom
    vmap rule: the pair axis joins the kernel grid)."""
    fn = _bitmap_search_fn(
        tile_q, tile_t, chunk, n_features, float(max_distance), interpret
    )
    return fn(q, binit, hot, cold, lb_tile, submask, pages)


# ---------------------------------------------------------------------------
# Resident-pages kernel: the whole target page table lives in VMEM
# ---------------------------------------------------------------------------

# The kd page table of an ETH-scale pair is small: capacity x 8 rows x 4 B
# ~= 32 B/point ~= 12.6 MB at 365k points — it FITS in one core's ~16 MB
# VMEM. The bitmap/visited kernels stream member blocks from HBM with one
# DMA per (tile, block) visit (~1.9k issues/pair/iter at bench shapes),
# which is what bounds them (~5% of HBM peak moved; subgroup compute
# gating bought only ~3% end-to-end because the DMA issue rate, not the
# VPU, was the wall). The resident kernel instead copies the pair's WHOLE
# page table into a persistent VMEM scratch ONCE per kernel invocation
# (one contiguous ~12.6 MB DMA riding near peak bandwidth, amortized over
# all query tiles) and runs the gated distance passes straight out of
# VMEM — zero per-block DMA, so the per-subgroup membership gating
# finally pays.
RESIDENT_VMEM_BUDGET = 13 * 1024 * 1024
# Gating granularity (query rows per conditional region) of the resident
# kernel. The r3 sweep picked 64 (scripts/evidence/resident_bench_log.txt:
# 128 -> 2.26, 64 -> 1.17, 32 -> 1.22, 16 -> 1.44, 8 -> 1.77 ms/pair/iter
# — per-region scalar-branch overhead beat the VPU savings below 64).
# With round 4's PER-GATE walk spans the balance shifted: gate=32 wins at
# every k (k=1: 0.861 vs 1.076 kernel probe; k=4 e2e: 14.30 vs 14.18
# pairs/s — scripts/evidence/approx_arm_log.txt), so 32 is the default.
RESIDENT_GATE_WIDTH = 32


def resident_fits(nc: int, tile_t: int, d: int | None = None) -> bool:
    """Whether one pair's page table fits the resident kernel's VMEM
    scratch budget (leaves ~3 MB of a v5e core's ~16 MB for the query
    tiles, outputs and code landing). With ``d <= 3`` the PACKED layout
    applies (two blocks per 8-row page — rows 0-2 / 3-5), halving both
    the scratch and the bulk copy; ``d`` omitted means the legacy
    one-block-per-page table."""
    n_pages = (nc + 1) // 2 if d is not None and d <= 3 else nc
    return n_pages * 8 * tile_t * 4 <= RESIDENT_VMEM_BUDGET


def _make_resident_kernel(
    tile_t: int, nc_real: int, nqt: int, n_features: int,
    quant_scale: float, tile_q: int, gate_width: int, probe: int = 0,
    packed: bool = False, pixel_window=None, restrict_col: int | None = None,
    transform_pose: bool = False,
):
    """Resident-pages search kernel (single-phase): grid = (pair, query
    tile); the first tile of each pair bulk-copies the pair's full page
    table into a VMEM scratch (4 parallel DMA streams) that persists
    across the pair's tiles. Each tile then scans its member span
    [jmin, jend) directly — ONE scalar pass, no compaction walk, no
    hot/cold phases (the probe decomposition measured the bitmap-style
    walk at 0.53 ms/pair/iter, half the kernel; with membership already
    top-k-capped per query by the prefix, a cold-phase bound prune cannot
    buy that back) — and runs per-gate-group distance passes straight out
    of VMEM, predicated on the prefix's membership bits.

    ``gate_width`` (a multiple of SG_WIDTH up to tile_q) sets the gating
    granularity: each conditional region covers ``gate_width`` query rows,
    predicated on the OR of its SG_WIDTH-wide membership bits. Fine gates
    skip more VPU work but pay a scalar-branch overhead per
    (gate, block) — the width trades the two (hardware-swept in
    scripts/evidence/resident_bench_log.txt).

    ``probe`` (perf-bisection aid, scripts/resident_bench.py): 1 = span
    scan without distance compute, 2 = also skip the span scan (copy +
    code DMA only). Probe results are NOT valid matches.

    ``transform_pose``: the query table holds RAW (untransformed) source
    features and an extra (1, 16) row-major pose operand follows the
    binit ref; the kernel applies ``R @ p + t`` to the three spatial
    feature columns per gate — a handful of broadcast VPU ops — so the
    caller can keep ONE loop-invariant query table across a whole ICP
    scan instead of materializing a transformed (and (8,128)-padded)
    (Nq, 8) table every iteration (~2 ms/frame-iter of HBM churn at the
    dense color tracker's 307k queries).

    ``restrict_col`` (the cached-membership mode, kdtree.nn_search_kd_
    cached): query column ``restrict_col`` carries each query's OWN block
    id as f32 (-1 = none), and every candidate lane is masked unless its
    block IS that query's block — the per-gate compute naturally runs the
    gate's block UNION over all its rows, so without the mask a query
    would also match gate-mates' blocks (layout-dependent semantics) and
    a -1 row would not be frozen out.

    ``pixel_window`` = ``(window, width, height, wb, b)`` turns the
    kernel into the PROJECTIVE window search (ops/projective.py): each
    page holds one b x b pixel block's coordinates, query columns 3/4
    carry the projected pixel center (u0, v0) as f32, and every
    candidate lane is masked by the exact +-window pixel test before the
    running min (NearestNeighbor.h:385-404 semantics)."""

    n_gate = tile_q // gate_width
    r = gate_width // SG_WIDTH          # SG bits per gate
    r_mask = (1 << r) - 1
    # With the packed layout the copy streams move PAGES (2 blocks each).
    n_pages = (nc_real + 1) // 2 if packed else nc_real
    # Fewer streams than pages (wide-block indexes can have < 4 pages —
    # a stream with zero pages would emit an out-of-bounds size-0 slice).
    n_streams = min(4, n_pages)
    nc_stream = -(-n_pages // n_streams)

    def kernel(
        range_ref,        # scalar prefetch (2*B*nqt*n_gate,) int32:
                          # PER-GATE [jmin, jend) pairs, flat (2-D SMEM
                          # operands lane-pad to 128)
        code_ref,         # (B*nqt, 8, nc_pad) int32 HBM: row 0 = tag|lbq
                          # codes (unused here), row 1 = membership masks
        t_ref,            # (B*nc_real*8, tile_t) pages in HBM, FLAT 2-D:
                          # each copy stream is one contiguous region (the
                          # 3-D layout split the bulk copy into per-block
                          # descriptors)
        q_ref,            # (tile_q, FEATURE_PAD) VMEM; RAW source
                          #   features when transform_pose is set
        binit_ref,        # (tile_q, 1) VMEM per-query initial bound
        *rest_refs,       # [pose_ref (1, 16) VMEM iff transform_pose,]
                          #   dist/idx outputs + scratches (below)
    ):
        # vcode_ref: SMEM (2, 8, nc_pad) int32 DOUBLE-BUFFERED code/mask
        #   landings — the code DMA for step p+1 starts during step p,
        #   so its latency never sits on the critical path (a start+wait
        #   in the same step cost ~5 us/step, which DOMINATED dense
        #   workloads: 19200 steps at TUM shapes = ~96 of the 101
        #   ms/frame/iter, scripts/color_kernel_probe);
        # vids_ref: SMEM (n_gate, nc_pad) per-gate member-id lists;
        # vpages_ref: VMEM (nc_real*8, tile_t) THE resident pages;
        # code_sems DMA (2,), page_sems DMA (n_streams,).
        if transform_pose:
            (pose_ref, dist_ref, idx_ref, vcode_ref, vids_ref,
             vpages_ref, code_sems, page_sems) = rest_refs
        else:
            (dist_ref, idx_ref, vcode_ref, vids_ref,
             vpages_ref, code_sems, page_sems) = rest_refs
        b = pl.program_id(0)
        i = pl.program_id(1)
        p = b * nqt + i
        p_last = code_ref.shape[0] - 1

        def page_dma(k):
            lo = k * nc_stream
            n = min(nc_stream, n_pages - k * nc_stream)
            return pltpu.make_async_copy(
                t_ref.at[pl.ds((b * n_pages + lo) * 8, n * 8)],
                vpages_ref.at[pl.ds(lo * 8, n * 8)],
                page_sems.at[k],
            )

        # New pair: start the page copy streams first so they overlap the
        # code DMA below (the scratch persists across this pair's
        # remaining tiles).
        @pl.when(i == 0)
        def _():
            for k in range(n_streams):
                page_dma(k).start()

        def code_dma(step):
            slot = jax.lax.rem(step, 2)
            return pltpu.make_async_copy(
                code_ref.at[step], vcode_ref.at[slot], code_sems.at[slot]
            )

        # Grid steps run in flat p order (tile axis innermost), so step
        # p prefetches step p+1's code row; the first step self-starts.
        @pl.when(p == 0)
        def _():
            code_dma(0).start()

        @pl.when(p < p_last)
        def _():
            code_dma(p + 1).start()

        # dist/idx are fully written by the per-gate loops below (their
        # carries start from binit / -1), so no output pre-init is needed.
        code_dma(p).wait()
        cslot = jax.lax.rem(p, 2)

        # Per-GATE compaction walk: one member-id list per gate group, so
        # the compute loops below are branch-free (a conditional vector
        # region costs ~50-100 ns whether or not it is taken — the v1/v3
        # sweeps bottomed out on exactly that; scalar walk work overlaps
        # the previous tiles' vector compute across grid steps and is
        # ~free, probe logs). Each gate walks its OWN span (per-gate
        # [jmin, jend) from the prefetch): Morton-coherent gate rows have
        # far tighter tree-order spans than the whole tile, and the
        # per-j work is one mask test instead of n_gate.
        n_lists = 2 * n_gate if packed else n_gate
        if probe >= 1:
            counts = (0,) * n_lists
        elif packed:
            # Per gate, SPLIT the member list by block parity: even blocks
            # live in rows 0-2 of their page, odd in rows 3-5, so the two
            # compute loops below keep STATIC row slices (no dynamic
            # sublane addressing).
            counts = []
            for g in range(n_gate):

                def walk_g(j, carry, g=g):
                    ce, co = carry
                    msk = vcode_ref[cslot, 1, j]
                    hit = (msk >> (g * r)) & r_mask != 0
                    odd = (j & 1) == 1
                    pid = jnp.minimum(j >> 1, n_pages - 1)
                    vids_ref[2 * g, ce] = pid
                    vids_ref[2 * g + 1, co] = pid
                    return ce + (hit & ~odd), co + (hit & odd)

                base = 2 * (p * n_gate + g)
                ce, co = jax.lax.fori_loop(
                    range_ref[base], range_ref[base + 1], walk_g, (0, 0)
                )
                counts.extend([ce, co])
            counts = tuple(counts)
        else:
            counts = []
            for g in range(n_gate):

                def walk_g(j, c, g=g):
                    msk = vcode_ref[cslot, 1, j]
                    vids_ref[g, c] = jnp.minimum(j, nc_real - 1)
                    return c + ((msk >> (g * r)) & r_mask != 0)

                base = 2 * (p * n_gate + g)
                counts.append(jax.lax.fori_loop(
                    range_ref[base], range_ref[base + 1], walk_g, 0
                ))
            counts = tuple(counts)

        @pl.when(i == 0)
        def _():
            for k in range(n_streams):
                page_dma(k).wait()

        # Dense branch-free compute: per gate group, a fori over exactly
        # its member blocks — every iteration computes, no predicates.
        # The running (dist, idx) ride the loop CARRY (vector registers),
        # written back to the output refs once per gate: the per-region
        # VMEM read-modify-write was measured as part of a ~0.2 us/region
        # fixed cost that dominated fine gate widths.
        if pixel_window is not None:
            win, img_w, img_h, wb_blocks, bpx = pixel_window
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, tile_t), 1)
            su = lane % bpx                     # within-block pixel col
            sv = lane // bpx                    # within-block pixel row

        for g in range(n_gate):
            rows = slice(g * gate_width, (g + 1) * gate_width)
            qg = [q_ref[rows, c:c + 1] for c in range(n_features)]
            if transform_pose:
                # Apply R @ p + t to the spatial columns in-register:
                # broadcast (1, 1) pose entries against (gate_width, 1)
                # coordinate slices. Non-spatial features (colors) pass
                # through untransformed.
                P = pose_ref[0:1, :]   # row 0 lanes 0-15 hold the pose
                px, py, pz = qg[0], qg[1], qg[2]
                # (pr, not r: Python 3.12 inlines comprehensions into the
                # enclosing frame, and reusing the kernel's `r` local here
                # broke the walk closures with a NameError.)
                qg = [
                    P[:, 4 * pr:4 * pr + 1] * px
                    + P[:, 4 * pr + 1:4 * pr + 2] * py
                    + P[:, 4 * pr + 2:4 * pr + 3] * pz
                    + P[:, 4 * pr + 3:4 * pr + 4]
                    for pr in range(3)
                ] + qg[3:]
            if pixel_window is not None:
                u0 = q_ref[rows, 3:4]           # projected pixel center
                v0 = q_ref[rows, 4:5]
            if restrict_col is not None:
                qblk = q_ref[
                    rows, restrict_col:restrict_col + 1
                ].astype(jnp.int32)             # (gate_width, 1)

            def make_body(g, qg, lst, row_off, blk_off):
                def body(k, carry):
                    dist, idx = carry
                    pid = vids_ref[lst, k]
                    t = vpages_ref[pl.ds(pid * 8, 8), :]    # (8, tile_t)
                    d2 = (qg[0] - t[row_off:row_off + 1, :]) ** 2
                    for c in range(1, n_features):
                        d2 = d2 + (
                            qg[c] - t[row_off + c:row_off + c + 1, :]
                        ) ** 2
                    if pixel_window is not None:
                        # Exact +-window pixel mask: lane -> image pixel
                        # from the block id + within-block offset.
                        pu = (pid % wb_blocks) * bpx + su   # (1, tile_t)
                        pv = (pid // wb_blocks) * bpx + sv
                        puf = pu.astype(jnp.float32)
                        pvf = pv.astype(jnp.float32)
                        inwin = (
                            (jnp.abs(puf - u0) <= win)
                            & (jnp.abs(pvf - v0) <= win)
                            & (pu < img_w)
                            & (pv < img_h)
                        )
                        d2 = jnp.where(inwin, d2, jnp.float32(3.0e13))
                    if restrict_col is not None:
                        # Cached-membership: only this query's OWN block
                        # may supply candidates (see docstring).
                        d2 = jnp.where(qblk == pid, d2, jnp.float32(3.0e13))
                    local_min = jnp.min(d2, axis=1, keepdims=True)
                    sub = jnp.argmin(d2, axis=1).astype(jnp.int32)
                    # PAIR-LOCAL sorted page index (callers map via their
                    # own page_orig).
                    block_id = pid * 2 + (1 if blk_off else 0) if packed else pid
                    local_arg = (block_id * tile_t + sub).reshape(-1, 1)
                    better = local_min < dist
                    return (
                        jnp.where(better, local_min, dist),
                        jnp.where(better, local_arg, idx),
                    )
                return body

            carry = (binit_ref[rows], jnp.full((gate_width, 1), -1, jnp.int32))
            if packed:
                carry = jax.lax.fori_loop(
                    0, counts[2 * g], make_body(g, qg, 2 * g, 0, 0), carry
                )
                carry = jax.lax.fori_loop(
                    0, counts[2 * g + 1],
                    make_body(g, qg, 2 * g + 1, 3, 1), carry,
                )
            else:
                carry = jax.lax.fori_loop(
                    0, counts[g], make_body(g, qg, g, 0, 0), carry
                )
            dist_ref[rows] = carry[0]
            idx_ref[rows] = carry[1]

    return kernel


def _run_resident_kernel_flat(
    q, binit, hot, cold, lb_tile, submask, pages, max_distance,
    *, tile_q, tile_t, n_features, gate_width, interpret, probe=0,
    packed=False, ranges_rows=None, pixel_window=None, restrict_col=None,
    pose=None,
):
    """Flat batched resident-kernel invocation (same operand preparation
    as :func:`_run_bitmap_kernel_flat`, grid (B, nqt) so each pair's first
    tile triggers the bulk page copy). Returns ``(dist, idx)`` of shape
    (B, Nq_pad, 1) with PAIR-LOCAL sorted page indices.

    ``packed`` means ``pages`` is the two-blocks-per-page layout
    (KDIndex.pages_packed, d <= 3): half the bulk copy bytes.
    ``ranges_rows`` (B, nqt, 128) carries the per-gate [jmin, jend) walk
    spans already computed by the prefix kernel (lane 2g / 2g+1); when
    omitted they are rebuilt here in XLA from the submask."""
    b, nq_pad, f = q.shape
    nq_tiles = nq_pad // tile_q
    nc = hot.shape[2]
    n_pages = pages.shape[1]
    assert n_pages == ((nc + 1) // 2 if packed else nc), (n_pages, nc)
    nc_pad = ((nc + 127) // 128) * 128

    bound_val = float(
        np.float32(max_distance) * np.float32(1.0 + 1e-6) + np.float32(1e-30)
    )
    quant_scale = float((1 << _LBQ_BITS) / bound_val)
    # The resident kernel reads ONLY the mask row (row 1) of each code
    # page — no hot/cold tag codes (the bitmap kernel's walk needs those;
    # this kernel's gating is the per-gate lists + submask bits).
    rows = jnp.stack(
        [jnp.zeros_like(submask, jnp.int32), submask.astype(jnp.int32)],
        axis=2,
    )
    code8 = jnp.pad(
        rows, ((0, 0), (0, 0), (0, 6), (0, nc_pad - nc))
    ).reshape(b * nq_tiles, 8, nc_pad)

    # PER-GATE membership spans: gate g's scalar walk only scans blocks
    # some query of ITS OWN gate_width rows needs (derived from the
    # per-subgroup mask bits), not the whole tile's span — Morton-coherent
    # gates have much tighter tree-order spans than their tile (the walk
    # was 0.23 ms/pair of the k=1 kernel with tile-wide spans,
    # scripts/evidence/approx_arm_log.txt).
    n_gate = tile_q // gate_width
    if ranges_rows is not None:
        ranges = ranges_rows[:, :, : 2 * n_gate].reshape(
            2 * b * nq_tiles * n_gate
        )
    else:
        r_bits = gate_width // SG_WIDTH
        r_mask = (1 << r_bits) - 1
        sm = submask.astype(jnp.int32)
        gate_member = jnp.stack(
            [((sm >> (g * r_bits)) & r_mask) != 0 for g in range(n_gate)],
            axis=2,
        )                                          # (B, nqt, n_gate, nc)
        iota = jnp.arange(nc, dtype=jnp.int32)
        jmin = jnp.min(jnp.where(gate_member, iota, nc), axis=3)
        jend = jnp.max(jnp.where(gate_member, iota + 1, 0), axis=3)
        ranges = jnp.stack(
            [jmin, jnp.maximum(jend, jmin)], axis=-1
        ).reshape(2 * b * nq_tiles * n_gate)

    kernel = _make_resident_kernel(
        tile_t, nc, nq_tiles, n_features, quant_scale, tile_q, gate_width,
        probe, packed=packed, pixel_window=pixel_window,
        restrict_col=restrict_col, transform_pose=pose is not None,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nq_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # code bitmap
            pl.BlockSpec(memory_space=pltpu.HBM),   # target pages
            pl.BlockSpec(
                (tile_q, FEATURE_PAD),
                lambda b_, i, *_: (b_ * nq_tiles + i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_q, 1),
                lambda b_, i, *_: (b_ * nq_tiles + i, 0),
                memory_space=pltpu.VMEM,
            ),
        ] + ([
            # One (8, 128) tile per pair (Mosaic block shapes must tile
            # (8, 128)); the 16 pose entries live in row 0, lanes 0-15.
            pl.BlockSpec(
                (8, 128),
                lambda b_, i, *_: (b_, 0),
                memory_space=pltpu.VMEM,
            ),
        ] if pose is not None else []),
        out_specs=[
            pl.BlockSpec(
                (tile_q, 1),
                lambda b_, i, *_: (b_ * nq_tiles + i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_q, 1),
                lambda b_, i, *_: (b_ * nq_tiles + i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.SMEM((2, 8, nc_pad), jnp.int32),
            pltpu.SMEM(
                (
                    max((2 if packed else 1) * (tile_q // gate_width), 2),
                    nc_pad,
                ),
                jnp.int32,
            ),
            pltpu.VMEM((n_pages * 8, tile_t), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    dist, idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b * nq_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((b * nq_pad, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        ranges,
        code8,
        pages.reshape(b * n_pages * 8, tile_t),
        q.reshape(b * nq_pad, f),
        binit.reshape(b * nq_pad, 1),
        *(() if pose is None else (
            jnp.zeros((b, 8, 128), jnp.float32)
            .at[:, 0, :16].set(pose.reshape(b, 16))
            .reshape(b * 8, 128),
        )),
    )
    return dist.reshape(b, nq_pad, 1), idx.reshape(b, nq_pad, 1)


@functools.lru_cache(maxsize=None)
def _resident_search_fn(
    tile_q: int, tile_t: int, n_features: int,
    max_distance: float, gate_width: int, interpret: bool,
    packed: bool = False, has_ranges: bool = False, pixel_window=None,
    restrict_col=None, has_pose: bool = False,
):
    """Build (and cache) the custom-vmap resident searcher (same batching
    design as :func:`_bitmap_search_fn`: the pair axis joins the kernel
    grid in one launch). ``has_ranges`` adds the prefix-computed per-gate
    walk-span operand."""
    kw = dict(
        tile_q=tile_q, tile_t=tile_t, n_features=n_features,
        gate_width=gate_width, interpret=interpret, packed=packed,
        pixel_window=pixel_window, restrict_col=restrict_col,
    )

    def search(q, binit, hot, cold, lb_tile, submask, pages, *extras):
        extras = list(extras)
        pose = extras.pop()[None] if has_pose else None
        rr = extras[0][None] if has_ranges else None
        dist, idx = _run_resident_kernel_flat(
            q[None], binit[None], hot[None], cold[None], lb_tile[None],
            submask[None], pages[None], max_distance, ranges_rows=rr,
            pose=pose, **kw
        )
        return dist[0], idx[0]

    search_vm = jax.custom_batching.custom_vmap(search)

    @search_vm.def_vmap
    def _rule(axis_size, in_batched, *args):
        flat = [
            x if b else jnp.broadcast_to(x, (axis_size,) + x.shape)
            for x, b in zip(args, in_batched)
        ]
        pose = flat.pop() if has_pose else None
        if has_ranges:
            *flat, rr = flat
        else:
            rr = None
        out = _run_resident_kernel_flat(
            *flat, max_distance, ranges_rows=rr, pose=pose, **kw
        )
        return out, (True, True)

    return search_vm


def _run_resident_kernel(
    q, binit, hot, cold, lb_tile, submask, pages, max_distance,
    *, tile_q, tile_t, n_features, interpret, gate_width=None,
    packed=False, ranges_rows=None, pixel_window=None, restrict_col=None,
    pose=None,
):
    """Resident-pages search over one pair (batches via the custom vmap
    rule: the pair axis joins the kernel grid). ``pages`` must be the
    packed two-blocks-per-page table when ``packed`` is set;
    ``ranges_rows`` (nqt, 128) carries prefix-computed per-gate walk
    spans (see _run_resident_kernel_flat)."""
    fn = _resident_search_fn(
        tile_q, tile_t, n_features, float(max_distance),
        RESIDENT_GATE_WIDTH if gate_width is None else gate_width,
        interpret, packed, ranges_rows is not None, pixel_window,
        restrict_col, pose is not None,
    )
    args = (q, binit, hot, cold, lb_tile, submask, pages)
    if ranges_rows is not None:
        args = args + (ranges_rows,)
    if pose is not None:
        args = args + (pose,)
    return fn(*args)


def nn_search_pruned_xla(
    queries: jax.Array,
    index: TargetIndex,
    max_distance: float | jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Portable equivalent of :func:`nn_search_pruned` (no pruning, same
    result contract) for CPU test meshes."""
    idx, d2 = nn_search_xla(_pad_features(queries), index.points)
    over = d2 > jnp.float32(max_distance)
    orig = index.perm[idx]
    bound = jnp.float32(max_distance) * (1.0 + 1e-6) + 1e-30
    return (
        jnp.where(over, -1, orig),
        jnp.where(over, bound, d2),
    )


def match_indexed(
    queries: jax.Array,
    index: TargetIndex,
    max_distance: float | jax.Array,
    query_mask: jax.Array | None = None,
    *,
    interpret: bool = False,
    impl: str | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Matching stage against a prebuilt index: 1-NN + squared threshold.

    ``impl`` forces a backend: ``"v2"`` (the production visited-list Pallas
    kernel; pair with ``interpret=True`` off-TPU) or ``"xla"`` (portable
    oracle). Default dispatches on the runtime backend.
    """
    if impl is None:
        impl = "v2" if jax.default_backend() in ("tpu", "axon") else "xla"
    if impl == "v2":
        tile_t = index.points_t3.shape[2]
        idx, d2 = nn_search_pruned_v2(
            queries, index, max_distance, interpret=interpret, tile_t=tile_t
        )
    else:
        idx, d2 = nn_search_pruned_xla(queries, index, max_distance)
    valid = (d2 <= max_distance) & (idx >= 0)
    if query_mask is not None:
        valid = valid & query_mask
    return idx, d2, valid


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def knn_k(
    queries: jax.Array, targets: jax.Array, k: int, *, chunk: int = 1024
) -> tuple[jax.Array, jax.Array]:
    """Exact k-NN (small k) via chunked distance tiles + top_k.

    Used by the PCL-style normal estimation (k=5, PointCloud.h:53) — runs
    once per cloud at load time, so the dense chunked form is fine on every
    backend. Returns ``(indices (N,k), dist2 (N,k))`` sorted ascending.
    """
    n = queries.shape[0]
    qp = _pad_rows(queries, chunk, 0.0)
    t_norm2 = jnp.sum(targets * targets, axis=1)

    def one_chunk(q):
        g = jnp.dot(q, targets.T, precision=jax.lax.Precision.HIGHEST)
        d2 = jnp.sum(q * q, axis=1, keepdims=True) + t_norm2[None, :] - 2.0 * g
        neg, idx = jax.lax.top_k(-d2, k)
        return idx.astype(jnp.int32), -neg

    num_chunks = qp.shape[0] // chunk
    idx, d2 = jax.lax.map(one_chunk, qp.reshape(num_chunks, chunk, -1))
    return idx.reshape(-1, k)[:n], d2.reshape(-1, k)[:n]


def nn_search(
    queries: jax.Array, targets: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Backend-dispatching 1-NN: Pallas on TPU, XLA elsewhere."""
    if jax.default_backend() in ("tpu", "axon"):
        return nn_search_pallas(queries, targets)
    return nn_search_xla(queries, targets)


def match(
    queries: jax.Array,
    targets: jax.Array,
    max_distance: float | jax.Array,
    query_mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Full matching stage: 1-NN + squared-distance threshold.

    Returns ``(indices, dist2, valid)``. The threshold compares SQUARED
    distance against ``max_distance`` exactly like the FLANN path
    (NearestNeighbor.h:182 — the reference stores the already-squared bound,
    ICPOptimizer.h:154).
    """
    idx, d2 = nn_search(queries, targets)
    valid = d2 <= max_distance
    if query_mask is not None:
        valid = valid & query_mask
    return idx, d2, valid
