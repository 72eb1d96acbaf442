"""Per-query exact 1-NN over a balanced k-d partition — the 'v3' matcher.

TPU-native successor to the Morton-tile visited-list kernel for the FLANN
kd-tree replacement (NearestNeighbor.h:104-314). The tile kernel computes
every query tile against every target tile ANY of its 128 queries needs;
measured against the per-query information floor that is ~95% wasted work
(386M candidate distances/iter at ETH scale vs a ~20M floor). This module
restores per-query granularity the TPU way:

* The target cloud is partitioned ONCE per pair on the HOST by recursive
  axis-median splits (``build_kd_index``) — equal-count blocks whose
  axis-aligned boxes are DISJOINT by construction. (Morton equal-count
  tiles have heavily overlapping AABBs, which makes per-query residual
  bounds useless — measured 64% exactness-fallback rate vs ~0% here.
  Host-side build matches the repo's load-time Morton ordering convention:
  device sorts compile pathologically in this environment.)
* Per iteration, each query ranks the block boxes by squared lower bound
  with K argmin-extraction rounds (pure VPU ``argmin`` + masking — no
  sort, no top_k), then gathers the K winners' point blocks and takes
  exact direct-difference f32 distances over every candidate.
* Exactness certificate: the (K+1)-th extraction minimum is the smallest
  lower bound of any UNEXAMINED block. A query whose best found distance
  does not beat that residual raises ``fail`` and is re-searched by the
  caller's fallback (the visited-list kernel in per-query-bound mode —
  ``knn.nn_search_pruned_v2``). Failures are data-dependent and
  empirically ~0% at K=4.

Layout notes (they ARE the design): TPU XLA gathers are row-issue-bound,
so candidates move as ONE contiguous row per (query, block) —
``block_pts`` rows hold a whole block's points coordinate-major
([x...x, y...y, z...z]), letting the distance accumulation slice
lane-major (N, K, cap) views with zero relayouts. Per-coordinate (N, M)
broadcasting everywhere; a fused (N, M, 3) broadcast pads the minor dim
to the 128-lane tile and was measured 10x slower.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Sentinel for padded block slots: finite in f32, squared distance ~1e18
# still finite, never the argmin for any real query.
LEAF_PAD = 1.0e9
# Default extraction width (scripts/knn_v3_proto.py: ~0% fallback at 4
# with far narrower candidate sets; one block is ~512-1024 points).
K_DEFAULT = 4
# Points per block at full occupancy. The round-5 hardware sweep
# (scripts/evidence/block_target_probe.txt) moved this 768 -> 3072: the
# resident kernel's cost is dominated by per-(gate, block) region count,
# not lane width, so FEWER/WIDER blocks win on every config and both
# arms (ETH checks=16: 21.7 -> 28.1 pairs/s; ETH exact 13.4 -> 17.4;
# indoor 23.8 -> 31.2; color exact 0.51 -> 0.71 f/s). 12288+ collapses
# (lane compute dominates); 384/192 lose monotonically (region
# overhead). The approximate 6-dim COLOR matcher peaks NARROWER (1536):
# the honest re-sweep after the seeding match-loss artifact was fixed
# measured record-mode 1.99 f/s at 1536 vs 1.12 at 6144 (t_err 0.69 vs
# 0.86 mm) — the mid-round "6144 wins color" readings rode the
# collapsed match set.
BLOCK_TARGET = 3072
BLOCK_TARGET_COLOR_APPROX = 1536


def default_block_target(color: bool, approx: bool) -> int:
    """The measured-winner block size for a matching configuration (see
    BLOCK_TARGET's comment; the approximate 6-dim color matcher peaks
    narrower than geometry)."""
    return BLOCK_TARGET_COLOR_APPROX if (color and approx) else BLOCK_TARGET
# Query-tile width of the bitmap-kernel search paths (sweepable like
# K_DEFAULT; resolved at trace time by the non-jitted wrappers).
TILE_Q_DEFAULT = 128


class KDIndex(NamedTuple):
    """Balanced k-d partition of one target cloud (device arrays).

    Blocks are equal-count (+-1 per split) with disjoint boxes. All shapes
    depend only on the cloud CAPACITY, so one executable serves a whole
    equal-capacity sweep. ``pages``/``page_orig`` carry the same points in
    the visited-list kernel's page layout (knn._run_visited_kernel) for
    the union matcher — one block = one kernel tile.
    """

    block_pts: jax.Array    # (C, D*cap) f32 coordinate-major rows,
                            # LEAF_PAD in padded slots
    block_orig: jax.Array   # (C, cap) int32 original row ids, -1 padding
    block_min: jax.Array    # (C, D) box mins (+inf for empty blocks)
    block_max: jax.Array    # (C, D) box maxs (-inf for empty blocks)
    pages: jax.Array        # (C, 8, cap_pad) kernel pages, feature-major
    page_orig: jax.Array    # (C*cap_pad,) original row ids, -1 padding
    # PACKED page table for the resident kernel (d <= 3 only, else None):
    # two blocks per 8-row page — rows 0-2 hold block 2m's coords, rows
    # 3-5 block 2m+1's. Halves the per-iteration bulk VMEM copy (the
    # legacy layout wastes 5 of 8 rows at d=3) and doubles the
    # resident-eligible cloud size.
    pages_packed: jax.Array | None = None


def kd_depth_for(capacity: int, block_target: int = BLOCK_TARGET) -> int:
    """Split depth so blocks hold ~block_target points at full occupancy."""
    depth = 1
    while (capacity >> depth) > block_target:
        depth += 1
    return depth


def kd_partition_np(points: np.ndarray, depth: int):
    """Host-side recursive widest-axis median partition.

    Returns ``(perm, blocks)``: ``points[perm]`` is block-grouped and
    ``blocks`` lists each block's ``(start, count)`` into ``perm`` in tree
    order — exact floor/ceil halves at every split (argpartition), so
    block sizes differ by at most 1 per level (0 allowed when n < 2^depth).
    """
    n = len(points)
    perm = np.arange(n)
    nodes = [(0, n)]
    for _ in range(depth):
        nxt = []
        for s, c in nodes:
            h = c // 2
            if c > 1:
                seg = perm[s:s + c]
                p = points[seg]
                ax = int(np.argmax(p.max(0) - p.min(0)))
                seg = seg[np.argpartition(p[:, ax], h)]
                perm[s:s + c] = seg
            nxt.append((s, h))
            nxt.append((s + h, c - h))
        nodes = nxt
    return perm, nodes


def build_kd_index(
    points: np.ndarray,
    valid: np.ndarray | None = None,
    *,
    block_target: int = BLOCK_TARGET,
    capacity: int | None = None,
) -> KDIndex:
    """Build the k-d search index on the host (numpy) for one target cloud.

    ``points`` is the (capacity, D) PADDED cloud array; ``valid`` masks the
    real rows (defaults to finite-coordinate rows). All output shapes are
    functions of ``capacity`` alone, so equal-capacity clouds share one
    executable. The reference analog is the one-time FLANN buildIndex
    (NearestNeighbor.h:122-141); D may be 3 (geometry) or 6 (color-ICP
    features), matching FLANN's 3- and 6-dim trees.
    """
    points = np.asarray(points, np.float32)
    if capacity is None:
        capacity = len(points)
    if valid is None:
        valid = np.abs(points[:, :3]).max(axis=1) < 1.0e5
    rows = np.flatnonzero(valid)
    depth = kd_depth_for(capacity, block_target)
    n_blocks = 1 << depth
    cap = -(-capacity // n_blocks)  # ceil: static upper bound on block size
    d = points.shape[1]

    # Native (multi-core) partition when available; the numpy fallback is
    # GIL-bound per node (~0.3 s at ETH scale — it would bottleneck a
    # sweep against the >12 pairs/s device throughput). Geometry only:
    # 6-dim color features split on their widest axis in the fallback, so
    # keep exact numpy semantics there.
    native_result = None
    if d == 3:
        from icp_variants_tpu.runtime import native as _native

        native_result = _native.kd_partition(points[rows], depth)
    if native_result is not None:
        perm, blocks = native_result
    else:
        perm, blocks = kd_partition_np(points[rows], depth)
    pts = np.full((n_blocks, cap, d), LEAF_PAD, np.float32)
    block_orig = np.full((n_blocks, cap), -1, np.int32)
    block_min = np.full((n_blocks, d), np.inf, np.float32)
    block_max = np.full((n_blocks, d), -np.inf, np.float32)
    for i, (s, c) in enumerate(blocks):
        if c == 0:
            continue
        sel = rows[perm[s:s + c]]
        pts[i, :c] = points[sel]
        block_orig[i, :c] = sel
        block_min[i] = pts[i, :c].min(0)
        block_max[i] = pts[i, :c].max(0)
    # Coordinate-major rows: [x_0..x_cap, y_0..y_cap, z_0..z_cap, ...]
    block_pts = np.ascontiguousarray(
        pts.transpose(0, 2, 1).reshape(n_blocks, d * cap))
    # Kernel pages: one block per visited-list-kernel tile, 8 feature rows
    # (coords then zeros), lane dim padded to the 128 multiple.
    cap_pad = ((cap + 127) // 128) * 128
    pages = np.zeros((n_blocks, 8, cap_pad), np.float32)
    pages[:, :d, :] = LEAF_PAD
    pages[:, :d, :cap] = pts.transpose(0, 2, 1)
    page_orig = np.full((n_blocks, cap_pad), -1, np.int32)
    page_orig[:, :cap] = block_orig
    pages_packed = None
    if d <= 3:
        # Two blocks per 8-row page for the resident kernel (see KDIndex).
        n_pages = (n_blocks + 1) // 2
        pk = np.zeros((n_pages, 8, cap_pad), np.float32)
        pk[:, 0:3, :] = LEAF_PAD
        pk[:, 3:6, :] = LEAF_PAD
        coords = pts.transpose(0, 2, 1)            # (nc, d, cap)
        pk[:, 0:d, :cap] = coords[0::2]
        n_odd = n_blocks // 2
        pk[:n_odd, 3:3 + d, :cap] = coords[1::2]
        pages_packed = jnp.asarray(pk)
    return KDIndex(
        block_pts=jnp.asarray(block_pts),
        block_orig=jnp.asarray(block_orig),
        block_min=jnp.asarray(block_min),
        block_max=jnp.asarray(block_max),
        pages=jnp.asarray(pages),
        page_orig=jnp.asarray(page_orig.reshape(-1)),
        pages_packed=pages_packed,
    )


def _resident_layout(index: KDIndex):
    """Resolve the resident kernel's page table for this index:
    ``(pages, packed, fits)``.

    The one-block-per-page layout is preferred when it fits — the halved
    bulk copy of the packed layout measured slightly SLOWER end-to-end
    (17.09 vs 17.79 pairs/s at checks=16: the copy rides near peak
    bandwidth and is not the kernel's fixed cost; the split even/odd
    walk+compute loops add overhead — scripts/evidence/approx_arm_log.txt).
    The packed two-blocks-per-page table (d <= 3) instead serves clouds
    whose full table EXCEEDS the VMEM budget: it doubles the
    resident-eligible capacity (~365k -> ~730k points) before falling
    back to the streaming bitmap kernel."""
    from icp_variants_tpu.ops import knn

    nc, _, tile_t = index.pages.shape
    d = index.block_min.shape[1]
    if knn.resident_fits(nc, tile_t):
        return index.pages, False, True
    if index.pages_packed is not None and knn.resident_fits(nc, tile_t, d=d):
        return index.pages_packed, True, True
    return index.pages, False, False


def _to_sorted_domain(index: KDIndex, orig_idx: jax.Array) -> jax.Array:
    """Translate original-row indices into the sorted page domain
    (-1 passes through)."""
    inv = _orig_to_sorted(index)
    return jnp.where(
        orig_idx >= 0,
        inv[jnp.clip(orig_idx, 0, inv.shape[0] - 1)],
        -1,
    )


def _orig_to_sorted(index: KDIndex) -> jax.Array:
    """Inverse of ``page_orig``: original target row -> sorted page
    position (block * cap_pad + slot). Rows absent from the index map to
    -1 is not needed — every valid row appears exactly once; unused slots
    simply never get written. Sized nc*cap (>= capacity) so it is static.
    """
    nc, cap = index.block_orig.shape
    size = nc * cap
    po = index.page_orig
    pos = jnp.arange(po.shape[0], dtype=jnp.int32)
    tgt = jnp.where(po >= 0, po, size)        # pad slots drop
    return jnp.zeros((size,), jnp.int32).at[tgt].set(pos, mode="drop")


def checks_to_k(checks: int, index: KDIndex) -> int:
    """Map a FLANN-style ``checks`` budget (candidate POINTS per query) to
    the top-k block cap of the kd searches: enough whole blocks to cover
    the budget, at least 1, at most the block count. The block capacity is
    the static ceil(capacity / n_blocks) slot count — the per-query
    candidate budget is therefore an upper bound, like FLANN's (a check
    counts a visited leaf whether or not it improves the result)."""
    nc = index.block_orig.shape[0]
    cap = index.block_orig.shape[1]
    return max(1, min(-(-int(checks) // cap), nc))


def stack_kd_indexes(indexes) -> KDIndex:
    """Stack equal-shape KDIndexes along a new leading batch axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *indexes)


# NOTE: a host-side "block-aligned query enumeration" (re-ordering source
# rows by nearest target kd block so each query tile clusters on fewer
# blocks) lived here through rounds 2-3. It LOST on hardware in every
# matcher configuration — warm 9.2 vs 12.7 pairs/s (it scatters the
# per-granule warm radii), union 7.7 vs 11.5 — and was deleted; the
# measurement evidence is scripts/evidence/warm_ab_sweep_log.txt and
# scripts/evidence/warm_ab_sweep2_log.txt.


@jax.custom_batching.custom_vmap
def _gather_rows(table: jax.Array, ids: jax.Array) -> jax.Array:
    """``table[ids]``: (R, W) x (N, K) -> (N, K, W) contiguous-row gather.

    The custom batch rule keeps the gather FLAT under ``vmap`` (one global
    row id space with per-pair offsets) instead of XLA's batch_dims=1
    lowering, which costs ~35% more on TPU at bench shapes
    (scripts/evidence/kd_batch_probe_log.txt: 33.8 vs 25.0 ms over 16 pairs).
    """
    return table[ids]


@_gather_rows.def_vmap
def _gather_rows_vmap(axis_size, in_batched, table, ids):
    t_b, i_b = in_batched
    if not i_b:
        ids = jnp.broadcast_to(ids, (axis_size,) + ids.shape)
    if t_b:
        rows = table.shape[1]
        flat = table.reshape(axis_size * rows, table.shape[2])
        offs = (jnp.arange(axis_size, dtype=ids.dtype) * rows).reshape(
            (axis_size,) + (1,) * (ids.ndim - 1)
        )
        out = flat[ids + offs]
    else:
        out = table[ids]
    return out, True


def _box_lb(q: jax.Array, bmin: jax.Array, bmax: jax.Array) -> jax.Array:
    """Squared distance lower bound from each query to each box.

    (N, D) x (M, D) -> (N, M), coordinate-at-a-time (see module docstring).
    Boxes are built from the same f32 coordinates the exact distances use,
    so the bound is honest to within one rounding step — absorbed by the
    fail margin in nn_search_kd.
    """
    d = q.shape[1]
    lb = None
    for j in range(d):
        gap = jnp.maximum(
            jnp.maximum(bmin[None, :, j] - q[:, j:j + 1],
                        q[:, j:j + 1] - bmax[None, :, j]),
            0.0,
        )
        lb = gap * gap if lb is None else lb + gap * gap
    return lb


def _extract_min(w: jax.Array, k: int):
    """k argmin-extraction rounds over axis 1 (no sort / top_k: device
    sorts are a compile hazard here and k is tiny). Returns the selected
    column ids (N, k) and the residual minimum after extraction (N,)."""
    m = w.shape[1]
    iota = jnp.arange(m, dtype=jnp.int32)[None, :]
    picks = []
    for _ in range(k):
        a = jnp.argmin(w, axis=1).astype(jnp.int32)
        picks.append(a)
        w = jnp.where(iota == a[:, None], jnp.inf, w)
    return jnp.stack(picks, axis=1), jnp.min(w, axis=1)


@functools.partial(jax.jit, static_argnames=("k",))
def nn_search_kd(
    queries: jax.Array,
    index: KDIndex,
    max_distance: float | jax.Array,
    *,
    k: int | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Exact-unless-flagged 1-NN: returns ``(orig_idx, dist2, fail)``.

    ``fail[i]`` set means query i's certificate did not close (an
    unexamined block could be closer than the best found) and the caller
    must re-search it; for ``~fail`` rows the result is exact within
    ``max_distance`` (over-threshold rows report idx -1, dist2 just above
    the bound, matching nn_search_pruned_xla's contract).
    """
    nc, dcap = index.block_pts.shape
    d = index.block_min.shape[1]
    cap = dcap // d
    k = min(K_DEFAULT if k is None else k, nc)
    q = queries[:, :d]
    n = q.shape[0]

    sel, resid = _extract_min(_box_lb(q, index.block_min, index.block_max), k)

    # One contiguous row per (query, winning block); distances accumulate
    # on lane-major (N, k, cap) slices of the coordinate-major rows.
    cand = _gather_rows(index.block_pts, sel)        # (N, k, D*cap)
    d2 = None
    for j in range(d):
        diff = cand[:, :, j * cap:(j + 1) * cap] - q[:, j, None, None]
        d2 = diff * diff if d2 is None else d2 + diff * diff
    per_blk = jnp.min(d2, axis=2)                    # (N, k)
    blk_pos = jnp.argmin(per_blk, axis=1)            # (N,)
    d2s = jnp.min(per_blk, axis=1)
    best_blk = jnp.take_along_axis(sel, blk_pos[:, None], axis=1)[:, 0]
    slot = jnp.argmin(
        jnp.take_along_axis(d2, blk_pos[:, None, None], axis=1)[:, 0, :],
        axis=1,
    )
    orig = index.block_orig[best_blk, slot]

    bound = jnp.float32(max_distance)
    # Certificate with one-ulp slack: unexamined boxes must be strictly
    # farther than both the found minimum and the threshold.
    fail = resid <= jnp.minimum(d2s, bound) * (1.0 + 1e-6)

    over = d2s > bound
    out_bound = bound * (1.0 + 1e-6) + 1e-30
    return (
        jnp.where(over, -1, orig),
        jnp.where(over, out_bound, d2s),
        fail,
    )


@functools.partial(
    jax.jit, static_argnames=("k", "tile_q", "chunk", "interpret")
)
def nn_search_kd_union(
    queries: jax.Array,
    index: KDIndex,
    max_distance: float | jax.Array,
    *,
    k: int | None = None,
    tile_q: int = 128,
    chunk: int = 4,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Exact-unless-flagged 1-NN via the visited-list kernel over the
    UNION of each query tile's per-query top-k blocks.

    Same ``(orig_idx, dist2, fail)`` contract as :func:`nn_search_kd`, but
    instead of gathering each query's k winning blocks separately (bytes
    duplicated per query), the 128 queries of a tile share one streamed
    evaluation of their union (~57 blocks/tile at bench shapes vs 512
    gathered rows) — per-query candidate tightness at per-tile bandwidth.
    Exactness: the kernel evaluates a superset of each query's top-k except
    blocks provably beyond its running best (suffix prune), so the
    (k+1)-th-extraction certificate from the ranking stage transfers
    unchanged; failed queries re-search via the caller's fallback.
    """
    from icp_variants_tpu.ops import knn

    nc = index.pages.shape[0]
    d = index.block_min.shape[1]
    k = min(K_DEFAULT if k is None else k, nc)
    nq = queries.shape[0]
    q = knn._pad_rows(knn._pad_features(queries[:, :d]), tile_q, 0.0)
    if q.shape[0] != nq:
        # Anchor-pin the tile-multiple padding to the first real query:
        # origin-pinned pad rows would drag blocks near (0,0,0) into the
        # last tile's member union and hold its frozen running-best bound
        # at the threshold (their result rows are discarded either way).
        pad_rows = (jnp.arange(q.shape[0]) >= nq)[:, None]
        q = jnp.where(pad_rows, q[0][None, :], q)
    nqt = q.shape[0] // tile_q

    lb = _box_lb(q[:, :d], index.block_min, index.block_max)  # (Nq_pad, nc)
    sel, resid = _extract_min(lb, k)                          # (Nq_pad, k)

    rows = (jnp.arange(q.shape[0], dtype=jnp.int32) // tile_q)[:, None]
    member = jnp.zeros((nqt, nc), bool)
    member = member.at[
        jnp.broadcast_to(rows, sel.shape).reshape(-1), sel.reshape(-1)
    ].set(True)
    lb_tile = jnp.min(lb.reshape(nqt, tile_q, nc), axis=1)

    bound_val = jnp.float32(max_distance) * (1.0 + 1e-6) + 1e-30
    vlist, suffix, counts, counts0 = knn._visit_lists_from(
        lb_tile, member, jnp.broadcast_to(bound_val, (nqt, 1))
    )
    binit = jnp.full((q.shape[0],), bound_val, jnp.float32)
    dist, idx = knn._run_visited_kernel(
        q, binit, vlist, suffix, counts, counts0, index.pages,
        tile_q=tile_q, tile_t=index.pages.shape[2], chunk=chunk,
        n_features=d, interpret=interpret,
    )
    sorted_idx = idx[:nq, 0]
    d2 = dist[:nq, 0]
    orig = index.page_orig[
        jnp.clip(sorted_idx, 0, index.page_orig.shape[0] - 1)
    ]
    out_idx = jnp.where(sorted_idx < 0, -1, orig)
    resid = resid[:nq]
    fail = resid <= jnp.minimum(d2, jnp.float32(max_distance)) * (1.0 + 1e-6)
    return out_idx, d2, fail


# Query tiles per prefix-kernel grid step: output rows must tile in
# (8, 128) sublane/lane units, so each step reduces 8 query tiles.
_PREFIX_GROUP = 8
# Compute-gating subgroup width of the bitmap kernel (knn.SG_WIDTH):
# per-subgroup membership bits ride the prefix's mask output so the
# search kernel can skip (subgroup, block) pairs no subgroup query needs.
_SG_WIDTH = 8


def _make_prefix_kernel(d: int, nc: int, tile_q: int, k: int, n_gate: int = 0):
    """Fused membership/ordering prefix for the bitmap search: per-query
    box lower bounds live only in VMEM (the (Nq, nc) lb matrix in HBM was
    ~half the XLA matcher's cost — scripts/evidence/warm_stage_log.txt), reduced in
    place to the per-tile quantities the bitmap kernel needs. Each grid
    step handles ``_PREFIX_GROUP`` query tiles so the output block is a
    legal (8, nc) page.

    With ``k > 0`` each query's membership is capped at its top-k blocks
    by lower bound (argmin-extraction rounds on the VPU — the union
    matcher's ranking, moved into VMEM), intersected with its radius;
    ``resid`` is the (k+1)-th extraction minimum — the certificate that
    no UNEXAMINED block can beat the found distance. With ``k == 0`` the
    membership is radius-complete and the certificate trivially holds
    (resid = +inf).

    ``mask_ref`` carries per-SUBGROUP membership: bit g of ``mask[s, c]``
    is set iff any query of tile s's g-th ``_SG_WIDTH``-row subgroup has
    block c in its hit set. The search kernel gates its distance compute
    per (subgroup, block) on these bits.

    The kernel iterates the group's tiles one at a time so every
    intermediate is (tile_q, nc) — a group-wide (gq, nc) lb matrix OOMed
    the 16 MB scoped VMEM at nc >= 1024 (the fine-block sweep), and the
    per-tile working set pipelines better at nc = 512 too. Subgroup bits
    are packed with integer shift + sum over an (n_sub, 8, nc) reshape —
    exact int32, no MXU rounding arguments needed."""

    n_sub = tile_q // _SG_WIDTH

    def kernel(
        q_ref, binit_ref, bmin_ref, bmax_ref,
        member_ref, hot_ref, lbtile_ref, resid_ref, mask_ref,
        *maybe_ranges_ref,
    ):
        for s in range(_PREFIX_GROUP):
            rows = slice(s * tile_q, (s + 1) * tile_q)
            lb = None
            for j in range(d):
                qj = q_ref[rows, j:j + 1]           # (tile_q, 1)
                gap = jnp.maximum(
                    jnp.maximum(
                        bmin_ref[j:j + 1, :] - qj, qj - bmax_ref[j:j + 1, :]
                    ),
                    0.0,
                )
                lb = gap * gap if lb is None else lb + gap * gap
            in_radius = (lb <= binit_ref[rows]).astype(jnp.float32)
            if k > 0:
                iota = jax.lax.broadcasted_iota(jnp.int32, lb.shape, 1)
                w = lb
                chosen = jnp.zeros_like(lb)
                for _ in range(k):
                    a = jnp.argmin(w, axis=1).astype(jnp.int32)
                    pick = (iota == a[:, None]).astype(jnp.float32)
                    chosen = jnp.maximum(chosen, pick)
                    w = jnp.where(pick > 0.0, jnp.inf, w)
                resid = jnp.min(w, axis=1, keepdims=True)   # (tile_q, 1)
                hit = chosen * in_radius
            else:
                resid = jnp.full_like(binit_ref[rows], jnp.inf)
                hit = in_radius
            resid_ref[rows] = resid
            # Hot = member blocks CONTAINING a live query (lb == 0): the
            # search kernel runs them first, after which every query's
            # running best is near-final.
            hot = jnp.where(lb <= 0.0, hit, 0.0)
            member_ref[s:s + 1, :] = jnp.max(hit, axis=0, keepdims=True)
            hot_ref[s:s + 1, :] = jnp.max(hot, axis=0, keepdims=True)
            lbtile_ref[s:s + 1, :] = jnp.min(lb, axis=0, keepdims=True)

            # Per-subgroup membership bits for tile s: bit g of
            # mask[s, c] = any hit in query rows [g*8, (g+1)*8).
            bits = jnp.max(
                hit.reshape(n_sub, _SG_WIDTH, nc), axis=1
            ).astype(jnp.int32)                         # (n_sub, nc) 0/1
            shifts = jax.lax.broadcasted_iota(jnp.int32, (n_sub, nc), 0)
            mask_ref[s:s + 1, :] = jnp.sum(
                jnp.left_shift(bits, shifts), axis=0, keepdims=True
            )

            if n_gate > 0:
                # Per-gate walk spans for the resident kernel, computed
                # here instead of an XLA shift/compare/reduce chain over
                # the HBM submask (the resident path's scalar-prefetch
                # ranges): lane 2g = jmin_g, lane 2g+1 = jend_g.
                r_sub = n_sub // n_gate
                iota_nc = jax.lax.broadcasted_iota(jnp.int32, (1, nc), 1)
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
                row = jnp.zeros((1, 128), jnp.int32)
                for g in range(n_gate):
                    gm = jnp.max(
                        bits[g * r_sub:(g + 1) * r_sub], axis=0,
                        keepdims=True,
                    )                                   # (1, nc) 0/1
                    jmin = jnp.min(jnp.where(gm > 0, iota_nc, nc))
                    jend = jnp.max(jnp.where(gm > 0, iota_nc + 1, 0))
                    jend = jnp.maximum(jend, jmin)
                    row = row + jmin * (lane == 2 * g).astype(
                        jnp.int32
                    ) + jend * (lane == 2 * g + 1).astype(jnp.int32)
                maybe_ranges_ref[0][s:s + 1, :] = row

    return kernel


def _radius_prefix(
    q, binit, index, *, tile_q: int, k: int, interpret: bool,
    n_gate: int = 0,
):
    """Per-query-exact membership (top-k-capped when ``k > 0``), hot
    subset, per-tile min lower bounds, per-query certificate residual,
    and per-subgroup membership bit masks — one fused VMEM pass per group
    of query tiles. ``q`` is row/feature padded to a
    ``_PREFIX_GROUP * tile_q`` multiple, ``binit`` the per-query radii
    (negative = frozen). Returns
    ``(member, hot, lb_tile, resid, mask, ranges)``; member/hot (nqt, nc)
    bool, lb_tile (nqt, nc) f32, resid (Nq_pad, 1), mask (nqt, nc) int32
    subgroup bits; ranges (nqt, 128) int32 per-gate [jmin, jend) lanes
    when ``n_gate > 0`` (the resident kernel's scalar-prefetch walk
    spans, computed in-kernel), else None."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nc = index.pages.shape[0]
    d = index.block_min.shape[1]
    nqt = q.shape[0] // tile_q
    f = q.shape[1]
    gq = _PREFIX_GROUP * tile_q
    # Boxes transposed feature-major so blocks ride the 128-lane axis.
    bmin_t = jnp.zeros((f, nc), jnp.float32).at[:d].set(index.block_min.T)
    bmax_t = jnp.zeros((f, nc), jnp.float32).at[:d].set(index.block_max.T)
    out_specs = [
        pl.BlockSpec((_PREFIX_GROUP, nc), lambda i: (i, 0)),
        pl.BlockSpec((_PREFIX_GROUP, nc), lambda i: (i, 0)),
        pl.BlockSpec((_PREFIX_GROUP, nc), lambda i: (i, 0)),
        pl.BlockSpec((gq, 1), lambda i: (i, 0)),
        pl.BlockSpec((_PREFIX_GROUP, nc), lambda i: (i, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((nqt, nc), jnp.float32),
        jax.ShapeDtypeStruct((nqt, nc), jnp.float32),
        jax.ShapeDtypeStruct((nqt, nc), jnp.float32),
        jax.ShapeDtypeStruct((q.shape[0], 1), jnp.float32),
        jax.ShapeDtypeStruct((nqt, nc), jnp.int32),
    ]
    if n_gate > 0:
        out_specs.append(pl.BlockSpec((_PREFIX_GROUP, 128), lambda i: (i, 0)))
        out_shape.append(jax.ShapeDtypeStruct((nqt, 128), jnp.int32))
    outs = pl.pallas_call(
        _make_prefix_kernel(d, nc, tile_q, k, n_gate),
        grid=(nqt // _PREFIX_GROUP,),
        in_specs=[
            pl.BlockSpec((gq, f), lambda i: (i, 0)),
            pl.BlockSpec((gq, 1), lambda i: (i, 0)),
            pl.BlockSpec((f, nc), lambda i: (0, 0)),
            pl.BlockSpec((f, nc), lambda i: (0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(q, binit[:, None], bmin_t, bmax_t)
    member, hot, lb_tile, resid, mask = outs[:5]
    ranges = outs[5] if n_gate > 0 else None
    return member > 0.0, hot > 0.0, lb_tile, resid, mask, ranges


def _make_cached_prefix_kernel(nc: int, tile_q: int, n_gate: int):
    """Membership prefix from CACHED block ids (the approximate arm's
    seeded-membership mode): each query's member set is exactly the one
    block carried in ``blk`` (-1 = none), so the per-query 6-dim box
    lower-bound ranking of :func:`_make_prefix_kernel` — ~6 ms/frame-iter
    at the dense color tracker's 307k queries
    (scripts/evidence/color_decomp_log.txt) — collapses to a one-hot
    compare. Emits the same per-subgroup mask words and per-gate
    [jmin, jend) walk spans the resident kernel consumes."""
    n_sub = tile_q // _SG_WIDTH

    def kernel(blk_ref, mask_ref, ranges_ref):
        for s in range(_PREFIX_GROUP):
            rows = slice(s * tile_q, (s + 1) * tile_q)
            blk = blk_ref[rows]                       # (tile_q, 1) int32
            iota_nc = jax.lax.broadcasted_iota(
                jnp.int32, (tile_q, nc), 1)
            hit = (iota_nc == blk).astype(jnp.int32)  # -1 rows: all-zero
            bits = jnp.max(hit.reshape(n_sub, _SG_WIDTH, nc), axis=1)
            shifts = jax.lax.broadcasted_iota(jnp.int32, (n_sub, nc), 0)
            mask_ref[s:s + 1, :] = jnp.sum(
                jnp.left_shift(bits, shifts), axis=0, keepdims=True
            )
            r_sub = n_sub // n_gate
            iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, nc), 1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            row = jnp.zeros((1, 128), jnp.int32)
            for g in range(n_gate):
                gm = jnp.max(
                    bits[g * r_sub:(g + 1) * r_sub], axis=0, keepdims=True)
                jmin = jnp.min(jnp.where(gm > 0, iota_c, nc))
                jend = jnp.maximum(
                    jnp.max(jnp.where(gm > 0, iota_c + 1, 0)), jmin)
                row = row + jmin * (lane == 2 * g).astype(jnp.int32) \
                    + jend * (lane == 2 * g + 1).astype(jnp.int32)
            ranges_ref[s:s + 1, :] = row

    return kernel


def _cached_prefix(blk, nc, *, tile_q: int, n_gate: int, interpret: bool):
    """Run the cached-membership prefix: ``blk`` is the (Nq_pad, 1) int32
    per-query block ids (-1 = no membership), padded to a
    ``_PREFIX_GROUP * tile_q`` multiple. Returns ``(submask, ranges)``."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nqt = blk.shape[0] // tile_q
    gq = _PREFIX_GROUP * tile_q
    return pl.pallas_call(
        _make_cached_prefix_kernel(nc, tile_q, n_gate),
        grid=(nqt // _PREFIX_GROUP,),
        in_specs=[pl.BlockSpec((gq, 1), lambda i: (i, 0))],
        out_specs=[
            pl.BlockSpec((_PREFIX_GROUP, nc), lambda i: (i, 0)),
            pl.BlockSpec((_PREFIX_GROUP, 128), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nqt, nc), jnp.int32),
            jax.ShapeDtypeStruct((nqt, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(blk)


@functools.partial(
    jax.jit,
    static_argnames=("max_distance", "tile_q", "gate_width", "interpret"),
)
def nn_search_kd_cached(
    queries: jax.Array,
    index: KDIndex,
    max_distance: float,
    blk_ids: jax.Array,
    *,
    tile_q: int | None = None,
    gate_width: int | None = None,
    interpret: bool = False,
    pose: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Approximate 1-NN with SEEDED membership: query i's candidate set is
    exactly block ``blk_ids[i]`` of the index (-1 = no search, idx -1).

    The approximate arm's cached-membership mode (ICPConfig.matching_checks
    with kd_seed_membership): instead of re-ranking blocks by box lower
    bound every iteration, each query carries the block of its previous
    match through the scan — valid within the FLANN-class approximation
    contract because the k=1-budget arm already accepts best-in-chosen-
    block results and inter-iteration pose deltas are tiny wherever this
    mode is enabled (dense SELECT_ALL fine pyramid levels). Returns
    ``(sorted_idx, d2)`` in the PAIR-LOCAL page domain; no certificate.
    Requires the resident layout (callers gate on _resident_layout).

    ``pose`` (4, 4): ``queries`` are RAW (untransformed) source features
    and the kernel applies ``R @ p + t`` to the spatial columns per gate
    — the caller's per-iteration (Nq, 8) transformed-table
    materialization (each (8,128)-lane-padded) disappears from the scan.
    """
    from icp_variants_tpu.ops import knn

    nc = index.pages.shape[0]
    d = index.block_min.shape[1]
    tile_q = TILE_Q_DEFAULT if tile_q is None else tile_q
    gw = knn.RESIDENT_GATE_WIDTH if gate_width is None else gate_width
    nq = queries.shape[0]
    q = knn._pad_rows(
        knn._pad_features(queries[:, :d]), _PREFIX_GROUP * tile_q, 0.0
    )
    bound_val = jnp.float32(max_distance) * (1.0 + 1e-6) + 1e-30
    binit = jnp.full((q.shape[0],), bound_val, jnp.float32)
    blk = jnp.pad(
        jnp.clip(blk_ids.astype(jnp.int32), -1, nc - 1),
        (0, q.shape[0] - nq), constant_values=-1,
    )[:, None]
    # Each query's own block id rides the last (free) feature column so
    # the kernel can mask gate-mates' blocks per row (restrict_col) —
    # block counts are far inside f32's exact-integer range.
    q = jnp.concatenate(
        [q[:, : knn.FEATURE_PAD - 1], blk.astype(jnp.float32)], axis=1
    )
    submask, ranges = _cached_prefix(
        blk, nc, tile_q=tile_q, n_gate=tile_q // gw, interpret=interpret)
    nqt = q.shape[0] // tile_q
    placeholder = jnp.zeros((nqt, nc), bool)
    dist, idx = knn._run_resident_kernel(
        q, binit, placeholder, placeholder, placeholder.astype(jnp.float32),
        submask, index.pages, float(max_distance),
        tile_q=tile_q, tile_t=index.pages.shape[2],
        n_features=d, interpret=interpret, gate_width=gate_width,
        packed=False, ranges_rows=ranges,
        restrict_col=knn.FEATURE_PAD - 1,
        pose=None if pose is None else pose.reshape(16),
    )
    return idx[:nq, 0], dist[:nq, 0]


def nn_search_kd_cached_oracle(
    queries: jax.Array,
    index: KDIndex,
    max_distance: float,
    blk_ids: jax.Array,
    pose: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Portable (XLA-only) oracle for :func:`nn_search_kd_cached`: exact
    best-in-assigned-block via one contiguous row gather — identical
    results, used on CPU and by the tests."""
    nc, dcap = index.block_pts.shape
    d = index.block_min.shape[1]
    cap = dcap // d
    cap_pad = index.pages.shape[2]
    if pose is not None:
        spatial = queries[:, :3] @ pose[:3, :3].T + pose[:3, 3]
        queries = jnp.concatenate([spatial, queries[:, 3:]], axis=1)
    blk = jnp.clip(blk_ids.astype(jnp.int32), -1, nc - 1)
    cand = _gather_rows(index.block_pts, jnp.maximum(blk, 0)[:, None])
    d2 = None
    for j in range(d):
        diff = cand[:, 0, j * cap:(j + 1) * cap] - queries[:, j:j + 1]
        d2 = diff * diff if d2 is None else d2 + diff * diff
    slot = jnp.argmin(d2, axis=1).astype(jnp.int32)
    best = jnp.min(d2, axis=1)
    bound_val = jnp.float32(max_distance) * (1.0 + 1e-6) + 1e-30
    # Same miss rule as the kernel (whose running best starts at
    # bound_val and only accepts strictly better): a best in the
    # (max_distance, bound_val) sliver returns its index with
    # valid=False downstream — NOT -1 — so the cache trajectory evolves
    # identically on both backends.
    miss = (blk < 0) | (best >= bound_val)
    sorted_idx = jnp.where(miss, -1, jnp.maximum(blk, 0) * cap_pad + slot)
    return sorted_idx, jnp.where(miss, bound_val, best)


def match_kd_cached(
    queries: jax.Array,
    index: KDIndex,
    max_distance: float,
    blk_ids: jax.Array,
    query_mask: jax.Array | None = None,
    *,
    interpret: bool = False,
    impl: str | None = None,
    gate_width: int | None = None,
    tile_q: int | None = None,
    pose: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Matching stage over SEEDED block membership (approximate arm only).
    Same ``(indices, dist2, valid)`` contract as :func:`match_kd` with
    ``orig_map=False`` — indices in the sorted page domain. Masked-out
    queries search nothing (their block id is forced to -1)."""
    if impl is None:
        impl = "v2" if jax.default_backend() in ("tpu", "axon") else "xla"
    blk = blk_ids
    if query_mask is not None:
        blk = jnp.where(query_mask, blk, -1)
    if impl == "v2":
        idx, d2 = nn_search_kd_cached(
            queries, index, float(max_distance), blk, interpret=interpret,
            gate_width=gate_width, tile_q=tile_q, pose=pose)
    else:
        idx, d2 = nn_search_kd_cached_oracle(
            queries, index, float(max_distance), blk, pose=pose)
    valid = (d2 <= max_distance) & (idx >= 0)
    if query_mask is not None:
        valid = valid & query_mask
    return idx, d2, valid


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_distance", "k", "tile_q", "chunk", "interpret", "impl",
        "gate_width", "orig_map",
    ),
)
def _kd_bitmap_search(
    queries: jax.Array,
    index: KDIndex,
    max_distance: float,
    radius: jax.Array,
    *,
    k: int,
    tile_q: int = 128,
    chunk: int = 4,
    interpret: bool = False,
    impl: str = "bitmap",
    gate_width: int | None = None,
    orig_map: bool = True,
):
    """Shared core of the bitmap-kernel searches: prefix (membership =
    per-query top-k by lb, intersected with the radius; k=0 = radius-
    complete) -> two-phase bitmap kernel -> original-row mapping.
    ``impl`` picks the search kernel: "bitmap" DMA-streams member blocks
    per tile, "resident" holds the pair's whole page table in VMEM
    (knn._make_resident_kernel; requires ``knn.resident_fits``).
    Returns ``(orig_idx, d2, resid)``."""
    from icp_variants_tpu.ops import knn

    d = index.block_min.shape[1]
    nq = queries.shape[0]
    q = knn._pad_rows(
        knn._pad_features(queries[:, :d]), _PREFIX_GROUP * tile_q, 0.0
    )

    bound_val = jnp.float32(max_distance) * (1.0 + 1e-6) + 1e-30
    binit = jnp.pad(
        jnp.minimum(jnp.asarray(radius, jnp.float32), bound_val),
        (0, q.shape[0] - nq),
        constant_values=-1.0,
    )
    if tile_q > 32 * _SG_WIDTH:
        raise ValueError(
            f"tile_q={tile_q}: the per-subgroup membership mask packs "
            f"tile_q/{_SG_WIDTH} bits into int32 words — 256 is the "
            "maximum (tile_q=512 measured silently dropping memberships)"
        )
    # gate_width=None takes knn.RESIDENT_GATE_WIDTH (32 — the measured
    # winner at every k once the per-gate walk spans landed; see the
    # constant's comment).
    if impl == "resident":
        gw = knn.RESIDENT_GATE_WIDTH if gate_width is None else gate_width
        n_gate = tile_q // gw
    else:
        n_gate = 0
    member, hot, lb_tile, resid, submask, ranges = _radius_prefix(
        q, binit, index, tile_q=tile_q, k=k, interpret=interpret,
        n_gate=n_gate,
    )
    # No XLA-side lb ordering: the list construction (two 512-lane
    # scatters + cummin per tile) cost ~half the matcher
    # (scripts/evidence/warm_stage_log.txt). The bitmap kernel compacts hot/cold
    # memberships on its scalar core, gates the distance compute per
    # (subgroup, block) on the prefix's membership bits, and prunes the
    # cold tail with per-subgroup frozen bounds read after the hot phase.
    if impl == "resident":
        pages, packed, _fits = _resident_layout(index)
        dist, idx = knn._run_resident_kernel(
            q, binit, hot, member & ~hot, lb_tile, submask, pages,
            float(max_distance),
            tile_q=tile_q, tile_t=index.pages.shape[2],
            n_features=d, interpret=interpret, gate_width=gate_width,
            packed=packed, ranges_rows=ranges,
        )
    else:
        dist, idx = knn._run_bitmap_kernel(
            q, binit, hot, member & ~hot, lb_tile, submask, index.pages,
            float(max_distance),
            tile_q=tile_q, tile_t=index.pages.shape[2], chunk=chunk,
            n_features=d, interpret=interpret,
        )
    sorted_idx = idx[:nq, 0]
    d2 = dist[:nq, 0]
    if not orig_map:
        # SORTED (pair-local page) index domain: the caller gathers from a
        # page-ordered table, folding the page_orig row gather away
        # (gather composition — one row gather instead of two per match).
        return sorted_idx, d2, resid[:nq, 0]
    orig = index.page_orig[
        jnp.clip(sorted_idx, 0, index.page_orig.shape[0] - 1)
    ]
    return jnp.where(sorted_idx < 0, -1, orig), d2, resid[:nq, 0]


@functools.partial(
    jax.jit,
    static_argnames=("max_distance", "tile_q", "chunk", "interpret"),
)
def nn_search_kd_radius(
    queries: jax.Array,
    index: KDIndex,
    max_distance: float,
    radius: jax.Array,
    *,
    tile_q: int = 128,
    chunk: int = 4,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Exact 1-NN within per-query radii — the uncapped warm-start mode.

    ``radius[i]`` is an UPPER bound on query i's squared NN distance (e.g.
    the exact distance to its previous iteration's match — a real target
    point, hence a valid bound); a NEGATIVE radius freezes the query out
    (idx -1). Block membership is per-query radius-complete: block B is
    visited iff ANY query in the tile has ``lb(q, B) <= radius_q`` — exact
    because a block whose lower bound exceeds an upper bound on the NN
    distance cannot contain the NN (same one-rounding-step slack argument
    as the radius mode of ``knn.nn_search_pruned_v2``; no certificate or
    fallback needed). Returns ``(orig_idx, d2)``; queries where nothing
    beats their radius return idx -1 with d2 equal to the initial bound —
    the caller backstops those with the cached match.
    """
    from icp_variants_tpu.ops import knn

    impl = "resident" if _resident_layout(index)[2] else "bitmap"
    idx, d2, _resid = _kd_bitmap_search(
        queries, index, float(max_distance), radius,
        k=0, tile_q=tile_q, chunk=chunk, interpret=interpret, impl=impl,
    )
    return idx, d2


def nn_search_kd_resident(
    queries: jax.Array,
    index: KDIndex,
    max_distance: float,
    *,
    k: int | None = None,
    tile_q: int | None = None,
    gate_width: int | None = None,
    interpret: bool = False,
    orig_map: bool = True,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Exact-unless-flagged 1-NN via the resident-pages kernel — the cold
    (cache-less) production matcher for pairs whose page table fits VMEM
    (``knn.resident_fits``).

    Membership is per-query top-k by box lower bound (the union path's
    ranking, computed in the prefix kernel instead of XLA), the search
    runs entirely out of VMEM with per-subgroup compute gating. Same
    ``(orig_idx, dist2, fail)`` contract and certificate argument as
    :func:`nn_search_kd_union` — failed queries re-search via the
    caller's fallback.
    """
    nc = index.pages.shape[0]
    k = min(K_DEFAULT if k is None else k, nc)
    bound_val = jnp.float32(max_distance) * (1.0 + 1e-6) + 1e-30
    radius = jnp.full((queries.shape[0],), bound_val, jnp.float32)
    idx, d2, resid = _kd_bitmap_search(
        queries, index, float(max_distance), radius,
        k=k, tile_q=TILE_Q_DEFAULT if tile_q is None else tile_q,
        interpret=interpret, impl="resident", gate_width=gate_width,
        orig_map=orig_map,
    )
    fail = resid <= jnp.minimum(d2, jnp.float32(max_distance)) * (1.0 + 1e-6)
    return idx, d2, fail


def nn_search_kd_warm(
    queries: jax.Array,
    index: KDIndex,
    max_distance: float,
    radius: jax.Array,
    *,
    k: int | None = None,
    tile_q: int | None = None,
    chunk: int = 4,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Exact-unless-flagged 1-NN: per-query top-k membership INTERSECTED
    with warm radii — the production warm matcher.

    The top-k cap bounds the work when radii are loose (early iterations,
    unseeded cache granules), where radius-complete membership degrades
    to the full radius search; tight radii shrink membership below k.
    Same ``(orig_idx, dist2, fail)`` contract as :func:`nn_search_kd_union`
    — ``fail`` = the (k+1)-th-extraction certificate did not close AND the
    radius cannot vouch for the result; failed queries re-search via the
    caller's fallback. Exactness: a top-k block dropped by the radius test
    has lb > radius >= the found distance, so it cannot improve the
    result; the certificate covers everything else.
    """
    from icp_variants_tpu.ops import knn

    nc = index.pages.shape[0]
    k = min(K_DEFAULT if k is None else k, nc)
    impl = "resident" if _resident_layout(index)[2] else "bitmap"
    idx, d2, resid = _kd_bitmap_search(
        queries, index, float(max_distance), radius,
        k=k, tile_q=TILE_Q_DEFAULT if tile_q is None else tile_q,
        chunk=chunk, interpret=interpret, impl=impl,
    )
    fail = resid <= jnp.minimum(d2, jnp.float32(max_distance)) * (1.0 + 1e-6)
    return idx, d2, fail


def match_kd_warm(
    queries: jax.Array,
    index: KDIndex,
    max_distance: float,      # static: keys the compiled search kernels
    cache_idx: jax.Array,
    target_feats: jax.Array,
    query_mask: jax.Array | None = None,
    *,
    fallback_index=None,
    k: int | None = None,
    checks: int = 0,
    tile_q: int | None = None,
    interpret: bool = False,
    impl: str | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Warm-start matching: per-query radii from the previous iteration's
    matches. ``cache_idx`` (N,) holds each query's last matched ORIGINAL
    target row (-1 = none); ``target_feats`` is the (capacity, d) original
    feature table the distances are measured in (points, or 6-dim color
    features). Same ``(indices, dist2, valid)`` contract as
    :func:`match_kd` / ``knn.match_indexed`` (squared threshold,
    NearestNeighbor.h:182) — the TPU analog of a kd-tree query warm-started
    at the previous correspondence, which FLANN cannot express.

    ``checks > 0`` is the approximate arm (see :func:`match_kd`): the
    membership cap comes from :func:`checks_to_k` and the certificate +
    fallback are skipped — the warm radii still only SHRINK membership
    (a block beyond an upper bound on the NN distance never helps), and
    the cached-match backstop still applies, so the approximate warm
    search is never worse than the cold approximate search.

    Exactness: the cached match is a real target point, so its exact
    distance at the CURRENT query position upper-bounds the NN distance;
    the search is complete within min(radius, top-k certificate) — a
    query the certificate cannot vouch for re-searches through
    ``fallback_index`` (a ``knn.TargetIndex``), rare by construction. A
    query whose kernel search finds nothing strictly better keeps its
    cached match (tie / roundoff backstop). Masked-out or cache-less
    queries search at the full threshold radius, where the top-k cap
    (k=0 disables it; requires ``fallback_index``) bounds the work.
    """
    if impl is None:
        impl = "v2" if jax.default_backend() in ("tpu", "axon") else "xla"
    if checks > 0:
        k = checks_to_k(checks, index)
    d = index.block_min.shape[1]
    bound_val = jnp.float32(max_distance) * (1.0 + 1e-6) + 1e-30

    has_cache = cache_idx >= 0
    cached = target_feats[jnp.clip(cache_idx, 0, target_feats.shape[0] - 1)]
    diff = queries[:, :d] - cached[:, :d]
    cached_d2 = jnp.sum(diff * diff, axis=1)
    # One-rounding-step slack so the kernel (different summation order)
    # re-finds the cached point rather than round-off-missing it.
    radius = jnp.where(
        has_cache, cached_d2 * (1.0 + 1e-6) + 1e-30, bound_val
    )
    radius = jnp.minimum(radius, bound_val)
    if query_mask is not None:
        radius = jnp.where(query_mask, radius, -1.0)

    if impl == "v2" and checks > 0:
        # Approximate arm: k-capped membership ∩ radii, certificate ignored,
        # no fallback. The cached-match backstop below still applies.
        idx, d2, _fail = nn_search_kd_warm(
            queries, index, float(max_distance), radius, k=k,
            tile_q=tile_q, interpret=interpret,
        )
    elif impl == "v2" and (k == 0 or fallback_index is None):
        idx, d2 = nn_search_kd_radius(
            queries, index, float(max_distance), radius,
            tile_q=TILE_Q_DEFAULT if tile_q is None else tile_q,
            interpret=interpret,
        )
    elif impl == "v2":
        idx, d2, fail = nn_search_kd_warm(
            queries, index, float(max_distance), radius, k=k,
            tile_q=tile_q, interpret=interpret,
        )
        tile_t = fallback_index.points_t3.shape[2]
        fallback_vm = _make_fallback(
            impl, float(max_distance), tile_t, interpret
        )
        fradii = jnp.where(fail, bound_val, -1.0)
        idxf, d2f = fallback_vm(queries, fradii, fallback_index)
        idx = jnp.where(fail, idxf, idx)
        d2 = jnp.where(fail, d2f, d2)
    elif checks > 0:
        # Portable approximate oracle: same k-capped membership rule as the
        # kernel path. Emulate the kernel's radius cap (binit) by deferring
        # to the cached match unless the k-block search beat it — the
        # generic backstop below then restores the cached match.
        fidx, fd2, _fail = nn_search_kd(
            queries, index, float(max_distance), k=k
        )
        not_better = has_cache & (fd2 >= cached_d2)
        idx = jnp.where(not_better, -1, fidx)
        d2 = jnp.where(not_better, bound_val, fd2)
    else:
        # Portable oracle (CPU tests): full exact search, radii ignored —
        # identical results by the exactness argument above.
        fidx, fd2 = nn_search_xla_flat(queries[:, :d], index)
        over = fd2 > jnp.float32(max_distance)
        idx = jnp.where(over, -1, fidx)
        d2 = jnp.where(over, bound_val, fd2)

    # Backstop: nothing strictly better found => the cached match IS the NN
    # (within one rounding step); only applies within the threshold.
    keep = (idx < 0) & has_cache & (cached_d2 <= jnp.float32(max_distance))
    if query_mask is not None:
        keep = keep & query_mask
    idx = jnp.where(keep, cache_idx, idx)
    d2 = jnp.where(keep, cached_d2, d2)
    valid = (d2 <= max_distance) & (idx >= 0)
    if query_mask is not None:
        valid = valid & query_mask
    return idx, d2, valid


def nn_search_xla_flat(
    queries: jax.Array, index: KDIndex
) -> tuple[jax.Array, jax.Array]:
    """Portable exact 1-NN over a KDIndex's block table (direct differences
    against every block point; CPU oracle for the warm path)."""
    nc, dcap = index.block_pts.shape
    d = index.block_min.shape[1]
    cap = dcap // d
    pts = index.block_pts.reshape(nc, d, cap)
    d2 = None
    for j in range(d):
        diff = pts[None, :, j, :] - queries[:, None, j, None]
        d2 = diff * diff if d2 is None else d2 + diff * diff
    flat = d2.reshape(queries.shape[0], nc * cap)
    best = jnp.argmin(flat, axis=1).astype(jnp.int32)
    d2min = jnp.min(flat, axis=1)
    orig = index.block_orig.reshape(-1)[best]
    return orig, d2min


@functools.lru_cache(maxsize=None)
def _make_fallback(impl: str, max_distance: float, tile_t: int, interpret: bool):
    """Build (and cache) the certificate-failure fallback searcher.

    Constructed OUTSIDE any trace (a ``custom_vmap`` object created inside
    a traced scan body leaks tracers into its staged jaxpr — "No constant
    handler" at lowering) and cached on the static config so repeated
    iterations reuse one object. The returned callable runs the search
    behind ``lax.cond(any(radii >= 0), ...)``; its batch rule keeps the
    predicate global across the vmapped pair axis, so a failure-free batch
    skips the kernel entirely instead of lowering to a select that always
    executes it.
    """
    from icp_variants_tpu.ops import knn

    # Host-side (numpy) arithmetic: jnp constants created here would become
    # tracers when this builder first runs inside a traced scan body.
    bound_val = float(
        np.float32(max_distance) * np.float32(1.0 + 1e-6) + np.float32(1e-30)
    )

    if impl == "v2":

        def run_one(q, radii, fb):
            return knn.nn_search_pruned_v2(
                q, fb, max_distance, interpret=interpret, tile_t=tile_t,
                per_query_bound=radii, use_phase1=False,
            )
    else:

        def run_one(q, radii, fb):
            return knn.nn_search_pruned_xla(q, fb, max_distance)

    def fallback(q, radii, fb):
        def run(args):
            return run_one(*args)

        def skip(args):
            # Derive from the operand (not fresh constants) so the outputs
            # carry the same varying-manual-axes as the run branch under
            # shard_map; values are placeholders (unused for ~fail rows).
            zero = args[1] * 0.0
            return (
                zero.astype(jnp.int32) - 1,
                zero + bound_val,
            )

        return jax.lax.cond(jnp.any(radii >= 0), run, skip, (q, radii, fb))

    fallback_vm = jax.custom_batching.custom_vmap(fallback)

    @fallback_vm.def_vmap
    def _rule(axis_size, in_batched, q, radii, fb):
        q_b, r_b = in_batched[0], in_batched[1]
        fb_axes = jax.tree.map(lambda b: 0 if b else None, in_batched[2])

        def run(args):
            return jax.vmap(
                run_one,
                in_axes=(0 if q_b else None, 0 if r_b else None, fb_axes),
            )(*args)

        def skip(args):
            n = args[0].shape[-2]
            zero = jnp.zeros((axis_size, n), jnp.float32) + jnp.sum(
                args[1] * 0.0
            )
            return (
                zero.astype(jnp.int32) - 1,
                zero + bound_val,
            )

        return (
            jax.lax.cond(jnp.any(radii >= 0), run, skip, (q, radii, fb)),
            (True, True),
        )

    return fallback_vm


def match_kd(
    queries: jax.Array,
    index: KDIndex,
    fallback_index,
    max_distance: float,
    query_mask: jax.Array | None = None,
    *,
    k: int | None = None,
    checks: int = 0,
    interpret: bool = False,
    impl: str | None = None,
    orig_map: bool = True,
    gate_width: int | None = None,
    tile_q: int | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Matching stage over the k-d index: per-query search + exactness
    fallback. Same ``(indices, dist2, valid)`` contract as
    ``knn.match_indexed`` (squared threshold, NearestNeighbor.h:182).
    ``max_distance`` must be a STATIC Python float (it keys the cached
    fallback kernel); per-level schedules should recompile per level like
    every other config knob, not trace the threshold.

    Queries whose certificate fails re-search through ``fallback_index``
    (a ``knn.TargetIndex``): the visited-list kernel in per-query-bound
    mode on TPU, the portable oracle elsewhere. The whole fallback sits
    behind a ``lax.cond`` on ANY certificate failing — empirically ~0% at
    the default width, so its cost is one reduction per iteration; the
    ``custom_vmap`` rule keeps the predicate batch-GLOBAL under the
    batched runner's vmap (a per-pair cond would lower to a select that
    executes both branches every iteration).

    ``checks > 0`` is the APPROXIMATE arm (ICPConfig.matching_checks,
    FLANN SearchParams(checks) parity — NearestNeighbor.h:134): the
    candidate budget is capped at ~``checks`` points (whole blocks via
    :func:`checks_to_k`) and the certificate + fallback are SKIPPED — a
    query whose NN lies outside its best-lb blocks keeps the best
    candidate found, exactly FLANN's failure mode. Results are then
    approximate; every exact caller keeps ``checks == 0``.

    ``orig_map=False`` (checks>0 kernel paths only) returns indices in
    the SORTED page domain (block * cap_pad + slot) instead of original
    target rows: callers that gather match attributes from a page-ordered
    table fold the page_orig row gather away entirely (gathers are
    row-issue bound — pipeline/icp.py builds that table once per run).
    """
    from icp_variants_tpu.ops import knn

    if impl is None:
        impl = "v2" if jax.default_backend() in ("tpu", "axon") else "xla"
    if checks > 0:
        k = checks_to_k(checks, index)
    sorted_out = (not orig_map) and checks > 0
    if impl == "v2" and _resident_layout(index)[2]:
        # Production when the pair's page table fits VMEM: the resident
        # kernel (measured 1.17 vs the union's 1.46 ms/pair/iter at bench
        # shapes, scripts/evidence/resident_bench_log.txt) — zero per-block DMA,
        # per-gate compute gating, list construction in the prefix kernel.
        idx3, d23, fail = nn_search_kd_resident(
            queries, index, max_distance, k=k, interpret=interpret,
            orig_map=not sorted_out, gate_width=gate_width, tile_q=tile_q,
        )
    elif impl == "v2":
        # The union kernel (per-query candidate tightness at per-tile
        # bandwidth): the streaming path for page tables beyond the
        # resident VMEM budget; the flat-gather search stays the portable
        # path and the batched-gather reference.
        idx3, d23, fail = nn_search_kd_union(
            queries, index, max_distance, k=k, interpret=interpret
        )
        if sorted_out:
            idx3 = _to_sorted_domain(index, idx3)
    else:
        idx3, d23, fail = nn_search_kd(queries, index, max_distance, k=k)
        if sorted_out:
            # Oracle path: translate to the sorted page domain so CPU
            # tests exercise the same contract as the kernel paths.
            idx3 = _to_sorted_domain(index, idx3)
    bound_val = jnp.float32(max_distance) * (1.0 + 1e-6) + 1e-30

    if checks > 0:
        # Approximate arm: no certificate, no fallback dispatch at all.
        idx, d2 = idx3, d23
    else:
        tile_t = fallback_index.points_t3.shape[2]
        fallback_vm = _make_fallback(
            impl, float(max_distance), tile_t, interpret
        )
        radii = jnp.where(fail, bound_val, -1.0)
        idxf, d2f = fallback_vm(queries, radii, fallback_index)
        idx = jnp.where(fail, idxf, idx3)
        d2 = jnp.where(fail, d2f, d23)
    valid = (d2 <= max_distance) & (idx >= 0)
    if query_mask is not None:
        valid = valid & query_mask
    return idx, d2, valid
