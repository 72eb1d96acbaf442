"""The ICP driver loop — one jitted scan over iterations.

TPU-native re-design of ``{Ceres,Linear}ICPOptimizer::estimatePose``
(ICPOptimizer.h:185-349, 493-663). The reference's per-iteration control flow

    selection -> transform -> matching -> weighting -> rejection
              -> solve -> left-multiply pose update -> record error

becomes the body of a single ``lax.scan``; the multi-resolution schedule is a
static per-iteration stride array scanned alongside (so coarse-to-fine runs
inside ONE compiled executable, no per-level recompilation), and random
selection threads a PRNG key. One ``(ICPConfig, shapes)`` pair = one XLA
program, reused across every scan pair of a dataset.
"""

from __future__ import annotations

from typing import NamedTuple

import functools

import jax
import jax.numpy as jnp
import numpy as np

from icp_variants_tpu.core import cloud as cloud_lib
from icp_variants_tpu.core import se3
from icp_variants_tpu.core.cloud import Cloud
from icp_variants_tpu.ops import (
    kdtree,
    knn,
    projective,
    rejection,
    selection,
    weighting,
)
from icp_variants_tpu.pipeline import measure
from icp_variants_tpu.pipeline.config import (
    ICPConfig,
    Matching,
    Metric,
    Minimizer,
    Selection,
    Weighting,
)
from icp_variants_tpu.solvers import anderson, gauss_newton, linear, procrustes


class ICPTrace(NamedTuple):
    """Per-iteration record (the reference prints these live,
    ICPOptimizer.h:253, 304, 315-317)."""

    rmse: jax.Array          # (T,)
    benchmark: jax.Array     # (T,) Fontana error (0 when not requested)
    num_matches: jax.Array   # (T,) valid correspondences entering the solver


class ICPResult(NamedTuple):
    pose: jax.Array          # (4, 4) final estimate
    trace: ICPTrace
    # Final per-source-row matched kd BLOCK ids ((capacity,) int32, -1 =
    # none) when the approximate arm's membership cache is active
    # (_membership_applies) — the segmented multires driver seeds the
    # next pyramid level's matcher from these. None otherwise.
    match_blocks: jax.Array | None = None


def _solve(
    cfg: ICPConfig,
    m: weighting.MatchArrays,
    w: jax.Array,
    axis_name: str | None = None,
) -> jax.Array:
    """Dispatch stage 5+6 (metric + minimizer) to the right solver; returns
    the 4x4 incremental pose applied from the left. With ``axis_name`` the
    correspondence axis is sharded over that mesh axis and the solvers psum
    their reductions."""
    robust_w = cfg.weighting in (Weighting.HUBER, Weighting.TUKEY)
    if cfg.minimizer == Minimizer.LINEAR:
        if cfg.metric == Metric.POINT_TO_POINT:
            return procrustes.estimate_pose_point_to_point(
                m.src_points, m.tgt_points, w, m.valid, axis_name=axis_name,
                # Robust weights zero out outliers; the reference's
                # unweighted-mean quirk would feed them into the
                # translation (see procrustes.py).
                weighted_means=robust_w,
            )
        if cfg.metric == Metric.POINT_TO_PLANE:
            return linear.estimate_pose_point_to_plane(
                m.src_points, m.tgt_points, m.tgt_normals, w, m.valid,
                axis_name=axis_name,
            )
        if cfg.metric == Metric.GICP:
            return linear.estimate_pose_gicp(
                m.src_points, m.tgt_points, m.src_normals, m.tgt_normals,
                w, m.valid, axis_name=axis_name,
            )
        return linear.estimate_pose_symmetric(
            m.src_points, m.tgt_points, m.src_normals, m.tgt_normals, w, m.valid,
            axis_name=axis_name,
        )
    return gauss_newton.estimate_pose_lm(
        cfg.metric,
        m.src_points,
        m.tgt_points,
        m.src_normals,
        m.tgt_normals,
        w,
        m.valid,
        max_iterations=cfg.lm_max_inner_iterations,
        function_tolerance=cfg.lm_function_tolerance,
        axis_name=axis_name,
    )


# Iteration-scan unroll factor: the XLA while-loop's per-iteration
# bookkeeping (branch + trace dynamic-update-slices) showed up as a
# ~0.9-1.1 ms scan floor per iteration-BATCH in the stop-after profile;
# unrolling amortizes it over several pipeline iterations per loop trip.
# Hardware sweep at checks=16 bench shapes: 1 -> 20.60, 2 -> 20.76,
# 5 -> 21.66, 10 -> 21.78, 25 -> 21.89 pairs/s — 5 takes most of the win
# at ~1/6 the program growth (scripts/evidence/approx_arm_log.txt).
# Applied on the real backend only: CPU test meshes keep unroll 1 so the
# suite's hundreds of scan compiles stay light (numerics are identical).
SCAN_UNROLL = 5

# NOTE: a sparse-path "sorted-domain match table" default switch
# (USE_SORTED_MATCH_TABLE) lived here through rounds 4-5. It lost TWICE
# on hardware (r4: 19.2 vs 20.9 pairs/s; r5 at the wide-block shapes:
# 25.4 vs 28.6 — the page-ordered table gather loses the original row
# domain's Morton locality for SPARSE scattered queries) and was deleted
# per the prune-twice-losers rule. The sorted-table MACHINERY ships — the
# dense color / membership-cache paths below consume it, where dense
# raster-coherent queries keep their gather locality either way and it
# folds the 307k-row page_orig gather out of the scan.


def _compact_capacity(n: int, proba: float) -> int:
    """Static query capacity for compacted random selection: expected count
    plus a >=10-sigma binomial margin, rounded to the k-NN tile multiple.

    The margin is exact-sigma-based (10 * sqrt(n*p*(1-p)) + 64), not a
    fixed 1.25x: at ETH scale the old rule held a ~15-sigma slack whose
    extra padded rows cost ~9% of every query-proportional stage
    (truncation odds at 10 sigma are ~1e-23 — still effectively never,
    and truncation only drops the tail selections of one iteration)."""
    expected = n * proba
    sigma = (n * proba * (1.0 - proba)) ** 0.5
    k = int(expected + 10.0 * sigma) + 64
    k = ((k + 127) // 128) * 128
    return min(n, k)


def _probe_trace(probe: jax.Array) -> "ICPTrace":
    """Fixed-structure trace for stage-truncated iterations (the fused
    TimeMeasure's stop-after probes): the checksum keeps the stage's outputs
    live under DCE while matching the full iteration's carry structure."""
    return ICPTrace(
        rmse=probe.astype(jnp.float32),
        benchmark=jnp.asarray(0.0, jnp.float32),
        num_matches=jnp.asarray(0, jnp.int32),
    )


def _fuse_cloud_table(cloud: Cloud) -> jax.Array:
    """(capacity, 8) f32 row table: [points | normals | valid | pad].

    TPU XLA gathers are ROW-issue bound (CLAUDE.md), so gathering points,
    normals and validity as three separate row gathers costs ~3x one
    8-wide-row gather. Built ONCE per compiled run (outside the scan) and
    gathered once per stage edge — the stop-after profile attributed
    0.17 (selection) + 0.19 (rejection-side normals/valid) ms/pair/iter
    to these gathers at checks=16 (scripts/evidence/batched_stage_log.txt)."""
    return jnp.concatenate(
        [
            cloud.points,
            cloud.normals,
            cloud.valid.astype(jnp.float32)[:, None],
            jnp.zeros((cloud.points.shape[0], 1), jnp.float32),
        ],
        axis=1,
    )


def _compact_cloud(
    source: Cloud,
    src_table,
    sel_idx,
    pre_mask,
    need_colors: bool = True,
    *,
    fold_table_valid: bool = True,
    require_finite_normals: bool = False,
) -> tuple[Cloud, jax.Array]:
    """Gather the compacted query cloud via ONE fused row gather from
    ``src_table`` (:func:`_fuse_cloud_table`): masked rows' points become
    the pad sentinel (never match anything); normals gather unmasked
    (their consumers apply the mask). ``pre_mask`` carries the caller's
    draw/range mask; the table's validity column folds in here
    (``fold_table_valid``), and ``require_finite_normals`` adds the
    multires finite-normals residual check — both from the already-
    gathered rows, so selection issues exactly one wide row gather (plus
    colors only when a color consumer is configured). Returns
    ``(cloud, sel_mask)``."""
    rows = src_table[sel_idx]
    sel_mask = pre_mask
    if fold_table_valid:
        sel_mask = sel_mask & (rows[:, 6] > 0.5)
    if require_finite_normals:
        sel_mask = sel_mask & jnp.isfinite(rows[:, 3:6]).all(axis=1)
    return Cloud(
        points=jnp.where(
            sel_mask[:, None], rows[:, :3], cloud_lib.PAD_SENTINEL
        ),
        normals=rows[:, 3:6],
        colors=(
            source.colors[sel_idx]
            if need_colors
            else jnp.zeros((sel_idx.shape[0], 4), source.colors.dtype)
        ),
        valid=sel_mask,
    ), sel_mask


def _warm_applies(cfg: ICPConfig) -> bool:
    """Whether warm-start kd matching is profitable for this config:
    dense SELECT_ALL only (see ICPConfig.kd_warm_start — sparse compacted
    selection measured slower warm than cold in every hardware A/B, dense
    measured faster), and only on the EXACT arm — under the approximate
    arm (matching_checks > 0) the top-k cap already bounds the work the
    warm radii used to bound, leaving the cache gather/scatter as pure
    overhead (color tracker at checks=16: 0.794 frames/s cold vs 0.712
    warm, scripts/evidence/approx_arm_log.txt)."""
    return (
        cfg.kd_warm_start
        and cfg.selection == Selection.ALL
        and cfg.matching_checks == 0
    )


# Resident-kernel shape for the dense membership-cache matcher (the
# approximate arm's SELECT_ALL path). NOTE the r5 mid-round "wide gates
# win dense" sweep (gate 128/tq 256 -> 2.1 f/s) was an ARTIFACT: the
# unthrottled cross-level seeding it rode had collapsed the fine level's
# match set 4x (far-parent seeds land across color boundaries and the
# restricted rows never re-rank), which made per-gate membership
# degenerately sparse. With honest membership (~3 distinct blocks per
# 32 rows) the default narrow gates win again, like every other config.
MEMBERSHIP_GATE_WIDTH = 32
MEMBERSHIP_TILE_Q = 128
# In-kernel pose transform for the seeded matcher (raw loop-invariant
# query table + R@p+t applied per gate in the kernel): built, tested
# (tests/test_kdtree.py::TestCachedMembership::test_in_kernel_pose_
# transform) and measured SLOWER on hardware — color 1.98 vs 2.13 f/s
# (scripts/evidence/block_target_probe.txt; both sides of that A/B ran
# the since-retracted unthrottled seeding, but the comparison is
# like-for-like so the ~7% verdict stands): the per-gate broadcast
# chain repeats the transform per (gate, tile) visit and costs more
# than the per-iteration (Nq, 8) table materialization it saves. Kept
# off; delete on a second loss per the prune rule.
SEEDED_IN_KERNEL_POSE = False
# Seed a pyramid level's membership only when its parent level's stride
# is at most this (see run_icp_batch_multires_segmented): parents more
# than a pixel away cross color boundaries in the 6-dim tree and poison
# the block cache. 2 = only the final (stride-1) level is seeded, from
# its pixel-adjacent stride-2 parent — on a sharp-color-edge fixture
# X=4 still lost 22% of the fine level's matches (+0.8 mm) while X=2
# lost 3.5% (+0.6 mm), and the stride-2 level it leaves ranked holds
# half the fine level's queries for ONE iteration (~2% of the frame).
SEED_MAX_PARENT_STRIDE = 2


def _membership_applies(cfg: ICPConfig) -> bool:
    """Whether the approximate arm's per-row BLOCK-membership cache rides
    the scan carry: dense SELECT_ALL (row identity is stable across
    iterations), checks > 0 (the k=1-budget arm — the cache's block choice
    is exactly the budget the arm already accepts), kd matching, and the
    sorted-domain match table's constraints (no COLORS weighting — it
    gathers original-row colors). Mutually exclusive with the warm-start
    match cache by construction (_warm_applies requires checks == 0), so
    the two share the scan's cache carry slot."""
    return (
        cfg.kd_seed_membership
        and cfg.matching == Matching.KNN
        and cfg.matching_checks > 0
        and cfg.selection == Selection.ALL
        and cfg.weighting != Weighting.COLORS
    )


def _needs_colors(cfg: ICPConfig) -> bool:
    """Whether any pipeline stage reads per-match colors (the COLORS
    weighting; color-ICP reads colors pre-compaction for the features)."""
    return cfg.weighting == Weighting.COLORS or cfg.color_icp


def _match_kd_stage(
    cfg, q, kd_index, target_index, sel_mask, sel_idx, match_cache,
    target_feats, orig_map=True, seeded=False, match_pose=None,
):
    """kd matching stage with optional warm start + match-cache update.

    Returns ``(idx, d2, valid, new_cache)``. Warm start gathers each
    query's cached match row, searches within the exact distance to it
    (kdtree.match_kd_warm), and scatters the new matches back — invalid
    slots write out of range (dropped), so a masked row never races a
    valid duplicate in the scatter. ``orig_map=False`` (cold approximate
    path only) returns SORTED-page-domain indices for the page-ordered
    match table (see _iteration).

    Under ``_membership_applies`` configs ``match_cache`` instead holds
    per-row BLOCK ids (the approximate arm's membership cache; requires
    ``orig_map=False``): with ``seeded`` the matcher searches EXACTLY the
    cached block per row (kdtree.match_kd_cached — no box ranking at
    all); unseeded it runs the standard k-capped search and only RECORDS
    each row's matched block for the next level's seed. Either way rows
    keep their last block when an iteration finds no match, so a row can
    re-enter once its block comes back in range.
    """
    if match_cache is not None and _membership_applies(cfg):
        assert not orig_map, "membership cache needs the sorted match table"
        if seeded:
            # ``q`` is the RAW (untransformed) feature table — loop-
            # invariant, so XLA hoists its construction out of the scan;
            # the kernel applies ``match_pose`` to the spatial columns
            # per gate (kdtree.nn_search_kd_cached), killing the
            # per-iteration (Nq, 8) transformed-table materialization.
            idx, d2, valid = kdtree.match_kd_cached(
                q, kd_index, cfg.max_distance, match_cache,
                query_mask=sel_mask,
                gate_width=MEMBERSHIP_GATE_WIDTH, tile_q=MEMBERSHIP_TILE_Q,
                pose=match_pose,
            )
        else:
            idx, d2, valid = kdtree.match_kd(
                q, kd_index, target_index, cfg.max_distance,
                query_mask=sel_mask, checks=cfg.matching_checks,
                orig_map=False,
                gate_width=MEMBERSHIP_GATE_WIDTH, tile_q=MEMBERSHIP_TILE_Q,
            )
        cap_pad = kd_index.pages.shape[2]
        new_cache = jnp.where(idx >= 0, idx // cap_pad, match_cache)
        return idx, d2, valid, new_cache
    if match_cache is None or not cfg.kd_warm_start or target_feats is None:
        idx, d2, valid = kdtree.match_kd(
            q, kd_index, target_index, cfg.max_distance, query_mask=sel_mask,
            checks=cfg.matching_checks, orig_map=orig_map,
        )
        return idx, d2, valid, match_cache
    gcap = match_cache.shape[0]
    rows = (
        sel_idx
        if sel_idx is not None
        else jnp.arange(q.shape[0], dtype=jnp.int32)
    )
    granules = rows // cfg.kd_warm_granule
    idx, d2, valid = kdtree.match_kd_warm(
        q, kd_index, cfg.max_distance, match_cache[granules], target_feats,
        query_mask=sel_mask, fallback_index=target_index,
        tile_q=cfg.kd_warm_tile_q, checks=cfg.matching_checks,
    )
    granules = jnp.where(valid, granules, gcap)
    new_cache = match_cache.at[granules].set(idx, mode="drop")
    return idx, d2, valid, new_cache


def _iteration(
    cfg: ICPConfig,
    source: Cloud,
    target: Cloud,
    pose: jax.Array,
    stride: jax.Array,
    key: jax.Array,
    gt_src: jax.Array,
    gt_tgt: jax.Array,
    gt_valid: jax.Array,
    run_benchmark: bool,
    axis_name: str | None = None,
    target_index: knn.TargetIndex | None = None,
    kd_index: kdtree.KDIndex | None = None,
    stop_after: str | None = None,
    match_cache: jax.Array | None = None,
    target_feats: jax.Array | None = None,
    src_table: jax.Array | None = None,
    tgt_table: jax.Array | None = None,
    tgt_table_kd: jax.Array | None = None,
    seeded_matching: bool = False,
):
    """One pipeline iteration; returns ``(pose, match_cache, trace)``.

    ``seeded_matching`` switches the kd matcher to the approximate arm's
    SEEDED membership mode (_membership_applies configs whose caller
    provided a block seed — the segmented multires driver's fine levels):
    each query searches exactly its cached block, no box ranking.

    ``src_table`` / ``tgt_table`` are the fused (capacity, 8) row tables
    (:func:`_fuse_cloud_table`) built once outside the scan; omitted they
    rebuild here (XLA hoists the loop-invariant concat).

    ``match_cache`` ((source capacity,) int32, -1 = none) carries each
    source row's last matched original target row across iterations for
    warm-start kd matching; threaded unchanged when warm start is off.
    ``target_feats`` is the original-row feature table distances are
    measured in (points, or color features under color-ICP).

    Queries enumerate in the clouds' load-time Morton order. A
    block-aligned re-enumeration (clustering each query tile on fewer
    target kd blocks) was built and measured in rounds 2-3 and LOST on
    hardware in every configuration — warm 9.2 vs 12.7 pairs/s (scattered
    per-granule radii), union 7.7 vs 11.5 (scattered gathers) — so the
    machinery was deleted (scripts/evidence/warm_ab_sweep_log.txt,
    scripts/evidence/warm_ab_sweep2_log.txt).
    """
    # With the point axis sharded, global row indices need the shard offset
    # and per-shard PRNG streams must decorrelate.
    if axis_name is not None:
        shard_index = jax.lax.axis_index(axis_name)
        index_offset = shard_index * source.capacity
        key = jax.random.fold_in(key, shard_index)
    else:
        index_offset = 0

    if stop_after == "floor":
        # Scan/dispatch floor probe for the fused TimeMeasure: no pipeline
        # stage runs; the key-dependent checksum keeps the scan body alive.
        # key_data handles both legacy uint32 keys and typed PRNG keys
        # (plain .astype raises on the latter).
        key_bits = jax.random.key_data(key).astype(jnp.float32)
        return pose, match_cache, _probe_trace(
            jnp.sum(key_bits) + jnp.sum(pose)
        )

    # --- stage 1: selection -------------------------------------------------
    if src_table is None:
        src_table = _fuse_cloud_table(source)
    if tgt_table is None:
        tgt_table = _fuse_cloud_table(target)
    sel_idx = None  # compacted-query rows into the source (None = identity)
    if cfg.multi_resolution:
        base_mask = cloud_lib.coarse_stride_mask(source, stride, index_offset)
    else:
        base_mask = source.valid
    if cfg.selection == Selection.RANDOM and cfg.compact_queries:
        # Exact Bernoulli selection drawn as geometric gaps (see
        # bernoulli_gap_indices): identical distribution to per-point
        # Bernoulli + compaction, but O(k) instead of an O(N) full-cloud
        # draw + cumsum per iteration. Stride membership is enforced by the
        # gap process' lattice, so only the validity part of base_mask
        # remains to check per selected row (folded from the fused table's
        # validity column inside _compact_cloud).
        k_cap = _compact_capacity(source.capacity, cfg.selection_proba)
        sel_stride = stride if cfg.multi_resolution else jnp.int32(1)
        sel_idx, in_range = selection.bernoulli_gap_indices(
            key, cfg.selection_proba, sel_stride, source.capacity, k_cap,
            index_offset=index_offset,
        )
        source, sel_mask = _compact_cloud(
            source, src_table, sel_idx, in_range, _needs_colors(cfg),
            require_finite_normals=cfg.multi_resolution,
        )
    elif cfg.selection == Selection.RANDOM:
        sel_mask = selection.random_sampling(key, base_mask, cfg.selection_proba)
    elif cfg.selection == Selection.RANDOM_FAST:
        # Fixed-count uniform draw: skips the full-cloud Bernoulli + cumsum
        # compaction entirely — one gather does selection AND compaction.
        k_cap = _compact_capacity(source.capacity, cfg.selection_proba)
        n_draw = min(int(source.capacity * cfg.selection_proba + 0.5), k_cap)
        sel_idx, draw_mask = selection.random_indices(
            key, source.capacity, n_draw, k_cap
        )
        if cfg.multi_resolution:
            # The stride-lattice part of base_mask needs the row gather;
            # validity is already inside coarse_stride_mask.
            pre = draw_mask & base_mask[sel_idx]
            fold_valid = False
        else:
            pre = draw_mask
            fold_valid = True
        source, sel_mask = _compact_cloud(
            source, src_table, sel_idx, pre, _needs_colors(cfg),
            fold_table_valid=fold_valid,
        )
    else:
        sel_mask = selection.select_all(base_mask)

    # --- transform (ICPOptimizer.h:251-252) ---------------------------------
    if stop_after is not None:
        # Anti-LICM for the stop-after probes: under SELECT_ALL with the
        # pose held constant (probes never update it), the whole matcher
        # is loop-invariant and XLA hoists it out of the scan — the
        # projective profile reported a 24 ms matcher as 0.9 ms. A
        # key-derived sub-femtometer perturbation of the POSE keeps each
        # iteration's work real without affecting what is measured.
        # (Perturbing the queries post-transform, as this probe did
        # through round 4, left the transform chain itself hoistable —
        # the per-iteration point/normal transforms then landed in the
        # first stage whose probe updates the pose, overstating "solve"
        # by the whole query-construction cost at dense shapes.)
        eps = jnp.mod(
            jnp.sum(jax.random.key_data(key).astype(jnp.float32)) * 1e-12,
            jnp.float32(1e-9),
        )
        pose = pose + eps
    # Masked-out queries are pinned to the FIRST valid query position (not 0
    # or a sentinel): their results are discarded via the mask anyway, and an
    # in-cloud anchor keeps every query-tile bbox tight so the indexed k-NN
    # kernel's pruning is unaffected by padding (a 0-pin dragged the last
    # tiles' bboxes through the cloud center, sweeping extra target tiles).
    src_pts = se3.transform_points(source.points, pose)
    anchor = src_pts[jnp.argmax(sel_mask)]
    src_pts = jnp.where(sel_mask[:, None], src_pts, anchor)
    src_nrm = se3.transform_normals(source.normals, pose)
    if stop_after == "selection":
        return pose, match_cache, _probe_trace(
            jnp.sum(src_pts) + jnp.sum(src_nrm)
        )

    # --- stage 2: matching --------------------------------------------------
    match_table = tgt_table  # original-row domain unless the kd shortcut
    if cfg.matching == Matching.PROJECTIVE:
        proj_kwargs = dict(
            fx=cfg.projective_fx,
            fy=cfg.projective_fy,
            cx=cfg.projective_cx,
            cy=cfg.projective_cy,
            width=cfg.projective_width,
            height=cfg.projective_height,
            window=cfg.projective_window,
            max_distance=cfg.max_distance,
            query_mask=sel_mask,
        )
        if (
            jax.default_backend() in ("tpu", "axon")
            and projective._resident_fits_projective(
                cfg.projective_width, cfg.projective_height,
                projective.BLOCK, cfg.projective_window,
            )
        ):
            # Resident-image Pallas kernel: the whole block table lives
            # in VMEM, replacing ~9 HBM row gathers per query per
            # iteration (the XLA window scan was ~23 ms/frame/iter at
            # 640x480 — the gather-issue wall; parity pinned by
            # tests/test_projective.py::TestResidentProjective).
            idx, _d2, valid = projective.projective_match_resident(
                src_pts, target.points, target.valid, **proj_kwargs,
            )
        else:
            idx, _d2, valid = projective.projective_match(
                src_pts, target.points, target.valid, **proj_kwargs,
                **(
                    {"chunk": cfg.projective_chunk}
                    if cfg.projective_chunk else {}
                ),
            )
    elif cfg.color_icp:
        if kd_index is not None and target_index is not None:
            # Sorted-domain match table for the approximate color path:
            # folds the in-matcher page_orig mapping gather away (one
            # row-issue-bound gather per query per iteration — ~3 ms at
            # the dense tracker's 307k queries) and makes the matched
            # BLOCK id a cheap division for the membership cache.
            use_sorted = tgt_table_kd is not None and (
                match_cache is None or _membership_applies(cfg)
            )
            in_kernel_pose = seeded_matching and SEEDED_IN_KERNEL_POSE
            if in_kernel_pose:
                # Raw features + in-kernel pose transform (see
                # _match_kd_stage); loop-invariant, hoisted by XLA.
                q = knn.color_features(source.points, source.colors)
            else:
                q = knn.color_features(src_pts, source.colors)
            idx, _d2, valid, match_cache = _match_kd_stage(
                cfg, q, kd_index, target_index, sel_mask, sel_idx,
                match_cache, target_feats, orig_map=not use_sorted,
                seeded=seeded_matching,
                match_pose=pose if in_kernel_pose else None,
            )
            if use_sorted:
                match_table = tgt_table_kd
        elif target_index is not None:
            q = knn.color_features(src_pts, source.colors)
            idx, _d2, valid = knn.match_indexed(
                q, target_index, cfg.max_distance, query_mask=sel_mask
            )
        else:
            q = knn.color_features(src_pts, source.colors)
            t = knn.color_features(target.points, target.colors)
            idx, _d2, valid = knn.match(q, t, cfg.max_distance, query_mask=sel_mask)
    elif kd_index is not None and target_index is not None:
        # SORTED-domain shortcut (approximate cold kd only): matches come
        # back as page positions and gather from the page-ordered table,
        # folding the page_orig row gather away (gather composition).
        use_sorted = tgt_table_kd is not None and (
            match_cache is None or _membership_applies(cfg)
        )
        in_kernel_pose = seeded_matching and SEEDED_IN_KERNEL_POSE
        idx, _d2, valid, match_cache = _match_kd_stage(
            cfg,
            source.points if in_kernel_pose else src_pts,
            kd_index, target_index, sel_mask, sel_idx,
            match_cache, target_feats, orig_map=not use_sorted,
            seeded=seeded_matching,
            match_pose=pose if in_kernel_pose else None,
        )
        if use_sorted:
            match_table = tgt_table_kd
    elif target_index is not None:
        idx, _d2, valid = knn.match_indexed(
            src_pts, target_index, cfg.max_distance, query_mask=sel_mask
        )
    else:
        idx, _d2, valid = knn.match(
            src_pts, target.points, cfg.max_distance, query_mask=sel_mask
        )
    if stop_after == "matching":
        return pose, match_cache, _probe_trace(
            jnp.sum(_d2) + jnp.sum(idx) + jnp.sum(valid)
        )
    idx = jnp.clip(idx, 0, match_table.shape[0] - 1)
    # ONE fused row gather for the matched targets' points + normals +
    # validity (stop-after profile: the separate normals/valid gathers
    # cost ~0.19 ms/pair/iter at bench shapes).
    tgt_rows = match_table[idx]
    valid = valid & (tgt_rows[:, 6] > 0.5)

    m = weighting.MatchArrays(
        src_points=src_pts,
        tgt_points=tgt_rows[:, :3],
        src_normals=src_nrm,
        tgt_normals=tgt_rows[:, 3:6],
        src_colors=source.colors,
        # Per-match target colors feed ONLY the COLORS weighting; under
        # color-ICP the color signal rides the 6-dim match features
        # (baked into target_feats), so gathering 307k u8 rows per
        # iteration for the dense tracker was pure waste.
        tgt_colors=(
            target.colors[idx]
            if cfg.weighting == Weighting.COLORS
            else jnp.zeros((idx.shape[0], 4), target.colors.dtype)
        ),
        valid=valid,
    )

    # --- stage 3: weighting (ICPOptimizer.h:271-272) ------------------------
    w = weighting.apply_weights(
        cfg.weighting, m, cfg.max_distance, axis_name=axis_name
    )
    if stop_after == "weighting":
        return pose, match_cache, _probe_trace(jnp.sum(w) + jnp.sum(m.tgt_points))

    # --- stage 4: rejection (ICPOptimizer.h:278-279) ------------------------
    if cfg.rejection:
        valid = rejection.normal_angle_mask(m.src_normals, m.tgt_normals, valid)
        m = m._replace(valid=valid)
    if cfg.trim_ratio < 1.0:
        # Trimmed-ICP extension: keep the best trim_ratio fraction of the
        # surviving matches by squared distance (partial-overlap
        # robustness; ops/rejection.py). Shard-safe: the cut threshold is
        # derived from psummed global counts.
        valid = rejection.trimmed_mask(
            _d2, valid, cfg.trim_ratio, cfg.max_distance,
            axis_name=axis_name,
        )
        m = m._replace(valid=valid)
    if stop_after == "rejection":
        return pose, match_cache, _probe_trace(
            jnp.sum(w) + jnp.sum(m.valid) + jnp.sum(m.tgt_points)
        )

    # --- stages 5+6: solve + left-multiplied pose update --------------------
    increment = _solve(cfg, m, w, axis_name=axis_name)
    new_pose = increment @ pose
    if stop_after == "solve":
        return new_pose, match_cache, _probe_trace(jnp.sum(increment))

    # --- instrumentation (ICPOptimizer.h:315-317) ---------------------------
    # With the point axis sharded, gt rows shard alongside and the error
    # reductions psum, so every shard reports the GLOBAL metric.
    rmse = measure.rmse_alignment_error(
        new_pose, gt_src, gt_tgt, gt_valid, axis_name=axis_name
    )
    if run_benchmark:
        bench = measure.benchmark_error(
            new_pose, gt_src, gt_tgt, gt_valid, axis_name=axis_name
        )
    else:
        bench = jnp.asarray(0.0, jnp.float32)

    num_matches = jnp.sum(m.valid).astype(jnp.int32)
    if axis_name is not None:
        num_matches = jax.lax.psum(num_matches, axis_name)

    return new_pose, match_cache, ICPTrace(
        rmse=rmse, benchmark=bench, num_matches=num_matches
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_iterations", "run_benchmark", "stop_after"),
)
def _run_icp_jit(
    cfg: ICPConfig,
    num_iterations: int,
    source: Cloud,
    target: Cloud,
    init_pose: jax.Array,
    strides: jax.Array,
    key: jax.Array,
    gt_src: jax.Array,
    gt_tgt: jax.Array,
    gt_valid: jax.Array,
    run_benchmark: bool,
    stop_after: str | None = None,
    kd_index: kdtree.KDIndex | None = None,
    membership_seed: jax.Array | None = None,
) -> ICPResult:
    keys = jax.random.split(key, num_iterations)

    # The target is fixed across iterations: build the Morton/bbox search
    # index ONCE before the scan, exactly like the reference's one-time FLANN
    # buildIndex (ICPOptimizer.h:224-227).
    target_index = None
    feats = None
    if cfg.matching == Matching.KNN:
        if cfg.color_icp:
            feats = knn.color_features(target.points, target.colors)
        else:
            feats = target.points
        target_index = knn.build_target_index(feats, tile_t=knn.V2_TILE_T)

    # Warm-start match cache: one slot per source-row granule, carried
    # through the scan (None — an empty pytree — when warm start is off).
    # Under _membership_applies configs the same carry slot instead holds
    # per-row kd BLOCK ids (the approximate arm's membership cache):
    # seeded from ``membership_seed`` (the segmented driver's previous
    # pyramid level — the matcher then searches exactly the cached block,
    # no box ranking), or all -1 to merely RECORD blocks for the next
    # level while the standard k-capped search runs.
    cache0 = None
    seeded = False
    emit_blocks = False
    if (
        kd_index is not None
        and _membership_applies(cfg)
        # The seeded matcher runs the resident kernel on the UNPACKED
        # page table (nn_search_kd_cached has no packed mode), so the
        # gate must test the unpacked fit specifically — the packed-only
        # regime (d=3 clouds ~400-700k points) would pass
        # _resident_layout's combined check and then blow the VMEM
        # budget at the cached kernel's scratch allocation.
        and knn.resident_fits(
            kd_index.pages.shape[0], kd_index.pages.shape[2])
    ):
        emit_blocks = True
        seeded = membership_seed is not None
        cache0 = (
            membership_seed.astype(jnp.int32)
            if seeded
            else jnp.full((source.points.shape[0],), -1, jnp.int32)
        )
    elif kd_index is not None and _warm_applies(cfg):
        n_granules = -(-source.points.shape[0] // cfg.kd_warm_granule)
        cache0 = jnp.full((n_granules,), -1, jnp.int32)

    # Anderson acceleration (AA-ICP extension): mixing state rides the
    # scan carry; anderson_m == 0 keeps the plain fixed-point iteration.
    aa0 = anderson.init(cfg.anderson_m) if cfg.anderson_m > 0 else None

    # Fused row tables, built ONCE outside the scan (see _fuse_cloud_table).
    src_table = _fuse_cloud_table(source)
    tgt_table = _fuse_cloud_table(target)

    # Page-ordered match table for the approximate cold kd path: matching
    # returns SORTED page positions and the per-match gather reads this
    # table directly — the page_orig row gather disappears from the scan
    # (one-time composition here instead; gathers are row-issue bound).
    # Guarded to configs whose match consumption never needs original
    # rows: no warm cache (it stores original ids) and no color gathers.
    # Built whenever the approximate COLOR path or the membership cache
    # runs (both consume sorted-domain matches); the sparse scattered
    # path measured SLOWER through the page-ordered table twice (see the
    # prune note above USE_SORTED_... in the module constants) and keeps
    # the original-row domain.
    tgt_table_kd = None
    if (
        kd_index is not None
        and cfg.matching_checks > 0
        and not _warm_applies(cfg)
        and cfg.weighting != Weighting.COLORS
        and (cfg.color_icp or _membership_applies(cfg))
    ):
        po = kd_index.page_orig
        rows = tgt_table[jnp.clip(po, 0, tgt_table.shape[0] - 1)]
        pad_row = jnp.concatenate([
            jnp.full((3,), cloud_lib.PAD_SENTINEL, jnp.float32),
            jnp.zeros((5,), jnp.float32),
        ])
        tgt_table_kd = jnp.where((po >= 0)[:, None], rows, pad_row[None, :])

    def body(carry, per_iter):
        pose, cache, aa = carry
        stride, k = per_iter
        new_pose, new_cache, rec = _iteration(
            cfg, source, target, pose, stride, k, gt_src, gt_tgt, gt_valid,
            run_benchmark, target_index=target_index, kd_index=kd_index,
            stop_after=stop_after, match_cache=cache, target_feats=feats,
            src_table=src_table, tgt_table=tgt_table,
            tgt_table_kd=tgt_table_kd, seeded_matching=seeded,
        )
        if aa is not None:
            # The per-iteration trace reflects the PLAIN step's pose (the
            # fixed-point evaluation); the carried pose is the mixed one.
            aa, x_next = anderson.step(
                aa, anderson.pose_to_vec(pose),
                anderson.pose_to_vec(new_pose), cfg.anderson_m,
            )
            new_pose = anderson.vec_to_pose(x_next)
        return (new_pose, new_cache, aa), rec

    unroll = (
        SCAN_UNROLL if jax.default_backend() in ("tpu", "axon") else 1
    )
    (final_pose, final_cache, _), trace = jax.lax.scan(
        body, (init_pose, cache0, aa0), (strides, keys),
        unroll=unroll,
    )
    return ICPResult(
        pose=final_pose, trace=trace,
        match_blocks=final_cache if emit_blocks else None,
    )


def run_icp(
    cfg: ICPConfig,
    source: Cloud,
    target: Cloud,
    init_pose: jax.Array | np.ndarray | None = None,
    *,
    gt_source_points: jax.Array | np.ndarray | None = None,
    gt_target_points: jax.Array | np.ndarray | None = None,
    gt_valid: jax.Array | np.ndarray | None = None,
    key: jax.Array | None = None,
    run_benchmark: bool = False,
    num_source_points: int | None = None,
    stop_after: str | None = None,
    kd_index: kdtree.KDIndex | None = None,
) -> ICPResult:
    """Estimate the pose aligning ``source`` onto ``target``.

    Equivalent of ``ICPOptimizer::estimatePose`` (ICPOptimizer.h:140) with
    the convergence oracle passed explicitly: ``gt_source_points[i]`` pairs
    with ``gt_target_points[i]`` (see ConvergenceMeasure usage at
    main.cpp:110-124).

    ``kd_index`` (a host-built ``kdtree.KDIndex`` over the target, or over
    its color features under color-ICP) switches matching to the per-query
    k-d path — ~20x fewer candidate distances at ETH scale, identical
    results.
    """
    if init_pose is None:
        init_pose = jnp.eye(4, dtype=jnp.float32)
    init_pose = jnp.asarray(init_pose, jnp.float32)
    if key is None:
        key = jax.random.PRNGKey(0)

    if gt_source_points is None:
        gt_src = jnp.zeros((1, 3), jnp.float32)
        gt_tgt = jnp.zeros((1, 3), jnp.float32)
        gtv = jnp.ones((1,), bool)
    else:
        gt_src = jnp.asarray(gt_source_points, jnp.float32)
        gt_tgt = jnp.asarray(gt_target_points, jnp.float32)
        if gt_valid is None:
            gtv = jnp.ones(gt_src.shape[:1], bool)
        else:
            gtv = jnp.asarray(gt_valid, bool)

    # The multires base size is the reference's source.getPoints().size()
    # (ICPOptimizer.h:196) — the ORIGINAL vector length including any kept
    # invalid rows, not the valid count. Callers with image-shaped clouds
    # (keepOriginalSize) pass it explicitly.
    if num_source_points is None:
        num_source_points = int(np.asarray(jax.device_get(source.num_valid())))
    strides = cloud_lib.multires_stride_schedule(
        num_source_points,
        cfg.n_iterations,
        cfg.multi_resolution,
        cfg.multi_resolution_min_points,
    )

    return _run_icp_jit(
        cfg,
        int(strides.shape[0]),
        source,
        target,
        init_pose,
        jnp.asarray(strides),
        key,
        gt_src,
        gt_tgt,
        gtv,
        run_benchmark,
        stop_after=stop_after,
        kd_index=kd_index,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_iterations", "run_benchmark", "stop_after"),
)
def _run_icp_batch_jit(
    cfg: ICPConfig,
    num_iterations: int,
    sources: Cloud,        # leading batch axis on every leaf
    targets: Cloud,
    init_poses: jax.Array,  # (B, 4, 4)
    strides: jax.Array,     # (T,)
    keys: jax.Array,        # (B, 2)
    gt_src: jax.Array,      # (B, G, 3)
    gt_tgt: jax.Array,      # (B, G, 3)
    gt_valid: jax.Array,    # (B, G)
    run_benchmark: bool,
    kd_indexes: kdtree.KDIndex | None = None,  # leading batch axis per leaf
    stop_after: str | None = None,
    membership_seed: jax.Array | None = None,  # (B, capacity) int32
) -> ICPResult:
    def one(source, target, pose0, key, gs, gtv_, gv, kd, seed):
        return _run_icp_jit(
            cfg, num_iterations, source, target, pose0, strides, key,
            gs, gtv_, gv, run_benchmark, kd_index=kd, stop_after=stop_after,
            membership_seed=seed,
        )

    return jax.vmap(one)(
        sources, targets, init_poses, keys, gt_src, gt_tgt, gt_valid,
        kd_indexes, membership_seed,
    )


def run_icp_batch(
    cfg: ICPConfig,
    sources: Cloud,
    targets: Cloud,
    init_poses=None,
    *,
    gt_source_points=None,
    gt_target_points=None,
    gt_valid=None,
    key=None,
    run_benchmark: bool = False,
    num_source_points: int | None = None,
    kd_indexes: kdtree.KDIndex | None = None,
    stop_after: str | None = None,
    membership_seed=None,
    strides: np.ndarray | None = None,
) -> ICPResult:
    """Register a BATCH of scan pairs in one program (vmapped over the pair
    axis) — the single-chip data-parallel runner behind the ETH sweep's
    pairs/sec headline. All Cloud leaves carry a leading batch dimension;
    multires stride schedules are shared (pass equal-capacity clouds).

    ``strides`` (host array) overrides the computed per-iteration stride
    schedule — the segmented multires driver's GROUPED segments pass the
    group's strides relative to its slice (with ``cfg.multi_resolution``
    on so the in-scan lattice masks apply).

    ``membership_seed`` ((B, capacity) int32, approximate arm only)
    seeds the per-row block-membership cache — see ``_membership_applies``
    and the segmented multires driver, which threads each level's
    ``ICPResult.match_blocks`` into the next level's seed.

    ``num_source_points`` seeds the shared multires stride schedule; pass
    the max VALID count across the batch (the single-pair runner's
    source.getPoints().size() analog, ICPOptimizer.h:196). Defaults to the
    padded capacity, which for heavily padded clouds starts one level
    coarser than the equivalent single-pair run.
    """
    b = sources.points.shape[0]
    if init_poses is None:
        init_poses = jnp.tile(jnp.eye(4, dtype=jnp.float32), (b, 1, 1))
    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, b)
    if gt_source_points is None:
        gt_src = jnp.zeros((b, 1, 3), jnp.float32)
        gt_tgt = jnp.zeros((b, 1, 3), jnp.float32)
        gtv = jnp.ones((b, 1), bool)
    else:
        gt_src = jnp.asarray(gt_source_points, jnp.float32)
        gt_tgt = jnp.asarray(gt_target_points, jnp.float32)
        gtv = (
            jnp.asarray(gt_valid, bool)
            if gt_valid is not None
            else jnp.ones(gt_src.shape[:2], bool)
        )

    if num_source_points is None:
        num_source_points = int(sources.points.shape[1])
    if strides is None:
        strides = cloud_lib.multires_stride_schedule(
            num_source_points, cfg.n_iterations, cfg.multi_resolution,
            cfg.multi_resolution_min_points,
        )
    else:
        strides = np.asarray(strides, np.int32)
    return _run_icp_batch_jit(
        cfg, int(strides.shape[0]), sources, targets,
        jnp.asarray(init_poses, jnp.float32), jnp.asarray(strides), keys,
        gt_src, gt_tgt, gtv, run_benchmark, kd_indexes=kd_indexes,
        stop_after=stop_after,
        membership_seed=(
            None if membership_seed is None
            else jnp.asarray(membership_seed, jnp.int32)
        ),
    )


def stack_clouds(clouds) -> Cloud:
    """Stack equal-capacity Clouds along a new leading batch axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *clouds)


def run_icp_multires_segmented(
    cfg: ICPConfig,
    source: Cloud,
    target: Cloud,
    init_pose=None,
    *,
    gt_source_points=None,
    gt_target_points=None,
    gt_valid=None,
    key=None,
    run_benchmark: bool = False,
    num_source_points: int | None = None,
    kd_index: kdtree.KDIndex | None = None,
) -> ICPResult:
    """Single-pair counterpart of :func:`run_icp_batch_multires_segmented`
    (per-level executables for dense multires; falls through to
    :func:`run_icp` for any other configuration)."""
    if not (cfg.multi_resolution and cfg.selection == Selection.ALL):
        return run_icp(
            cfg, source, target, init_pose,
            gt_source_points=gt_source_points,
            gt_target_points=gt_target_points, gt_valid=gt_valid, key=key,
            run_benchmark=run_benchmark,
            num_source_points=num_source_points, kd_index=kd_index,
        )
    res = run_icp_batch_multires_segmented(
        cfg, stack_clouds([source]), stack_clouds([target]),
        None if init_pose is None else jnp.asarray(
            init_pose, jnp.float32)[None],
        key=key, num_source_points=num_source_points,
        kd_indexes=(
            kdtree.stack_kd_indexes([kd_index])
            if kd_index is not None else None
        ),
        run_benchmark=run_benchmark,
        gt_source_points=(
            None if gt_source_points is None
            else jnp.asarray(gt_source_points, jnp.float32)[None]
        ),
        gt_target_points=(
            None if gt_target_points is None
            else jnp.asarray(gt_target_points, jnp.float32)[None]
        ),
        gt_valid=(
            None if gt_valid is None
            else jnp.asarray(gt_valid, bool)[None]
        ),
    )
    return ICPResult(
        pose=res.pose[0], trace=jax.tree.map(lambda x: x[0], res.trace)
    )


def _stride_groups(strides: np.ndarray):
    """Consecutive (stride, count) runs of a multires schedule."""
    groups = []
    for s in np.asarray(strides).tolist():
        if groups and groups[-1][0] == s:
            groups[-1][1] += 1
        else:
            groups.append([int(s), 1])
    return [(s, c) for s, c in groups]


def _slice_clouds_stride(clouds: Cloud, stride: int) -> Cloud:
    """The stride-lattice subclouds (rows i with i % stride == 0, batch
    axis leading) as COMPACT clouds: the in-scan coarse_stride_mask's
    membership is a deterministic lattice under SELECT_ALL, so coarse
    levels can run at their own (much smaller) capacity instead of
    full-capacity masked. The finite-normal part of coarse_stride_mask
    folds into `valid`."""
    finite = jnp.isfinite(clouds.normals).all(axis=2)
    return Cloud(
        points=clouds.points[:, ::stride],
        normals=clouds.normals[:, ::stride],
        colors=clouds.colors[:, ::stride],
        valid=(clouds.valid & finite)[:, ::stride],
    )


# One program instead of ~6 eager slice dispatches per pyramid level
# (eager ops pay per-dispatch latency over this tunneled backend).
_slice_clouds_stride_jit = functools.partial(
    jax.jit, static_argnames="stride")(_slice_clouds_stride)


@functools.partial(
    jax.jit, static_argnames=("stride", "prev_stride", "cap_l"))
def _level_seed(blk, stride, prev_stride, cap_l):
    """Membership seed for a pyramid level from its parent level's
    matched blocks (see run_icp_batch_multires_segmented) — one program
    instead of ~28 eager dispatches."""
    parent = jnp.minimum(
        jnp.arange(cap_l, dtype=jnp.int32) * stride // prev_stride,
        blk.shape[1] - 1,
    )
    seed = blk[:, parent]
    # Seedless rows (-1: their stride-parent never matched) must not be
    # frozen out of the whole level — the seeded matcher searches
    # nothing for them, and they would stay -1 through every finer
    # level even once their true NN comes in range. Log-step neighbor
    # fill: borrow the nearest seeded row's block (raster/Morton
    # neighbors are spatially adjacent, so the borrowed block is a
    # sound approximate candidate set); rows with no seeded neighbor at
    # all stay -1. Edge-clamped neighbor borrow (NOT jnp.roll: a wrap
    # would hand edge rows a block from the spatially opposite end of
    # the cloud and re-create the far-seed starvation bug at the array
    # boundaries).
    for shift in (1, 2, 4, 8, 16, 32):
        fwd = jnp.pad(
            seed, ((0, 0), (0, shift)), mode="edge")[:, shift:]
        bwd = jnp.pad(
            seed, ((0, 0), (shift, 0)), mode="edge")[:, :-shift]
        seed = jnp.where(seed >= 0, seed,
                         jnp.where(fwd >= 0, fwd, bwd))
    return seed


# Segment planning for the segmented multires driver: each extra
# per-level program costs ~5.9 ms/frame of launch + eager-dispatch
# overhead over this tunneled backend, while a stride-MASKED (in-scan
# multires) iteration costs ~0.056 us per row of slice capacity — both
# hardware-measured at color bench shapes (scripts/evidence/
# block_target_probe.txt, "per-level floor decomposition": dropping the
# 10 coarse single-iteration programs recovered 59.3 ms/frame). The
# planner greedily merges consecutive coarse levels into ONE program on
# the group-finest stride's slice (coarser members run stride-masked
# in-scan, the mechanism the non-segmented multires path already uses)
# while the marginal masked-capacity cost of a merge stays below the
# program overhead it saves. At the color config's 12-level schedule
# this yields 4 programs: [2048..16], [8,4], [2], [1] — the fine
# (expensive, seeded) levels keep their own exact-capacity programs.
SEGMENT_PROGRAM_OVERHEAD_MS = 5.0
SEGMENT_QUERY_COST_MS = 5.6e-5  # per masked query-row iteration


def _plan_segments(levels, num_points, protect_tail=0):
    """Partition a schedule's consecutive [(stride, count), ...] runs
    into SEGMENTS, each run as one program sliced at the segment's
    finest stride with coarser members stride-masked in-scan.

    ``protect_tail`` keeps the last N runs as singleton segments
    regardless of the cost model — the membership-seeding path needs
    the stride-2 parent and stride-1 levels as separate programs (the
    seed hand-off rides ``ICPResult.match_blocks`` between programs),
    and at small cloud scales the cost model would otherwise merge
    everything into one program and silently disable seeding."""

    def extra_ms(seg, slice_stride):
        cap = num_points / slice_stride
        return sum(
            c * (cap - num_points / s) * SEGMENT_QUERY_COST_MS
            for s, c in seg
        )

    protect_tail = min(protect_tail, len(levels))
    head = levels[:len(levels) - protect_tail] if protect_tail else levels
    segments, cur = [], []
    for s, c in head:
        if cur:
            delta = (extra_ms(cur + [(s, c)], s)
                     - extra_ms(cur, cur[-1][0]))
            if delta < SEGMENT_PROGRAM_OVERHEAD_MS:
                cur.append((s, c))
                continue
            segments.append(cur)
        cur = [(s, c)]
    if cur:
        segments.append(cur)
    for s, c in levels[len(levels) - protect_tail:] if protect_tail else []:
        segments.append([(s, c)])
    return segments


def run_icp_batch_multires_segmented(
    cfg: ICPConfig,
    sources: Cloud,
    targets: Cloud,
    init_poses=None,
    *,
    key=None,
    num_source_points: int | None = None,
    kd_indexes: kdtree.KDIndex | None = None,
    run_benchmark: bool = False,
    gt_source_points=None,
    gt_target_points=None,
    gt_valid=None,
) -> ICPResult:
    """Multi-resolution registration with PER-LEVEL executables — the
    dense (SELECT_ALL) pyramid driver.

    The in-scan multires path keeps one executable by stride-MASKING the
    full-capacity cloud, so a stride-64 coarse iteration pays the same
    full-capacity matching/weighting/solve as a stride-1 iteration (the
    dense TUM tracker's coarse 11 of 35 iterations cost ~33 ms/frame each
    for <2% of the points — scripts/evidence/batched_stage_log.txt).
    Under SELECT_ALL the stride membership is a deterministic lattice, so
    each level here runs as its own compiled program on the stride-SLICED
    source (points[::stride] — a slice, not a gather), threading the pose
    across levels; the target side (and its kd index) is shared
    unchanged. Level results are identical to the in-scan path up to f32
    reduction order (pinned by tests); per-level compiles are cached like
    any other shape.

    Only meaningful for ``multi_resolution`` + ``Selection.ALL`` configs;
    other configs fall through to :func:`run_icp_batch`.
    """
    if not (cfg.multi_resolution and cfg.selection == Selection.ALL):
        return run_icp_batch(
            cfg, sources, targets, init_poses, key=key,
            num_source_points=num_source_points, kd_indexes=kd_indexes,
            run_benchmark=run_benchmark,
            gt_source_points=gt_source_points,
            gt_target_points=gt_target_points, gt_valid=gt_valid,
        )
    b = sources.points.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)
    if init_poses is None:
        init_poses = jnp.tile(jnp.eye(4, dtype=jnp.float32), (b, 1, 1))
    if num_source_points is None:
        num_source_points = int(sources.points.shape[1])
    strides = np.asarray(cloud_lib.multires_stride_schedule(
        num_source_points, cfg.n_iterations, True,
        cfg.multi_resolution_min_points,
    ))
    poses = jnp.asarray(init_poses, jnp.float32)
    traces = []
    # Approximate-arm membership cache threads ACROSS pyramid levels:
    # level L+1's rows seed from their stride-parent's matched block
    # (strides halve, so fine row j' descends from coarse row j'//ratio;
    # -1 parents borrow the next neighbor's block). Seeding is gated to
    # levels whose PARENT lattice is at most SEED_MAX_PARENT_STRIDE
    # apart: a seed inherited from a far-away lattice pixel lands in the
    # wrong COLOR region of the 6-dim tree, the restricted search then
    # finds nothing inside the threshold, and the row never re-ranks —
    # seeding every level collapsed the fine level's match set 4x and
    # cost 13 mm of accuracy on the TUM family (t_err 13.9 vs 0.86 mm,
    # scripts/evidence/block_target_probe.txt). With the gate, coarse
    # levels run the cheap ranked search (they hold few queries) and the
    # expensive fine levels inherit from 1-2-pixel-adjacent parents.
    blk, prev_stride = None, None
    protect = (
        2 if (_membership_applies(cfg) and SEED_MAX_PARENT_STRIDE >= 2)
        else 0
    )
    segments = _plan_segments(
        _stride_groups(strides), num_source_points, protect_tail=protect)
    for li, seg in enumerate(segments):
        s_min = seg[-1][0]
        n_it = sum(c for _, c in seg)
        src_l = _slice_clouds_stride_jit(sources, stride=s_min)
        if len(seg) == 1:
            # Exact-capacity level program (the expensive fine levels).
            cfg_l = cfg.replace(multi_resolution=False, n_iterations=n_it)
            seg_strides = None
        else:
            # Grouped coarse segment: one program on the s_min slice,
            # coarser members stride-masked in-scan (the non-segmented
            # multires mechanism) — their masked capacity is tiny by
            # the planner's cost model, and each merge saves a
            # ~5.9 ms/frame program floor.
            cfg_l = cfg.replace(multi_resolution=True, n_iterations=n_it)
            seg_strides = np.concatenate([
                np.full(c, s // s_min, np.int32) for s, c in seg
            ])
        seed = None
        if (
            blk is not None
            and prev_stride <= SEED_MAX_PARENT_STRIDE
            and _membership_applies(cfg_l)
        ):
            seed = _level_seed(
                blk, stride=s_min, prev_stride=prev_stride,
                cap_l=src_l.points.shape[1],
            )
        res = run_icp_batch(
            cfg_l, src_l, targets, poses,
            key=jax.random.fold_in(key, li),
            kd_indexes=kd_indexes, run_benchmark=run_benchmark,
            gt_source_points=gt_source_points,
            gt_target_points=gt_target_points, gt_valid=gt_valid,
            membership_seed=seed, strides=seg_strides,
        )
        poses = res.pose
        traces.append(res.trace)
        if res.match_blocks is not None:
            blk, prev_stride = res.match_blocks, s_min
    trace = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=1), *traces)
    return ICPResult(pose=poses, trace=trace)


# Below this size the kd build + extra program outweigh the candidate
# savings (the visited-list kernel already prunes well on small clouds).
KD_MIN_POINTS = 20_000
# When the page table does NOT fit the resident kernel's VMEM budget the
# streaming union kernel runs, and it pays only when the query set is
# SPARSE: its per-query block work is radius-independent, so with dense
# queries (SELECT_ALL) and a tight threshold the radius-pruned
# visited-list kernel wins instead (measured on the TUM room tracker: 51
# vs 32 ms/iter, scripts/bench_projective_log). The RESIDENT kernel has
# no per-block DMA, and dense Morton/raster-coherent query tiles have
# tiny block unions — dense selection is its BEST case, so the gate
# opens fully whenever it will run (bench: the dense color-multires
# config lost to its CPU proxy on the visited-kernel path, 0.77x).
KD_MAX_SELECTION_P = 0.05


def _kd_resident_will_run(cfg: ICPConfig, capacity: int) -> bool:
    """Whether :func:`kdtree.match_kd` would pick the resident kernel for
    a target of this capacity (page-table shapes depend on capacity
    alone)."""
    depth = kdtree.kd_depth_for(
        capacity, cfg.kd_block_target or kdtree.default_block_target(
            cfg.color_icp, cfg.matching_checks > 0))
    nc = 1 << depth
    cap_pad = ((-(-capacity // nc)) + 127) // 128 * 128
    # Either layout qualifies: the preferred one-block-per-page table, or
    # (for 3-dim geometry past the VMEM budget) the packed fallback that
    # doubles the resident-eligible capacity (kdtree._resident_layout).
    return knn.resident_fits(nc, cap_pad) or knn.resident_fits(
        nc, cap_pad, d=6 if cfg.color_icp else 3
    )


def _kd_selection_applies(cfg: ICPConfig, capacity: int | None = None) -> bool:
    """Single source of truth for "the per-query kd path will run with this
    selection config": any selection when the resident kernel applies
    (``capacity`` known), sparse compacted random selection otherwise.
    Every runner (bench, CLI sweep, experiments) gates its kd build
    through ``build_kd_for`` -> here, so the production matcher
    configuration always equals the benchmarked one."""
    if capacity is not None and _kd_resident_will_run(cfg, capacity):
        return True
    if cfg.selection not in (Selection.RANDOM, Selection.RANDOM_FAST):
        return False
    if cfg.selection_proba > KD_MAX_SELECTION_P:
        return False
    if cfg.selection == Selection.RANDOM and not cfg.compact_queries:
        # Non-compacted Bernoulli keeps the full-capacity query vector;
        # the per-query kd search only wins over the tile kernel when the
        # query set is the compacted sparse selection.
        return False
    return True


def build_kd_for(
    cfg: ICPConfig, target: Cloud, min_points: int = KD_MIN_POINTS
) -> kdtree.KDIndex | None:
    """Host-side kd-index build for the production matching path.

    Returns a ``kdtree.KDIndex`` over the target (or its 6-dim color
    features under color-ICP) when k-NN matching is configured, the cloud
    is large enough to benefit, and either the resident kernel applies
    (any selection) or selection is sparse (the streaming kernels'
    winning regime); ``None`` otherwise. The reference analog is the
    one-time FLANN buildIndex (NearestNeighbor.h:122-141).
    """
    if cfg.matching != Matching.KNN:
        return None
    if not _kd_selection_applies(cfg, capacity=target.capacity):
        return None
    valid = np.asarray(jax.device_get(target.valid))
    if int(valid.sum()) < min_points:
        return None
    if cfg.color_icp:
        feats = np.asarray(
            jax.device_get(knn.color_features(target.points, target.colors))
        )
    else:
        feats = np.asarray(jax.device_get(target.points))
    return kdtree.build_kd_index(
        feats, valid,
        block_target=cfg.kd_block_target or kdtree.default_block_target(
            cfg.color_icp, cfg.matching_checks > 0),
    )
