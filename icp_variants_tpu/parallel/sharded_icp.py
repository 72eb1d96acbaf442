"""Multi-device ICP: scan pairs and point shards over a 2-D mesh.

The reference is strictly single-process (SURVEY §2.2): its ETH sweep walks
scan pairs sequentially (main.cpp:411) and its only parallelism is OpenMP.
Here the two natural axes distribute over a ``jax.sharding.Mesh``:

* ``pairs``  — data parallel over registration problems (scan pairs, TUM
  frames, experiment-CSV rows). Embarrassingly parallel; zero collectives.
* ``points`` — tensor parallel within a pair: SOURCE points shard across
  devices, each device matches its query shard against the replicated
  target (so the k-NN Pallas kernel runs unchanged per shard), and the
  solvers' reductions — means, 3x3 cross-covariance, 6x6 normal equations,
  JTJ/JTr per LM step, the RMSE/benchmark error sums — cross the axis via
  ``psum`` over ICI. Per-step communication is a few hundred bytes per
  pair; compute splits N-ways.

Every device keeps the one-time Morton/bbox ``TargetIndex`` (the FLANN
``buildIndex`` economy, NearestNeighbor.h:122-141) as a REPLICATED
structure: the target is replicated over ``points`` anyway and the build is
a single cheap pass, so each shard constructs it locally with zero
communication and matching stays on the pruned kernel.

Implemented with ``shard_map`` so the collective placement is explicit and
the Pallas matching kernel composes (GSPMD cannot partition a pallas_call,
and its gather-sharding inference rejects the masked gathers anyway).

``run_icp_batch_sharded`` is the full driver: the complete multires scan of
``pipeline/icp.py`` (one compiled executable per config) over both mesh
axes — the distributed equivalent of the sequential ETH sweep loop
(main.cpp:411).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from icp_variants_tpu.core import cloud as cloud_lib
from icp_variants_tpu.core.cloud import Cloud
from icp_variants_tpu.ops import knn
from icp_variants_tpu.pipeline import icp
from icp_variants_tpu.pipeline.config import ICPConfig, Matching
from icp_variants_tpu.solvers import anderson

POINTS_AXIS = "points"
PAIRS_AXIS = "pairs"


def _build_index(cfg: ICPConfig, tgt_points, tgt_colors):
    """The per-device replicated buildIndex step (None off the k-NN path)."""
    if cfg.matching != Matching.KNN:
        return None
    if cfg.color_icp:
        feats = knn.color_features(tgt_points, tgt_colors)
    else:
        feats = tgt_points
    return knn.build_target_index(feats, tile_t=knn.V2_TILE_T)


def pad_cloud_rows(cloud: Cloud, multiple: int) -> Cloud:
    """Pad a (possibly batched) Cloud's point axis so it splits evenly into
    ``multiple`` shards: sentinel points, NaN normals, invalid rows."""
    cap = cloud.points.shape[-2]
    pad = (-cap) % multiple
    if pad == 0:
        return cloud
    width2 = [(0, 0)] * (cloud.points.ndim - 2) + [(0, pad), (0, 0)]
    width1 = [(0, 0)] * (cloud.valid.ndim - 1) + [(0, pad)]
    return Cloud(
        points=jnp.pad(cloud.points, width2, constant_values=cloud_lib.PAD_SENTINEL),
        normals=jnp.pad(cloud.normals, width2, constant_values=np.nan),
        colors=jnp.pad(cloud.colors, width2),
        valid=jnp.pad(cloud.valid, width1),
    )


def make_sharded_icp_step(cfg: ICPConfig, mesh):
    """Build a jitted, mesh-sharded batched ICP training step (ONE
    iteration; see :func:`run_icp_batch_sharded` for the full scan).

    Returns ``step(src..., tgt..., poses, keys) -> new_poses`` over a leading
    ``pairs`` batch axis. Source arrays shard ``P('pairs', 'points')``;
    target arrays shard ``P('pairs')`` (replicated over ``points``); poses
    and keys shard ``P('pairs')``. k-NN matching goes through the pruned
    ``TargetIndex`` kernel, built replicated per device.
    """

    def local_step(
        src_points, src_normals, src_colors, src_valid,
        tgt_points, tgt_normals, tgt_colors, tgt_valid,
        poses, keys,
    ):
        gt = jnp.zeros((1, 3), jnp.float32)
        gtv = jnp.ones((1,), bool)
        stride = jnp.asarray(1, jnp.int32)

        def one(sp, sn, sc, sv, tp, tn, tc, tv, pose, key):
            source = Cloud(points=sp, normals=sn, colors=sc, valid=sv)
            target = Cloud(points=tp, normals=tn, colors=tc, valid=tv)
            index = _build_index(cfg, tp, tc)
            new_pose, _cache, _trace = icp._iteration(
                cfg, source, target, pose, stride, key, gt, gt, gtv,
                run_benchmark=False, axis_name=POINTS_AXIS, target_index=index,
            )
            return new_pose

        return jax.vmap(one)(
            src_points, src_normals, src_colors, src_valid,
            tgt_points, tgt_normals, tgt_colors, tgt_valid,
            poses, keys,
        )

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            P(PAIRS_AXIS, POINTS_AXIS), P(PAIRS_AXIS, POINTS_AXIS),
            P(PAIRS_AXIS, POINTS_AXIS), P(PAIRS_AXIS, POINTS_AXIS),
            P(PAIRS_AXIS), P(PAIRS_AXIS), P(PAIRS_AXIS), P(PAIRS_AXIS),
            P(PAIRS_AXIS), P(PAIRS_AXIS),
        ),
        out_specs=P(PAIRS_AXIS),
    )
    return jax.jit(sharded)


def run_icp_batch_sharded(
    cfg: ICPConfig,
    sources: Cloud,          # leading batch axis on every leaf
    targets: Cloud,
    mesh,
    init_poses=None,
    *,
    gt_source_points=None,   # (B, G, 3)
    gt_target_points=None,   # (B, G, 3)
    gt_valid=None,           # (B, G)
    key=None,
    run_benchmark: bool = False,
    num_source_points: int | None = None,
    kd_indexes=None,         # kdtree.KDIndex, leading batch axis per leaf
) -> icp.ICPResult:
    """The FULL ICP driver (multires stride schedule, per-iteration trace,
    benchmark error — everything ``run_icp_batch`` does) distributed over a
    device mesh: scan pairs across ``pairs`` (if present), each pair's
    source points across ``points`` (if present).

    Results are bitwise-independent of the mesh layout up to float reduction
    order: matching runs per query shard against the replicated pruned
    index; solver and error reductions psum over ``points``.

    ``kd_indexes`` (host-built per-target ``kdtree.KDIndex``, stacked over
    the batch) switches matching to the per-query k-d path, sharded over
    ``pairs`` and replicated over ``points`` exactly like the target — each
    query shard searches the full index, so results are layout-independent.

    Queries enumerate in load-time Morton order, same as the unsharded
    runner (the block-aligned query re-enumeration experiment was deleted
    after losing on hardware in every configuration — see
    scripts/evidence/warm_ab_sweep2_log.txt).
    """
    has_pairs = PAIRS_AXIS in mesh.shape
    has_points = POINTS_AXIS in mesh.shape
    n_points_shards = mesh.shape.get(POINTS_AXIS, 1)
    n_pairs_shards = mesh.shape.get(PAIRS_AXIS, 1)

    b = sources.points.shape[0]
    if b % n_pairs_shards != 0:
        raise ValueError(
            f"batch {b} does not divide over {n_pairs_shards} pair shards; "
            "pad the batch (repeat a pair) to a multiple"
        )
    # The stride schedule must come from the PRE-padding capacity: padding
    # depends on the mesh's points-axis size, and a mesh-dependent schedule
    # would break the layout-independence contract (and parity with the
    # unsharded runner on the same data).
    if num_source_points is None:
        num_source_points = int(sources.points.shape[1])
    # Shard the point axis evenly; PAD_MULTIPLE tiles per shard keeps the
    # Pallas kernel's query tiling legal on every device.
    sources = pad_cloud_rows(sources, n_points_shards * cloud_lib.PAD_MULTIPLE)

    strides = jnp.asarray(cloud_lib.multires_stride_schedule(
        num_source_points, cfg.n_iterations, cfg.multi_resolution,
        cfg.multi_resolution_min_points,
    ))

    if init_poses is None:
        init_poses = jnp.tile(jnp.eye(4, dtype=jnp.float32), (b, 1, 1))
    init_poses = jnp.asarray(init_poses, jnp.float32)
    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, b)

    if gt_source_points is None:
        gt_src = jnp.zeros((b, n_points_shards, 3), jnp.float32)
        gt_tgt = jnp.zeros((b, n_points_shards, 3), jnp.float32)
        gtv = jnp.ones((b, n_points_shards), bool)
    else:
        gt_src = jnp.asarray(gt_source_points, jnp.float32)
        gt_tgt = jnp.asarray(gt_target_points, jnp.float32)
        gtv = (
            jnp.asarray(gt_valid, bool)
            if gt_valid is not None
            else jnp.ones(gt_src.shape[:2], bool)
        )
        pad = (-gt_src.shape[1]) % n_points_shards
        if pad:
            gt_src = jnp.pad(gt_src, ((0, 0), (0, pad), (0, 0)))
            gt_tgt = jnp.pad(gt_tgt, ((0, 0), (0, pad), (0, 0)))
            gtv = jnp.pad(gtv, ((0, 0), (0, pad)))

    spec_src, spec_tgt, spec_pair = _specs(has_pairs, has_points)
    runner = _sharded_runner(cfg, mesh, run_benchmark, kd_indexes is not None)

    def place(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    kd_leaves = (
        tuple(place(x, spec_tgt) for x in jax.tree.leaves(kd_indexes))
        if kd_indexes is not None
        else ()
    )
    return runner(
        place(sources.points, spec_src), place(sources.normals, spec_src),
        place(sources.colors, spec_src), place(sources.valid, spec_src),
        place(targets.points, spec_tgt), place(targets.normals, spec_tgt),
        place(targets.colors, spec_tgt), place(targets.valid, spec_tgt),
        place(gt_src, spec_src), place(gt_tgt, spec_src), place(gtv, spec_src),
        place(init_poses, spec_pair), place(keys, spec_pair),
        strides,
        *kd_leaves,
    )


def _specs(has_pairs: bool, has_points: bool):
    pair = PAIRS_AXIS if has_pairs else None
    pts = POINTS_AXIS if has_points else None
    return P(pair, pts), P(pair), P(pair)


@functools.lru_cache(maxsize=64)
def _sharded_runner(cfg: ICPConfig, mesh, run_benchmark: bool, has_kd: bool):
    """Jitted full-scan runner for (cfg, mesh); cached so repeated sweeps
    reuse one executable per shape set."""
    from icp_variants_tpu.ops import kdtree

    has_pairs = PAIRS_AXIS in mesh.shape
    has_points = POINTS_AXIS in mesh.shape
    axis_name = POINTS_AXIS if has_points else None
    spec_src, spec_tgt, spec_pair = _specs(has_pairs, has_points)
    n_kd_leaves = len(kdtree.KDIndex._fields) if has_kd else 0

    def local(
        sp, sn, sc, sv, tp, tn, tc, tv,
        gs, gt_, gv, poses0, keys, strides, *kd_leaves,
    ):
        n_iter = strides.shape[0]

        def one(sp, sn, sc, sv, tp, tn, tc, tv, gs, gt_, gv, pose0, key,
                *kd_leaves):
            source = Cloud(points=sp, normals=sn, colors=sc, valid=sv)
            target = Cloud(points=tp, normals=tn, colors=tc, valid=tv)
            index = _build_index(cfg, tp, tc)
            kd = kdtree.KDIndex(*kd_leaves) if kd_leaves else None
            ks = jax.random.split(key, n_iter)
            if cfg.color_icp:
                feats = knn.color_features(tp, tc)
            else:
                feats = tp
            # Warm-start cache over this shard's LOCAL source rows (the kd
            # index + target feats are replicated over 'points', so cached
            # ORIGINAL target rows are globally meaningful on every shard).
            # Derived from an operand (not jnp.full) so the scan carry has
            # the same varying-manual-axes as the body's output under
            # shard_map.
            cache0 = (
                sv[:: cfg.kd_warm_granule].astype(jnp.int32) * 0 - 1
                if kd is not None and icp._warm_applies(cfg)
                else None
            )

            # AA-ICP mixing state (solvers/anderson.py): pure pose-space,
            # so it is replicated along 'points' exactly like the pose —
            # the psum-reduced solve makes new_pose identical on every
            # shard, and the AA extrapolation is elementwise on it.
            aa0 = (
                anderson.init_like(cfg.anderson_m, pose0)
                if cfg.anderson_m > 0
                else None
            )

            # Fused row tables hoisted out of the scan (icp._fuse_cloud_table).
            src_table = icp._fuse_cloud_table(source)
            tgt_table = icp._fuse_cloud_table(target)

            def body(carry, per):
                pose, cache, aa = carry
                stride, k = per
                new_pose, new_cache, rec = icp._iteration(
                    cfg, source, target, pose, stride, k, gs, gt_, gv,
                    run_benchmark, axis_name=axis_name, target_index=index,
                    kd_index=kd, match_cache=cache, target_feats=feats,
                    src_table=src_table, tgt_table=tgt_table,
                )
                if aa is not None:
                    aa, x_next = anderson.step(
                        aa, anderson.pose_to_vec(pose),
                        anderson.pose_to_vec(new_pose), cfg.anderson_m,
                    )
                    new_pose = anderson.vec_to_pose(x_next)
                return (new_pose, new_cache, aa), rec

            (final, _, _), trace = jax.lax.scan(
                body, (pose0, cache0, aa0), (strides, ks)
            )
            return icp.ICPResult(pose=final, trace=trace)

        return jax.vmap(
            one,
            in_axes=(0,) * (13 + n_kd_leaves),
        )(sp, sn, sc, sv, tp, tn, tc, tv, gs, gt_, gv, poses0, keys,
          *kd_leaves)

    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            spec_src, spec_src, spec_src, spec_src,
            spec_tgt, spec_tgt, spec_tgt, spec_tgt,
            spec_src, spec_src, spec_src,
            spec_pair, spec_pair,
            P(),
        ) + (spec_tgt,) * n_kd_leaves,
        out_specs=icp.ICPResult(
            pose=spec_pair,
            trace=icp.ICPTrace(
                rmse=spec_pair, benchmark=spec_pair, num_matches=spec_pair
            ),
        ),
    )
    return jax.jit(sharded)


def run_icp_sharded(
    cfg: ICPConfig,
    source: Cloud,
    target: Cloud,
    mesh,
    init_pose=None,
    **kwargs,
) -> icp.ICPResult:
    """Single-pair full sharded run: :func:`run_icp_batch_sharded` with a
    batch of one (points-axis tensor parallelism only makes sense here)."""
    batch_src = jax.tree.map(lambda x: x[None], source)
    batch_tgt = jax.tree.map(lambda x: x[None], target)
    for k in ("gt_source_points", "gt_target_points", "gt_valid"):
        if kwargs.get(k) is not None:
            kwargs[k] = jnp.asarray(kwargs[k])[None]
    if kwargs.get("kd_index") is not None:
        kwargs["kd_indexes"] = jax.tree.map(
            lambda x: x[None], kwargs.pop("kd_index")
        )
    init_poses = None if init_pose is None else jnp.asarray(init_pose)[None]
    res = run_icp_batch_sharded(
        cfg, batch_src, batch_tgt, mesh, init_poses, **kwargs
    )
    return icp.ICPResult(
        pose=res.pose[0],
        trace=icp.ICPTrace(
            rmse=res.trace.rmse[0],
            benchmark=res.trace.benchmark[0],
            num_matches=res.trace.num_matches[0],
        ),
    )
