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
  JTJ/JTr per LM step — cross the axis via ``psum`` over ICI. Per-step
  communication is a few hundred bytes per pair; compute splits N-ways.

Implemented with ``shard_map`` so the collective placement is explicit and
the Pallas matching kernel composes (GSPMD cannot partition a pallas_call,
and its gather-sharding inference rejects the masked gathers anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from icp_variants_tpu.core.cloud import Cloud
from icp_variants_tpu.pipeline import icp
from icp_variants_tpu.pipeline.config import ICPConfig

POINTS_AXIS = "points"
PAIRS_AXIS = "pairs"


def make_sharded_icp_step(cfg: ICPConfig, mesh):
    """Build a jitted, mesh-sharded batched ICP training step.

    Returns ``step(src..., tgt..., poses, keys) -> new_poses`` over a leading
    ``pairs`` batch axis. Source arrays shard ``P('pairs', 'points')``;
    target arrays shard ``P('pairs')`` (replicated over ``points``); poses
    and keys shard ``P('pairs')``.
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
            new_pose, _trace = icp._iteration(
                cfg, source, target, pose, stride, key, gt, gt, gtv,
                run_benchmark=False, axis_name=POINTS_AXIS,
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
