"""High-level one-call registration API.

The reference's user experience is "configure an ICPOptimizer, call
estimatePose" (ICPOptimizer.h:41-140). The equivalent here is one function:

    import icp_variants_tpu as icp
    result = icp.register(source_points, target_points,
                          config=icp.ICPConfig(metric=icp.Metric.SYMMETRIC))
    result.pose          # (4, 4) aligning source onto target
    result.rmse          # per-iteration curve vs. the provided oracle

Host numpy in, host numpy out; normals are estimated on device when not
provided (k=5 k-NN PCA, the PCL path of PointCloud.h:41-76).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from icp_variants_tpu.pipeline.config import ICPConfig


@dataclass
class RegistrationResult:
    pose: np.ndarray               # (4, 4) estimated transform (source -> target)
    rmse: np.ndarray               # (T,) per-iteration RMSE vs the oracle
    benchmark_error: np.ndarray    # (T,) Fontana error (zeros unless requested)
    num_matches: np.ndarray        # (T,) valid correspondences per iteration

    @property
    def final_rmse(self) -> float:
        return float(self.rmse[-1])


def register(
    source_points: np.ndarray,
    target_points: np.ndarray,
    config: ICPConfig | None = None,
    *,
    source_normals: np.ndarray | None = None,
    target_normals: np.ndarray | None = None,
    source_colors: np.ndarray | None = None,
    target_colors: np.ndarray | None = None,
    initial_pose: np.ndarray | None = None,
    gt_source_points: np.ndarray | None = None,
    gt_target_points: np.ndarray | None = None,
    run_benchmark: bool = False,
    normal_k: int = 5,
    seed: int = 0,
) -> RegistrationResult:
    """Align ``source_points`` onto ``target_points`` with the configured
    ICP variant; returns the pose and per-iteration diagnostics.

    Without explicit normals they are estimated with k-NN PCA. Without an
    explicit GT oracle the RMSE curve measures source-vs-its-own-start
    (useful as a motion magnitude, not an error).
    """
    import jax
    import jax.numpy as jnp

    from icp_variants_tpu.core import cloud as cloud_lib
    from icp_variants_tpu.ops import normals as normals_ops
    from icp_variants_tpu.pipeline import icp as icp_mod

    config = config or ICPConfig()

    # Projective matching indexes the target as an image grid (v*width+u,
    # ops/projective.py); Morton ordering would scramble that layout into
    # silently wrong correspondences. Keep image order for projective runs
    # (the room workload path); Morton-order otherwise for k-NN pruning.
    from icp_variants_tpu.pipeline.config import Matching

    morton = config.matching != Matching.PROJECTIVE

    def make_cloud(pts, nrm, col):
        pts = np.asarray(pts, np.float32)
        if nrm is None:
            finite = np.isfinite(pts).all(axis=1)
            if len(pts) >= 20_000:
                # Morton-banded exact k-NN (tens of ms at ETH scale; the
                # dense sweep is ~seconds) — same gate as the data loaders.
                nrm = np.asarray(
                    normals_ops.estimate_normals_knn_fast(
                        pts, finite, k=normal_k
                    )
                )
            else:
                nrm = np.asarray(
                    normals_ops.estimate_normals_knn(
                        jnp.asarray(pts), jnp.asarray(finite), k=normal_k
                    )
                )
        return cloud_lib.from_numpy(
            pts, normals=nrm, colors=col, morton_order=morton
        )

    source = make_cloud(source_points, source_normals, source_colors)
    target = make_cloud(target_points, target_normals, target_colors)

    if (gt_source_points is None) != (gt_target_points is None):
        raise ValueError(
            "gt_source_points and gt_target_points must be given together "
            "(row i of one corresponds to row i of the other)"
        )
    if gt_source_points is None:
        # Motion-magnitude oracle: valid source points vs their start.
        gt_src = np.asarray(source.points)
        gt_tgt = gt_src.copy()
        gt_valid = np.asarray(source.valid)
    else:
        gt_src = np.asarray(gt_source_points, np.float32)
        gt_tgt = np.asarray(gt_target_points, np.float32)
        gt_valid = None

    kd_index = icp_mod.build_kd_for(config, target)
    res = icp_mod.run_icp(
        config, source, target,
        init_pose=initial_pose,
        gt_source_points=gt_src,
        gt_target_points=gt_tgt,
        gt_valid=gt_valid,
        key=jax.random.PRNGKey(seed),
        run_benchmark=run_benchmark,
        # Large targets match through the per-query kd path (the bench
        # headline's production matcher); None for small/projective runs.
        kd_index=kd_index,
    )
    return RegistrationResult(
        pose=np.asarray(jax.device_get(res.pose)),
        rmse=np.asarray(jax.device_get(res.trace.rmse)),
        benchmark_error=np.asarray(jax.device_get(res.trace.benchmark)),
        num_matches=np.asarray(jax.device_get(res.trace.num_matches)),
    )
