"""The bunny workload — mesh-to-mesh ICP, the canonical entry point.

Equivalent of ``alignBunnyWithICP`` (main.cpp:43-181): align
``bunny_part2_trans`` onto ``bunny_part1`` with k-NN matching at max squared
distance 3e-4, 20 iterations, and the 4 hand-verified GT pairs as the
convergence oracle.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np

from icp_variants_tpu.data.loaders import BunnyDataLoader
from icp_variants_tpu.pipeline import icp
from icp_variants_tpu.pipeline.config import ICPConfig, Metric, Minimizer


def default_config(**overrides) -> ICPConfig:
    """The bunny run configuration of main.cpp:59-98."""
    cfg = ICPConfig(
        metric=Metric.POINT_TO_POINT,
        minimizer=Minimizer.NONLINEAR_LM,
        n_iterations=20,
        max_distance=0.0003,
    )
    return cfg.replace(**overrides)


@dataclass
class BunnyRunResult:
    pose: np.ndarray
    rmse_per_iteration: np.ndarray
    final_rmse: float
    num_matches: np.ndarray


def align_bunny(
    cfg: ICPConfig | None = None,
    data_dir: str | None = None,
    seed: int = 0,
) -> BunnyRunResult:
    cfg = cfg or default_config()
    loader = BunnyDataLoader(data_dir=data_dir)
    sample = loader.get_item(0)
    gt_src, gt_tgt = loader.gt_correspondences()

    result = icp.run_icp(
        cfg,
        sample.source,
        sample.target,
        init_pose=np.eye(4, dtype=np.float32),
        gt_source_points=gt_src,
        gt_target_points=gt_tgt,
        key=jax.random.PRNGKey(seed),
    )
    rmse = np.asarray(jax.device_get(result.trace.rmse))
    return BunnyRunResult(
        pose=np.asarray(jax.device_get(result.pose)),
        rmse_per_iteration=rmse,
        final_rmse=float(rmse[-1]),
        num_matches=np.asarray(jax.device_get(result.trace.num_matches)),
    )


if __name__ == "__main__":
    res = align_bunny()
    print("per-iteration RMSE:")
    for i, r in enumerate(res.rmse_per_iteration):
        print(f"  {i:02d}  {r:.6f}")
    print("final RMSE:", res.final_rmse)
    print("pose:\n", res.pose)
