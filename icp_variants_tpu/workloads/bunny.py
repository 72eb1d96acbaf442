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
    artifacts_dir: str | None = None,
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
    run = BunnyRunResult(
        pose=np.asarray(jax.device_get(result.pose)),
        rmse_per_iteration=rmse,
        final_rmse=float(rmse[-1]),
        num_matches=np.asarray(jax.device_get(result.trace.num_matches)),
    )
    if artifacts_dir is not None:
        write_artifacts(artifacts_dir, loader, sample, run, gt_src, gt_tgt)
    return run


def write_artifacts(out_dir, loader, sample, run, gt_src, gt_tgt) -> None:
    """The bunny driver's output files (main.cpp:144-176): source/target/
    aligned clouds as .ply, per-iteration RMSE.txt, and the joined
    visualization mesh with correspondence spheres as bunny_icp.off."""
    import os

    from icp_variants_tpu.data import mesh as mesh_lib
    from icp_variants_tpu.data import ply_io
    from icp_variants_tpu.workloads.experiments import write_error_file

    os.makedirs(out_dir, exist_ok=True)
    src_valid = np.asarray(sample.source.valid)
    src_pts = np.asarray(sample.source.points)[src_valid]
    src_nrm = np.asarray(sample.source.normals)[src_valid]
    tgt_valid = np.asarray(sample.target.valid)
    tgt_pts = np.asarray(sample.target.points)[tgt_valid]
    tgt_nrm = np.asarray(sample.target.normals)[tgt_valid]
    ones_s = np.ones(len(src_pts), np.float32)

    ply_io.write_ply(os.path.join(out_dir, "bunny_source.ply"), src_pts,
                     normals=src_nrm, intensity=ones_s)
    ply_io.write_ply(os.path.join(out_dir, "bunny_target.ply"), tgt_pts,
                     normals=tgt_nrm, intensity=np.ones(len(tgt_pts), np.float32))
    moved = src_pts @ run.pose[:3, :3].T + run.pose[:3, 3]
    ply_io.write_ply(os.path.join(out_dir, "bunny_final_source.ply"), moved,
                     normals=src_nrm @ run.pose[:3, :3].T, intensity=ones_s)
    write_error_file(os.path.join(out_dir, "RMSE.txt"), run.rmse_per_iteration)

    # Joined visualization mesh with GT-correspondence spheres
    # (SHOW_BUNNY_CORRESPONDENCES, main.cpp:153-172). Per-point spheres are
    # limited to the GT pairs to keep the artifact a few MB.
    src_mesh = mesh_lib.TriMesh(
        loader.source_mesh.vertices, loader.source_mesh.triangles,
        loader.source_mesh.vertex_colors,
    )
    tgt_mesh = mesh_lib.TriMesh(
        loader.target_mesh.vertices, loader.target_mesh.triangles,
        loader.target_mesh.vertex_colors,
    )
    joined = mesh_lib.join_meshes(src_mesh, tgt_mesh, pose_a=run.pose)
    for p in gt_src:
        joined = mesh_lib.join_meshes(
            mesh_lib.sphere(p, 0.003, color=(0, 255, 0, 255)), joined,
            pose_a=run.pose,
        )
    for p in gt_tgt:
        joined = mesh_lib.join_meshes(
            mesh_lib.sphere(p, 0.003, color=(255, 0, 255, 0)), joined
        )
    joined.write(os.path.join(out_dir, "bunny_icp.off"))


if __name__ == "__main__":
    res = align_bunny()
    print("per-iteration RMSE:")
    for i, r in enumerate(res.rmse_per_iteration):
        print(f"  {i:02d}  {r:.6f}")
    print("final RMSE:", res.final_rmse)
    print("pose:\n", res.pose)
