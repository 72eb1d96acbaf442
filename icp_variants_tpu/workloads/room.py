"""TUM RGB-D room reconstruction — frame-to-frame-0 camera tracking.

Equivalent of ``reconstructRoom`` (main.cpp:183-341): track every
``frame_step``-th frame of a TUM sequence against frame 0 with 35 ICP
iterations at max squared distance 0.1. Projective matching uses the
full-size image-shaped target; k-NN uses the compacted one; multires keeps
the source full-size, otherwise the source is stride-8 downsampled
(main.cpp:293-298). Ground truth per frame comes from the trajectory:
``currentToZero = targetTrajectory @ inv(currentTrajectory)``
(main.cpp:300-303).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

import jax
import numpy as np

from icp_variants_tpu.core import se3
from icp_variants_tpu.data import rgbd, tum
from icp_variants_tpu.pipeline import icp
from icp_variants_tpu.pipeline.config import ICPConfig, Matching, Metric, Minimizer


logger = logging.getLogger("icp_variants_tpu.room")


def default_config(**overrides) -> ICPConfig:
    """The room run configuration of main.cpp:211-268."""
    cfg = ICPConfig(
        metric=Metric.POINT_TO_POINT,
        minimizer=Minimizer.NONLINEAR_LM,
        n_iterations=35,
        max_distance=0.1,
    )
    cfg = cfg.with_camera(
        fx=525.0, fy=525.0, cx=319.5, cy=239.5,
        width=tum.WIDTH, height=tum.HEIGHT,
    )
    return cfg.replace(**overrides)


@dataclass
class RoomRunResult:
    estimated_poses: list = field(default_factory=list)   # camera poses (inverted)
    rmse_per_frame: list = field(default_factory=list)    # per-iteration curves
    initial_rmse: list = field(default_factory=list)
    final_rmse: list = field(default_factory=list)


def save_room_frame(out_path, frame, sensor, camera_pose) -> None:
    """Per-frame mesh dump with camera marker (saveRoomToFile,
    utils.h:179-193): triangulated RGB-D mesh joined with a frustum."""
    from icp_variants_tpu.data import mesh as mesh_lib

    camera_pose_inv = np.linalg.inv(camera_pose)
    depth_mesh = mesh_lib.from_rgbd_frame(
        frame.depth, frame.color, sensor.intrinsics, camera_pose_inv,
        edge_threshold=0.1,
    )
    cam = mesh_lib.camera_marker(camera_pose_inv, scale=0.0015)
    mesh_lib.join_meshes(depth_mesh, cam).write(out_path)


def reconstruct_room(
    dataset_dir: str,
    cfg: ICPConfig | None = None,
    frame_step: int = 10,
    max_frames: int = 10,
    seed: int = 0,
    artifacts_dir: str | None = None,
) -> RoomRunResult:
    cfg = cfg or default_config()
    sensor = tum.VirtualSensor(dataset_dir, increment=frame_step)
    if cfg.matching == Matching.PROJECTIVE:
        # setCameraParamsMatchingMethod with the sensor calibration
        # (main.cpp:236-238).
        K = sensor.intrinsics
        cfg = cfg.with_camera(
            fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2],
            width=sensor.width, height=sensor.height,
        )

    frame0 = sensor.process_frame_index(0)
    if frame0 is None:
        raise RuntimeError(f"no frames in {dataset_dir}")

    keep_original = cfg.matching == Matching.PROJECTIVE
    target = rgbd.cloud_from_depth(
        frame0.depth, frame0.color, sensor.intrinsics, sensor.extrinsics,
        keep_original_size=keep_original,
        capacity=sensor.width * sensor.height,
    )
    target_trajectory = frame0.trajectory
    # One-time kd build over the tracked frame-0 target (k-NN runs only;
    # the production matching path for image-scale clouds).
    target_kd = icp.build_kd_for(cfg, target)

    # Source shape contract (main.cpp:293-298): full-size for multires,
    # stride-8 compacted otherwise. Fixed capacities keep one executable.
    if cfg.multi_resolution:
        # color_morton_order: 6-dim Morton source rows cluster
        # same-kd-block queries into the resident color matcher's gates
        # (+23%, scripts/evidence/block_target_probe.txt); k-NN-only —
        # projective matching needs image-shaped indexing.
        src_kwargs = dict(keep_original_size=True, downsample_factor=1,
                          capacity=sensor.width * sensor.height,
                          color_morton_order=(
                              cfg.color_icp
                              and cfg.matching == Matching.KNN))
        num_source_points = sensor.width * sensor.height
    else:
        # Morton-ordered compacted rows keep the resident projective
        # kernel's per-subgroup membership rects tight (data/rgbd.py).
        src_kwargs = dict(keep_original_size=False, downsample_factor=8,
                          capacity=sensor.width * sensor.height // 8,
                          morton_order=True)
        num_source_points = None  # valid count (compacted cloud)

    result = RoomRunResult()
    current_camera_to_world = np.eye(4, dtype=np.float32)
    result.estimated_poses.append(np.linalg.inv(current_camera_to_world))
    if artifacts_dir is not None:
        import os

        os.makedirs(artifacts_dir, exist_ok=True)
        save_room_frame(
            f"{artifacts_dir}/mesh_0.off", frame0, sensor,
            current_camera_to_world,
        )

    i = 0
    while i <= max_frames:
        frame = sensor.process_frame_index((i + 1) * frame_step)
        if frame is None:
            break
        source = rgbd.cloud_from_depth(
            frame.depth, frame.color, sensor.intrinsics, sensor.extrinsics,
            **src_kwargs,
        )

        current_to_zero = target_trajectory @ np.linalg.inv(frame.trajectory)
        src_pts = np.asarray(source.points)
        gt_tgt = src_pts @ current_to_zero[:3, :3].T + current_to_zero[:3, 3]
        gt_valid = np.asarray(source.valid)

        init_rmse = float(
            jax.device_get(
                icp.measure.rmse_alignment_error(
                    jax.numpy.asarray(current_camera_to_world),
                    source.points, jax.numpy.asarray(gt_tgt), source.valid,
                )
            )
        )

        # Dense multires configs route through the segmented per-level
        # driver (coarse pyramid levels at their own sliced capacity —
        # the bench'd production path); everything else falls through to
        # the one-executable in-scan runner inside.
        res = icp.run_icp_multires_segmented(
            cfg, source, target,
            init_pose=current_camera_to_world,
            gt_source_points=src_pts,
            gt_target_points=gt_tgt,
            gt_valid=gt_valid,
            key=jax.random.PRNGKey(seed + i),
            num_source_points=num_source_points,
            kd_index=target_kd,
        )
        current_camera_to_world = np.asarray(jax.device_get(res.pose))
        rmse = np.asarray(jax.device_get(res.trace.rmse))

        logger.info(
            "frame %d: rmse %.5f -> %.5f", frame.index, init_rmse, float(rmse[-1])
        )
        result.rmse_per_frame.append(rmse)
        result.initial_rmse.append(init_rmse)
        result.final_rmse.append(float(rmse[-1]))
        result.estimated_poses.append(np.linalg.inv(current_camera_to_world))
        if artifacts_dir is not None:
            save_room_frame(
                f"{artifacts_dir}/mesh_{frame.index}.off", frame, sensor,
                current_camera_to_world,
            )
        i += 1

    return result
