"""ETH laser-registration benchmark — the headline workload.

Equivalent of ``alignETH`` (main.cpp:343-514): for every scan pair of an
ETH sequence, perturb the source by the (0.1-scaled) ground-truth pose,
register with 50 ICP iterations at max squared distance 10, and record
RMSE + the Fontana benchmark error per iteration (the oracle is the
unperturbed source cloud itself, main.cpp:417-439).

Two pose-scaling conventions exist in the reference — main.cpp:419-429
scales the Euler angles and translation by 0.1, experiment.cpp:327-328
applies the unscaled pose; ``pose_scaling`` selects either.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from icp_variants_tpu.core import cloud as cloud_lib
from icp_variants_tpu.core import se3
from icp_variants_tpu.data.loaders import ETHDataLoader
from icp_variants_tpu.pipeline import icp, measure
from icp_variants_tpu.pipeline.config import ICPConfig, Metric, Minimizer


logger = logging.getLogger("icp_variants_tpu.eth")


def default_config(**overrides) -> ICPConfig:
    """The ETH run configuration of main.cpp:360-398."""
    cfg = ICPConfig(
        metric=Metric.POINT_TO_POINT,
        minimizer=Minimizer.NONLINEAR_LM,
        n_iterations=50,
        max_distance=10.0,
    )
    return cfg.replace(**overrides)


def scale_pose(pose: np.ndarray, scaling: float) -> np.ndarray:
    """Scale a pose by factor ``scaling`` through Euler angles + translation
    (main.cpp:419-429, Eigen eulerAngles(0,1,2) convention)."""
    abg = np.asarray(se3.matrix_to_euler_xyz(jnp.asarray(pose[:3, :3])))
    abg = abg * scaling
    R = np.asarray(se3.euler_xyz_to_matrix(*[jnp.float32(a) for a in abg]))
    out = np.eye(4, dtype=np.float32)
    out[:3, :3] = R
    out[:3, 3] = scaling * pose[:3, 3]
    return out


def perturb_cloud(cloud: cloud_lib.Cloud, pose: np.ndarray) -> cloud_lib.Cloud:
    """Apply a pose to points AND normals (rotation-only for normals),
    matching ``PointCloud::change_pose`` (PointCloud.h:277-282)."""
    pts = np.asarray(cloud.points) @ pose[:3, :3].T + pose[:3, 3]
    valid = np.asarray(cloud.valid)
    pts = np.where(valid[:, None], pts, cloud_lib.PAD_SENTINEL)
    nrm = np.asarray(cloud.normals) @ pose[:3, :3].T
    return cloud._replace(
        points=jnp.asarray(pts.astype(np.float32)),
        normals=jnp.asarray(nrm.astype(np.float32)),
    )


@dataclass
class ETHPairResult:
    index: int
    initial_error: float
    final_error: float
    initial_rmse: float
    final_rmse: float
    rmse_per_iteration: np.ndarray
    benchmark_per_iteration: np.ndarray
    pose: np.ndarray
    # The scaled GT pose applied to the source BEFORE registration
    # (main.cpp:419-429); the true scan-to-scan relative transform is
    # ``pose @ perturbation``.
    perturbation: np.ndarray = None

    @property
    def relative_pose(self) -> np.ndarray:
        """ICP estimate composed with the applied perturbation: maps RAW
        source-scan coordinates onto the target scan."""
        if self.perturbation is None:
            return self.pose
        return self.pose @ self.perturbation


@dataclass
class ETHRunResult:
    pairs: list = field(default_factory=list)
    min_error: float = float("inf")
    index_min_error: int = -1
    min_relative_error: float = 1.0
    index_min_relative_error: int = -1

    @property
    def final_errors(self) -> np.ndarray:
        return np.asarray([p.final_error for p in self.pairs])


def align_eth_batch(
    csv_path: str,
    cfg: ICPConfig | None = None,
    pose_scaling: float = 0.1,
    data_root: str | None = None,
    capacity: int | None = None,
    max_pairs: int | None = None,
    batch_size: int = 4,
    seed: int = 0,
    downsample: int | None = None,
    checkpoint_dir: str | None = None,
) -> ETHRunResult:
    """Data-parallel ETH sweep: registers ``batch_size`` scan pairs per
    compiled program (``run_icp_batch``). Requires a common ``capacity`` so
    all pairs share one executable; defaults to the max cloud size found in
    the first batch, rounded up.

    ``checkpoint_dir`` enables crash-safe incremental checkpointing: after
    every completed batch the accumulated per-pair results (poses,
    perturbations, error curves) are written atomically, and a rerun with
    the same configuration resumes from the first incomplete batch —
    the in-process analog of the reference's incrementally-written
    per-pair error files (main.cpp:479-480) extended to full sweep state
    (SURVEY §5 checkpoint/resume).
    """
    cfg = cfg or default_config()
    loader = ETHDataLoader(
        csv_path, data_root=data_root, capacity=capacity,
        downsample=downsample,
    )
    n = loader.get_length() if max_pairs is None else min(max_pairs, loader.get_length())
    result = ETHRunResult()

    num_source_points = None
    if capacity is None and n > 0:
        # Pre-scan ALL cloud sizes from the .pcd headers so every batch
        # shares one capacity (and one compiled executable); rounded up to
        # the k-NN tile multiple for shape reuse.
        counts = loader.point_counts(max_pairs=n)
        capacity = int(-(-int(counts.max()) // 512) * 512)
        loader.capacity = capacity
        num_source_points = int(counts.max())
    elif cfg.multi_resolution and n > 0:
        # The multires stride schedule must come from the TRUE point count
        # (run_icp semantics, ICPOptimizer.h:196), not the shared padded
        # capacity — otherwise the batched driver runs a coarser schedule
        # than align_eth on identical pairs.
        num_source_points = int(loader.point_counts(max_pairs=n).max())

    # Batches load on a background worker (native threaded .pcd parsing +
    # per-target kd builds) while the previous batch's ICP program runs on
    # device.
    from icp_variants_tpu.runtime.prefetch import Prefetcher

    def load_batch(idxs):
        # ALL per-pair host-side prep happens here, on the worker thread:
        # kd builds and pose scaling/perturbation — the consumer thread
        # only stacks and launches programs.
        samples = loader.get_items(idxs)
        kds = [icp.build_kd_for(cfg, s.target) for s in samples]
        scaled = [scale_pose(s.pose, pose_scaling) for s in samples]
        perturbed = [
            perturb_cloud(s.source, sc) for s, sc in zip(samples, scaled)
        ]
        if any(k is None for k in kds):
            return samples, None, scaled, perturbed
        return samples, kdtree_stack(kds), scaled, perturbed

    def kdtree_stack(kds):
        from icp_variants_tpu.ops import kdtree

        return kdtree.stack_kd_indexes(kds)

    batch_indices = [
        list(range(start, min(start + batch_size, n)))
        for start in range(0, n, batch_size)
    ]
    ckpt = (
        _SweepCheckpoint(checkpoint_dir, csv_path, cfg, n, batch_size,
                         pose_scaling, seed, capacity, downsample)
        if checkpoint_dir is not None
        else None
    )
    if ckpt is not None:
        done = ckpt.load_into(result)
        if done:
            logger.info("resumed %d completed pairs from %s",
                        len(done), ckpt.path)
        batch_indices = [
            idxs for idxs in batch_indices
            if not all(i in done for i in idxs)
        ]
    prefetched = Prefetcher(batch_indices, load_batch, depth=1)
    for idxs, (samples, kd_indexes, perturbations, sources) in (
        zip(batch_indices, prefetched)
    ):
        start = idxs[0]
        originals = [np.asarray(s.source.points) for s in samples]
        gt_valids = [np.asarray(p.valid) for p in sources]
        targets = [s.target for s in samples]

        batch_src = icp.stack_clouds(sources)
        batch_tgt = icp.stack_clouds(targets)
        res = icp.run_icp_batch(
            cfg, batch_src, batch_tgt,
            gt_source_points=np.stack([np.asarray(s.points) for s in sources]),
            gt_target_points=np.stack(originals),
            gt_valid=np.stack(gt_valids),
            key=jax.random.PRNGKey(seed + start),
            run_benchmark=True,
            kd_indexes=kd_indexes,
            num_source_points=num_source_points,
        )
        rmse = np.asarray(jax.device_get(res.trace.rmse))
        bench = np.asarray(jax.device_get(res.trace.benchmark))
        poses = np.asarray(jax.device_get(res.pose))

        for bi, index in enumerate(idxs):
            eye = jnp.eye(4)
            initial_error = float(jax.device_get(measure.benchmark_error(
                eye, sources[bi].points, jnp.asarray(originals[bi]),
                sources[bi].valid)))
            initial_rmse = float(jax.device_get(measure.rmse_alignment_error(
                eye, sources[bi].points, jnp.asarray(originals[bi]),
                sources[bi].valid)))
            final_error = float(bench[bi, -1])
            result.pairs.append(ETHPairResult(
                index=index,
                initial_error=initial_error,
                final_error=final_error,
                initial_rmse=initial_rmse,
                final_rmse=float(rmse[bi, -1]),
                rmse_per_iteration=rmse[bi],
                benchmark_per_iteration=bench[bi],
                pose=poses[bi],
                perturbation=perturbations[bi],
            ))
            if final_error < result.min_error:
                result.min_error, result.index_min_error = final_error, index
            rel = final_error / max(initial_error, 1e-30)
            if rel < result.min_relative_error:
                result.min_relative_error, result.index_min_relative_error = rel, index
        if ckpt is not None:
            ckpt.save(result)

    result.pairs.sort(key=lambda p: p.index)
    return result


class _SweepCheckpoint:
    """Atomic npz checkpoint of an ETH sweep's accumulated pair results.

    The manifest (config repr, csv path, pair count, batching, seed) guards
    against resuming into a different run; the state file is replaced
    atomically after each batch so a crash never leaves a torn checkpoint.
    """

    def __init__(self, directory, csv_path, cfg, n, batch_size,
                 pose_scaling, seed, capacity=None, downsample=None):
        import os

        os.makedirs(directory, exist_ok=True)
        self.path = os.path.join(directory, "eth_sweep.npz")
        self.manifest = dict(
            csv=os.path.abspath(csv_path), cfg=repr(cfg), n=int(n),
            batch_size=int(batch_size), pose_scaling=float(pose_scaling),
            seed=int(seed),
            # Loading knobs change the computed results, so they gate
            # resume too (a sweep at a different resolution or padding
            # must not mix with this one).
            capacity=None if capacity is None else int(capacity),
            downsample=None if downsample is None else int(downsample),
        )

    def load_into(self, result: "ETHRunResult") -> set:
        import json
        import os

        if not os.path.exists(self.path):
            return set()
        with np.load(self.path, allow_pickle=False) as z:
            manifest = json.loads(str(z["manifest"]))
            if manifest != self.manifest:
                logger.warning(
                    "checkpoint %s belongs to a different run config; "
                    "ignoring it", self.path,
                )
                return set()
            for row, index in enumerate(z["indices"]):
                pair = ETHPairResult(
                    index=int(index),
                    initial_error=float(z["initial_errors"][row]),
                    final_error=float(z["final_errors"][row]),
                    initial_rmse=float(z["initial_rmses"][row]),
                    final_rmse=float(z["final_rmses"][row]),
                    rmse_per_iteration=z["rmse_curves"][row],
                    benchmark_per_iteration=z["benchmark_curves"][row],
                    pose=z["poses"][row],
                    perturbation=z["perturbations"][row],
                )
                result.pairs.append(pair)
                if pair.final_error < result.min_error:
                    result.min_error = pair.final_error
                    result.index_min_error = pair.index
                rel = pair.final_error / max(pair.initial_error, 1e-30)
                if rel < result.min_relative_error:
                    result.min_relative_error = rel
                    result.index_min_relative_error = pair.index
        return {p.index for p in result.pairs}

    def save(self, result: "ETHRunResult") -> None:
        import json
        import os
        import tempfile

        pairs = sorted(result.pairs, key=lambda p: p.index)
        payload = dict(
            manifest=np.asarray(json.dumps(self.manifest)),
            indices=np.asarray([p.index for p in pairs], np.int32),
            initial_errors=np.asarray([p.initial_error for p in pairs]),
            final_errors=np.asarray([p.final_error for p in pairs]),
            initial_rmses=np.asarray([p.initial_rmse for p in pairs]),
            final_rmses=np.asarray([p.final_rmse for p in pairs]),
            rmse_curves=np.stack([p.rmse_per_iteration for p in pairs]),
            benchmark_curves=np.stack(
                [p.benchmark_per_iteration for p in pairs]
            ),
            poses=np.stack([p.pose for p in pairs]),
            perturbations=np.stack([p.perturbation for p in pairs]),
        )
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(self.path), suffix=".npz.tmp"
        )
        try:
            with os.fdopen(fd, "wb") as f:
                np.savez(f, **payload)
            os.replace(tmp, self.path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise


def refine_trajectory(
    result: ETHRunResult,
    weights: np.ndarray | None = None,
    *,
    extra_edges=None,
    mesh=None,
):
    """Pose-graph refinement over a SEQUENTIAL ETH run (pair k registers
    scan k+1 onto scan k): chains the per-pair ICP poses into absolute scan
    poses and jointly refines them (parallel/pose_graph) — the global
    consistency step the reference never performs.

    Note each ETH pair was solved in its own perturbed frame; the chained
    pose of pair k composes its ICP estimate with the applied perturbation,
    so the relative edge is ``icp_pose @ scaled_perturbation``
    (``ETHPairResult.relative_pose``).

    ``extra_edges`` appends loop-closure edges: a list of
    ``(i, j, rel_pose, weight)`` with ``rel_pose`` mapping scan j's
    coordinates onto scan i's (:func:`register_closures` builds them from
    odometry proximity). ``mesh`` dispatches the solve to the sharded
    block-Jacobi CG refiner (``pose_graph.refine_sharded``) when a device
    mesh is available; ``None`` solves locally (dense below 96 poses,
    matrix-free CG above).
    """
    import jax.numpy as jnp

    from icp_variants_tpu.parallel import pose_graph

    rel = np.stack([p.relative_pose for p in result.pairs])
    odometry, graph = pose_graph.sequential_graph(rel, weights)
    if extra_edges:
        graph = pose_graph.PoseGraph(
            edge_i=jnp.concatenate([
                graph.edge_i,
                jnp.asarray([e[0] for e in extra_edges], jnp.int32),
            ]),
            edge_j=jnp.concatenate([
                graph.edge_j,
                jnp.asarray([e[1] for e in extra_edges], jnp.int32),
            ]),
            rel_poses=jnp.concatenate([
                graph.rel_poses,
                jnp.stack([jnp.asarray(e[2], jnp.float32)
                           for e in extra_edges]),
            ]),
            weights=jnp.concatenate([
                graph.weights,
                jnp.asarray([e[3] for e in extra_edges], jnp.float32),
            ]),
        )
    if mesh is not None:
        refined = np.asarray(
            pose_graph.refine_sharded(odometry, graph, mesh))
    else:
        refined = np.asarray(pose_graph.refine(odometry, graph))
    return odometry, refined, graph


def find_loop_closures(
    odometry: np.ndarray,
    *,
    radius: float = 1.0,
    min_separation: int = 3,
    max_closures: int = 8,
) -> list[tuple[int, int]]:
    """Candidate loop-closure scan pairs from trajectory proximity: scans
    ``(i, j)`` with ``j - i >= min_separation`` whose odometry positions
    sit within ``radius`` meters. Greedy farthest-separation-first pick so
    the budget goes to the closures with the most drift leverage; each
    scan joins at most one closure."""
    pos = np.asarray([T[:3, 3] for T in odometry])
    n = len(pos)
    cands = []
    for i in range(n):
        for j in range(i + min_separation, n):
            d = float(np.linalg.norm(pos[j] - pos[i]))
            if d <= radius:
                cands.append((j - i, d, i, j))
    cands.sort(key=lambda c: (-c[0], c[1]))
    used: set[int] = set()
    out = []
    for _, _, i, j in cands:
        if i in used or j in used:
            continue
        out.append((i, j))
        used.update((i, j))
        if len(out) >= max_closures:
            break
    return out


def register_closures(
    loader: ETHDataLoader,
    closures: list[tuple[int, int]],
    cfg: ICPConfig,
    odometry: np.ndarray,
    *,
    seed: int = 0,
) -> list[tuple[int, int, np.ndarray, float]]:
    """Register each loop-closure scan pair (scan j onto scan i) with the
    sweep's own ICP configuration, initialized from the odometry guess
    (the source is pre-transformed by ``odometry[i]^-1 @ odometry[j]``, so
    ICP only solves for the residual drift — the standard pose-graph
    closure recipe). Returns ``(i, j, rel_pose, weight)`` edges where
    ``rel_pose`` maps scan j's raw coordinates onto scan i's."""
    edges = []
    for k, (i, j) in enumerate(closures):
        scan_i = loader.get_scan(i)
        scan_j = loader.get_scan(j)
        guess = (np.linalg.inv(odometry[i]) @ odometry[j]).astype(np.float32)
        src = perturb_cloud(scan_j, guess)
        kd_index = icp.build_kd_for(cfg, scan_i)
        res = icp.run_icp(
            cfg, src, scan_i, key=jax.random.PRNGKey(seed + 7919 * k),
            kd_index=kd_index,
        )
        pose = np.asarray(jax.device_get(res.pose))
        edges.append((i, j, (pose @ guess).astype(np.float32), 1.0))
        logger.info("closure %d-%d registered (|t| drift %.4f m)", i, j,
                    float(np.linalg.norm(pose[:3, 3])))
    return edges


def align_eth(
    csv_path: str,
    cfg: ICPConfig | None = None,
    pose_scaling: float = 0.1,
    data_root: str | None = None,
    capacity: int | None = None,
    max_pairs: int | None = None,
    seed: int = 0,
    downsample: int | None = None,
) -> ETHRunResult:
    if not (0.0 < pose_scaling <= 1.0):
        raise ValueError("pose scaling must be in (0, 1]")  # main.cpp:346-349
    cfg = cfg or default_config()
    loader = ETHDataLoader(
        csv_path, data_root=data_root, capacity=capacity,
        downsample=downsample,
    )
    result = ETHRunResult()
    logger.info("%s", cfg.describe())

    n = loader.get_length() if max_pairs is None else min(max_pairs, loader.get_length())
    for index in range(n):
        logger.info("processing pair %d/%d", index, n)
        sample = loader.get_item(index)
        original_points = np.asarray(sample.source.points)
        scaled = scale_pose(sample.pose, pose_scaling)
        source = perturb_cloud(sample.source, scaled)
        gt_valid = np.asarray(source.valid)

        eye = jnp.eye(4)
        initial_error = float(jax.device_get(measure.benchmark_error(
            eye, source.points, jnp.asarray(original_points), source.valid)))
        initial_rmse = float(jax.device_get(measure.rmse_alignment_error(
            eye, source.points, jnp.asarray(original_points), source.valid)))

        kd_index = icp.build_kd_for(cfg, sample.target)
        res = icp.run_icp(
            cfg, source, sample.target,
            gt_source_points=np.asarray(source.points),
            gt_target_points=original_points,
            gt_valid=gt_valid,
            key=jax.random.PRNGKey(seed + index),
            run_benchmark=True,
            kd_index=kd_index,
        )
        rmse = np.asarray(jax.device_get(res.trace.rmse))
        bench = np.asarray(jax.device_get(res.trace.benchmark))
        final_error = float(bench[-1])

        logger.info(
            "pair %d: benchmark %.5f -> %.5f, rmse %.5f -> %.5f",
            index, initial_error, final_error, initial_rmse, float(rmse[-1]),
        )
        result.pairs.append(ETHPairResult(
            index=index,
            initial_error=initial_error,
            final_error=final_error,
            initial_rmse=initial_rmse,
            final_rmse=float(rmse[-1]),
            rmse_per_iteration=rmse,
            benchmark_per_iteration=bench,
            pose=np.asarray(jax.device_get(res.pose)),
            perturbation=scaled,
        ))
        if final_error < result.min_error:
            result.min_error, result.index_min_error = final_error, index
        rel = final_error / max(initial_error, 1e-30)
        if rel < result.min_relative_error:
            result.min_relative_error, result.index_min_relative_error = rel, index

    return result
