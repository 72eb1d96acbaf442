"""Dataset loaders: the TPU-native ``DataLoader`` family.

Equivalents of the reference loaders (DataLoader.h:4-15, BunnyDataLoader.h,
ETHDataLoader.h): each ``getItem`` yields a :class:`Sample` of padded device
clouds plus a ground-truth pose. All file parsing happens on the host; the
clouds land on device as fixed-capacity masked arrays so a whole dataset can
share one compiled ICP executable.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from icp_variants_tpu.core import cloud as cloud_lib
from icp_variants_tpu.core.cloud import Cloud
from icp_variants_tpu.data import off_io

# Default asset root: the bunny halves shipped with the repo
# (Stanford bunny split, from the reference's Data/ directory, MIT-licensed).
ASSET_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "assets")


@dataclass
class Sample:
    """One registration problem (DataLoader.h:4-10)."""

    source: Cloud
    target: Cloud
    pose: np.ndarray  # (4, 4) ground-truth pose


class DataLoader:
    """Abstract dataset of registration pairs (DataLoader.h:12-15)."""

    def get_length(self) -> int:
        raise NotImplementedError

    def get_item(self, index: int) -> Sample:
        raise NotImplementedError

    def __len__(self) -> int:
        return self.get_length()

    def __getitem__(self, index: int) -> Sample:
        return self.get_item(index)


class BunnyDataLoader(DataLoader):
    """The Stanford-bunny pair: part2_trans (source) -> part1 (target),
    identity GT pose (BunnyDataLoader.h:9-39).

    Vertex normals come from summed incident face normals exactly like the
    mesh constructor of PointCloud.h:24-37.
    """

    def __init__(self, data_dir: str | None = None, capacity: int | None = None):
        data_dir = data_dir or os.path.join(ASSET_ROOT, "bunny")
        self.source_mesh = off_io.read_off(os.path.join(data_dir, "bunny_part2_trans.off"))
        self.target_mesh = off_io.read_off(os.path.join(data_dir, "bunny_part1.off"))
        self._capacity = capacity

    def get_length(self) -> int:
        return 1

    def _cloud_from_mesh(self, mesh: off_io.OffMesh) -> Cloud:
        normals = cloud_lib.mesh_vertex_normals(mesh.vertices, mesh.triangles)
        colors = None
        if mesh.vertex_colors is not None:
            colors = mesh.vertex_colors.astype(np.float32)
        return cloud_lib.from_numpy(
            mesh.vertices, normals=normals, colors=colors, capacity=self._capacity
        )

    def get_item(self, index: int) -> Sample:
        if index != 0:
            raise IndexError("BunnyDataLoader has exactly one sample")
        return Sample(
            source=self._cloud_from_mesh(self.source_mesh),
            target=self._cloud_from_mesh(self.target_mesh),
            pose=np.eye(4, dtype=np.float32),
        )

    # Hand-verified GT correspondence indices documented in main.cpp:106-120.
    GT_SOURCE_INDICES = (215, 424, 640, 1023)
    GT_TARGET_INDICES = (294, 258, 1238, 1310)

    def gt_correspondences(self) -> tuple[np.ndarray, np.ndarray]:
        src = self.source_mesh.vertices[list(self.GT_SOURCE_INDICES)]
        tgt = self.target_mesh.vertices[list(self.GT_TARGET_INDICES)]
        return src, tgt


class ETHDataLoader(DataLoader):
    """ETH laser-registration benchmark loader (ETHDataLoader.h:11-107).

    Reads a pose CSV (``eth/plain_global.csv``-style: per-row source/target
    .pcd filenames + a 3x4 GT pose in columns 4..15), loads both clouds via
    the numpy .pcd reader, and estimates normals with the k=5 k-NN PCA op
    (the PCL ``NormalEstimation`` equivalent, PointCloud.h:41-76).

    ``capacity`` pads every cloud of the sequence to one static shape so all
    pairs share a single compiled ICP executable — pass e.g. the max cloud
    size of the dataset.
    """

    def __init__(
        self,
        csv_path: str,
        data_root: str | None = None,
        capacity: int | None = None,
        estimate_normals: bool = True,
        normal_k: int = 5,
        downsample: int | None = None,
    ):
        import csv as _csv

        self.csv_path = csv_path
        # dataName: basename without .csv and the _local/_global suffix
        # (ETHDataLoader.h:20-24).
        name = os.path.basename(csv_path)
        for suffix in (".csv",):
            if name.endswith(suffix):
                name = name[: -len(suffix)]
        for suffix in ("_local", "_global"):
            if name.endswith(suffix):
                name = name[: -len(suffix)]
        self.data_name = name
        self.data_root = data_root or os.path.dirname(csv_path)
        self.capacity = capacity
        self.estimate_normals = estimate_normals
        self.normal_k = normal_k
        # Load-time stride subsampling (EXTENSION: the reference only
        # strides inside the optimizer, ICPOptimizer.h:196-208; this trims
        # very large clouds before normals/device upload). Applied before
        # normal estimation, so normals see the subsampled neighborhood.
        self.downsample = downsample

        with open(csv_path, newline="") as f:
            rows = list(_csv.reader(f))
        self.rows = [r for r in rows if r]  # first row is the header

    def get_length(self) -> int:
        return len(self.rows) - 1

    def _load_cloud(self, pcd_name: str) -> Cloud:
        from icp_variants_tpu.data import pcd_io

        path = os.path.join(self.data_root, self.data_name, pcd_name)
        return self._cloud_from_points(pcd_io.read_pcd(path))

    def point_counts(self, max_pairs: int | None = None) -> np.ndarray:
        """(n_pairs, 2) point counts of every (source, target) pair, from the
        .pcd headers only — cheap pre-scan for choosing a shared capacity."""
        from icp_variants_tpu.data import pcd_io

        n = self.get_length() if max_pairs is None else min(max_pairs, self.get_length())
        out = np.zeros((n, 2), np.int64)
        for i in range(n):
            row = self.rows[i + 1]
            for c, name in enumerate(row[1:3]):
                path = os.path.join(self.data_root, self.data_name, name)
                out[i, c] = pcd_io.read_pcd_point_count(path)
        if self.downsample is not None and self.downsample > 1:
            out = -(-out // self.downsample)  # ceil: rows kept by the stride
        return out

    def _gt_pose(self, index: int) -> np.ndarray:
        row = self.rows[index + 1]
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :4] = np.asarray(
            [float(x) for x in row[4:16]], np.float32
        ).reshape(3, 4)
        return pose

    def _cloud_from_points(self, pts: np.ndarray) -> Cloud:
        if self.downsample is not None and self.downsample > 1:
            pts = pts[:: self.downsample]
        normals = None
        if self.estimate_normals:
            import jax.numpy as jnp

            from icp_variants_tpu.ops import normals as normals_ops

            finite = np.isfinite(pts).all(axis=1)
            if len(pts) >= 20_000:
                normals = np.asarray(
                    normals_ops.estimate_normals_knn_fast(
                        pts, finite, k=self.normal_k
                    )
                )
            else:
                normals = np.asarray(
                    normals_ops.estimate_normals_knn(
                        jnp.asarray(pts), jnp.asarray(finite), k=self.normal_k
                    )
                )
        return cloud_lib.from_numpy(
            pts, normals=normals, capacity=self.capacity, morton_order=True
        )

    def get_item(self, index: int) -> Sample:
        if index >= self.get_length():
            raise IndexError(
                f"index {index} out of range, only {self.get_length()} samples"
            )
        row = self.rows[index + 1]
        return Sample(
            source=self._load_cloud(row[1]),
            target=self._load_cloud(row[2]),
            pose=self._gt_pose(index),
        )

    def get_scan(self, index: int) -> Cloud:
        """Load SCAN ``index`` of the sequential sequence (0..n_pairs):
        pair k registers scan k+1 (reading, column 1) onto scan k
        (reference, column 2), so scan k is row k's reference and the
        final scan is the last row's reading. Used by the pose-graph
        loop-closure registration (workloads/eth.register_closures)."""
        n = self.get_length()
        if not (0 <= index <= n):
            raise IndexError(f"scan {index} out of range (0..{n})")
        if index < n:
            return self._load_cloud(self.rows[index + 1][2])
        return self._load_cloud(self.rows[n][1])

    def get_items(self, indices) -> list[Sample]:
        """Load a BATCH of pairs, parsing all 2*B .pcd files concurrently
        through the native thread pool (``pcd_io.read_pcd_batch``) — the
        prefetch-friendly bulk path the batched ETH sweep uses. Results
        match per-index :meth:`get_item` exactly."""
        from icp_variants_tpu.data import pcd_io

        indices = list(indices)
        for i in indices:
            if i >= self.get_length():
                raise IndexError(
                    f"index {i} out of range, only {self.get_length()} samples"
                )
        paths = []
        for i in indices:
            row = self.rows[i + 1]
            for name in (row[1], row[2]):
                paths.append(
                    os.path.join(self.data_root, self.data_name, name)
                )
        clouds = [
            self._cloud_from_points(pts)
            for pts in pcd_io.read_pcd_batch(paths)
        ]
        return [
            Sample(
                source=clouds[2 * b],
                target=clouds[2 * b + 1],
                pose=self._gt_pose(i),
            )
            for b, i in enumerate(indices)
        ]
