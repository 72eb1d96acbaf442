"""Data-layer tests: OFF/COFF, PCD, TUM sensor, RGB-D cloud bridge, meshes,
ETH loader (references: SimpleMesh.h, VirtualSensor.h, ETHDataLoader.h,
PointCloud.h)."""

import os

import numpy as np
import pytest

from icp_variants_tpu.data import mesh as mesh_lib
from icp_variants_tpu.data import off_io, pcd_io, rgbd, tum
from icp_variants_tpu.data.loaders import BunnyDataLoader, ETHDataLoader


class TestOffIO:
    def test_bunny_loads(self):
        loader = BunnyDataLoader()
        assert loader.source_mesh.vertices.shape == (1054, 3)
        assert loader.target_mesh.vertices.shape == (1359, 3)
        assert loader.source_mesh.vertex_colors is not None  # COFF

    def test_roundtrip(self, tmp_path):
        v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        t = np.array([[0, 1, 2]], np.int32)
        c = np.array([[255, 0, 0, 255]] * 3, np.uint8)
        p = str(tmp_path / "m.off")
        off_io.write_off(p, v, t, c)
        m = off_io.read_off(p)
        np.testing.assert_allclose(m.vertices, v)
        np.testing.assert_array_equal(m.triangles, t)
        np.testing.assert_array_equal(m.vertex_colors, c)


class TestPcdIO:
    @pytest.mark.parametrize("binary", [True, False])
    def test_roundtrip(self, tmp_path, binary):
        pts = np.random.default_rng(0).standard_normal((100, 3)).astype(np.float32)
        p = str(tmp_path / "c.pcd")
        pcd_io.write_pcd(p, pts, binary=binary)
        out = pcd_io.read_pcd(p)
        np.testing.assert_allclose(out, pts, rtol=1e-5)

    def test_truncated_header_raises(self, tmp_path):
        """A .pcd without a DATA line (truncated/wrong format) must raise,
        not spin forever on readline() returning b'' at EOF."""
        p = str(tmp_path / "trunc.pcd")
        with open(p, "w") as f:
            f.write("VERSION 0.7\nFIELDS x y z\n")
        with pytest.raises(ValueError, match="EOF"):
            pcd_io.read_pcd(p)
        with pytest.raises(ValueError, match="EOF"):
            pcd_io.read_pcd_point_count(p)

    def test_extra_fields_binary(self, tmp_path):
        # PCD with intensity: x y z i layout; only xyz extracted.
        pts = np.random.default_rng(1).standard_normal((10, 3)).astype(np.float32)
        inten = np.arange(10, dtype=np.float32)
        p = str(tmp_path / "c.pcd")
        header = (
            "VERSION 0.7\nFIELDS x y z intensity\nSIZE 4 4 4 4\nTYPE F F F F\n"
            "COUNT 1 1 1 1\nWIDTH 10\nHEIGHT 1\nPOINTS 10\nDATA binary\n"
        )
        with open(p, "wb") as f:
            f.write(header.encode())
            f.write(
                np.concatenate([pts, inten[:, None]], axis=1).astype(np.float32).tobytes()
            )
        out = pcd_io.read_pcd(p)
        np.testing.assert_allclose(out, pts, rtol=1e-6)


def make_tum_dataset(root, n_frames=3, h=tum.HEIGHT, w=tum.WIDTH):
    """Synthetic minimal TUM sequence on disk."""
    from PIL import Image

    os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    depth_lines, rgb_lines, gt_lines = [], [], []
    rng = np.random.default_rng(0)
    for i in range(n_frames):
        ts = 100.0 + i * 0.1
        dname, cname = f"depth/{i}.png", f"rgb/{i}.png"
        depth = np.full((h, w), 10000 + 100 * i, np.uint16)  # 2m + 2cm*i
        depth[0, 0] = 0  # invalid pixel
        Image.fromarray(depth).save(os.path.join(root, dname))
        rgb = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(rgb, "RGB").save(os.path.join(root, cname))
        depth_lines.append(f"{ts} {dname}")
        rgb_lines.append(f"{ts} {cname}")
        gt_lines.append(f"{ts + 0.01} {0.1 * i} 0 0 0 0 0 1")
    for name, lines in (
        ("depth.txt", depth_lines), ("rgb.txt", rgb_lines), ("groundtruth.txt", gt_lines)
    ):
        with open(os.path.join(root, name), "w") as f:
            f.write("# header\n# header\n# header\n")
            f.write("\n".join(lines) + "\n")


class TestVirtualSensor:
    def test_frames(self, tmp_path):
        make_tum_dataset(str(tmp_path))
        s = tum.VirtualSensor(str(tmp_path))
        assert len(s) == 3
        f0 = s.process_frame_index(0)
        assert f0.depth.shape == (480, 640)
        assert f0.depth[1, 1] == pytest.approx(2.0)      # 10000/5000
        assert f0.depth[0, 0] == -np.inf                  # zero -> MINF
        assert f0.color.shape == (480, 640, 4)
        # GT translation 0 at frame 0; world-to-camera inverse of identity.
        np.testing.assert_allclose(f0.trajectory, np.eye(4), atol=1e-6)
        f1 = s.process_frame_index(1)
        # cam-to-world t=(0.1,0,0) -> world-to-cam t=(-0.1,0,0).
        np.testing.assert_allclose(f1.trajectory[:3, 3], [-0.1, 0, 0], atol=1e-6)
        assert s.process_frame_index(3) is None

    def test_cloud_from_depth(self, tmp_path):
        make_tum_dataset(str(tmp_path))
        s = tum.VirtualSensor(str(tmp_path))
        f = s.process_frame_index(0)
        c = rgbd.cloud_from_depth(
            f.depth, f.color, s.intrinsics, s.extrinsics,
            keep_original_size=False, downsample_factor=8,
        )
        nv = int(np.asarray(c.valid).sum())
        assert 0 < nv <= 640 * 480 // 8
        pts = np.asarray(c.points)[np.asarray(c.valid)]
        np.testing.assert_allclose(pts[:, 2], 2.0, atol=1e-3)  # flat plane at 2m

    def test_keep_original_size(self, tmp_path):
        make_tum_dataset(str(tmp_path))
        s = tum.VirtualSensor(str(tmp_path))
        f = s.process_frame_index(0)
        c = rgbd.cloud_from_depth(
            f.depth, f.color, s.intrinsics, s.extrinsics, keep_original_size=True,
        )
        assert c.capacity == 640 * 480
        valid = np.asarray(c.valid)
        assert not valid[0]  # the zero-depth pixel
        assert valid[1:].all()

    def test_color_morton_order(self, tmp_path):
        """color_morton_order permutes rows (same point/color multiset,
        invalid rows last) along the 6-dim feature-space Morton curve —
        consecutive valid rows must be closer in feature space than a
        random permutation on average."""
        make_tum_dataset(str(tmp_path))
        s = tum.VirtualSensor(str(tmp_path))
        f = s.process_frame_index(0)
        base = rgbd.cloud_from_depth(
            f.depth, f.color, s.intrinsics, s.extrinsics,
            keep_original_size=True)
        c = rgbd.cloud_from_depth(
            f.depth, f.color, s.intrinsics, s.extrinsics,
            keep_original_size=True, color_morton_order=True)
        assert c.capacity == base.capacity
        vb = np.asarray(base.valid)
        vc = np.asarray(c.valid)
        assert int(vb.sum()) == int(vc.sum())
        # Same multiset of (point, color) rows.
        def feat(cl):
            m = np.concatenate([
                np.asarray(cl.points), np.asarray(cl.colors)[:, :3] / 255.0,
            ], axis=1)[np.asarray(cl.valid)]
            return m[np.lexsort(m.T)]
        np.testing.assert_allclose(feat(c), feat(base), atol=0)
        # Invalid rows sorted to the end (valid has no True after a False
        # ... except rows with invalid normals which stay valid but sort
        # late too; check the all-invalid tail exists where base had
        # interleaved invalids).
        first_invalid = int(np.argmin(vc)) if not vc.all() else len(vc)
        assert not vc[first_invalid:][:1].any() or vc.all()
        # Locality: mean consecutive feature distance beats shuffled.
        fc = np.concatenate([
            np.asarray(c.points), np.asarray(c.colors)[:, :3] / 255.0,
        ], axis=1)[vc]
        d_sorted = np.linalg.norm(np.diff(fc, axis=0), axis=1).mean()
        rng = np.random.default_rng(0)
        fs = fc[rng.permutation(len(fc))]
        d_rand = np.linalg.norm(np.diff(fs, axis=0), axis=1).mean()
        assert d_sorted < 0.5 * d_rand


class TestMesh:
    def test_rgbd_triangulation(self):
        h, w = 8, 8
        depth = np.full((h, w), 1.0, np.float32)
        depth[0, 0] = -np.inf
        color = np.zeros((h, w, 4), np.uint8)
        K = np.array([[100.0, 0, 4], [0, 100.0, 4], [0, 0, 1]], np.float32)
        m = mesh_lib.from_rgbd_frame(depth, color, K, np.eye(4), edge_threshold=0.5)
        assert len(m.triangles) > 0
        # No triangle references the invalid vertex 0.
        assert (m.triangles != 0).all()

    def test_sphere_and_join(self, tmp_path):
        s1 = mesh_lib.sphere(np.zeros(3), 0.1)
        s2 = mesh_lib.sphere(np.ones(3), 0.1, color=(255, 0, 0, 255))
        j = mesh_lib.join_meshes(s1, s2)
        assert len(j.vertices) == len(s1.vertices) + len(s2.vertices)
        assert j.triangles.max() < len(j.vertices)
        p = str(tmp_path / "j.off")
        j.write(p)
        m = off_io.read_off(p)
        assert len(m.vertices) == len(j.vertices)

    def test_camera_and_cylinder(self):
        c = mesh_lib.camera_marker(np.eye(4))
        assert len(c.vertices) == 5
        cyl = mesh_lib.cylinder(np.zeros(3), np.array([0, 0, 1.0]), 0.05)
        assert len(cyl.triangles) == 16


class TestETHLoader:
    def test_synthetic_sequence(self, tmp_path):
        rng = np.random.default_rng(0)
        data_dir = tmp_path / "plain"
        data_dir.mkdir()
        for name in ("s0.pcd", "s1.pcd"):
            pcd_io.write_pcd(str(data_dir / name), rng.standard_normal((200, 3)).astype(np.float32))
        csv_path = str(tmp_path / "plain_global.csv")
        pose = "1,0,0,0.5,0,1,0,0,0,0,1,0"
        with open(csv_path, "w") as f:
            f.write("id,source,target,overlap,t0,t1,t2,t3,t4,t5,t6,t7,t8,t9,t10,t11\n")
            f.write(f"0,s1.pcd,s0.pcd,0.5,{pose}\n")
        loader = ETHDataLoader(csv_path)
        assert loader.get_length() == 1
        assert loader.data_name == "plain"
        sample = loader.get_item(0)
        assert int(np.asarray(sample.source.valid).sum()) == 200
        np.testing.assert_allclose(sample.pose[0, 3], 0.5)
        # Normals were estimated and are unit-ish.
        n = np.asarray(sample.source.normals)[np.asarray(sample.source.valid)]
        np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-3)
        with pytest.raises(IndexError):
            loader.get_item(1)
